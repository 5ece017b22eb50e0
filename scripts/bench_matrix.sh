#!/usr/bin/env bash
# TPU bench matrix for the escape-room perf push (run ALONE — no CPU
# pytest/compile jobs on the host, or the tunnel dispatch starves and
# reads ~3x low; see ROADMAP "Known tunnel/workflow facts").
#
# Usage: bash scripts/bench_matrix.sh [out.jsonl]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/bench_matrix.jsonl}"
: > "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label ($*)" >&2
  local line
  line=$(env "$@" timeout 1200 python bench.py 2>/dev/null | tail -1)
  echo "{\"label\": \"$label\", \"result\": $line}" | tee -a "$OUT"
}

# 1. split-path baseline (round-1 default config)
run split_default MADRONA_TPU_BENCH_ENV=escape_room

# 2. fused whole-physics-step megakernel
run fused MADRONA_TPU_BENCH_ENV=escape_room MADRONA_TPU_MEGAKERNEL_FUSED=1

# 3. fused + chunked scan rollout (amortized dispatch)
run fused_chunk8 MADRONA_TPU_BENCH_ENV=escape_room \
  MADRONA_TPU_MEGAKERNEL_FUSED=1 MADRONA_TPU_BENCH_CHUNK=8

# 4. split + chunked scan (isolate chunking win from fusion win)
run split_chunk8 MADRONA_TPU_BENCH_ENV=escape_room MADRONA_TPU_BENCH_CHUNK=8

# 5. fused pair-chunk sweep (VMEM working-set knob)
for pc in 2 3 4; do
  run "fused_pc$pc" MADRONA_TPU_BENCH_ENV=escape_room \
    MADRONA_TPU_MEGAKERNEL_FUSED=1 MADRONA_TPU_FUSED_PAIR_CHUNK="$pc"
done

# 6. world-count sweep at the best config so far (edit after 1-5)
for w in 1024 2048 4096; do
  run "fused_w$w" MADRONA_TPU_BENCH_ENV=escape_room \
    MADRONA_TPU_MEGAKERNEL_FUSED=1 MADRONA_TPU_BENCH_WORLDS="$w"
done

echo "--- results in $OUT" >&2
