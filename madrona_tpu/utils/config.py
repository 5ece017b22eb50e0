"""Config system: dataclass configs + environment-variable overrides.

Reference parity (SURVEY.md §5.6): the reference mixes typed config
structs (ThreadPoolExecutor::Config, StateConfig/CompileConfig) with
~15 MADRONA_* environment variables read ad hoc. Here every config is a
frozen dataclass (jit-static by construction — configs are Python-side
constants baked into the trace), and :func:`env_override` applies
``MADRONA_TPU_<FIELD>``-style overrides with dataclass-typed parsing.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Type, TypeVar

T = TypeVar("T")

PREFIX = "MADRONA_TPU"


def _parse(raw: str, ty):
    if ty is bool:
        return raw.lower() not in ("0", "false", "")
    if ty is int:
        return int(raw)
    if ty is float:
        return float(raw)
    if ty is str:
        return raw
    if ty is tuple or getattr(ty, "__origin__", None) is tuple:
        return tuple(float(x) for x in raw.split(","))
    return raw


def env_override(cfg: T, prefix: str = PREFIX) -> T:
    """Apply ``<prefix>_<FIELDNAME>`` env overrides to a dataclass.

    e.g. ``MADRONA_TPU_SUBSTEPS=8`` overrides PhysicsConfig.substeps.
    Unknown variables are ignored; type errors raise."""
    updates = {}
    for f in dataclasses.fields(cfg):
        var = f"{prefix}_{f.name.upper()}"
        if var in os.environ:
            ty = type(getattr(cfg, f.name))
            updates[f.name] = _parse(os.environ[var], ty)
    return dataclasses.replace(cfg, **updates) if updates else cfg


_TUNED_PATH = os.path.join(
    os.path.dirname(__file__), "..", "tuned_configs.json"
)
_tuned_cache = None


def load_tuned(env_name: str, backend: str = "") -> dict:
    """Tuned kernel knobs for (env, backend) from the committed tuning
    table — the PGO analogue of the reference's per-node block-config
    cache (``src/mw/cuda_exec.cpp:2115-2203`` records the fastest
    per-kernel launch config from a profile run and replays it from a
    file; ``scripts/profile.py`` drives the sweep). Here
    ``scripts/tune_kernels.py`` sweeps the knobs ON HARDWARE and writes
    ``madrona_tpu/tuned_configs.json``; this loader replays the winners.

    Returns {} when the table or the (env, backend) row is absent, so
    the dataclass defaults stand. Keys starting with ``bench_`` are
    harness-level (world count, scan chunk) and are ignored by
    :func:`apply_tuned`."""
    global _tuned_cache
    import json

    if _tuned_cache is None:
        try:
            with open(_TUNED_PATH) as f:
                _tuned_cache = json.load(f)
        except (OSError, ValueError):
            _tuned_cache = {}
    if not backend:
        import jax

        backend = jax.default_backend()
        # axon (the tunnel alias) and tpu share the hardware-measured
        # row; any OTHER accelerator (e.g. cuda) gets {} so dataclass
        # defaults stand — TPU-tuned Pallas tiles were never profiled
        # there
        if backend in ("tpu", "axon"):
            backend = "tpu"
        elif backend != "cpu":
            return {}
    row = _tuned_cache.get(env_name, {}).get(backend, {})
    # lists -> tuples so the returned dict shares nothing mutable with
    # the module cache (apply_tuned needs tuples anyway)
    return {
        k: (tuple(v) if isinstance(v, list) else v) for k, v in row.items()
    }


def apply_tuned(cfg: T, env_name: str) -> T:
    """Overlay the tuned table's kernel knobs onto a config dataclass.

    Precedence (lowest to highest): dataclass defaults -> tuned table ->
    ``MADRONA_TPU_*`` env vars (call :func:`env_override` after this)."""
    tuned = load_tuned(env_name)
    names = {f.name for f in dataclasses.fields(cfg)}
    updates = {
        k: (tuple(v) if isinstance(v, list) else v)
        for k, v in tuned.items()
        if k in names and not k.startswith("bench_")
    }
    return dataclasses.replace(cfg, **updates) if updates else cfg


def enable_compile_cache(path: str = "") -> None:
    """Turn on JAX's persistent compilation cache (the TPU analogue of
    the reference's on-disk CUDA kernel cache, MADRONA_MWGPU_KERNEL_CACHE
    — SURVEY.md §5.6). Safe to call repeatedly; the env var
    MADRONA_TPU_COMPILE_CACHE overrides the location, empty disables."""
    import jax

    loc = os.environ.get(PREFIX + "_COMPILE_CACHE", path or "/tmp/mtpu_jax_cache")
    if not loc:
        return
    jax.config.update("jax_compilation_cache_dir", loc)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
