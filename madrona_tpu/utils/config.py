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
