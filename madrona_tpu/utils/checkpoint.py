"""Per-world checkpoint / restore + host-side persistence.

TPU-native equivalent of the reference's env checkpointing surface
(``TrainCheckpointingInterface``, ``include/madrona/py/utils.hpp:163-165``;
``save_ckpts`` / ``restore_ckpts`` XLA custom calls with per-world
should_save / should_restore masks, ``src/python/jax_register.py:209-344``).
SURVEY.md §5.4: on TPU this is pure JAX — world state *is* a pytree of
``[W, ...]`` arrays, so checkpoint = masked select into a snapshot buffer
and restore = masked select back. No custom calls, no app-side packing.

Host persistence (the reference leaves disk I/O to the app; we provide
the orbax-style convenience SURVEY.md §5.3 calls for): ``save_npz`` /
``load_npz`` round-trip the full SimState through one .npz file.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState


def snapshot(state: SimState) -> SimState:
    """A checkpoint buffer covering all worlds (initially a copy)."""
    return jax.tree_util.tree_map(lambda x: x, state)


def _masked_select(mask, new, old, scalars_from_new: bool):
    """Per-world select; global scalars (the step counter) can't be
    per-world, so they follow the live side of each operation."""

    def sel(n, o):
        if n.ndim == 0:
            return n if scalars_from_new else o
        m = mask.reshape(mask.shape + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)

    return jax.tree_util.tree_map(sel, new, old)


def save_worlds(ckpt: SimState, state: SimState, should_save) -> SimState:
    """ckpt' = state where should_save else ckpt (reference save_ckpts)."""
    mask = jnp.asarray(should_save, bool)
    return _masked_select(mask, state, ckpt, scalars_from_new=True)


def restore_worlds(state: SimState, ckpt: SimState, should_restore) -> SimState:
    """state' = ckpt where should_restore else state (restore_ckpts).
    The global step counter stays live so post-restore RNG streams are
    fresh rather than replaying the checkpoint's future."""
    mask = jnp.asarray(should_restore, bool)
    return _masked_select(mask, ckpt, state, scalars_from_new=False)


# ---------------------------------------------------------------- disk I/O

def _flatten_with_paths(state: SimState):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_npz(path: str, state: SimState) -> None:
    leaves, _ = _flatten_with_paths(state)
    np.savez_compressed(
        path, **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    )


def load_npz(path: str, like: SimState) -> SimState:
    """Rebuild a SimState with ``like``'s structure from a saved file."""
    data = np.load(path)
    leaves, treedef = _flatten_with_paths(like)
    loaded = []
    for i, ref in enumerate(leaves):
        arr = jnp.asarray(data[f"leaf_{i}"])
        if arr.shape != ref.shape or arr.dtype != ref.dtype:
            raise ValueError(
                f"checkpoint leaf {i} mismatch: saved "
                f"{arr.shape}/{arr.dtype} vs expected {ref.shape}/{ref.dtype}"
            )
        loaded.append(arr)
    return jax.tree_util.tree_unflatten(treedef, loaded)
