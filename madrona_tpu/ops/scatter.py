"""Masked scatter/gather primitives shared by the ECS core.

The one subtle rule on TPU/XLA: a masked scatter must NOT clamp disabled
lanes onto a real index (read-then-rewrite races with enabled lanes under
duplicate-index scatter). Instead, disabled lanes are routed out of bounds
and dropped by XLA's ``mode="drop"`` scatter semantics — race-free and
deterministic by construction, which is this engine's replacement for the
reference's atomic row claims.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_set_2d(arr, world_idx, idx, values, mask):
    """arr[w, idx] = values where mask, else untouched.

    arr: [W, N, ...]; world_idx/idx/mask: [W, K]; values: [W, K, ...].
    """
    n = arr.shape[1]
    safe_idx = jnp.where(mask, idx, n)  # out of bounds -> dropped
    return arr.at[world_idx, safe_idx].set(values, mode="drop")


def masked_add_2d(arr, world_idx, idx, values, mask):
    n = arr.shape[1]
    safe_idx = jnp.where(mask, idx, n)
    return arr.at[world_idx, safe_idx].add(values, mode="drop")
