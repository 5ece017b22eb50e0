"""Per-world light tables + the reference's multi-light shading loop.

TPU-native equivalent of the reference's LightDesc ECS archetype
(``include/madrona/render/ecs.hpp`` LightDesc{Direction,Type,Shadow,
CutoffAngle,Intensity,Active}, registered in
``src/render/ecs_system.cpp:412-421``) and the raycaster's per-light
accumulation loop (``src/mw/device/bvh_raycast.cpp:865-925``):

* per light: directional (light_dir = -direction) or spotlight
  (light_dir = normalize(position - hit), skipped outside the cutoff
  cone);
* castShadow lights contribute only when the surface faces the light
  AND an occlusion trace toward it misses;
* contribution = clamp(normal . light_dir, 0, 1), summed over lights;
* final shade = max(ambient_floor, sum) * albedo, clamped to 1
  (the reference hardcodes the 0.2 floor — here ``cfg.ambient``).

Lights ride a fixed-capacity ``[W, L]`` table (the usual
capacity-tier convention) so worlds can carry different live light
sets; inactive slots are masked. The table is an ordinary pytree —
envs that move lights per step keep it in a singleton and hand
``RenderingSystem(lights_fn=...)`` a reader.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Lights:
    """[W, L] light table (or [L] for a single world)."""

    direction: jnp.ndarray    # [..., L, 3] f32 (normalized at build)
    position: jnp.ndarray     # [..., L, 3] f32 (spotlights)
    is_spot: jnp.ndarray      # [..., L] bool
    cutoff: jnp.ndarray       # [..., L] f32 half-angle, radians
    cast_shadow: jnp.ndarray  # [..., L] bool
    active: jnp.ndarray       # [..., L] bool
    intensity: jnp.ndarray    # [..., L] f32

    @property
    def capacity(self) -> int:
        return self.direction.shape[-2]


def make_lights(num_worlds: int, specs) -> Lights:
    """Build a [W, L] table replicated across worlds from a list of
    dicts: {"direction"| "position", "cutoff"?, "cast_shadow"?,
    "intensity"?}. A spec with "position" (and optionally "direction"
    as the cone axis) is a spotlight; otherwise directional."""
    l = max(len(specs), 1)
    dirs = np.zeros((l, 3), np.float32)
    dirs[:, 2] = -1.0
    pos = np.zeros((l, 3), np.float32)
    spot = np.zeros((l,), bool)
    cut = np.full((l,), np.pi, np.float32)
    shad = np.zeros((l,), bool)
    act = np.zeros((l,), bool)
    inten = np.ones((l,), np.float32)
    for i, s in enumerate(specs):
        act[i] = True
        if "position" in s:
            spot[i] = True
            pos[i] = s["position"]
            cut[i] = s.get("cutoff", np.pi / 4)
        if "direction" in s:
            d = np.asarray(s["direction"], np.float32)
            dirs[i] = d / max(np.linalg.norm(d), 1e-12)
        shad[i] = s.get("cast_shadow", False)
        inten[i] = s.get("intensity", 1.0)
    rep = lambda a: jnp.asarray(np.broadcast_to(
        a[None], (num_worlds,) + a.shape
    ))
    return Lights(
        direction=rep(dirs), position=rep(pos), is_spot=rep(spot),
        cutoff=rep(cut), cast_shadow=rep(shad), active=rep(act),
        intensity=rep(inten),
    )


def light_contrib(lights: Lights, hit_p, n_w, hit_any, shadow_trace,
                  use_shadows: bool):
    """The reference's per-light loop on [R]-lane arrays for ONE world.

    lights: [L]-capacity table rows; hit_p/n_w: [R, 3]; shadow_trace:
    fn(origins [R,3], dirs [R,3], t_limit [R]) -> occluded [R] bool —
    occluded iff a hit lands strictly before t_limit (the distance to
    a spotlight; inf for directional lights, whose occluders can sit
    anywhere along the ray). Returns contrib [R]."""
    l = lights.capacity
    contrib = jnp.zeros(hit_p.shape[0], jnp.float32)
    for i in range(l):
        axis = lights.direction[i]                      # [3]
        is_spot = lights.is_spot[i]
        to_light = lights.position[i][None, :] - hit_p  # [R, 3]
        tl_len = jnp.maximum(
            jnp.linalg.norm(to_light, axis=-1, keepdims=True), 1e-12
        )
        ldir = jnp.where(is_spot, to_light / tl_len, -axis[None, :])
        # spotlight cone test (bvh_raycast.cpp:884-895)
        d = jnp.sum((-ldir) * axis[None, :], axis=-1)
        angle = jnp.arccos(jnp.clip(d, -1.0, 1.0))
        in_cone = (~is_spot) | (
            jnp.abs(angle) <= jnp.abs(lights.cutoff[i])
        )
        ndl = jnp.sum(n_w * ldir, axis=-1)
        lam = jnp.clip(ndl, 0.0, 1.0) * lights.intensity[i]
        lit = jnp.ones_like(contrib, bool)
        if use_shadows:
            # trace regardless (fixed compute), mask by cast_shadow;
            # the shadow segment ends AT a spotlight — geometry beyond
            # the light position must not occlude it
            s_org = hit_p + n_w * jnp.where(
                ndl >= 0, 1e-2, -1e-2
            )[:, None]
            t_limit = jnp.where(
                is_spot, tl_len[:, 0] - 2e-2, jnp.float32(jnp.inf)
            )
            occluded = shadow_trace(s_org, ldir, t_limit)
            lit = (~lights.cast_shadow[i]) | (
                (ndl > 0.0) & (~occluded)
            )
        ok = lights.active[i] & in_cone & lit & hit_any
        contrib = contrib + jnp.where(ok, lam, 0.0)
    return contrib
