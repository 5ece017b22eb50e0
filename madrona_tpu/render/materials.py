"""Material + texture tables for the raycaster.

TPU-native equivalent of the reference's material bake
(``AssetProcessor::initMaterialData``,
``src/render/asset_processor.cpp:155-254``) and the raycast kernel's
material/texture sampling (``src/mw/device/bvh_raycast.cpp:776-790``).
Design translation: the reference uploads per-material structs + CUDA
texture objects; here materials are a packed ``[M, ...]`` table and all
textures live in one fixed-shape atlas ``[A, S, S, 3]`` (each source
image resampled to S x S at bake time) so a texture fetch is a single
static-shape gather — no dynamic texture dimensions inside jit.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class MaterialTables:
    base_color: jnp.ndarray    # [M, 4] f32 RGBA factor
    rough_metal: jnp.ndarray   # [M, 2] f32 (roughness, metallic)
    tex_id: jnp.ndarray        # [M] i32 (-1 = untextured)
    atlas: jnp.ndarray         # [A, S, S, 3] f32 (A >= 1)

    @property
    def tex_size(self) -> int:
        return self.atlas.shape[1]

    @property
    def num_materials(self) -> int:
        return self.base_color.shape[0]


def bake_materials(
    materials: Sequence,
    textures: Sequence = (),
    tex_size: int = 64,
) -> MaterialTables:
    """Pack ImportedMaterial/ImportedTexture lists into device tables.

    Material slot 0 is always the default white material so ``mat_id``
    -1 can clamp to it; callers offset imported ids by +1.
    """
    m = len(materials) + 1
    base = np.ones((m, 4), np.float32)
    rm = np.ones((m, 2), np.float32)
    tid = np.full((m,), -1, np.int32)
    for i, mat in enumerate(materials):
        base[i + 1] = np.asarray(mat.base_color, np.float32)
        rm[i + 1] = (mat.roughness, mat.metallic)
        tid[i + 1] = mat.texture

    a = max(len(textures), 1)
    atlas = np.ones((a, tex_size, tex_size, 3), np.float32)
    for i, tex in enumerate(textures):
        img = np.asarray(tex.data)
        if img.shape[0] != tex_size or img.shape[1] != tex_size:
            from PIL import Image

            img = np.asarray(
                Image.fromarray(img).resize(
                    (tex_size, tex_size), Image.BILINEAR
                )
            )
        atlas[i] = img[..., :3].astype(np.float32) / 255.0
    return MaterialTables(
        base_color=jnp.asarray(base),
        rough_metal=jnp.asarray(rm),
        tex_id=jnp.asarray(tid),
        atlas=jnp.asarray(atlas),
    )


def default_materials() -> MaterialTables:
    return bake_materials([])


def sample_materials(tables: MaterialTables, mat_id, uv):
    """Albedo for hits: base_color.rgb x (texture sample | 1).

    mat_id: [R] i32 (imported id + 1; <=0 -> default white).
    uv: [R, 2] f32, wrapped (GL_REPEAT semantics, the reference's
    default sampler). Bilinear filtering over the atlas.
    Returns [R, 3] f32.
    """
    m = jnp.clip(mat_id, 0, tables.num_materials - 1)
    base = tables.base_color[m, :3]                     # [R, 3]
    t = tables.tex_id[m]                                # [R]
    s = tables.tex_size
    frac = uv - jnp.floor(uv)                           # wrap
    # texel space; v flipped (image row 0 = v 1.0, stb/GL convention)
    x = frac[..., 0] * s - 0.5
    y = (1.0 - frac[..., 1]) * s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    ti = jnp.maximum(t, 0)

    def texel(yy, xx):
        # GL_REPEAT: neighbor texels WRAP across tile edges (clipping
        # would duplicate edge texels and draw seams at integer uv)
        return tables.atlas[
            ti, jnp.mod(yy.astype(jnp.int32), s),
            jnp.mod(xx.astype(jnp.int32), s),
        ]

    c00 = texel(y0, x0)
    c01 = texel(y0, x0 + 1)
    c10 = texel(y0 + 1, x0)
    c11 = texel(y0 + 1, x0 + 1)
    tex = (
        c00 * (1 - fx) * (1 - fy) + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy + c11 * fx * fy
    )
    return base * jnp.where((t >= 0)[..., None], tex, 1.0)
