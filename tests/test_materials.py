"""Material/texture/light pipeline: import (glTF materials + images,
OBJ .mtl), bake (MaterialTables + atlas), sample (textured shading in
the BLAS tracer), shadows. Reference: importer.hpp:86-110,
asset_processor.cpp:155-254, bvh_raycast.cpp:776-912."""

import base64
import io
import json
import os

import jax.numpy as jnp
import numpy as np

from madrona_tpu.assets.bvh import build_mesh_bvh
from madrona_tpu.assets.importer import import_assets
from madrona_tpu.render.blas import bake_assets_blas, bake_blas, trace_scene_blas
from madrona_tpu.render.materials import bake_materials, sample_materials
from madrona_tpu.render.raycast import RenderConfig


def _png_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _checker_png(s=8):
    img = np.zeros((s, s, 3), np.uint8)
    yy, xx = np.mgrid[0:s, 0:s]
    img[((yy // 2 + xx // 2) % 2) == 0] = (255, 0, 0)
    img[((yy // 2 + xx // 2) % 2) == 1] = (0, 0, 255)
    return img


def _write_quad_gltf(tmp_path, with_texture=True):
    """Textured unit quad in the xz plane at y=0."""
    pos = np.array(
        [[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], np.float32
    )
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3]], np.uint16)
    blob = (
        pos.tobytes() + uv.tobytes() + idx.tobytes()
    )
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode(),
            "byteLength": len(blob),
        }],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 32},
            {"buffer": 0, "byteOffset": 80, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
        "meshes": [{
            "name": "quad",
            "primitives": [{
                "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
                "indices": 2, "material": 0,
            }],
        }],
        "materials": [{
            "name": "checker",
            "pbrMetallicRoughness": {
                "baseColorFactor": [1.0, 1.0, 1.0, 1.0],
                "roughnessFactor": 0.5,
                "metallicFactor": 0.25,
                **({"baseColorTexture": {"index": 0}} if with_texture
                   else {}),
            },
        }],
    }
    if with_texture:
        png = _checker_png()
        doc["images"] = [{
            "uri": "data:image/png;base64,"
                   + base64.b64encode(_png_bytes(png)).decode(),
        }]
        doc["textures"] = [{"source": 0}]
    p = os.path.join(tmp_path, "quad.gltf")
    with open(p, "w") as f:
        json.dump(doc, f)
    return p


def test_gltf_material_texture_import(tmp_path):
    p = _write_quad_gltf(str(tmp_path))
    assets = import_assets(p)
    assert len(assets.meshes) == 1
    m = assets.meshes[0]
    assert m.uvs is not None and m.uvs.shape == (4, 2)
    assert m.material == 0
    assert len(assets.materials) == 1
    mat = assets.materials[0]
    assert mat.roughness == 0.5 and mat.metallic == 0.25
    assert mat.texture == 0
    assert len(assets.textures) == 1
    assert assets.textures[0].data.shape == (8, 8, 4)


def test_obj_mtl_import(tmp_path):
    mtl = tmp_path / "cube.mtl"
    mtl.write_text(
        "newmtl red\nKd 0.9 0.1 0.2\nNs 250\n"
    )
    obj = tmp_path / "cube.obj"
    obj.write_text(
        "mtllib cube.mtl\nusemtl red\n"
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
    )
    assets = import_assets(str(obj))
    assert assets.meshes[0].material == 0
    np.testing.assert_allclose(
        assets.materials[0].base_color[:3], [0.9, 0.1, 0.2]
    )


def test_sample_materials_bilinear_wrap():
    from madrona_tpu.assets.importer import (
        ImportedMaterial, ImportedTexture,
    )

    img = np.zeros((4, 4, 4), np.uint8)
    img[..., 3] = 255
    img[0, 0] = (255, 0, 0, 255)     # v=1 corner (row 0)
    tex = ImportedTexture("t", img)
    mats = [ImportedMaterial(name="m", texture=0)]
    tables = bake_materials(mats, [tex], tex_size=4)
    # texel centers: uv=(0.125, 0.875) hits texel (0,0) exactly
    rgb = sample_materials(
        tables, jnp.asarray([1]), jnp.asarray([[0.125, 0.875]])
    )
    np.testing.assert_allclose(np.asarray(rgb)[0], [1, 0, 0], atol=1e-5)
    # wrap: uv + 1 samples the same point
    rgb2 = sample_materials(
        tables, jnp.asarray([1]), jnp.asarray([[1.125, -0.125]])
    )
    np.testing.assert_allclose(np.asarray(rgb2)[0], [1, 0, 0], atol=1e-5)
    # default material (slot 0): white
    rgb3 = sample_materials(
        tables, jnp.asarray([0]), jnp.asarray([[0.5, 0.5]])
    )
    np.testing.assert_allclose(np.asarray(rgb3)[0], [1, 1, 1], atol=1e-6)


def test_textured_trace_golden(tmp_path):
    """Trace the textured quad straight on: pixel colors must follow the
    checker pattern (modulo shading scale)."""
    p = _write_quad_gltf(str(tmp_path))
    assets = import_assets(p)
    blas, mats, _ = bake_assets_blas(assets)
    cfg = RenderConfig(
        width=4, height=4, t_max=10.0, ambient=1.0,  # shading = albedo
    )
    # camera rays at checker-cell centers (cells are 2x2 texels of the
    # 8x8 checker; centers land on solid color even under bilinear):
    # u = (2i+1)/8 -> x = 2u-1
    centers = [-0.75, -0.25, 0.25, 0.75]
    origins = []
    dirs = []
    for z in reversed(centers):              # image rows: top = +z
        for x in centers:
            origins.append((x, -3.0, z))
            dirs.append((0.0, 1.0, 0.0))
    origins = jnp.asarray(origins, jnp.float32)
    dirs = jnp.asarray(dirs, jnp.float32)
    rgb, depth = trace_scene_blas(
        cfg, blas,
        jnp.zeros((1, 3)), jnp.asarray([[1.0, 0, 0, 0]]),
        jnp.ones((1, 3)), jnp.zeros((1,), jnp.int32), jnp.ones((1,), bool),
        origins, dirs, materials=mats,
    )
    rgb = np.asarray(rgb).reshape(4, 4, 3)
    depth = np.asarray(depth).reshape(4, 4)
    assert (depth < 10.0).all()
    red = rgb[..., 0] > 0.6
    blue = rgb[..., 2] > 0.6
    assert (red | blue).all()
    assert red.any() and blue.any()
    # pattern is the checker: compare against uv-derived expectation
    for iy, z in enumerate(reversed(centers)):
        for ix, x in enumerate(centers):
            u = (x + 1) / 2
            v = (z + 1) / 2
            tx = int(u * 8)
            ty = int((1 - v) * 8)
            expect_red = ((ty // 2 + tx // 2) % 2) == 0
            assert red[iy, ix] == expect_red, (iy, ix)


def test_shadow_rays(tmp_path):
    """A slab floating above a floor: floor pixels under the slab darken
    when cfg.shadows is on."""
    floor_v = np.array(
        [[-5, -5, 0], [5, -5, 0], [5, 5, 0], [-5, 5, 0]], np.float32
    )
    floor_t = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    slab_v = np.array(
        [[-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]], np.float32
    )
    fb = build_mesh_bvh(floor_v, floor_t)
    sb = build_mesh_bvh(slab_v, floor_t)
    blas = bake_blas([fb, sb], colors=[(0.8, 0.8, 0.8), (0.5, 0.2, 0.2)])

    # straight-down light; rays straight down onto the floor
    origins = jnp.asarray(
        [[0.0, 0.0, 5.0], [3.0, 3.0, 5.0]], jnp.float32
    )  # under-slab point and open point
    dirs = jnp.asarray([[0, 0, -1.0], [0, 0, -1.0]], jnp.float32)
    inst = dict(
        inst_pos=jnp.zeros((2, 3)),
        inst_rot=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1)),
        inst_scale=jnp.ones((2, 3)),
        inst_obj=jnp.asarray([0, 1], jnp.int32),
        inst_mask=jnp.ones((2,), bool),
    )
    cfg_on = RenderConfig(t_max=20.0, shadows=True,
                          light_dir=(0.0, 0.0, -1.0))
    cfg_off = RenderConfig(t_max=20.0, shadows=False,
                           light_dir=(0.0, 0.0, -1.0))
    rgb_on, _ = trace_scene_blas(cfg_on, blas, origins=origins,
                                 dirs=dirs, **inst)
    rgb_off, _ = trace_scene_blas(cfg_off, blas, origins=origins,
                                  dirs=dirs, **inst)
    rgb_on = np.asarray(rgb_on)
    rgb_off = np.asarray(rgb_off)
    # ray 0 passes through the slab first; it hits the SLAB (nearest),
    # which is lit from above -> unshadowed either way. Instead compare
    # the floor point at (3,3): open, so shadows on == off there.
    np.testing.assert_allclose(rgb_on[1], rgb_off[1], atol=1e-6)
    # a ray that reaches the floor *under* the slab without passing
    # through the slab: from (3,0,5) toward (0.5,0,0) — it crosses the
    # slab plane z=2 at x=1.5 (outside the slab) and lands at x=0.5
    # (under it); the shadow ray straight up then hits the slab
    org = jnp.asarray([[3.0, 0.0, 5.0]], jnp.float32)
    drc = jnp.asarray([[-2.5, 0.0, -5.0]], jnp.float32)
    drc = drc / jnp.linalg.norm(drc)
    r_on, d_on = trace_scene_blas(cfg_on, blas, origins=org, dirs=drc,
                                  **inst)
    r_off, d_off = trace_scene_blas(cfg_off, blas, origins=org,
                                    dirs=drc, **inst)
    assert float(d_on[0]) < 20.0
    np.testing.assert_allclose(float(d_on[0]), float(d_off[0]))
    assert np.all(np.asarray(r_on)[0] < np.asarray(r_off)[0] - 0.05)
