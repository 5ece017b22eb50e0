"""Asset pipeline tests: native OBJ import, glTF parse, SAH BVH build."""

import json
import os
import struct

import numpy as np
import pytest

from madrona_tpu import native
from madrona_tpu.assets import (
    build_mesh_bvh, import_from_disk, load_gltf, load_obj,
)
from madrona_tpu.assets.importer import _load_obj_py


CUBE_OBJ = """
# unit cube
v -1 -1 -1
v 1 -1 -1
v 1 1 -1
v -1 1 -1
v -1 -1 1
v 1 -1 1
v 1 1 1
v -1 1 1
f 1 2 3 4
f 5 8 7 6
f 1 5 6 2
f 3 7 8 4
f 1 4 8 5
f 2 6 7 3
"""


@pytest.fixture
def cube_path(tmp_path):
    p = os.path.join(tmp_path, "cube.obj")
    with open(p, "w") as f:
        f.write(CUBE_OBJ)
    return p


def test_native_library_builds():
    assert native.load() is not None


def test_obj_import_native_matches_python(cube_path):
    m = load_obj(cube_path)
    assert m.positions.shape == (8, 3)
    assert m.indices.shape == (12, 3)   # 6 quads fan-triangulated
    mp = _load_obj_py(cube_path)
    np.testing.assert_array_equal(m.positions, mp.positions)
    np.testing.assert_array_equal(m.indices, mp.indices)
    # importFromDisk dispatch
    (m2,) = import_from_disk(cube_path)
    np.testing.assert_array_equal(m2.indices, m.indices)


def test_obj_negative_indices(tmp_path):
    p = os.path.join(tmp_path, "tri.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n")
    m = load_obj(p)
    np.testing.assert_array_equal(m.indices, [[0, 1, 2]])


def test_gltf_roundtrip(tmp_path):
    # hand-built minimal gltf with an embedded buffer: one triangle
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    buf = pos.tobytes() + idx.tobytes()
    import base64
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{
            "uri": "data:application/octet-stream;base64,"
            + base64.b64encode(buf).decode(),
            "byteLength": len(buf),
        }],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "meshes": [{
            "name": "tri",
            "primitives": [{"attributes": {"POSITION": 0}, "indices": 1}],
        }],
    }
    p = os.path.join(tmp_path, "tri.gltf")
    with open(p, "w") as f:
        json.dump(doc, f)
    (m,) = load_gltf(p)
    np.testing.assert_array_equal(m.positions, pos)
    np.testing.assert_array_equal(m.indices, [[0, 1, 2]])


def test_bvh_build_and_query(cube_path):
    m = load_obj(cube_path)
    bvh = build_mesh_bvh(m.positions, m.indices, leaf_size=2)
    # structural invariants: every tri appears exactly once in leaves
    seen = np.sort(bvh.tri_order)
    np.testing.assert_array_equal(seen, np.arange(len(m.indices)))
    # root bounds contain the mesh
    np.testing.assert_allclose(bvh.node_min[0], [-1, -1, -1])
    np.testing.assert_allclose(bvh.node_max[0], [1, 1, 1])
    # leaf bounds contain their triangles
    for n in range(bvh.num_nodes):
        if bvh.is_leaf(n):
            first, count = bvh.left[n], -bvh.right[n]
            for k in range(first, first + count):
                tri = m.indices[bvh.tri_order[k]]
                for vi in tri:
                    v = m.positions[vi]
                    assert (v >= bvh.node_min[n] - 1e-5).all()
                    assert (v <= bvh.node_max[n] + 1e-5).all()
    # ray query: from outside along -x hits the +x face at t=4
    t, tri = bvh.trace_ray([5.0, 0.2, 0.3], [-1.0, 0.0, 0.0])
    np.testing.assert_allclose(t, 4.0, rtol=1e-6)
    assert tri >= 0
    # miss
    t, tri = bvh.trace_ray([5.0, 3.0, 0.0], [-1.0, 0.0, 0.0])
    assert tri == -1


def test_bvh_large_random_mesh_matches_bruteforce():
    rs = np.random.RandomState(0)
    pos = rs.randn(300, 3).astype(np.float32) * 3
    idx = rs.randint(0, 300, (200, 3)).astype(np.int32)
    bvh = build_mesh_bvh(pos, idx)
    o = np.array([10.0, 0, 0])
    for i in range(20):
        d = rs.randn(3)
        d /= np.linalg.norm(d)
        t_bvh, _ = bvh.trace_ray(o, d)
        # brute force
        best = 1e30
        for tri in idx:
            v0 = pos[tri[0]].astype(np.float64)
            e1 = pos[tri[1]] - v0
            e2 = pos[tri[2]] - v0
            p = np.cross(d, e2)
            det = e1 @ p
            if abs(det) < 1e-12:
                continue
            tv = o - v0
            u = (tv @ p) / det
            q = np.cross(tv, e1)
            v = (d @ q) / det
            t = (e2 @ q) / det
            if 0 <= u and 0 <= v and u + v <= 1 and 1e-9 < t < best:
                best = t
        if best >= 1e30:
            assert t_bvh >= 1e30 or t_bvh == 1e30
        else:
            np.testing.assert_allclose(t_bvh, best, rtol=1e-5)


# ------------------------------------------------------------------- USD

CUBE_USDA = """#usda 1.0
(
    defaultPrim = "root"
    metersPerUnit = 1
)

def Xform "root"
{
    double3 xformOp:translate = (10, 0, 0)
    uniform token[] xformOpOrder = ["xformOp:translate"]

    def Xform "child" (
        kind = "component"
    )
    {
        float3 xformOp:scale = (2, 2, 2)
        uniform token[] xformOpOrder = ["xformOp:scale"]

        def Mesh "cube"
        {
            int[] faceVertexCounts = [4, 4, 4, 4, 4, 4]
            int[] faceVertexIndices = [0, 1, 3, 2, 4, 6, 7, 5, 0, 4, 5, 1,
                                       2, 3, 7, 6, 0, 2, 6, 4, 1, 5, 7, 3]
            point3f[] points = [(-1, -1, -1), (1, -1, -1), (-1, 1, -1),
                                (1, 1, -1), (-1, -1, 1), (1, -1, 1),
                                (-1, 1, 1), (1, 1, 1)]
        }
    }
}
"""


def test_usda_import(tmp_path):
    from madrona_tpu.assets import load_usd

    p = os.path.join(tmp_path, "cube.usda")
    with open(p, "w") as f:
        f.write(CUBE_USDA)
    meshes = load_usd(p)
    assert len(meshes) == 1
    m = meshes[0]
    assert m.name == "cube"
    assert m.positions.shape == (8, 3)
    assert m.indices.shape == (12, 3)    # 6 quads fan-triangulated
    # translate (10,0,0) then scale 2x applied to geometry
    np.testing.assert_allclose(m.positions.min(axis=0), [8, -2, -2])
    np.testing.assert_allclose(m.positions.max(axis=0), [12, 2, 2])
    # dispatch
    (m2,) = import_from_disk(p)
    np.testing.assert_array_equal(m2.indices, m.indices)


def test_usda_transform_ops(tmp_path):
    from madrona_tpu.assets import load_usd

    txt = """#usda 1.0
def Xform "g"
{
    matrix4d xformOp:transform = ( (0, 1, 0, 0), (-1, 0, 0, 0),
                                   (0, 0, 1, 0), (5, 0, 0, 1) )
    uniform token[] xformOpOrder = ["xformOp:transform"]

    def Mesh "tri" (
        active = true
    )
    {
        int[] faceVertexCounts = [3]
        int[] faceVertexIndices = [0, 1, 2]
        point3f[] points = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
        uniform token orientation = "leftHanded"
    }
}
"""
    p = os.path.join(tmp_path, "t.usda")
    with open(p, "w") as f:
        f.write(txt)
    (m,) = load_usd(p)
    # row-vector matrix: x-axis maps to +y, y-axis to -x, translate (5,0,0)
    np.testing.assert_allclose(
        m.positions, [[5, 1, 0], [4, 0, 0], [5, 0, 1]], atol=1e-6
    )
    # leftHanded flips winding
    np.testing.assert_array_equal(m.indices, [[0, 2, 1]])


def test_usda_rotate_and_normals(tmp_path):
    from madrona_tpu.assets import load_usd

    txt = """#usda 1.0
def Mesh "quad"
{
    float3 xformOp:rotateXYZ = (0, 0, 90)
    uniform token[] xformOpOrder = ["xformOp:rotateXYZ"]
    int[] faceVertexCounts = [3]
    int[] faceVertexIndices = [0, 1, 2]
    point3f[] points = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    normal3f[] normals = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
}
"""
    p = os.path.join(tmp_path, "r.usda")
    with open(p, "w") as f:
        f.write(txt)
    (m,) = load_usd(p)
    # rotateZ(90): +x -> +y
    np.testing.assert_allclose(m.positions[0], [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(m.normals[0], [0, 1, 0], atol=1e-6)


def test_usdc_rejected(tmp_path):
    from madrona_tpu.assets import load_usd

    p = os.path.join(tmp_path, "bin.usd")
    with open(p, "wb") as f:
        f.write(b"PXR-USDC" + b"\x00" * 64)
    with pytest.raises(ValueError, match="usdc"):
        load_usd(p)


def test_usda_non_xyz_euler_and_attrs_after_child(tmp_path):
    """rotateZYX (and friends) must apply all three axes in name order;
    prim attributes declared AFTER a nested child prim must survive
    parsing (exporters often emit GeomSubset children first)."""
    from madrona_tpu.assets import load_usd

    txt = """#usda 1.0
def Xform "g"
{
    float3 xformOp:rotateZYX = (0, 0, 90)
    uniform token[] xformOpOrder = ["xformOp:rotateZYX"]

    def Mesh "tri"
    {
        def GeomSubset "mat0"
        {
            int[] indices = [0]
        }
        int[] faceVertexCounts = [3]
        int[] faceVertexIndices = [0, 1, 2]
        point3f[] points = [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    }
}
"""
    p = os.path.join(tmp_path, "zyx.usda")
    with open(p, "w") as f:
        f.write(txt)
    meshes = load_usd(p)
    # the mesh's points appear after the GeomSubset child: must import
    assert len(meshes) == 1
    m = meshes[0]
    assert m.positions.shape == (3, 3)
    # rotateZYX = (0, 0, 90): per pxr, components follow the NAME's
    # letters (Z-angle first) -> only the X rotation is 90 deg here,
    # applied first: (0,1,0) -> (0,0,1)
    got = sorted(np.round(m.positions, 5).tolist())
    expect = sorted(np.round(np.asarray(
        [[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32), 5).tolist())
    assert got == expect, (got, expect)
