"""Native (C++) host-side components: asset import + mesh BVH build.

The reference implements its asset pipeline in C++
(``src/importer/obj.cpp``, ``src/common/mesh_bvh_builder.cpp``); the TPU
build keeps those host-side stages native too — compiled on first use
into ``libmadrona_native.so`` and bound via ctypes (no pybind11 in the
toolchain; SURVEY.md §2 lang column).

``load()`` returns the bound library or None (callers fall back to pure
Python where one exists).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "importer.cpp")
_LIB = os.path.join(_DIR, "libmadrona_native.so")

_lib = None
_tried = False


class ObjMeshC(ctypes.Structure):
    _fields_ = [
        ("positions", ctypes.POINTER(ctypes.c_float)),
        ("normals", ctypes.POINTER(ctypes.c_float)),
        ("indices", ctypes.POINTER(ctypes.c_int32)),
        ("num_verts", ctypes.c_int64),
        ("num_tris", ctypes.c_int64),
        ("error", ctypes.c_char * 256),
    ]


class BVHOutC(ctypes.Structure):
    _fields_ = [
        ("node_min", ctypes.POINTER(ctypes.c_float)),
        ("node_max", ctypes.POINTER(ctypes.c_float)),
        ("node_left", ctypes.POINTER(ctypes.c_int32)),
        ("node_right", ctypes.POINTER(ctypes.c_int32)),
        ("tri_order", ctypes.POINTER(ctypes.c_int32)),
        ("num_nodes", ctypes.c_int64),
    ]


def build_library(force: bool = False) -> str:
    """Compile the native library (g++ -O2 -shared)."""
    if force or not os.path.exists(_LIB) or (
        os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB, _SRC],
            check=True,
        )
    return _LIB


def load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        build_library()
        lib = ctypes.CDLL(_LIB)
        lib.obj_import.restype = ctypes.POINTER(ObjMeshC)
        lib.obj_import.argtypes = [ctypes.c_char_p]
        lib.obj_free.argtypes = [ctypes.POINTER(ObjMeshC)]
        lib.bvh_build.restype = ctypes.POINTER(BVHOutC)
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.bvh_free.argtypes = [ctypes.POINTER(BVHOutC)]
        _lib = lib
    except Exception as exc:  # toolchain missing: callers fall back
        print(f"madrona_tpu.native: build failed ({exc})", file=sys.stderr)
        _lib = None
    return _lib
