"""Mesh importers: OBJ (native C++), glTF 2.0 (.gltf/.glb, Python).

Reference parity: ``AssetImporter::importFromDisk`` dispatching on file
extension (``src/importer/importer.cpp``); OBJ semantics follow
``src/importer/obj.cpp`` (1-based / negative indices, polygon fan
triangulation, per-vertex normal averaging).
"""

from __future__ import annotations

import base64
import ctypes
import dataclasses
import json
import os
import struct
from typing import List

import numpy as np

from .. import native


@dataclasses.dataclass
class ImportedMesh:
    positions: np.ndarray    # [V, 3] f32
    normals: np.ndarray      # [V, 3] f32 (zeros if absent)
    indices: np.ndarray      # [T, 3] i32
    name: str = ""


def load_obj(path: str) -> ImportedMesh:
    lib = native.load()
    if lib is not None:
        m = lib.obj_import(path.encode())
        try:
            err = bytes(m.contents.error).split(b"\0")[0]
            if err:
                raise ValueError(err.decode())
            nv = m.contents.num_verts
            nt = m.contents.num_tris
            pos = np.ctypeslib.as_array(
                m.contents.positions, shape=(nv, 3)
            ).copy()
            nrm = np.ctypeslib.as_array(
                m.contents.normals, shape=(nv, 3)
            ).copy()
            idx = np.ctypeslib.as_array(
                m.contents.indices, shape=(nt, 3)
            ).copy()
        finally:
            lib.obj_free(m)
        return ImportedMesh(pos, nrm, idx, os.path.basename(path))
    return _load_obj_py(path)


def _load_obj_py(path: str) -> ImportedMesh:
    """Pure-Python fallback with identical semantics."""
    pos: List[List[float]] = []
    tris: List[List[int]] = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                pos.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                refs = []
                for tok in line.split()[1:]:
                    vi = int(tok.split("/")[0])
                    refs.append(vi - 1 if vi > 0 else len(pos) + vi)
                for k in range(1, len(refs) - 1):
                    tris.append([refs[0], refs[k], refs[k + 1]])
    p = np.asarray(pos, np.float32)
    return ImportedMesh(
        p, np.zeros_like(p), np.asarray(tris, np.int32),
        os.path.basename(path),
    )


# ------------------------------------------------------------------ glTF

_CTYPE = {5120: np.int8, 5121: np.uint8, 5122: np.int16,
          5123: np.uint16, 5125: np.uint32, 5126: np.float32}
_NCOMP = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4}


def load_gltf(path: str) -> List[ImportedMesh]:
    """Minimal glTF 2.0 reader: embedded/.bin buffers, triangle prims
    (reference: src/importer/gltf.cpp, 2.4k LoC with simdjson)."""
    if path.endswith(".glb"):
        with open(path, "rb") as f:
            magic, _ver, _len = struct.unpack("<III", f.read(12))
            if magic != 0x46546C67:
                raise ValueError("not a glb file")
            clen, ctype = struct.unpack("<II", f.read(8))
            doc = json.loads(f.read(clen))
            buffers = []
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    break
                clen, ctype = struct.unpack("<II", hdr)
                buffers.append(f.read(clen))
    else:
        with open(path) as f:
            doc = json.load(f)
        buffers = []
        base = os.path.dirname(path)
        for buf in doc.get("buffers", []):
            uri = buf["uri"]
            if uri.startswith("data:"):
                buffers.append(base64.b64decode(uri.split(",", 1)[1]))
            else:
                with open(os.path.join(base, uri), "rb") as bf:
                    buffers.append(bf.read())

    def read_accessor(idx):
        acc = doc["accessors"][idx]
        view = doc["bufferViews"][acc["bufferView"]]
        dtype = _CTYPE[acc["componentType"]]
        ncomp = _NCOMP[acc["type"]]
        offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
        data = buffers[view.get("buffer", 0)]
        count = acc["count"]
        stride = view.get("byteStride") or ncomp * np.dtype(dtype).itemsize
        if stride == ncomp * np.dtype(dtype).itemsize:
            arr = np.frombuffer(
                data, dtype, count * ncomp, offset
            ).reshape(count, ncomp)
        else:
            arr = np.zeros((count, ncomp), dtype)
            for i in range(count):
                arr[i] = np.frombuffer(
                    data, dtype, ncomp, offset + i * stride
                )
        return arr

    out = []
    for mesh in doc.get("meshes", []):
        for prim in mesh.get("primitives", []):
            if prim.get("mode", 4) != 4:   # triangles only
                continue
            pos = read_accessor(prim["attributes"]["POSITION"]).astype(
                np.float32
            )
            nrm = (
                read_accessor(prim["attributes"]["NORMAL"]).astype(np.float32)
                if "NORMAL" in prim["attributes"]
                else np.zeros_like(pos)
            )
            if "indices" in prim:
                idx = read_accessor(prim["indices"]).reshape(-1, 3)
            else:
                idx = np.arange(len(pos), dtype=np.int32).reshape(-1, 3)
            out.append(
                ImportedMesh(
                    pos, nrm, idx.astype(np.int32),
                    mesh.get("name", ""),
                )
            )
    return out


def import_from_disk(path: str) -> List[ImportedMesh]:
    """AssetImporter::importFromDisk dispatch."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        return [load_obj(path)]
    if ext in (".gltf", ".glb"):
        return load_gltf(path)
    if ext in (".usd", ".usda"):
        from .usd import load_usd

        return load_usd(path)
    raise ValueError(f"unsupported asset format: {ext}")
