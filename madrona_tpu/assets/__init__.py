"""Asset pipeline: import meshes from disk, bake BVHs.

TPU-native equivalent of the reference AssetImporter
(``include/madrona/importer.hpp:114-130``, ``src/importer/`` — OBJ/glTF/
USD) and the render asset processor (``src/render/asset_processor.cpp``).
OBJ parsing and SAH BVH baking run in native C++
(madrona_tpu/native/importer.cpp); glTF is parsed host-side in Python
(the reference uses simdjson — JSON decode is not a hot path here). USD
ASCII stages are imported with the xform hierarchy flattened (assets/
usd.py) — the reference's USDLoader parses but never imports geometry
(src/importer/usd.cpp:30-61 returns false unconditionally).
"""

from .importer import ImportedMesh, load_obj, load_gltf, import_from_disk
from .usd import load_usd
from .bvh import MeshBVH, build_mesh_bvh

__all__ = [
    "ImportedMesh", "load_obj", "load_gltf", "load_usd", "import_from_disk",
    "MeshBVH", "build_mesh_bvh",
]
