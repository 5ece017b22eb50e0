"""Asset pipeline: import meshes from disk, bake BVHs.

TPU-native equivalent of the reference AssetImporter
(``include/madrona/importer.hpp:114-130``, ``src/importer/`` — OBJ/glTF/
USD) and the render asset processor (``src/render/asset_processor.cpp``).
OBJ parsing and SAH BVH baking run in native C++
(madrona_tpu/native/importer.cpp); glTF is parsed host-side in Python
(the reference uses simdjson — JSON decode is not a hot path here). USD
is out of scope (the reference defers to tinyusdz).
"""

from .importer import ImportedMesh, load_obj, load_gltf, import_from_disk
from .bvh import MeshBVH, build_mesh_bvh

__all__ = [
    "ImportedMesh", "load_obj", "load_gltf", "import_from_disk",
    "MeshBVH", "build_mesh_bvh",
]
