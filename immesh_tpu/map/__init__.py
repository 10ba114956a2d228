from immesh_tpu.map.hash import HashTable  # noqa: F401
from immesh_tpu.map.voxel_map import VoxelMap  # noqa: F401
