"""immesh_tpu — TPU-native LiDAR(-inertial) odometry + incremental meshing.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of hku-mars/ImMesh
(reference: /root/reference): scan preprocessing + motion deskew, IMU
propagation, an 18-state iterated ESIKF registering scans point-to-plane
against a probabilistic hash-voxel plane map, and incremental per-voxel 2-D
Delaunay mesh reconstruction — all expressed as batched, statically-shaped
device kernels instead of the reference's pointer-heavy CPU structures.

Layer map (see SURVEY.md §7):
  core/      SO(3) math, 18-dim manifold state, config     (ref: so3_math.h, common_lib.h)
  map/       open-addressing hash-voxel plane map          (ref: voxel_loc.*, tools_kd_hash.hpp, ikd-Tree)
  frontend/  sensor decoding, scan/IMU sync, simulator     (ref: preprocess.*, voxel_mapping_common.cpp)
  lio/       IMU propagation, deskew, association, ESIKF   (ref: IMU_Processing.*, voxel_mapping.cpp)
  mesh/      global point map, Delaunay, triangle store    (ref: ImMesh_mesh_reconstruction.cpp, meshing/)
  io/        PLY/PCD export, pose logs, checkpointing      (ref: mesh_rec_geometry.cpp, voxel_mapping_common.cpp)
  parallel/  device mesh, sharded map + distributed update (ref: none — new multi-chip design)
  runtime/   frame pipeline, cost-time instrumentation     (ref: thread topology in ImMesh_node.cpp)
  viz/       mesh depth rasterizer ("reinforcement")       (ref: openGL_camera_view.cpp)
"""

__version__ = "0.1.0"

from immesh_tpu.config import ImMeshConfig  # noqa: F401
