"""immesh_tpu — TPU-native LiDAR(-inertial) odometry + incremental meshing.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of hku-mars/ImMesh
(reference: /root/reference): scan preprocessing + motion deskew, IMU
propagation, an 18-state iterated ESIKF registering scans point-to-plane
against a probabilistic hash-voxel plane map, and incremental per-voxel 2-D
Delaunay mesh reconstruction — all expressed as batched, statically-shaped
device kernels instead of the reference's pointer-heavy CPU structures.

Layer map (see SURVEY.md §7):
  core/      SO(3) math, 18-dim manifold state, geometry   (ref: so3_math.h, common_lib.h)
  map/       open-addressing hash-voxel plane map          (ref: voxel_loc.*, tools_kd_hash.hpp, ikd-Tree)
  frontend/  sensor decoding, scan/IMU sync, simulator     (ref: preprocess.*, voxel_mapping_common.cpp)
  lio/       IMU propagation, deskew, association, ESIKF,
             sliding keyframe window                       (ref: IMU_Processing.*, voxel_mapping.cpp)
  mesh/      global point map, Delaunay, triangle store    (ref: ImMesh_mesh_reconstruction.cpp, meshing/)
  runtime/   frame pipeline, cost-time instrumentation,
             PLY/PCD export, pose logs, checkpointing      (ref: ImMesh_node.cpp, mesh_rec_geometry.cpp)
  dist/      device mesh, sharded map, multihost, window BA (ref: none — new multi-chip design)
  render/    live WebGL viewer, depth raster "reinforcement" (ref: mesh_rec_display.cpp, openGL_camera_view.cpp)
  texture/   camera model, RGB-Kalman render, pyramidal LK  (ref: image_frame.*, pointcloud_rgbd render path)
  eval/      ATE, mesh-quality metrics                      (ref: none — reference verifies visually)
  utils/     timers, trajectory/cost logs, console          (ref: tools_timer.hpp, tools_logger.hpp)
"""

__version__ = "0.1.0"

import jax as _jax

# Exact-f32 matmuls everywhere: on TPU the DEFAULT precision runs f32
# einsum/dot through the MXU as one bf16×bf16 pass (8 mantissa bits — 0.5 m
# resolution at |position| ≈ 100 m).  SLAM geometry (deskew rotations, H·R⁻¹·H
# Gauss-Newton assembly, window-BA factor blocks) silently degrades with map
# extent: the round-3 window-BA A/B diverged on TPU (ate 5.5 m) while the
# IDENTICAL run on CPU held 0.13 m.  The FLOP-heavy kernels (mesh/delaunay.py)
# already request HIGHEST explicitly; everything else is small-contraction
# work where the 6-pass f32 cost is irrelevant next to HBM traffic.
_jax.config.update("jax_default_matmul_precision", "float32")

from immesh_tpu.config import ImMeshConfig  # noqa: E402,F401
