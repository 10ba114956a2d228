"""Fused odometry + meshing frame step: ONE jitted program per LiDAR frame.

The reference splits the frame across threads — LIO thread → frame queue →
mesh worker pool (SURVEY.md §3.2/3.3, ImMesh_mesh_reconstruction.cpp:272-310).
On TPU the equivalent of that overlap is a single fused XLA program per frame
plus JAX's async dispatch: the host enqueues frame k+1 while frame k still
runs, so throughput is bounded by device execution, not by host↔device
round-trip latency (which, through a tunneled chip, dwarfs the compute).

All four persistent pytrees (filter state, plane voxel map, global point map,
triangle store) are DONATED: XLA updates the hash tables and point/triangle
slabs in place instead of allocating fresh HBM copies each frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from immesh_tpu.config import ImMeshConfig
from immesh_tpu.core.state import EsikfState
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.lio.pipeline import LioPipeline, lio_step
from immesh_tpu.map.voxel_map import VoxelMap
from immesh_tpu.mesh.global_map import GlobalPointMap
from immesh_tpu.mesh.pipeline import MeshPipeline, mesh_step
from immesh_tpu.mesh.triangles import TriangleStore


@functools.partial(
    jax.jit, static_argnames=("cfg",),
    donate_argnames=("state", "vm", "gm", "store"))
def joint_step(state: EsikfState, vm: VoxelMap, gm: GlobalPointMap,
               store: TriangleStore, bundle: ScanBundle, cfg: ImMeshConfig):
    """propagate → deskew → ESIKF → map grow → append → re-mesh, fused."""
    state, vm, world_scan, diag = lio_step(state, vm, bundle, cfg)
    gm, store, n_active, slots, smask, mdiag = mesh_step(
        gm, store, world_scan, bundle.mask, state.pos, cfg.mesh.mesh_chunk)
    diag = dict(diag, n_active_voxels=n_active, **mdiag)
    return state, vm, gm, store, world_scan, slots, smask, diag


class JointPipeline:
    """Host wrapper for the fused step — drop-in for LioPipeline+MeshPipeline
    when per-stage host timing isn't needed (bench, headless runs)."""

    def __init__(self, cfg: ImMeshConfig):
        self.cfg = cfg
        self.lio = LioPipeline(cfg)      # owns state + voxel map
        self.mesh = MeshPipeline(cfg)    # owns global map + triangle store
        self.frame_idx = 0

    def static_init(self, acc, gyr) -> None:
        self.lio.static_init(acc, gyr)

    def step(self, bundle: ScanBundle):
        (self.lio.state, self.lio.vm, self.mesh.gm, self.mesh.store,
         world_scan, slots, smask, diag) = joint_step(
            self.lio.state, self.lio.vm, self.mesh.gm, self.mesh.store,
            bundle, self.cfg)
        self.mesh.last_active = (slots, smask)
        self.frame_idx += 1
        self.lio.frame_idx = self.mesh.frame_idx = self.frame_idx
        # lifetime management on the fused path too: any positive
        # compact_check_every enables an async host-side occupancy poll
        # EVERY frame (the poll is a free async scalar copy; ≤0 disables);
        # compaction itself is a jitted device program (reference bounds its
        # working set by RAM reserves + recent-voxel expiry,
        # pointcloud_rgbd.cpp:278-294,425-455)
        self.lio.maybe_compact()
        self.mesh.maybe_compact(self.lio.state.pos)
        return world_scan, diag

    @property
    def state(self):
        return self.lio.state

    @property
    def store(self):
        return self.mesh.store
