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

    def __init__(self, cfg: ImMeshConfig, adaptive_mesh_budget: int = 0):
        self.cfg = cfg
        self.lio = LioPipeline(cfg)      # owns state + voxel map
        self.mesh = MeshPipeline(cfg)    # owns global map + triangle store
        self.frame_idx = 0
        # Adaptive re-mesh budget (the reference's analogue is its frame
        # queue absorbing bursts, ImMesh_mesh_reconstruction.cpp:272-310):
        # when > cfg.mesh.active_voxels_per_frame, a SECOND compiled variant
        # of the joint program with this larger budget is used on frames
        # where the previous frame left a re-mesh backlog — spending the
        # LIO/mesh headroom to keep the pending queue near zero instead of
        # letting frontier bursts accumulate.  Both variants consume the
        # same pytrees (the budget only sizes program-internal work lists),
        # so switching per frame is free apart from the one-time compile.
        self._cfg_hi = None
        if adaptive_mesh_budget > cfg.mesh.active_voxels_per_frame:
            import dataclasses
            self._cfg_hi = cfg.replace(mesh=dataclasses.replace(
                cfg.mesh, active_voxels_per_frame=adaptive_mesh_budget))
        self._backlog_prev = None   # in-flight async copy of drop_deferred

    def static_init(self, acc, gyr) -> None:
        self.lio.static_init(acc, gyr)

    def step(self, bundle: ScanBundle):
        cfg = self.cfg
        if self._cfg_hi is not None and self._backlog_prev is not None \
                and int(self._backlog_prev) > 0:
            cfg = self._cfg_hi
        (self.lio.state, self.lio.vm, self.mesh.gm, self.mesh.store,
         world_scan, slots, smask, diag) = joint_step(
            self.lio.state, self.lio.vm, self.mesh.gm, self.mesh.store,
            bundle, cfg)
        if self._cfg_hi is not None:
            # one-frame-delayed async backlog poll (same pattern as the
            # occupancy polls): the decision tolerates one frame of staleness
            d = diag["drop_deferred"] + 0
            d.copy_to_host_async()
            self._backlog_prev = d
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
