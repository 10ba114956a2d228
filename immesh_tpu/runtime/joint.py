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

    def __init__(self, cfg: ImMeshConfig, adaptive_mesh_budget: int = 0,
                 adaptive_threshold: int = 0):
        self.cfg = cfg
        self.lio = LioPipeline(cfg)      # owns state + voxel map
        self.mesh = MeshPipeline(cfg)    # owns global map + triangle store
        self.frame_idx = 0
        # Adaptive re-mesh budget (the reference's analogue is its frame
        # queue absorbing bursts, ImMesh_mesh_reconstruction.cpp:272-310):
        # when > cfg.mesh.active_voxels_per_frame, a SECOND compiled variant
        # of the joint program with this larger budget is used on frames
        # where the pending backlog exceeds `adaptive_threshold` (default
        # 2× the base budget) — spending the LIO/mesh headroom on genuine
        # frontier bursts while steady frames keep the cheap program, so
        # the backlog self-regulates around the threshold instead of
        # either growing unboundedly or taxing every frame.  Both variants
        # consume the same pytrees (the budget only sizes program-internal
        # work lists), so switching per frame costs nothing beyond the
        # one-time compile.
        self._cfg_hi = None
        if adaptive_mesh_budget > cfg.mesh.active_voxels_per_frame:
            import dataclasses
            self._cfg_hi = cfg.replace(mesh=dataclasses.replace(
                cfg.mesh, active_voxels_per_frame=adaptive_mesh_budget))
        self.adaptive_threshold = (adaptive_threshold or
                                   2 * cfg.mesh.active_voxels_per_frame)
        # TWO-frame-deep async backlog poll: reading a one-frame-old device
        # scalar blocks on the in-flight program and collapses the async
        # frame pipeline to depth 1 (~+14 ms/frame through the tunneled
        # chip, measured); a two-frame-old value is host-resident by read
        # time and the threshold decision tolerates the extra staleness
        self._backlog_q = []

    def static_init(self, acc, gyr) -> None:
        self.lio.static_init(acc, gyr)

    def prime_adaptive(self) -> None:
        """Force the next steps onto the hi-budget program — benches call
        this during warm-up so the hi variant's compile/cache-load happens
        before timing, not on the first frame whose backlog crosses the
        threshold."""
        if self._cfg_hi is not None:
            import numpy as np
            self._backlog_q = [np.int32(1 << 30), np.int32(1 << 30)]

    def step(self, bundle: ScanBundle):
        cfg = self.cfg
        if self._cfg_hi is not None and len(self._backlog_q) >= 2 \
                and int(self._backlog_q[0]) > self.adaptive_threshold:
            cfg = self._cfg_hi
        (self.lio.state, self.lio.vm, self.mesh.gm, self.mesh.store,
         world_scan, slots, smask, diag) = joint_step(
            self.lio.state, self.lio.vm, self.mesh.gm, self.mesh.store,
            bundle, cfg)
        if self._cfg_hi is not None:
            d = diag["drop_deferred"] + 0
            d.copy_to_host_async()
            self._backlog_q = (self._backlog_q + [d])[-2:]
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
