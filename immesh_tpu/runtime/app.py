"""Joint odometry + meshing runtime — the framework's `main()`.

Re-design of the reference's process topology (SURVEY.md §1 threading): the
LIO thread, frame queue, mesh thread-pool, and sync thread collapse into one
host loop dispatching two jitted device programs per frame (LIO step → mesh
step).  JAX dispatch is asynchronous, so host-side frame prep (decode, pad)
overlaps device compute — the reference's pipeline parallelism (P3) without
threads or locks.

Responsibilities mirrored from the reference's `service_LiDAR_update`
(src/voxel_mapping.cpp:1660-2050) and mesh service
(ImMesh_mesh_reconstruction.cpp:272-326):
  * static IMU init, per-frame step, pose/trajectory logging (kitti_log),
  * handoff of the full deskewed world scan to meshing (map_incremental_grow),
  * per-frame cost-time instrumentation in the reference's log schema,
  * mesh + trajectory export, whole-state checkpointing.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import numpy as np

import jax

from immesh_tpu.config import ImMeshConfig
from immesh_tpu.core import so3
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.lio.pipeline import LioPipeline
from immesh_tpu.mesh.pipeline import MeshPipeline
from immesh_tpu.runtime.export import save_checkpoint, save_ply, smooth_vertices
from immesh_tpu.utils.timers import CostTimeLogger, Timer, TrajectoryLogger


class ImMeshRuntime:
    """End-to-end LiDAR(-inertial) odometry + incremental meshing."""

    def __init__(self, cfg: ImMeshConfig, log_dir: Optional[str] = None,
                 mesh_enabled: bool = True):
        self.cfg = cfg
        self.lio = LioPipeline(cfg)
        self.mesh = MeshPipeline(cfg) if mesh_enabled else None
        if cfg.ba.enabled:
            from immesh_tpu.lio.window import WindowBA
            self.ba = WindowBA(cfg)
        else:
            self.ba = None
        self.timer = Timer()
        self.frame_idx = 0
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self.traj_log = TrajectoryLogger(os.path.join(log_dir, "kitti_log.txt"))
            self.cost_log = CostTimeLogger(
                os.path.join(log_dir, "mesh_cost_time.log"))
        else:
            self.traj_log = TrajectoryLogger(None)
            self.cost_log = CostTimeLogger(None)
        self._live = None
        self._live_cache = None
        self._live_sync_every = 5
        from collections import deque
        self._pending_cost = deque()

    # ------------------------------------------------------------------
    def start_live_viewer(self, host: str = "127.0.0.1", port: int = 0,
                          sync_every: int = 5) -> str:
        """Serve the live WebGL mesh viewer (reference GUI window analogue,
        ImMesh_node.cpp:298-525); returns its URL.  Dirty regions are synced
        to the host cache every `sync_every` frames (the reference uses a
        100 ms sync thread, mesh_rec_display.cpp:262-271)."""
        assert self.mesh is not None, "live viewer needs meshing enabled"
        from immesh_tpu.render.live import LiveMeshServer, RegionCache
        self._live_cache = RegionCache(self.cfg.mesh.region_size,
                                       self.cfg.mesh.voxel_resolution,
                                       self.cfg.mesh.display_smooth_lam)
        self._live = LiveMeshServer(self._live_cache, host, port).start()
        self._live_sync_every = max(1, sync_every)
        return self._live.url

    def stop_live_viewer(self) -> None:
        if self._live is not None:
            self._live.stop()
            self._live = None

    # ------------------------------------------------------------------
    def static_init(self, acc: np.ndarray, gyr: np.ndarray) -> None:
        self.lio.static_init(acc, gyr)

    def process_frame(self, bundle: ScanBundle, t: float = 0.0,
                      imu_gap: bool = False) -> dict:
        """One LiDAR(-inertial) frame through odometry and meshing.

        `imu_gap`: stream anomaly flag from PacketSynchronizer.consume_gap();
        triggers a filter re-init before the step (reference m_flg_reset,
        src/voxel_mapping.cpp:1791-1797).

        No per-frame host sync: device scalars (active-voxel count, effective
        residuals) are logged one frame late via the pending queue, so the
        mesh program for frame k overlaps host prep of frame k+1 (the
        reference overlaps via threads, ImMesh_mesh_reconstruction.cpp:272-310).
        """
        if imu_gap:
            self.lio.reset_filter(keep_pose=True)

        self.timer.tic("lio")
        world_scan, diag = self.lio.step(bundle)
        lio_ms = self.timer.toc("lio")

        n_active_dev = None
        mesh_ms = 0.0
        if self.mesh is not None:
            self.timer.tic("mesh")
            # reference decimates to ≤number_of_pts_append_to_map points
            # before appending (ImMesh_mesh_reconstruction.cpp:111); our
            # bundles are already capped by preprocess.max_points
            n_active_dev = self.mesh.step(
                world_scan, bundle.mask, self.lio.state.pos)
            mesh_ms = self.timer.toc("mesh")

        # prefetch: enqueue the device→host copy behind the frame's programs
        # so the blocking read below pays compute latency, not an extra
        # transfer round trip (~26 ms through a tunneled chip)
        self.lio.state.pos.copy_to_host_async()
        pos = np.asarray(self.lio.state.pos)
        ba_cost = None
        if self.ba is not None:
            corr = self.ba.observe(self.lio.state.rot, pos, world_scan,
                                   bundle.mask, self.lio.vm)
            if corr is not None:
                ba_cost = corr["cost"]
                if self.cfg.ba.apply_correction:
                    # left-apply the window's world-frame correction to the
                    # live filter (velocity rotates with the frame; gravity
                    # and biases are frame-invariant here)
                    import jax.numpy as jnp
                    dR = jnp.asarray(corr["d_rot"], jnp.float32)
                    dp = jnp.asarray(corr["d_pos"], jnp.float32)
                    st = self.lio.state
                    self.lio.state = st.replace(
                        rot=dR @ st.rot, pos=dR @ st.pos + dp,
                        vel=dR @ st.vel)
                    pos = np.asarray(self.lio.state.pos)
        quat = np.asarray(so3.rot_to_quat(self.lio.state.rot))  # wxyz
        self.traj_log.record(t, pos, (*quat[1:4], quat[0]))
        if self._live is not None:
            self._live.record_pose(t, pos, (*quat[1:4], quat[0]))
            if self.frame_idx % self._live_sync_every == 0:
                self.mesh.store = self._live_cache.sync(
                    self.mesh.gm, self.mesh.store)
                # plane-map overlay (reference pubPlaneMap,
                # voxel_mapping.cpp:947-1159): publish the LIO map's fitted
                # planes alongside the mesh regions
                from immesh_tpu.render.live import extract_planes
                self._live.record_planes(extract_planes(self.lio.vm))
        self._pending_cost.append(
            (self.frame_idx, mesh_ms, n_active_dev, lio_ms))
        # flush rows at least one frame old — their programs have retired, so
        # the int() below no longer blocks the pipeline
        while len(self._pending_cost) > 1:
            fi, mms, nact, lms = self._pending_cost.popleft()
            self.cost_log.record(fi, mms, 0 if nact is None else int(nact), lms)
        self.frame_idx += 1
        return {
            "pos": pos, "lio_ms": lio_ms, "mesh_ms": mesh_ms,
            # device scalars — callers that want numbers int() them
            "n_active_voxels": n_active_dev,
            "n_effective": diag["n_effective"],
            "ba_cost": ba_cost,
        }

    def reinforce(self, cam=None):
        """LiDAR point-cloud reinforcement at the viewer's RUNTIME-MUTABLE
        density/depth settings (the reference exposes these live in its GUI,
        ImMesh_node.cpp:305-329): rasterize the current mesh from `cam` (or
        a forward-looking camera at the current sensor pose) and synthesize
        densified points from the depth buffer.  Returns (points (N, 3),
        depth image)."""
        from immesh_tpu.render.raster import PinholeCam, reinforce_scan

        step, max_depth = 2, 80.0
        if self._live is not None:
            c = self._live.controls
            step = max(1, int(c.get("reinf_step", step)))
            max_depth = float(c.get("reinf_max_depth", max_depth))
        if cam is None:
            pos = np.asarray(self.lio.state.pos)
            fwd = np.asarray(self.lio.state.rot)[:, 0]  # body +x in world
            cam = PinholeCam.looking(pos, pos + fwd)
        return reinforce_scan(self.mesh.store, self.mesh.gm, cam,
                              stride=step, max_depth=max_depth)

    @property
    def paused(self) -> bool:
        """Runtime-mutable pause from the live viewer (reference's GUI pause
        flag halts `service_LiDAR_update`, ImMesh_node.cpp:360-432)."""
        return self._live is not None and self._live.paused

    def run(self, bundles: Iterable[ScanBundle]) -> list:
        import time as _time
        out = []
        for k, b in enumerate(bundles):
            while self.paused:
                _time.sleep(0.05)
            out.append(self.process_frame(b, t=k * 0.1))
        return out

    # ------------------------------------------------------------------
    def save_mesh(self, path: str, smooth_iters: int = 0) -> tuple:
        """Export current mesh to PLY (reference Save-Mesh button,
        ImMesh_node.cpp:395-402 → save_to_ply_file)."""
        assert self.mesh is not None
        verts, faces = self.mesh.extract()
        if smooth_iters:
            verts = smooth_vertices(verts, faces, smooth_iters)
        save_ply(path, verts, faces)
        return verts, faces

    def save_state(self, path_prefix: str) -> None:
        """Checkpoint filter + maps (beyond the reference, which can only
        serialize its point map offline)."""
        save_checkpoint(path_prefix + ".lio.npz", self.lio.state)
        save_checkpoint(path_prefix + ".vmap.npz", self.lio.vm)
        if self.mesh is not None:
            save_checkpoint(path_prefix + ".gmap.npz", self.mesh.gm)
            save_checkpoint(path_prefix + ".tris.npz", self.mesh.store)

    def close(self) -> None:
        while self._pending_cost:
            fi, mms, nact, lms = self._pending_cost.popleft()
            self.cost_log.record(fi, mms, 0 if nact is None else int(nact), lms)
        self.traj_log.close()
        self.cost_log.close()


def run_offline_pointcloud(pts: np.ndarray, cfg: ImMeshConfig,
                           frame_size: int = 100_000) -> MeshPipeline:
    """Offline meshing of a raw point cloud, no odometry (reference
    `reconstruct_mesh_from_pointcloud`, ImMesh_mesh_reconstruction.cpp:328-345
    / mapping_pointcloud.launch): identity pose, cloud chunked into frames."""
    mesh = MeshPipeline(cfg)
    sensor = pts.mean(axis=0).astype(np.float32) + np.array(
        [0, 0, 100.0], np.float32)
    for k in range(0, len(pts), frame_size):
        chunk = np.asarray(pts[k:k + frame_size], np.float32)
        mesh.step(chunk, np.ones(len(chunk), bool), sensor)
    return mesh
