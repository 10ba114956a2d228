"""Per-frame LIO step: propagate → deskew → downsample → update → grow map.

This is the TPU re-design of the reference's `service_LiDAR_update` hot loop
(reference src/voxel_mapping.cpp:1660-2050, call stack SURVEY.md §3.2): the
whole frame is ONE jitted program with no host round-trips — the reference's
thread/callback plumbing is replaced by the host feeding padded ScanBundles
and reading back poses asynchronously.

The full deskewed world-frame scan is returned for the meshing stage, exactly
as the reference hands `{undistorted world scan, pose}` to its mesh workers
(`map_incremental_grow`, ImMesh_mesh_reconstruction.cpp:377-444).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from immesh_tpu.config import ImMeshConfig
from immesh_tpu.core.geometry import lidar_point_cov_body
from immesh_tpu.core.state import EsikfState
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.lio import imu as imu_mod
from immesh_tpu.lio.downsample import voxel_downsample
from immesh_tpu.lio.esikf import lio_update
from immesh_tpu.map.voxel_map import VoxelMap


@functools.partial(jax.jit, static_argnames=("cfg",))
def lio_step(state: EsikfState, vm: VoxelMap, bundle: ScanBundle,
             cfg: ImMeshConfig):
    """One LiDAR(-inertial) frame. Returns (state, vm, world_scan, diag).

    world_scan is the full deskewed scan in world frame (meshing input),
    shaped like bundle.pts with bundle.mask validity.
    """
    lio_cfg, map_cfg, imu_cfg = cfg.lio, cfg.voxel_map, cfg.imu

    # 0. LiDAR→IMU extrinsics: points arrive in the LiDAR frame; express them
    # in the IMU/body frame the filter state lives in (reference composes
    # Lid_rot_to_IMU/Lid_offset_to_IMU through UndistortPcl,
    # IMU_Processing.cpp:925-956, and re-applies m_extR/m_extT per iteration,
    # voxel_mapping.cpp:1312 — algebraically identical to converting once).
    has_ext = (tuple(imu_cfg.extrinsic_t) != (0.0, 0.0, 0.0)
               or tuple(imu_cfg.extrinsic_r) != (1.0, 0.0, 0.0,
                                                 0.0, 1.0, 0.0,
                                                 0.0, 0.0, 1.0))
    if has_ext:
        r_ext = jnp.asarray(imu_cfg.extrinsic_r, bundle.pts.dtype).reshape(3, 3)
        t_ext = jnp.asarray(imu_cfg.extrinsic_t, bundle.pts.dtype)
        pts_body = bundle.pts @ r_ext.T + t_ext
    else:
        pts_body = bundle.pts

    # 1. propagate + deskew (reference Process2 → Forward/UndistortPcl)
    if imu_cfg.imu_en:
        state_prop, seg = imu_mod.imu_propagate(state, bundle, imu_cfg)
        pts_end = imu_mod.deskew(seg, state_prop, pts_body, bundle.t_rel)
    else:
        # constant-twist model: the filter's bg slot carries the estimated
        # body angular rate (reference Forward_without_imu semantics), so the
        # deskew twist is {ω̂·T, v·T} — the previous frames' relative motion.
        state_prop = imu_mod.const_velocity_propagate(
            state, bundle.scan_duration, imu_cfg)
        pts_end = imu_mod.deskew_const_twist(
            pts_body, bundle.t_rel, bundle.scan_duration,
            state.bg * bundle.scan_duration, state.vel * bundle.scan_duration,
        )

    # 2. scan downsample for registration/map (reference downSizeFilterSurf)
    down_pts, down_mask = voxel_downsample(
        pts_end, bundle.mask, lio_cfg.downsample_voxel, lio_cfg.map_update_points
    )

    # 3. iterated ESIKF update (reference lio_state_estimation)
    # Beam-noise covariance is defined by the LiDAR-frame geometry (reference
    # computes calcBodyVar on the lidar-frame point then rotates by extR,
    # voxel_mapping.cpp:1305-1311 + :1521); recover the lidar-frame point.
    if has_ext:
        pcov_l = lidar_point_cov_body(
            (down_pts - t_ext) @ r_ext, map_cfg.dept_err, map_cfg.beam_err)
        pcov = jnp.einsum("ij,njk,lk->nil", r_ext, pcov_l, r_ext)
    else:
        pcov = lidar_point_cov_body(down_pts, map_cfg.dept_err, map_cfg.beam_err)
    state_new, diag = lio_update(
        state_prop, vm, down_pts, pcov, down_mask, lio_cfg, map_cfg
    )

    # 4. map growth with the posterior pose (reference map_incremental_grow);
    # skipped in localization-only mode (prebuilt map)
    if lio_cfg.update_map:
        pts_world_down = state_new.transform_points(down_pts)
        sigma2 = (pcov[:, 0, 0] + pcov[:, 1, 1] + pcov[:, 2, 2]) / 3.0
        vm = vm.update(pts_world_down, sigma2, down_mask)

    # full-resolution world scan for meshing
    world_scan = state_new.transform_points(pts_end)
    return state_new, vm, world_scan, diag


class LioPipeline:
    """Host-side convenience wrapper holding filter + map state across frames."""

    def __init__(self, cfg: ImMeshConfig):
        self.cfg = cfg
        self.state = EsikfState.identity(
            gravity=cfg.imu.gravity,
            init_rot_cov=cfg.lio.init_rot_cov, init_pos_cov=cfg.lio.init_pos_cov,
            init_vel_cov=cfg.lio.init_vel_cov, init_bias_cov=cfg.lio.init_bias_cov,
            init_grav_cov=cfg.lio.init_grav_cov,
        )
        self.vm = VoxelMap.create(cfg.voxel_map)
        self.frame_idx = 0
        self.n_compactions = 0
        self.compact_ms = 0.0   # wall time spent inside compaction events
        self._occ_pending = None  # in-flight async occupancy copy

    def static_init(self, acc, gyr):
        """IMU static initialization (reference IMU_init)."""
        self.state = imu_mod.static_init(
            jnp.asarray(acc), jnp.asarray(gyr), self.cfg.imu, self.state
        )

    def reset_filter(self, keep_pose: bool = True) -> None:
        """Re-initialize the filter after a stream anomaly (IMU gap / bag
        restart) — the reference's m_flg_reset → ImuProcess::Reset path
        (src/voxel_mapping.cpp:1791-1797).  Pose mean and gravity survive;
        velocity and biases are zeroed and the covariance re-inflated (with
        extra velocity uncertainty: the platform may have moved arbitrarily
        during the gap) so the next updates re-converge from scratch."""
        lio = self.cfg.lio
        fresh = EsikfState.identity(
            gravity=self.cfg.imu.gravity,
            init_rot_cov=max(lio.init_rot_cov, 1e-3),
            init_pos_cov=max(lio.init_pos_cov, 1e-2),
            init_vel_cov=max(lio.init_vel_cov, 1.0),
            init_bias_cov=lio.init_bias_cov,
            init_grav_cov=lio.init_grav_cov,
        )
        if keep_pose:
            fresh = fresh.replace(rot=self.state.rot, pos=self.state.pos,
                                  grav=self.state.grav)
        self.state = fresh

    def step(self, bundle: ScanBundle):
        self.state, self.vm, world_scan, diag = lio_step(
            self.state, self.vm, bundle, self.cfg
        )
        self.frame_idx += 1
        self.maybe_compact()
        return world_scan, diag

    def maybe_compact(self) -> bool:
        """Occupancy-triggered map lifetime management (reference
        laser_map_fov_segment, voxel_mapping_common.cpp:214-288): when the
        hash table crosses the high-water mark, evict voxels outside the
        local-map radius; if the map is genuinely dense, shrink the radius
        until occupancy drops — never silently stop growing."""
        mc = self.cfg.voxel_map
        if mc.compact_check_every <= 0:
            return False
        high = mc.compact_high_water * mc.capacity
        # one-FRAME-delayed async occupancy poll (see mesh/pipeline.py): a
        # synchronous int() stalls the frame pipeline one device round trip;
        # the async copy makes next frame's read host-local and free
        pending = self._occ_pending
        n_v = self.vm.n_voxels()
        n_v.copy_to_host_async()
        self._occ_pending = n_v
        if pending is None:
            return False
        if int(pending) <= high:
            return False
        self._occ_pending = None
        self.n_compactions += 1
        import time as _time
        _t0 = _time.perf_counter()
        # hysteresis: compact down to the LOW water mark so steady growth
        # doesn't re-trigger a full table rebuild every few frames.  The
        # keep radius is solved in one device pass (distance quantile at
        # the low-water count) instead of a shrink-until-under rebuild
        # loop — see mesh/pipeline.maybe_compact.
        low = int(mc.compact_low_water * mc.capacity)
        radius = _keep_radius_vm(self.vm, self.state.pos + 0, low,
                                 mc.local_map_radius)
        self.vm = _compact_jit(self.vm, self.state.pos, radius)
        r = float(radius) * 0.7
        for _ in range(2):  # quantile-granularity guard, rarely taken
            if int(self.vm.n_voxels()) <= high:
                break
            self.vm = _compact_jit(
                self.vm, self.state.pos, jnp.asarray(r, jnp.float32))
            r *= 0.7
        self.compact_ms += 1e3 * (_time.perf_counter() - _t0)
        return True


@jax.jit
def _compact_jit(vm: VoxelMap, center: jnp.ndarray,
                 radius: jnp.ndarray) -> VoxelMap:
    return vm.compact(center, radius)


@functools.partial(jax.jit, static_argnames=("low", "r_max"))
def _keep_radius_vm(vm: VoxelMap, center: jnp.ndarray, low: int,
                    r_max: float) -> jnp.ndarray:
    """Largest keep radius whose Chebyshev cube holds ≤ `low` live voxels
    (per-level centers, the same rule VoxelMap.compact evicts by)."""
    from immesh_tpu.map.hash import EMPTY
    keys = vm.table.keys
    live = keys[:, 0] != EMPTY
    size = vm.cfg.voxel_size / jnp.exp2(keys[:, 3].astype(jnp.float32))
    vcen = (keys[:, :3].astype(jnp.float32) + 0.5) * size[:, None]
    d = jnp.max(jnp.abs(vcen - center[None, :]), axis=-1)
    d = jnp.sort(jnp.where(live, d, jnp.float32(jnp.inf)))
    r = jnp.minimum(jnp.float32(r_max), d[min(low, d.shape[0]) - 1])
    return jnp.where(jnp.isfinite(r), r * (1.0 - 1e-6), jnp.float32(r_max))
