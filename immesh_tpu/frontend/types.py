"""Statically-shaped measurement bundles handed from host to device.

Replaces the reference's `LidarMeasureGroup` (reference include/common_lib.h:161-197)
— one LiDAR scan plus the IMU packets covering it (`sync_packages`,
voxel_mapping_common.cpp:372-441) — with a padded SoA pytree so the whole
per-frame step is one jit invocation at a fixed shape bucket.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ScanBundle:
    # LiDAR
    pts: jnp.ndarray        # (N, 3) body-frame points
    t_rel: jnp.ndarray      # (N,) per-point time, seconds from scan start
    mask: jnp.ndarray       # (N,) bool validity (padding / blind / decimation)
    # IMU (interval-boundary samples spanning [0, scan_duration])
    imu_stamps: jnp.ndarray  # (M,) seconds from scan start, ascending
    imu_acc: jnp.ndarray     # (M, 3) m/s²
    imu_gyr: jnp.ndarray     # (M, 3) rad/s
    imu_mask: jnp.ndarray    # (M,) bool validity (padding)
    scan_duration: jnp.ndarray  # () seconds

    @classmethod
    def from_numpy(cls, pts, t_rel, imu_stamps, imu_acc, imu_gyr,
                   scan_duration, n_pts: int, n_imu: int,
                   mask=None, dtype=np.float32) -> "ScanBundle":
        """Pad/truncate host arrays to the static bucket (n_pts, n_imu)."""
        n = min(len(pts), n_pts)
        m = min(len(imu_stamps), n_imu)
        P = np.zeros((n_pts, 3), dtype)
        T = np.zeros((n_pts,), dtype)
        K = np.zeros((n_pts,), bool)
        P[:n] = pts[:n]
        T[:n] = t_rel[:n]
        K[:n] = True if mask is None else mask[:n]
        S = np.zeros((n_imu,), dtype)
        A = np.zeros((n_imu, 3), dtype)
        G = np.zeros((n_imu, 3), dtype)
        M_ = np.zeros((n_imu,), bool)
        S[:m] = imu_stamps[:m]
        A[:m] = imu_acc[:m]
        G[:m] = imu_gyr[:m]
        M_[:m] = True
        # padded stamps repeat the last valid stamp so searchsorted stays sane
        if m > 0:
            S[m:] = S[m - 1]
        return cls(
            pts=jnp.asarray(P), t_rel=jnp.asarray(T), mask=jnp.asarray(K),
            imu_stamps=jnp.asarray(S), imu_acc=jnp.asarray(A),
            imu_gyr=jnp.asarray(G), imu_mask=jnp.asarray(M_),
            scan_duration=jnp.asarray(dtype(scan_duration)),
        )
