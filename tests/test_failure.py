"""Failure detection / recovery: IMU-gap flag consumption and filter re-init
(reference m_flg_reset, src/voxel_mapping.cpp:1791-1797 + the stream guards in
voxel_mapping_common.cpp:348-362)."""

import jax.numpy as jnp
import numpy as np

from immesh_tpu.config import PRESETS
from immesh_tpu.frontend.sim import LidarImuSimulator
from immesh_tpu.frontend.sync import PacketSynchronizer
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.runtime.app import ImMeshRuntime


def _bundle(frame, cfg):
    return ScanBundle.from_numpy(
        frame.pts, frame.t_rel, frame.imu_stamps, frame.imu_acc,
        frame.imu_gyr, frame.scan_duration,
        cfg.preprocess.max_points, cfg.imu.max_imu_per_scan,
    )


class TestGapFlag:
    def test_gap_sets_and_consumes(self):
        cfg = PRESETS["sim"]()
        sync = PacketSynchronizer(cfg)
        sync.push_imu(0.00, np.zeros(3), np.zeros(3))
        sync.push_imu(0.01, np.zeros(3), np.zeros(3))
        assert not sync.consume_gap()
        sync.push_imu(0.60, np.zeros(3), np.zeros(3))  # >0.4 s gap
        assert sync.consume_gap()
        assert not sync.consume_gap()  # one-shot

    def test_backwards_imu_dropped(self):
        cfg = PRESETS["sim"]()
        sync = PacketSynchronizer(cfg)
        sync.push_imu(1.0, np.zeros(3), np.zeros(3))
        sync.push_imu(0.5, np.ones(3), np.ones(3))  # backwards → dropped
        assert len(sync.imu_t) == 1


class TestFilterResetRecovery:
    def test_recovers_from_injected_gap(self):
        """Inject a stream anomaly mid-run (velocity estimate corrupted, as
        after an IMU outage) and assert the reset path re-converges while the
        unreset filter is measurably worse at the first post-anomaly frame."""
        sim = LidarImuSimulator(n_rays=2048, seed=5)
        cfg = PRESETS["sim"]()

        def run(reset: bool):
            rt = ImMeshRuntime(cfg, mesh_enabled=False)
            rt.static_init(*sim.static_imu(100))
            R0_true, p0_true = sim.traj.pose(0.0)
            R_align = R0_true @ np.asarray(rt.lio.state.rot).T
            errs = []
            for k in range(16):
                f = sim.frame(k)
                if k == 8:  # anomaly: velocity knocked off by 3 m/s
                    rt.lio.state = rt.lio.state.replace(
                        vel=rt.lio.state.vel + jnp.asarray([3.0, -3.0, 1.0]))
                rt.process_frame(_bundle(f, cfg), t=k * sim.scan_T,
                                 imu_gap=(reset and k == 8))
                est_p = R_align @ np.asarray(rt.lio.state.pos) + p0_true
                errs.append(np.linalg.norm(est_p - f.gt_pos))
            rt.close()
            return errs

        errs_reset = run(reset=True)
        errs_no = run(reset=False)
        # by the end the reset run re-converged to cm-class error
        assert errs_reset[-1] < 0.05, errs_reset[-6:]
        # the reset absorbs the anomaly better right where it strikes
        assert errs_reset[8] <= errs_no[8]

    def test_reset_inflates_covariance_keeps_pose(self):
        cfg = PRESETS["sim"]()
        rt = ImMeshRuntime(cfg, mesh_enabled=False)
        rt.lio.state = rt.lio.state.replace(
            pos=jnp.asarray([1.0, 2.0, 3.0]),
            vel=jnp.asarray([9.0, 9.0, 9.0]))
        cov_before = float(rt.lio.state.cov[6, 6])
        rt.lio.reset_filter(keep_pose=True)
        np.testing.assert_allclose(np.asarray(rt.lio.state.pos), [1, 2, 3])
        np.testing.assert_allclose(np.asarray(rt.lio.state.vel), 0.0)
        assert float(rt.lio.state.cov[6, 6]) > cov_before
        rt.close()
