"""Frontend tests: per-sensor preprocessing, KITTI reader, packet sync."""

import numpy as np
import pytest

from immesh_tpu.config import ImMeshConfig, LidarType, PRESETS, PreprocessConfig
from immesh_tpu.frontend.preprocess import (
    Preprocessor, RawScan, kitti_vertical_angle_calib, read_kitti_bin,
)
from immesh_tpu.frontend.sync import PacketSynchronizer


class TestPreprocessor:
    def test_blind_and_range_gates(self):
        cfg = PreprocessConfig(blind=1.0, max_range=50.0)
        pre = Preprocessor(cfg)
        xyz = np.array([
            [0.5, 0, 0],      # inside blind
            [5, 0, 0],        # ok
            [100, 0, 0],      # beyond max range
            [np.nan, 0, 0],   # invalid
        ], np.float32)
        pts, t = pre.process(RawScan(xyz=xyz, time_off=np.zeros(4)))
        assert len(pts) == 1
        np.testing.assert_array_equal(pts[0], [5, 0, 0])

    def test_decimation(self):
        cfg = PreprocessConfig(point_filter_num=3, blind=0.01)
        pre = Preprocessor(cfg)
        xyz = np.tile(np.array([[5.0, 0, 0]], np.float32), (30, 1))
        pts, _ = pre.process(RawScan(xyz=xyz, time_off=np.zeros(30)))
        assert len(pts) == 10

    def test_livox_tag_filter(self):
        cfg = PreprocessConfig(lidar_type=LidarType.AVIA, blind=0.01)
        pre = Preprocessor(cfg)
        xyz = np.tile(np.array([[5.0, 0, 0]], np.float32), (4, 1))
        tag = np.array([0x00, 0x10, 0x20, 0x30], np.uint8)
        pts, _ = pre.process(RawScan(xyz=xyz, time_off=np.zeros(4), tag=tag))
        assert len(pts) == 2  # only 0x00 / 0x10 confidence kept

    def test_time_units(self):
        cfg = PreprocessConfig(timestamp_unit=1e-3, blind=0.01)  # ms
        pre = Preprocessor(cfg)
        xyz = np.tile(np.array([[5.0, 0, 0]], np.float32), (3, 1))
        _, t = pre.process(RawScan(xyz=xyz, time_off=np.array([0, 50, 100.0])))
        np.testing.assert_allclose(t, [0.0, 0.05, 0.1], atol=1e-6)

    def test_synthesized_azimuth_time_monotone_per_rev(self):
        """KITTI-style: no per-point time → azimuth sweep synthesis."""
        cfg = PreprocessConfig(blind=0.01)
        pre = Preprocessor(cfg)
        az = np.linspace(0, -2 * np.pi * 0.9, 100)  # CW sweep
        xyz = np.stack([5 * np.cos(az), 5 * np.sin(az), np.zeros(100)], -1)
        _, t = pre.process(RawScan(xyz=xyz.astype(np.float32), duration=0.1))
        assert (np.diff(t) >= -1e-6).all()
        assert t.max() <= 0.1 and t.max() > 0.08

    def test_kitti_calib_preserves_range(self):
        rng = np.random.default_rng(0)
        xyz = rng.uniform(-20, 20, (100, 3)).astype(np.float32)
        out = kitti_vertical_angle_calib(xyz)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=1), np.linalg.norm(xyz, axis=1), rtol=1e-5)
        # elevation shifted by exactly 0.205°
        el_in = np.arcsin(xyz[:, 2] / np.linalg.norm(xyz, axis=1))
        el_out = np.arcsin(out[:, 2] / np.linalg.norm(out, axis=1))
        np.testing.assert_allclose(
            np.degrees(el_out - el_in), 0.205, atol=1e-3)

    def test_kitti_bin_reader(self, tmp_path):
        raw = np.random.default_rng(0).uniform(-10, 10, (50, 4)).astype(np.float32)
        p = tmp_path / "000000.bin"
        raw.tofile(p)
        scan = read_kitti_bin(str(p))
        np.testing.assert_array_equal(scan.xyz, raw[:, :3])
        np.testing.assert_array_equal(scan.intensity, raw[:, 3])


class TestPacketSync:
    def _cfg(self):
        return PRESETS["sim"]()

    def _scan(self, stamp, n=100):
        rng = np.random.default_rng(int(stamp * 1000) % 2**31)
        return RawScan(xyz=rng.uniform(2, 10, (n, 3)).astype(np.float32),
                       time_off=np.linspace(0, 100, n), stamp=stamp,
                       duration=0.1)

    def test_bundles_scan_with_imu_window(self):
        sync = PacketSynchronizer(self._cfg())
        for k in range(30):
            sync.push_imu(k * 0.01, [0, 0, 9.81], [0, 0, 0])
        sync.push_scan(self._scan(0.0))
        b = sync.next_bundle()
        assert b is not None
        m = int(np.asarray(b.imu_mask).sum())
        assert 10 <= m <= 12  # samples in [0, 0.1]
        assert np.asarray(b.imu_stamps)[0] >= 0

    def test_waits_for_imu(self):
        sync = PacketSynchronizer(self._cfg())
        sync.push_scan(self._scan(0.0))
        sync.push_imu(0.02, [0, 0, 9.81], [0, 0, 0])
        assert sync.next_bundle() is None  # IMU hasn't reached scan end
        sync.push_imu(0.12, [0, 0, 9.81], [0, 0, 0])
        assert sync.next_bundle() is not None

    def test_backwards_imu_dropped(self):
        sync = PacketSynchronizer(self._cfg())
        sync.push_imu(0.05, [0, 0, 9.81], [0, 0, 0])
        sync.push_imu(0.01, [9, 9, 9], [9, 9, 9])  # backwards → dropped
        assert len(sync.imu_t) == 1

    def test_loopback_clears(self):
        sync = PacketSynchronizer(self._cfg())
        sync.push_scan(self._scan(5.0))
        sync.push_imu(5.0, [0, 0, 9.81], [0, 0, 0])
        sync.push_scan(self._scan(0.0))  # bag restarted
        assert len(sync.scans) == 1
        assert sync.scans[0].stamp == 0.0
        assert len(sync.imu_t) == 0

    def test_imu_less_mode(self):
        cfg = PRESETS["kitti"]()
        cfg = cfg.replace(preprocess=PreprocessConfig(
            lidar_type=LidarType.KITTI64, blind=1.0, max_points=1024))
        sync = PacketSynchronizer(cfg)
        sync.push_scan(self._scan(0.0))
        b = sync.next_bundle()  # no IMU needed
        assert b is not None
