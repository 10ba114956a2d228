"""LOAM-style feature extraction tests on analytic ring geometry."""

import numpy as np

from immesh_tpu.frontend.features import FeatureConfig, extract_features
from immesh_tpu.runtime.export import load_pcd, save_pcd


def _corner_ring(n=400, seed=0):
    """One ring sweeping across two walls meeting at a 90° corner: flat
    stretches (plane features) + one sharp crease (edge feature)."""
    rng = np.random.default_rng(seed)
    az = np.linspace(np.deg2rad(-40), np.deg2rad(40), n)
    # wall A: x=5 (az<0 side hits it), wall B: y=5... use corner at az=0:
    # range to wall x=5 for az in [-40°, 0): r = 5/cos(az); to wall through
    # corner rotated: mirror for az>0
    r = np.where(az < 0, 5.0 / np.cos(az), 5.0 / np.cos(az) * np.cos(az * 2))
    # simpler analytic corner: two planes r(az) piecewise-smooth w/ kink at 0
    r = np.where(az < 0, 5.0 / np.cos(az + np.deg2rad(20)),
                 5.0 / np.cos(np.deg2rad(20) - az))
    r += rng.normal(0, 0.002, n)
    xyz = np.stack([r * np.cos(az), r * np.sin(az), np.zeros(n)], -1)
    t = np.linspace(0, 0.1, n)
    ring = np.zeros(n, int)
    return xyz.astype(np.float32), ring, t.astype(np.float32), az


class TestFeatures:
    def test_corner_edge_and_planes(self):
        xyz, ring, t, az = _corner_ring()
        surf, edge = extract_features(xyz, ring, t)
        assert surf.sum() > 50, "flat wall stretches must yield plane features"
        assert edge.sum() >= 1, "the crease must yield an edge feature"
        # edge features concentrate at the crease (az ≈ 0)
        assert np.abs(az[edge]).min() < np.deg2rad(3)
        # plane features avoid the crease vicinity
        assert np.abs(az[surf]).min() > np.deg2rad(0.5)
        assert not np.any(surf & edge)

    def test_occlusion_edge_rejected(self):
        """A depth discontinuity (foreground object edge occluding background)
        must NOT produce an edge feature (reference edge_jump_judge Nr_blind)."""
        n = 300
        az = np.linspace(-0.5, 0.5, n)
        r = np.where(az < 0, 3.0, 8.0)  # hard occlusion jump at az=0
        xyz = np.stack([r * np.cos(az), r * np.sin(az), np.zeros(n)], -1)
        surf, edge = extract_features(
            xyz.astype(np.float32), np.zeros(n, int),
            np.linspace(0, 0.1, n).astype(np.float32))
        hit = edge & (np.abs(az) < 0.05)
        assert hit.sum() == 0

    def test_empty(self):
        s, e = extract_features(
            np.zeros((0, 3), np.float32), np.zeros(0, int), np.zeros(0))
        assert len(s) == 0 and len(e) == 0


class TestPcd:
    def test_roundtrip_binary(self, tmp_path):
        pts = np.random.default_rng(0).uniform(-5, 5, (1000, 3)).astype(np.float32)
        p = str(tmp_path / "c.pcd")
        save_pcd(p, pts)
        back = load_pcd(p)
        np.testing.assert_array_equal(back, pts)

    def test_ascii(self, tmp_path):
        pts = np.array([[1, 2, 3], [4, 5, 6.5]], np.float32)
        p = tmp_path / "a.pcd"
        with open(p, "w") as f:
            f.write("VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                    "COUNT 1 1 1\nWIDTH 2\nHEIGHT 1\nPOINTS 2\nDATA ascii\n")
            for r in pts:
                f.write(" ".join(str(v) for v in r) + "\n")
        back = load_pcd(str(p))
        np.testing.assert_allclose(back, pts)


class TestFeatureWiring:
    """feature_extract_en wires give_feature into Preprocessor.process
    (reference preprocess.cpp:900: the flag routes the feature cloud, not the
    raw scan, to registration)."""

    def test_flag_selects_feature_subset(self):
        from dataclasses import replace
        from immesh_tpu.config import PRESETS
        from immesh_tpu.frontend.preprocess import Preprocessor, RawScan
        from immesh_tpu.frontend.sim import LidarImuSimulator

        cfg = PRESETS["sim"]()
        pp = replace(cfg.preprocess, feature_extract_en=True,
                     timestamp_unit=1.0)
        sim = LidarImuSimulator(n_rays=4096, seed=0)
        f = sim.frame(0)
        raw = RawScan(xyz=f.pts, time_off=f.t_rel)
        pts_raw, _ = Preprocessor(replace(pp, feature_extract_en=False)
                                  ).process(raw)
        pts_f, t_f = Preprocessor(pp).process(raw)
        assert 64 <= len(pts_f) < len(pts_raw), \
            "feature cloud must be a strict, non-degenerate subset"
        assert len(t_f) == len(pts_f)

    def test_lio_runs_on_feature_scans(self):
        """End-to-end: LIO consumes feature-extracted scans and stays sane."""
        from dataclasses import replace
        import numpy as np
        from immesh_tpu.config import PRESETS
        from immesh_tpu.frontend.preprocess import Preprocessor, RawScan
        from immesh_tpu.frontend.sim import LidarImuSimulator
        from immesh_tpu.frontend.types import ScanBundle
        from immesh_tpu.lio.pipeline import LioPipeline

        cfg = PRESETS["sim"]()
        cfg = cfg.replace(preprocess=replace(
            cfg.preprocess, feature_extract_en=True, timestamp_unit=1.0,
            max_points=4096))
        pre = Preprocessor(cfg.preprocess)
        sim = LidarImuSimulator(n_rays=4096, seed=1)
        pipe = LioPipeline(cfg)
        pipe.static_init(*sim.static_imu(100))
        for k in range(3):
            f = sim.frame(k)
            pts, t_rel = pre.process(RawScan(xyz=f.pts, time_off=f.t_rel))
            b = ScanBundle.from_numpy(
                pts, t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
                f.scan_duration, cfg.preprocess.max_points,
                cfg.imu.max_imu_per_scan)
            pipe.step(b)
        pos = np.asarray(pipe.state.pos)
        assert np.all(np.isfinite(pos))
        # static-ish sim start: the filter must not diverge on feature clouds
        assert np.linalg.norm(pos) < 5.0
