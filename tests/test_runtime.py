"""Runtime tests: joint odometry+meshing loop, logs in the reference schema,
offline-pointcloud mode, state checkpointing."""

import os

import numpy as np
import pytest

from immesh_tpu.config import PRESETS
from immesh_tpu.frontend.sim import LidarImuSimulator
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.runtime.app import ImMeshRuntime, run_offline_pointcloud
from immesh_tpu.runtime.export import load_ply


def _bundles(sim, cfg, n):
    out = []
    for k in range(n):
        f = sim.frame(k)
        out.append(ScanBundle.from_numpy(
            f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
            f.scan_duration, cfg.preprocess.max_points,
            cfg.imu.max_imu_per_scan))
    return out


class TestJointRuntime:
    @pytest.mark.slow  # ~8-10 s; default gate keeps a faster sibling
    def test_end_to_end_with_logs(self, tmp_path):
        cfg = PRESETS["sim"]()
        sim = LidarImuSimulator(n_rays=2048, seed=5)
        rt = ImMeshRuntime(cfg, log_dir=str(tmp_path))
        rt.static_init(*sim.static_imu(50))
        stats = rt.run(_bundles(sim, cfg, 6))
        assert len(stats) == 6
        # meshing actually produced triangles
        assert int(rt.mesh.store.n_triangles()) > 100
        # trajectory log: TUM rows, unit quaternions
        rows = np.loadtxt(tmp_path / "kitti_log.txt")
        assert rows.shape == (6, 8)
        np.testing.assert_allclose(
            np.linalg.norm(rows[:, 4:8], axis=1), 1.0, atol=1e-5)
        # mesh + checkpoint export
        verts, faces = rt.save_mesh(str(tmp_path / "m.ply"), smooth_iters=1)
        v2, f2 = load_ply(str(tmp_path / "m.ply"))
        assert len(f2) == len(faces) > 0
        rt.save_state(str(tmp_path / "ck"))
        assert os.path.exists(tmp_path / "ck.lio.npz")
        assert os.path.exists(tmp_path / "ck.tris.npz")
        rt.close()

        # cost log: reference schema `frame mesh_ms n_voxels lio_ms avg_ms`
        # (rows are flushed one frame late to avoid per-frame device syncs,
        # so the log is complete only after close())
        cost = np.loadtxt(tmp_path / "mesh_cost_time.log")
        assert cost.shape == (6, 5)
        assert (cost[:, 2] >= 0).all()

    def test_mesh_tracks_trajectory(self):
        """Meshed surface must lie near the simulated scene geometry: all
        triangle vertices on floor/walls/boxes ⇒ |z| of floor verts small."""
        cfg = PRESETS["sim"]()
        sim = LidarImuSimulator(n_rays=2048, seed=6)
        rt = ImMeshRuntime(cfg)
        rt.static_init(*sim.static_imu(50))
        rt.run(_bundles(sim, cfg, 5))
        verts, faces = rt.mesh.extract()
        assert len(faces) > 200
        # LIO world = gravity-aligned frame anchored at the initial sensor
        # pose (z0 = 1.5 m above the floor) → floor plane sits at z ≈ −1.5
        floor = verts[np.abs(verts[:, 2] + 1.5) < 0.3]
        assert len(floor) > 0.2 * len(verts)
        assert np.abs(floor[:, 2] + 1.5).mean() < 0.05


class TestOfflineMode:
    def test_pointcloud_to_mesh(self):
        rng = np.random.default_rng(0)
        t = rng.uniform(0, 3, (4000, 2)).astype(np.float32)
        pts = np.stack(
            [t[:, 0], t[:, 1],
             0.01 * rng.standard_normal(4000).astype(np.float32)], -1)
        cfg = PRESETS["sim"]()
        mesh = run_offline_pointcloud(pts, cfg, frame_size=2000)
        verts, faces = mesh.extract()
        v = verts[faces]
        area = 0.5 * np.linalg.norm(
            np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=1).sum()
        assert 6.0 < area < 10.5, area


class TestPlaneMapExport:
    """Plane-map visualization export — the analogue of the reference's
    `pubPlaneMap` MarkerArray publisher (src/voxel_mapping.cpp:947-1159)."""

    @pytest.mark.slow  # >12 s on the 2-core gate host
    def test_patches_lie_on_their_planes(self, tmp_path):
        import jax.numpy as jnp
        from immesh_tpu.config import VoxelMapConfig
        from immesh_tpu.map.voxel_map import VoxelMap
        from immesh_tpu.runtime.export import (
            extract_plane_patches, load_ply, save_plane_map_ply)

        rng = np.random.default_rng(5)
        vm = VoxelMap.create(VoxelMapConfig(voxel_size=1.0, capacity=2 ** 12))
        pts = rng.uniform(-8, 8, (20000, 3)).astype(np.float32)
        pts[:, 2] = (0.01 * rng.standard_normal(20000)).astype(np.float32)
        vm = vm.update(jnp.asarray(pts), jnp.full(len(pts), 1e-4),
                       jnp.ones(len(pts), bool), max_voxels=1024)

        verts, faces, colors = extract_plane_patches(vm, scale=2.0)
        n_planes = len(verts) // 4
        assert n_planes > 50                      # dense ground → many planes
        assert faces.shape == (2 * n_planes, 3)
        assert colors.shape == (len(verts), 3) and colors.dtype == np.uint8
        # ground scene: every patch vertex sits near z = 0 and the two
        # in-plane axes span xy (quad diagonal extents ≫ z extents)
        assert np.abs(verts[:, 2]).max() < 0.25
        quads = verts.reshape(n_planes, 4, 3)
        span_xy = np.ptp(quads[:, :, :2], axis=1).max(axis=-1)
        assert (span_xy > 0.2).mean() > 0.9

        path = str(tmp_path / "planes.ply")
        n = save_plane_map_ply(vm, path, scale=2.0)
        assert n == n_planes
        v2, f2, c2 = load_ply(path)
        np.testing.assert_allclose(v2, verts, atol=1e-6)
        np.testing.assert_array_equal(f2, faces)

    def test_empty_map_exports_empty(self, tmp_path):
        from immesh_tpu.config import VoxelMapConfig
        from immesh_tpu.map.voxel_map import VoxelMap
        from immesh_tpu.runtime.export import extract_plane_patches

        vm = VoxelMap.create(VoxelMapConfig(capacity=2 ** 10))
        verts, faces, colors = extract_plane_patches(vm)
        assert len(verts) == 0 and len(faces) == 0
