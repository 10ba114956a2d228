"""Multi-host scaffolding (dist/multihost.py) on the virtual 8-device CPU
mesh: single-process no-op init, mesh builders, host-local feeding, and the
scaling harness (SURVEY.md §5 distributed backend; BASELINE.md 1→N target)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from immesh_tpu.config import PRESETS
from immesh_tpu.dist import multihost


class TestInit:
    def test_single_process_noop(self, monkeypatch):
        monkeypatch.delenv(multihost.ENV_COORDINATOR, raising=False)
        assert multihost.initialize() is False

    def test_env_single_process_noop(self, monkeypatch):
        monkeypatch.setenv(multihost.ENV_NUM_PROCESSES, "1")
        assert multihost.initialize() is False


class TestMeshBuilders:
    def test_build_mesh_all_devices(self):
        m = multihost.build_mesh()
        assert m.shape["dp"] == len(jax.devices())

    def test_build_mesh_subset(self):
        m = multihost.build_mesh(devices=jax.devices()[:4])
        assert m.shape["dp"] == 4

    def test_build_host_mesh_single_host(self):
        m = multihost.build_host_mesh()
        assert m.shape["host"] == 1
        assert m.shape["dp"] == len(jax.devices())

    def test_host_local_sharder_roundtrip(self):
        m = multihost.build_mesh(devices=jax.devices()[:8])
        put = multihost.host_local_sharder(m)
        x = np.arange(32, dtype=np.float32).reshape(16, 2)
        g = put(x)  # single process: local block == global array
        assert g.shape == (16, 2)
        np.testing.assert_array_equal(np.asarray(g), x)
        # actually laid out over the axis
        assert len(g.sharding.device_set) == 8


class TestScalingCurve:
    @pytest.mark.slow
    def test_curve_runs_and_reports(self, tmp_path):
        cfg = PRESETS["sim"]()
        cfg = cfg.replace(
            preprocess=cfg.preprocess.__class__(
                lidar_type=cfg.preprocess.lidar_type, max_points=1024),
            voxel_map=cfg.voxel_map.__class__(
                voxel_size=0.8, capacity=2 ** 12, max_probe=16),
            lio=cfg.lio.__class__(max_iterations=2, map_update_points=512),
            mesh=cfg.mesh.__class__(
                points_capacity=2 ** 14, voxel_capacity=2 ** 10,
                active_voxels_per_frame=64, mesh_chunk=8),
        )
        out = tmp_path / "scaling.json"
        res = multihost.scaling_curve(cfg, [1, 2], frames=2, warmup=1,
                                      out_path=str(out))
        assert [r["n_devices"] for r in res] == [1, 2]
        assert all(r["frames_per_s"] > 0 for r in res)
        assert res[0]["speedup"] == 1.0
        data = json.loads(out.read_text())
        assert data == res
