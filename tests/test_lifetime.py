"""Map lifetime management tests: occupancy-triggered compaction of the LIO
voxel map and the mesh global map (+ triangle-store remap), the fixed-capacity
equivalent of the reference's sliding local-map cube and recent-voxel expiry
(reference voxel_mapping_common.cpp:214-288, pointcloud_rgbd.cpp:425-455).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from immesh_tpu.config import (ImMeshConfig, LioConfig, MeshConfig,
                               PreprocessConfig, VoxelMapConfig)
from immesh_tpu.lio.pipeline import LioPipeline
from immesh_tpu.map.voxel_map import VoxelMap
from immesh_tpu.mesh.pipeline import MeshPipeline


def _plane_patch(rng, cx, cy, n=512, extent=2.0):
    """Noisy ground-plane patch centered at (cx, cy, 0)."""
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rng.uniform(cx - extent, cx + extent, n)
    pts[:, 1] = rng.uniform(cy - extent, cy + extent, n)
    pts[:, 2] = rng.normal(0, 0.01, n)
    return pts


class TestVoxelMapCompact:
    @pytest.mark.slow  # >12 s on the 2-core gate host
    def test_keeps_near_drops_far(self, rng):
        cfg = VoxelMapConfig(voxel_size=1.0, capacity=2 ** 12)
        vm = VoxelMap.create(cfg)
        near = _plane_patch(rng, 0, 0)
        far = _plane_patch(rng, 100, 0)
        for p in (near, far):
            vm = vm.update(jnp.asarray(p), jnp.full(len(p), 1e-4),
                           jnp.ones(len(p), bool))
        n_before = int(vm.n_voxels())
        q_before = vm.query_planes(jnp.asarray(near[:16]))

        vm2 = vm.compact(jnp.zeros(3), jnp.asarray(20.0))
        assert int(vm2.n_voxels()) < n_before
        # near planes intact: same slots' plane params after rehash
        q_after = vm2.query_planes(jnp.asarray(near[:16]))
        np.testing.assert_array_equal(np.asarray(q_before["found"]),
                                      np.asarray(q_after["found"]))
        np.testing.assert_allclose(np.asarray(q_before["normal"]),
                                   np.asarray(q_after["normal"]), atol=1e-6)
        # far voxels gone
        q_far = vm2.query_planes(jnp.asarray(far[:16]))
        assert not bool(np.any(np.asarray(q_far["found"])))

    @pytest.mark.slow  # ~8-10 s; default gate keeps a faster sibling
    def test_regrows_after_compaction(self, rng):
        cfg = VoxelMapConfig(voxel_size=1.0, capacity=2 ** 10, max_probe=32)
        vm = VoxelMap.create(cfg)
        far = _plane_patch(rng, 50, 50, extent=8.0)
        vm = vm.update(jnp.asarray(far), jnp.full(len(far), 1e-4),
                       jnp.ones(len(far), bool))
        vm = vm.compact(jnp.zeros(3), jnp.asarray(10.0))
        assert int(vm.n_voxels()) == 0
        near = _plane_patch(rng, 0, 0)
        vm = vm.update(jnp.asarray(near), jnp.full(len(near), 1e-4),
                       jnp.ones(len(near), bool))
        q = vm.query_planes(jnp.asarray(near[:16]))
        assert bool(np.all(np.asarray(q["found"])))


class TestLioOccupancyPlateau:
    @pytest.mark.slow
    def test_long_run_occupancy_bounded(self, rng):
        """Simulated long traverse: scans advance 2 m/frame along +x for 120
        frames with a map that holds only ~40 frames' worth — occupancy must
        plateau under the high-water mark instead of silently dropping new
        voxels (VERDICT.md item 2 'done' criterion, shrunk to test scale)."""
        cfg = ImMeshConfig(
            preprocess=PreprocessConfig(max_points=512),
            voxel_map=VoxelMapConfig(
                voxel_size=1.0, capacity=2 ** 10, local_map_radius=40.0,
                compact_high_water=0.5, compact_check_every=8),
            lio=LioConfig(map_update_points=512),
        )
        pipe = LioPipeline(cfg)
        high = cfg.voxel_map.compact_high_water * cfg.voxel_map.capacity
        occ_trace = []
        for k in range(120):
            pts = _plane_patch(rng, 2.0 * k, 0, n=512, extent=4.0)
            pipe.vm = pipe.vm.update(
                jnp.asarray(pts), jnp.full(len(pts), 1e-4),
                jnp.ones(len(pts), bool))
            pipe.state = pipe.state.replace(
                pos=jnp.asarray([2.0 * k, 0.0, 0.0], jnp.float32))
            pipe.frame_idx += 1
            pipe.maybe_compact()
            occ_trace.append(int(pipe.vm.n_voxels()))
        # plateau under the one-frame-delayed async poll
        # (lio/pipeline.maybe_compact): detection lags ≤2 frames, so the
        # trace may overshoot the mark by a couple frames' voxel inflow
        inflow = max(np.diff(occ_trace[:8]).max(), 1)
        slack = 3 * inflow
        assert max(occ_trace) <= high + slack, (max(occ_trace), high, slack)
        # growth stays bounded well below capacity
        assert max(occ_trace) < 0.75 * cfg.voxel_map.capacity
        # and the CURRENT neighborhood is still mapped (no silent loss)
        probe = _plane_patch(rng, 2.0 * 119, 0, n=16, extent=2.0)
        q = pipe.vm.query_planes(jnp.asarray(probe))
        assert bool(np.any(np.asarray(q["found"])))


class TestMeshCompact:
    def _mesh_cfg(self):
        return ImMeshConfig(mesh=MeshConfig(
            points_capacity=2 ** 13, voxel_capacity=2 ** 10,
            pts_minimum_scale=0.1, voxel_resolution=0.5,
            local_map_radius=20.0, compact_high_water=0.5,
            compact_check_every=4, active_voxels_per_frame=256))

    def test_compact_remaps_triangles(self, rng):
        cfg = self._mesh_cfg()
        mp = MeshPipeline(cfg)
        near = _plane_patch(rng, 0, 0, n=1024, extent=3.0)
        far = _plane_patch(rng, 100, 0, n=1024, extent=3.0)
        mp.step(near, np.ones(len(near), bool), np.zeros(3))
        mp.step(far, np.ones(len(far), bool), np.array([100.0, 0, 0]))
        v_before, f_before = mp.extract()
        near_tris_before = {
            tuple(np.round(v_before[f].mean(0), 3)) for f in f_before
            if np.abs(v_before[f].mean(0)[0]) < 10}
        assert len(near_tris_before) > 10

        from immesh_tpu.mesh.pipeline import _compact_mesh_jit
        mp.gm, mp.store = _compact_mesh_jit(
            mp.gm, mp.store, jnp.zeros(3), jnp.asarray(20.0, jnp.float32))
        v_after, f_after = mp.extract()
        assert len(f_after) > 0
        # all remapped ids in range and all surviving triangles are near ones
        assert f_after.min() >= 0 and f_after.max() < len(v_after)
        cents = v_after[f_after].mean(axis=1)
        assert np.all(np.abs(cents[:, 0]) < 25)
        near_tris_after = {tuple(np.round(c, 3)) for c in cents}
        # the near mesh survives compaction geometrically intact
        missing = near_tris_before - near_tris_after
        assert len(missing) <= 0.05 * len(near_tris_before), len(missing)

    @pytest.mark.slow
    def test_long_run_plateau_and_valid_mesh(self, rng):
        import os
        import subprocess
        import sys
        if os.environ.get("IMMESH_LONGRUN_INPROC") != "1":
            # XLA:CPU's LLVM JIT deterministically segfaults/aborts while
            # COMPILING this test's mesh program after the preceding slow
            # tests' ~8 compiles (jax compiler.py backend_compile_and_load;
            # the identical program compiles and the test passes in a fresh
            # process) — an upstream compiler-state bug, so the body runs in
            # a subprocess to get a clean XLA client.
            env = dict(os.environ, IMMESH_LONGRUN_INPROC="1")
            r = subprocess.run(
                [sys.executable, "-m", "pytest",
                 os.path.abspath(__file__)
                 + "::TestMeshCompact::test_long_run_plateau_and_valid_mesh",
                 "-q", "-m", "slow", "-p", "no:cacheprovider"],
                env=env, capture_output=True, text=True, timeout=600)
            assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-1000:])
            return
        cfg = self._mesh_cfg()
        mp = MeshPipeline(cfg)
        high_p = cfg.mesh.compact_high_water * cfg.mesh.points_capacity
        for k in range(60):
            pts = _plane_patch(rng, 1.5 * k, 0, n=768, extent=3.0)
            mp.step(pts, np.ones(len(pts), bool),
                    np.array([1.5 * k, 0.0, 1.0]))
        # post-trigger occupancy bounded
        assert int(mp.gm.n_points()) <= high_p * 1.5
        v, f = mp.extract()
        assert len(f) > 0
        assert f.min() >= 0 and f.max() < len(v)
        # mesh near the rover's current position exists (map still grows)
        cents = v[f].mean(axis=1)
        assert np.any(np.abs(cents[:, 0] - 1.5 * 59) < 5)
