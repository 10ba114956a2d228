"""Spatially-sharded voxel map (dist/sharded_map.py): slab ownership,
ppermute halo exchange, and the sharded-map LIO step — the map-capacity
scaling upgrade over dist/lio.py's replicated map."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from immesh_tpu.config import PRESETS
from immesh_tpu.core.state import EsikfState
from immesh_tpu.dist.sharded_map import (
    ShardedVoxelMap, create_sharded_map, make_sharded_lio_step,
    owner_of_coords,
)
from immesh_tpu.frontend.sim import LidarImuSimulator
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.lio import imu as imu_mod
from immesh_tpu.lio.pipeline import LioPipeline
from immesh_tpu.map.hash import EMPTY, voxel_coords
from immesh_tpu.map.voxel_map import VoxelMap

N_DEV = 8


@pytest.fixture(scope="module")
def mesh8():
    return Mesh(np.array(jax.devices()[:N_DEV]), ("dp",))


def _bundle(sim, cfg, k):
    f = sim.frame(k)
    return ScanBundle.from_numpy(
        f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
        f.scan_duration, cfg.preprocess.max_points, cfg.imu.max_imu_per_scan)


class TestOwnership:
    def test_owner_consistent_across_levels(self, rng):
        """A voxel and its octant children share an owner (level-aware
        floor-div column)."""
        pts = jnp.asarray(rng.uniform(-50, 50, size=(512, 3)), jnp.float32)
        c0 = voxel_coords(pts, 0.8, 0)
        c1 = voxel_coords(pts, 0.8, 1)
        o0 = owner_of_coords(c0, 4, N_DEV)
        o1 = owner_of_coords(c1, 4, N_DEV)
        np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))

    @pytest.mark.slow
    def test_partition_disjoint_and_complete(self, rng):
        """Owned voxel keys across shards = exactly the single-device keys."""
        cfg = PRESETS["sim"]()
        pts = rng.uniform(-20, 20, size=(4096, 3)).astype(np.float32)
        sig = np.full(4096, 1e-4, np.float32)
        mask = np.ones(4096, bool)

        vm_ref = VoxelMap.create(cfg.voxel_map).update(
            jnp.asarray(pts), jnp.asarray(sig), jnp.asarray(mask))
        ref_keys = np.asarray(vm_ref.table.keys)
        ref_set = {tuple(k) for k in ref_keys[ref_keys[:, 0] != EMPTY]}

        shard_sets = []
        for i in range(N_DEV):
            svm = ShardedVoxelMap.create(cfg.voxel_map, i, N_DEV,
                                         slab_voxels=4)
            svm = svm.update_owned(
                jnp.asarray(pts), jnp.asarray(sig), jnp.asarray(mask))
            keys = np.asarray(svm.vm.table.keys)
            halo = np.asarray(svm.is_halo)
            occ = (keys[:, 0] != EMPTY) & ~halo
            shard_sets.append({tuple(k) for k in keys[occ]})

        union = set().union(*shard_sets)
        assert union == ref_set
        for a in range(N_DEV):
            for b in range(a + 1, N_DEV):
                assert not (shard_sets[a] & shard_sets[b])

    @pytest.mark.slow  # ~8 s; default gate keeps a faster sibling
    def test_owned_planes_match_single_device(self, rng):
        cfg = PRESETS["sim"]()
        pts = rng.uniform(-15, 15, size=(4096, 3)).astype(np.float32)
        pts[:, 2] = 0.02 * rng.standard_normal(4096)   # near-planar scene
        sig = np.full(4096, 1e-4, np.float32)
        mask = np.ones(4096, bool)
        vm_ref = VoxelMap.create(cfg.voxel_map).update(
            jnp.asarray(pts), jnp.asarray(sig), jnp.asarray(mask))

        svm = ShardedVoxelMap.create(cfg.voxel_map, 3, N_DEV, slab_voxels=4)
        svm = svm.update_owned(
            jnp.asarray(pts), jnp.asarray(sig), jnp.asarray(mask))
        keys = np.asarray(svm.vm.table.keys)
        occ = (keys[:, 0] != EMPTY) & ~np.asarray(svm.is_halo)
        ref_lookup = vm_ref.table.lookup(jnp.asarray(keys[occ]))
        assert np.all(np.asarray(ref_lookup) >= 0)
        np.testing.assert_allclose(
            np.asarray(svm.vm.normal)[occ],
            np.asarray(vm_ref.normal)[np.asarray(ref_lookup)], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(svm.vm.d)[occ],
            np.asarray(vm_ref.d)[np.asarray(ref_lookup)], atol=1e-4)


class TestShardedLio:
    @pytest.mark.slow
    def test_tracks_single_device(self, mesh8):
        cfg = PRESETS["sim"]()
        sim = LidarImuSimulator(n_rays=2048, seed=7)

        ref = LioPipeline(cfg)
        ref.static_init(*sim.static_imu(100))

        step = make_sharded_lio_step(mesh8, cfg)
        state = EsikfState.identity()
        state = imu_mod.static_init(
            *map(jnp.asarray, sim.static_imu(100)), cfg.imu, state)
        svm = create_sharded_map(mesh8, cfg, slab_voxels=4)

        for k in range(5):
            b = _bundle(sim, cfg, k)
            ref.step(b)
            state, svm, world, diag = step(state, svm, b)

        p_ref = np.asarray(ref.state.pos)
        p_sh = np.asarray(state.pos)
        assert np.linalg.norm(p_sh - p_ref) < 0.05, (p_sh, p_ref)
        assert int(diag["n_effective"]) > 500
        assert world.shape[0] == cfg.preprocess.max_points

        # the map really is partitioned: every shard holds a strict subset,
        # and halos exist on shards whose neighbors own boundary planes
        owned = np.asarray(jax.vmap(ShardedVoxelMap.n_owned_voxels)(svm))
        total_ref = int(ref.vm.n_voxels())
        assert owned.sum() >= 0.8 * total_ref   # same scene ⇒ similar count
        assert owned.max() < total_ref          # no shard holds everything
        assert np.asarray(svm.is_halo).sum() > 0

    @pytest.mark.slow
    def test_map_capacity_scales(self, mesh8):
        """The raison d'être: per-shard occupancy ≈ total/n, so an n-chip
        mesh holds ~n× the voxels of one chip's table."""
        cfg = PRESETS["sim"]()
        sim = LidarImuSimulator(n_rays=2048, seed=9)
        step = make_sharded_lio_step(mesh8, cfg)
        state = EsikfState.identity()
        state = imu_mod.static_init(
            *map(jnp.asarray, sim.static_imu(100)), cfg.imu, state)
        svm = create_sharded_map(mesh8, cfg, slab_voxels=2)
        for k in range(3):
            state, svm, _, _ = step(state, svm, _bundle(sim, cfg, k))
        owned = np.asarray(jax.vmap(ShardedVoxelMap.n_owned_voxels)(svm))
        assert owned.sum() > 100
        # balanced striping: no shard owns more than half the total
        assert owned.max() <= 0.5 * owned.sum()
