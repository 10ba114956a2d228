"""Tests for the open-addressing hash table and the hash-voxel plane map."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from immesh_tpu.config import VoxelMapConfig
from immesh_tpu.map.hash import EMPTY, HashTable, voxel_coords
from immesh_tpu.map.voxel_map import VoxelMap


def _coords(rng, n, lo=-50, hi=50):
    c = rng.integers(lo, hi, size=(n, 3)).astype(np.int32)
    lvl = np.zeros((n, 1), np.int32)
    return np.concatenate([c, lvl], axis=1)


class TestHashTable:
    def test_insert_then_lookup(self, rng):
        t = HashTable.create(1024)
        c = np.unique(_coords(rng, 300), axis=0)
        u = len(c)
        t, slots = t.insert(jnp.asarray(c), jnp.ones(u, bool))
        slots = np.asarray(slots)
        assert np.all(slots >= 0)
        assert len(np.unique(slots)) == u  # one slot per key
        found = np.asarray(t.lookup(jnp.asarray(c)))
        np.testing.assert_array_equal(found, slots)

    def test_lookup_missing(self, rng):
        t = HashTable.create(256)
        c = np.unique(_coords(rng, 50), axis=0)
        t, _ = t.insert(jnp.asarray(c), jnp.ones(len(c), bool))
        other = _coords(rng, 20, lo=1000, hi=2000)
        assert np.all(np.asarray(t.lookup(jnp.asarray(other))) == -1)

    def test_insert_existing_returns_same_slot(self, rng):
        t = HashTable.create(512)
        c = np.unique(_coords(rng, 100), axis=0)
        t, s1 = t.insert(jnp.asarray(c), jnp.ones(len(c), bool))
        t2, s2 = t.insert(jnp.asarray(c), jnp.ones(len(c), bool))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        # re-insert must not change the table
        np.testing.assert_array_equal(np.asarray(t2.keys), np.asarray(t.keys))

    def test_invalid_entries_skipped(self, rng):
        t = HashTable.create(256)
        c = np.unique(_coords(rng, 40), axis=0)
        valid = np.zeros(len(c), bool)
        valid[::2] = True
        t, slots = t.insert(jnp.asarray(c), jnp.asarray(valid))
        slots = np.asarray(slots)
        assert np.all(slots[~valid] == -1)
        assert np.all(slots[valid] >= 0)
        assert int(t.occupancy()) == int(valid.sum())

    def test_high_load_still_resolves(self, rng):
        # 45% load on a small table exercises probe chains
        t = HashTable.create(512, max_probe=64)
        c = np.unique(_coords(rng, 400, lo=-8, hi=8), axis=0)[:230]
        t, slots = t.insert(jnp.asarray(c), jnp.ones(len(c), bool))
        assert np.all(np.asarray(slots) >= 0)
        np.testing.assert_array_equal(
            np.asarray(t.lookup(jnp.asarray(c))), np.asarray(slots)
        )

    def test_level_distinguishes_keys(self):
        t = HashTable.create(256)
        c0 = np.array([[1, 2, 3, 0]], np.int32)
        c1 = np.array([[1, 2, 3, 1]], np.int32)
        t, s0 = t.insert(jnp.asarray(c0), jnp.ones(1, bool))
        t, s1 = t.insert(jnp.asarray(c1), jnp.ones(1, bool))
        assert int(s0[0]) != int(s1[0])

    def test_jit(self, rng):
        t = HashTable.create(256)
        c = jnp.asarray(np.unique(_coords(rng, 50), axis=0))
        insert = jax.jit(lambda tab, cc: tab.insert(cc, jnp.ones(cc.shape[0], bool)))
        t2, slots = insert(t, c)
        assert np.all(np.asarray(slots) >= 0)

    def test_voxel_coords_floor(self):
        pts = jnp.array([[0.9, -0.1, 2.5], [-3.7, 0.0, 0.49]])
        c = np.asarray(voxel_coords(pts, 1.0))
        np.testing.assert_array_equal(c[0], [0, -1, 2, 0])
        np.testing.assert_array_equal(c[1], [-4, 0, 0, 0])
        c1 = np.asarray(voxel_coords(pts, 1.0, level=1))
        np.testing.assert_array_equal(c1[0], [1, -1, 5, 1])


def _make_plane_scan(rng, n=4000, extent=10.0, z=0.0, noise=0.01):
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rng.uniform(-extent, extent, n)
    pts[:, 1] = rng.uniform(-extent, extent, n)
    pts[:, 2] = z + rng.normal(size=n) * noise
    return pts


class TestVoxelMap:
    def _cfg(self, **kw):
        d = dict(voxel_size=1.0, capacity=2 ** 12, min_plane_points=5,
                 planer_threshold=0.01)
        d.update(kw)
        return VoxelMapConfig(**d)

    @pytest.mark.slow
    def test_ground_plane_fits(self, rng):
        vm = VoxelMap.create(self._cfg())
        pts = _make_plane_scan(rng, n=20000)  # ~50 pts/voxel so fits are dense
        vm = vm.update(jnp.asarray(pts), jnp.full(len(pts), 1e-4),
                       jnp.ones(len(pts), bool), max_voxels=1024)
        assert int(vm.n_voxels()) > 100
        q = vm.query_planes(jnp.asarray(pts[:100]))
        found = np.asarray(q["found"])
        assert found.mean() > 0.9
        normals = np.asarray(q["normal"])[found]
        assert np.all(np.abs(normals[:, 2]) > 0.99)
        # plane distance ≈ 0 for on-plane points
        dist = np.abs(
            np.einsum("ni,ni->n", normals, pts[:100][found]) + np.asarray(q["d"])[found]
        )
        assert dist.max() < 0.05

    @pytest.mark.slow
    def test_moments_match_numpy(self, rng):
        cfg = self._cfg(max_layers=1)
        vm = VoxelMap.create(cfg)
        pts = rng.uniform(-5, 5, size=(2000, 3)).astype(np.float32)
        vm = vm.update(jnp.asarray(pts), jnp.full(2000, 1e-4),
                       jnp.ones(2000, bool), max_voxels=2048)
        # host reference: dict voxelization
        keys = np.floor(pts / cfg.voxel_size).astype(np.int32)
        from collections import defaultdict
        ref = defaultdict(list)
        for p, k in zip(pts, map(tuple, keys)):
            ref[k].append(p)
        # check counts/means for a sample of voxels
        kx = np.asarray(vm.table.keys)
        cnt = np.asarray(vm.count)
        sp = np.asarray(vm.sum_p)
        checked = 0
        for k, plist in list(ref.items())[:50]:
            q = np.array([[k[0], k[1], k[2], 0]], np.int32)
            slot = int(vm.table.lookup(jnp.asarray(q))[0])
            assert slot >= 0, k
            assert cnt[slot] == len(plist)
            # moments are accumulated relative to the voxel center
            # (core/geometry.plane_from_moments anchor doc)
            anchor = (np.asarray(k) + 0.5) * cfg.voxel_size
            np.testing.assert_allclose(
                sp[slot], np.sum(np.asarray(plist) - anchor, axis=0),
                rtol=1e-4, atol=1e-4)
            checked += 1
        assert checked == 50

    @pytest.mark.slow
    def test_incremental_updates_accumulate(self, rng):
        vm = VoxelMap.create(self._cfg())
        p1 = _make_plane_scan(rng, n=500, extent=3.0)
        p2 = _make_plane_scan(rng, n=500, extent=3.0)
        vm = vm.update(jnp.asarray(p1), jnp.full(500, 1e-4), jnp.ones(500, bool), 512)
        n1 = float(jnp.sum(vm.count))
        vm = vm.update(jnp.asarray(p2), jnp.full(500, 1e-4), jnp.ones(500, bool), 512)
        n2 = float(jnp.sum(vm.count))
        assert n1 == 500 and n2 == 1000

    @pytest.mark.slow
    def test_freeze_at_max_points(self, rng):
        vm = VoxelMap.create(self._cfg(max_points_per_voxel=50, max_layers=1))
        # all points in one voxel
        pts = (rng.uniform(0.1, 0.9, size=(200, 3))).astype(np.float32)
        vm = vm.update(jnp.asarray(pts[:40]), jnp.full(40, 1e-4), jnp.ones(40, bool), 64)
        vm = vm.update(jnp.asarray(pts[40:80]), jnp.full(40, 1e-4), jnp.ones(40, bool), 64)
        # third update hits the freeze (count 80 ≥ 50 → no add)
        vm = vm.update(jnp.asarray(pts[80:]), jnp.full(120, 1e-4), jnp.ones(120, bool), 64)
        assert float(jnp.max(vm.count)) == 80

    @pytest.mark.slow  # ~8-10 s; default gate keeps a faster sibling
    def test_subdivision_on_nonplanar(self, rng):
        vm = VoxelMap.create(self._cfg(planer_threshold=0.001))
        # full 3-D noise in one voxel → not planar → children created
        pts = rng.uniform(0.05, 0.95, size=(300, 3)).astype(np.float32)
        vm = vm.update(jnp.asarray(pts), jnp.full(300, 1e-4), jnp.ones(300, bool), 64)
        sub = np.asarray(vm.subdivided)
        assert sub.sum() >= 1
        # children exist at level 1
        keys = np.asarray(vm.table.keys)
        assert np.any(keys[:, 3] == 1)

    @pytest.mark.slow
    def test_masked_points_ignored(self, rng):
        vm = VoxelMap.create(self._cfg())
        pts = _make_plane_scan(rng, n=200, extent=2.0)
        mask = np.zeros(200, bool)
        vm = vm.update(jnp.asarray(pts), jnp.full(200, 1e-4), jnp.asarray(mask), 256)
        assert int(vm.n_voxels()) == 0
        assert float(jnp.sum(vm.count)) == 0

    def test_update_jits_and_caches(self, rng):
        vm = VoxelMap.create(self._cfg())
        step = jax.jit(lambda v, p, s, m: v.update(p, s, m, max_voxels=512))
        for i in range(3):
            pts = _make_plane_scan(rng, n=300, extent=3.0)
            vm = step(vm, jnp.asarray(pts), jnp.full(300, 1e-4), jnp.ones(300, bool))
        assert int(vm.n_voxels()) > 10

