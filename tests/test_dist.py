"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4): the
data-parallel LIO step and voxel-parallel mesh step must track the
single-device pipeline."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from immesh_tpu.config import PRESETS
from immesh_tpu.dist.lio import make_dp_lio_step
from immesh_tpu.dist.mesh import make_mp_mesh_step
from immesh_tpu.frontend.sim import LidarImuSimulator
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.lio.pipeline import LioPipeline
from immesh_tpu.lio import imu as imu_mod
from immesh_tpu.core.state import EsikfState
from immesh_tpu.map.voxel_map import VoxelMap
from immesh_tpu.mesh.global_map import GlobalPointMap
from immesh_tpu.mesh.triangles import TriangleStore


N_DEV = 8


@pytest.fixture(scope="module")
def mesh8():
    devs = np.array(jax.devices()[:N_DEV])
    return Mesh(devs, ("dp",))


def _bundle(sim, cfg, k):
    f = sim.frame(k)
    return ScanBundle.from_numpy(
        f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
        f.scan_duration, cfg.preprocess.max_points, cfg.imu.max_imu_per_scan)


class TestDpLio:
    @pytest.mark.slow
    def test_tracks_single_device(self, mesh8):
        cfg = PRESETS["sim"]()
        sim = LidarImuSimulator(n_rays=2048, seed=7)

        # single-device reference
        ref = LioPipeline(cfg)
        ref.static_init(*sim.static_imu(100))

        # 8-way dp
        step, shard_bundle = make_dp_lio_step(mesh8, cfg)
        state = EsikfState.identity()
        state = imu_mod.static_init(
            *map(jnp.asarray, sim.static_imu(100)), cfg.imu, state)
        vm = VoxelMap.create(cfg.voxel_map)

        for k in range(5):
            b = _bundle(sim, cfg, k)
            ref.step(b)
            state, vm, world, diag = step(state, vm, shard_bundle(b))

        p_ref = np.asarray(ref.state.pos)
        p_dp = np.asarray(state.pos)
        # different downsample partitioning ⇒ not bitwise equal, but both must
        # track the same trajectory closely
        assert np.linalg.norm(p_dp - p_ref) < 0.05, (p_dp, p_ref)
        assert int(diag["n_effective"]) > 500
        # sharded world scan reassembles to full scan size
        assert world.shape[0] == cfg.preprocess.max_points

    @pytest.mark.slow
    def test_replicas_consistent(self, mesh8):
        """The replicated map must be identical on every device."""
        cfg = PRESETS["sim"]()
        sim = LidarImuSimulator(n_rays=2048, seed=8)
        step, shard_bundle = make_dp_lio_step(mesh8, cfg)
        state = EsikfState.identity()
        state = imu_mod.static_init(
            *map(jnp.asarray, sim.static_imu(100)), cfg.imu, state)
        vm = VoxelMap.create(cfg.voxel_map)
        for k in range(2):
            state, vm, world, _ = step(state, vm, shard_bundle(_bundle(sim, cfg, k)))
        # a replicated output can be fetched consistently (any shard copy)
        n = int(vm.n_voxels())
        assert n > 100


class TestMpMesh:
    @pytest.mark.slow  # >12 s; sharded/pre-partition parity cover the path
    def test_matches_single_device_triangles(self, mesh8):
        cfg = PRESETS["sim"]()
        rng = np.random.default_rng(0)
        g = np.arange(-1.5, 1.5, 0.12, dtype=np.float32)
        X, Y = np.meshgrid(g, g)
        jit2 = 0.01 * rng.standard_normal((X.size, 2)).astype(np.float32)
        pts = np.stack([
            X.ravel() + jit2[:, 0], Y.ravel() + jit2[:, 1],
            0.005 * rng.standard_normal(X.size).astype(np.float32)], -1)
        n = len(pts)
        pad = (-n) % N_DEV
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        sensor = jnp.asarray([0.0, 0.0, 2.0], jnp.float32)

        # single-device reference
        from immesh_tpu.mesh.pipeline import MeshPipeline
        ref = MeshPipeline(cfg)
        ref.step(pts, mask, np.asarray(sensor))

        gm = GlobalPointMap.create(cfg.mesh)
        store = TriangleStore.create(cfg.mesh)
        step = make_mp_mesh_step(mesh8, cfg)
        gm, store, n_active = step(
            gm, store, jnp.asarray(pts), jnp.asarray(mask), sensor)

        t_ref = int(ref.store.n_triangles())
        t_mp = int(store.n_triangles())
        assert t_mp == t_ref, (t_mp, t_ref)
        # identical triangle sets (deterministic owner-computes)
        def tri_set(s):
            t = np.asarray(s.tri_ids).reshape(-1, 3)
            t = t[np.all(t >= 0, axis=1)]
            return {tuple(sorted(r)) for r in t}
        assert tri_set(store) == tri_set(ref.store)


class TestShardedMesh:
    """Capacity-sharded meshing (dist/mesh.py ShardedMeshMap): per-chip
    stores, owner-computes triangulation, bitwise-consistent boundaries."""

    def _cloud(self, seed, shift=0.0):
        rng = np.random.default_rng(seed)
        g = np.arange(-1.5, 1.5, 0.12, dtype=np.float32)
        X, Y = np.meshgrid(g, g)
        jit2 = 0.01 * rng.standard_normal((X.size, 2)).astype(np.float32)
        pts = np.stack([
            X.ravel() + jit2[:, 0] + shift, Y.ravel() + jit2[:, 1],
            0.005 * rng.standard_normal(X.size).astype(np.float32)], -1)
        n = len(pts)
        pad = (-n) % N_DEV
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        return pts, mask

    @staticmethod
    def _tri_pos_set(pts, tris, decimals=4):
        """Triangle set keyed by sorted rounded vertex positions (ids are
        store-local, so position triples are the shard-invariant identity)."""
        v = np.round(pts[tris], decimals)  # (T, 3, 3)
        out = set()
        for t in v:
            out.add(tuple(sorted(map(tuple, t.tolist()))))
        return out

    def test_matches_single_device_triangles(self, mesh8):
        from immesh_tpu.dist.mesh import (
            create_sharded_mesh, gather_mesh, make_sharded_mesh_step)
        from immesh_tpu.mesh.pipeline import MeshPipeline

        cfg = PRESETS["sim"]()
        sensor = jnp.asarray([0.0, 0.0, 2.0], jnp.float32)

        ref = MeshPipeline(cfg)
        # slab_voxels=1 with 8 shards: every 0.4 m column has a different
        # owner — maximum boundary stress for the halo consistency argument
        smm = create_sharded_mesh(mesh8, cfg, slab_voxels=1)
        step = make_sharded_mesh_step(mesh8, cfg)

        for k, shift in enumerate([0.0, 0.25]):  # frame 2 = incremental remesh
            pts, mask = self._cloud(k, shift)
            ref.step(pts, mask, np.asarray(sensor))
            smm, n_active, n_tris, _ = step(
                smm, jnp.asarray(pts), jnp.asarray(mask), sensor)

        t_ref = int(ref.store.n_triangles())
        t_sh = int(n_tris)
        assert t_sh == t_ref, (t_sh, t_ref)

        g = gather_mesh(smm)
        ref_tris = np.asarray(ref.store.tri_ids).reshape(-1, 3)
        ref_tris = ref_tris[np.all(ref_tris >= 0, axis=1)]
        s_ref = self._tri_pos_set(np.asarray(ref.gm.pts), ref_tris)
        s_sh = self._tri_pos_set(g["pts"], g["tris"])
        assert s_sh == s_ref, (
            len(s_sh - s_ref), len(s_ref - s_sh))

    def test_capacity_scales_with_shards(self, mesh8):
        """Each shard stores only its slab (+halo): per-shard occupancy must
        be well below the single-device count, while the owned-column union
        covers every point."""
        from immesh_tpu.dist.mesh import (
            create_sharded_mesh, make_sharded_mesh_step)
        from immesh_tpu.mesh.pipeline import MeshPipeline

        cfg = PRESETS["sim"]()
        sensor = jnp.asarray([0.0, 0.0, 2.0], jnp.float32)
        pts, mask = self._cloud(3)

        ref = MeshPipeline(cfg)
        ref.step(pts, mask, np.asarray(sensor))
        n_single = int(ref.gm.pt_count)

        smm = create_sharded_mesh(mesh8, cfg, slab_voxels=1)
        step = make_sharded_mesh_step(mesh8, cfg)
        smm, _, _, _ = step(smm, jnp.asarray(pts), jnp.asarray(mask), sensor)

        per_shard = np.asarray(smm.gm.pt_count)
        assert per_shard.max() < 0.8 * n_single, (per_shard, n_single)
        # halo duplication is bounded: ~(owned + 4 halo columns) per shard
        assert per_shard.sum() < 6 * n_single


class TestPrePartitionedAppend:
    """The dedup pre-partition (dist/mesh.py:_sharded_mesh_body): when the
    expected keep fraction × margin < 1, the gathered scan is compacted to
    owned+halo rows BEFORE the in-frame dedup sort and the per-frame budgets
    scale with it — triangle content must still match the single-device
    pipeline exactly, and overflow must be counted, not silent."""

    def _strip(self, seed=0, x_len=25.6, n_y=10):
        """A long thin strip spanning all 8 shards' slabs (slab_voxels=8 ×
        0.4 m × 8 shards = 25.6 m in x) so ownership is spread uniformly."""
        rng = np.random.default_rng(seed)
        gx = np.arange(0.06, x_len, 0.12, dtype=np.float32)
        gy = np.arange(0.06, n_y * 0.12, 0.12, dtype=np.float32)
        X, Y = np.meshgrid(gx, gy)
        jit2 = 0.01 * rng.standard_normal((X.size, 2)).astype(np.float32)
        pts = np.stack([
            X.ravel() + jit2[:, 0], Y.ravel() + jit2[:, 1],
            0.005 * rng.standard_normal(X.size).astype(np.float32)], -1)
        n = len(pts)
        pad = (-n) % N_DEV
        pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        mask = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
        return pts, mask

    def test_compact_path_matches_single_device(self, mesh8):
        from immesh_tpu.dist.mesh import (
            create_sharded_mesh, gather_mesh, make_sharded_mesh_step,
            shard_keep_fraction)
        from immesh_tpu.mesh.pipeline import MeshPipeline

        # keep fraction (8+4)/(8·8) = 0.1875; ×1.5 margin < 1 ⇒ the
        # compacted-append branch (M < N) is the one under test
        assert shard_keep_fraction(8, N_DEV) * 1.5 < 1.0

        cfg = PRESETS["sim"]()
        sensor = jnp.asarray([12.0, 0.5, 2.0], jnp.float32)
        ref = MeshPipeline(cfg)
        smm = create_sharded_mesh(mesh8, cfg, slab_voxels=8)
        step = make_sharded_mesh_step(mesh8, cfg)

        for k in range(2):  # frame 2 = incremental remesh across slabs
            pts, mask = self._strip(k)
            ref.step(pts, mask, np.asarray(sensor))
            smm, n_active, n_tris, n_drop = step(
                smm, jnp.asarray(pts), jnp.asarray(mask), sensor)

        assert int(n_drop) == 0, "uniform strip must not overflow the buffer"
        assert int(n_tris) == int(ref.store.n_triangles())
        g = gather_mesh(smm)
        ref_tris = np.asarray(ref.store.tri_ids).reshape(-1, 3)
        ref_tris = ref_tris[np.all(ref_tris >= 0, axis=1)]
        s_ref = TestShardedMesh._tri_pos_set(np.asarray(ref.gm.pts), ref_tris)
        s_sh = TestShardedMesh._tri_pos_set(g["pts"], g["tris"])
        assert s_sh == s_ref, (len(s_sh - s_ref), len(s_ref - s_sh))

        # the pre-partition must actually shrink per-chip storage: every
        # shard holds ≈ its owned+halo share, not the full map
        per_shard = np.asarray(smm.gm.pt_count)
        assert per_shard.max() < 0.5 * int(ref.gm.pt_count)

    def test_overflow_is_counted(self, mesh8):
        """A frame concentrated inside ONE chip's slab exceeds the margin-
        sized buffer; the excess rows must surface in n_part_drops."""
        from immesh_tpu.dist.mesh import (
            create_sharded_mesh, make_sharded_mesh_step)

        cfg = PRESETS["sim"]()
        sensor = jnp.asarray([1.6, 0.5, 2.0], jnp.float32)
        smm = create_sharded_mesh(mesh8, cfg, slab_voxels=8)
        step = make_sharded_mesh_step(mesh8, cfg)
        # 4096 points all inside slab 0 (+ its halo): chip 0 keeps ~all of
        # them, far beyond its margin-sized buffer M ≈ 0.28·N
        rng = np.random.default_rng(0)
        pts = np.stack([
            rng.uniform(0.0, 3.1, 4096), rng.uniform(0.0, 2.0, 4096),
            rng.normal(0, 0.005, 4096)], -1).astype(np.float32)
        mask = np.ones(4096, bool)
        smm, _, _, n_drop = step(
            smm, jnp.asarray(pts), jnp.asarray(mask), sensor)
        assert int(n_drop) > 0
