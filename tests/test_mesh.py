"""Mesh layer tests: Delaunay kernel vs scipy oracle, global point map
dedup/pull semantics, owner-computes triangle uniqueness, coverage, export
round-trips (SURVEY.md §4 test pyramid — unit kernels + golden fixtures)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from immesh_tpu.config import PRESETS
from immesh_tpu.mesh.delaunay import delaunay_mask, pca_project
from immesh_tpu.mesh.global_map import GlobalPointMap
from immesh_tpu.mesh.pipeline import MeshPipeline
from immesh_tpu.runtime.export import (
    load_checkpoint, load_ply, save_checkpoint, save_ply, smooth_vertices,
)


def _sorted_set(tris):
    return {tuple(sorted(t)) for t in np.asarray(tris)}


def _incircle_margin(uv, tri, n):
    """f64 oracle: max signed incircle value of any non-vertex point
    (positive ⇒ some point is inside the circumcircle ⇒ not Delaunay)."""
    a, b, c = (uv[i].astype(np.float64) for i in tri)
    area = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
    worst = -np.inf
    for d in range(n):
        if d in tri:
            continue
        q = uv[d].astype(np.float64)
        m = np.array([
            [a[0] - q[0], a[1] - q[1], (a[0] - q[0]) ** 2 + (a[1] - q[1]) ** 2],
            [b[0] - q[0], b[1] - q[1], (b[0] - q[0]) ** 2 + (b[1] - q[1]) ** 2],
            [c[0] - q[0], c[1] - q[1], (c[0] - q[0]) ** 2 + (c[1] - q[1]) ** 2],
        ])
        worst = max(worst, np.linalg.det(m) * np.sign(area))
    return worst


class TestDelaunayKernel:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("n", [8, 20, 40])
    def test_matches_scipy(self, seed, n):
        """Against the scipy (qhull) oracle on general-position points.

        f32 cannot resolve near-cocircular quads (f64 margins ≲1e-6); the
        kernel keeps both diagonals by design there, so disagreements are
        allowed ONLY when the f64 oracle confirms the margin is tie-level."""
        from scipy.spatial import Delaunay as SciDelaunay

        rng = np.random.default_rng(seed)
        k = 48
        uv = np.zeros((1, k, 2), np.float32)
        uv[0, :n] = rng.uniform(-0.5, 0.5, (n, 2))
        mask = np.zeros((1, k), bool)
        mask[0, :n] = True

        tris, keep = delaunay_mask(jnp.asarray(uv), jnp.asarray(mask))
        ours = _sorted_set(np.asarray(tris)[np.asarray(keep[0])])
        ref = _sorted_set(SciDelaunay(uv[0, :n].astype(np.float64)).simplices)
        for t in ours ^ ref:
            margin = abs(_incircle_margin(uv[0], t, n))
            assert margin < 1e-5, (t, margin, t in ref)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_pairs_kernel_parity_interpret(self, seed):
        """The Pallas edge-neighbor kernel (TPU branch, run here in interpret
        mode) must agree with the XLA broadcast formulation on random masked
        inputs — the CPU suite otherwise never exercises the kernel and a
        regression in either branch would go unnoticed off/on TPU
        (ADVICE r3).  The two implementations perform the same f32 operations
        in the same association order, so W/keep must match exactly."""
        from immesh_tpu.mesh.delaunay import delaunay_pairs

        rng = np.random.default_rng(seed)
        A, K = 4, 24
        uv = rng.uniform(-0.5, 0.5, (A, K, 2)).astype(np.float32)
        mask = rng.random((A, K)) < 0.8
        tb = rng.integers(-2**31, 2**31 - 1, (A, K), dtype=np.int32)
        trip_x, keep_x = delaunay_pairs(
            jnp.asarray(uv), jnp.asarray(mask), tiebreak=jnp.asarray(tb),
            impl="xla")
        trip_p, keep_p = delaunay_pairs(
            jnp.asarray(uv), jnp.asarray(mask), tiebreak=jnp.asarray(tb),
            impl="interpret")
        np.testing.assert_array_equal(np.asarray(keep_x), np.asarray(keep_p))
        kept = np.asarray(keep_x)
        np.testing.assert_array_equal(
            np.asarray(trip_x)[kept], np.asarray(trip_p)[kept])

    def test_collinear_degenerate(self):
        k = 48
        uv = np.zeros((1, k, 2), np.float32)
        uv[0, :10, 0] = np.linspace(0, 1, 10)
        mask = np.zeros((1, k), bool)
        mask[0, :10] = True
        _, keep = delaunay_mask(jnp.asarray(uv), jnp.asarray(mask))
        assert int(keep.sum()) == 0

    def test_pca_projection_recovers_plane(self, rng):
        n = 40
        pts = np.zeros((2, 48, 3), np.float32)
        mask = np.zeros((2, 48), bool)
        # tilted plane
        t = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
        normal = np.array([0.3, -0.4, 0.866], np.float32)
        normal /= np.linalg.norm(normal)
        b1 = np.cross(normal, [0, 0, 1.0]); b1 /= np.linalg.norm(b1)
        b2 = np.cross(normal, b1)
        pts[0, :n] = t[:, :1] * b1 + t[:, 1:] * b2 + np.array([5, 5, 5])
        mask[0, :n] = True
        uv, origin, axes = pca_project(jnp.asarray(pts), jnp.asarray(mask))
        # short axis ≈ plane normal
        n_est = np.asarray(axes)[0][:, 0]
        assert abs(abs(np.dot(n_est, normal)) - 1) < 1e-3
        # projected coords reproduce pairwise distances
        d3 = np.linalg.norm(pts[0, :n, None] - pts[0, None, :n], axis=-1)
        d2 = np.linalg.norm(
            np.asarray(uv)[0, :n, None] - np.asarray(uv)[0, None, :n], axis=-1)
        np.testing.assert_allclose(d2, d3, atol=1e-3)


class TestGlobalPointMap:
    @pytest.mark.slow
    def test_dedup_and_counts(self):
        cfg = PRESETS["sim"]().mesh
        gm = GlobalPointMap.create(cfg)
        rng = np.random.default_rng(0)
        pts = rng.uniform(0, 2, (500, 3)).astype(np.float32)
        gm, s, m, _ = gm.append_frame(jnp.asarray(pts), jnp.ones(500, bool))
        n1 = int(gm.pt_count)
        assert 0 < n1 <= 500
        # appending the identical frame adds nothing
        gm, s, m, _ = gm.append_frame(jnp.asarray(pts), jnp.ones(500, bool))
        assert int(gm.pt_count) == n1
        # min-spacing enforced
        kept = np.asarray(gm.pts[:n1])
        cell = np.floor(kept / cfg.pts_minimum_scale).astype(int)
        assert len(np.unique(cell, axis=0)) == n1

    @pytest.mark.slow
    def test_pull_includes_halo(self):
        cfg = PRESETS["sim"]().mesh
        gm = GlobalPointMap.create(cfg)
        # two touching voxels of points at z=0
        g = np.arange(0.05, 0.8, 0.11, dtype=np.float32)
        X, Y = np.meshgrid(g, g)
        pts = np.stack([X.ravel(), Y.ravel(), np.zeros(X.size, np.float32)], -1)
        gm, slots, smask, _ = gm.append_frame(
            jnp.asarray(pts), jnp.ones(len(pts), bool))
        pull = gm.pull_neighborhood(slots, smask)
        a = int(np.argmax(np.asarray(smask)))
        got = np.asarray(pull["pts"])[a][np.asarray(pull["mask"])[a]]
        center = np.asarray(pull["center"])[a]
        # halo: pulled points extend beyond the 0.4 m voxel cube
        d = np.abs(got - center).max(axis=0)
        assert (d > 0.2 + 1e-6).any()
        # all pulled points within the radius gate (or own voxel)
        r = np.linalg.norm(got - center, axis=1)
        assert r.max() <= cfg.knn_radius_scale * cfg.voxel_resolution * 1.8


class TestMeshPipeline:
    @pytest.fixture(scope="class")
    def ground_mesh(self):
        cfg = PRESETS["sim"]()
        pipe = MeshPipeline(cfg)
        g = np.arange(-1.5, 1.5, 0.12, dtype=np.float32)
        X, Y = np.meshgrid(g, g)
        rng = np.random.default_rng(0)
        pts = np.stack([
            X.ravel(), Y.ravel(),
            0.005 * rng.standard_normal(X.size).astype(np.float32)], -1)
        pipe.step(pts, np.ones(len(pts), bool), np.array([0, 0, 2.0], np.float32))
        return pipe

    def test_covers_area_no_duplicates(self, ground_mesh):
        verts, faces = ground_mesh.extract()
        assert len(faces) > 0
        assert len(_sorted_set(faces)) == len(faces), "duplicate triangles"
        v = verts[faces]
        area = 0.5 * np.linalg.norm(
            np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=1).sum()
        # grid is 3×3 m = 9 m²; mesh should cover most of it, overlap-free
        assert 7.0 < area < 10.0, area

    def test_normals_face_sensor(self, ground_mesh):
        verts, faces = ground_mesh.extract()
        v = verts[faces]
        n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
        # sensor was above the ground plane → winding makes normals point up
        assert (n[:, 2] > 0).mean() > 0.99

    @pytest.mark.slow
    def test_incremental_refines_border(self):
        """Adding points next to an existing patch re-meshes the border
        without duplicate or stale overlapping triangles."""
        cfg = PRESETS["sim"]()
        pipe = MeshPipeline(cfg)
        rng = np.random.default_rng(1)

        def patch(x0):
            g = np.arange(0, 1.2, 0.12, dtype=np.float32)
            X, Y = np.meshgrid(g + x0, g)
            jit = 0.01 * rng.standard_normal((X.size, 2)).astype(np.float32)
            return np.stack([
                X.ravel() + jit[:, 0], Y.ravel() + jit[:, 1],
                0.005 * rng.standard_normal(X.size).astype(np.float32)], -1)

        sensor = np.array([0, 0, 2.0], np.float32)
        pipe.step(patch(0.0), np.ones(100, bool), sensor)
        pipe.step(patch(1.2), np.ones(100, bool), sensor)
        verts, faces = pipe.extract()
        assert len(_sorted_set(faces)) == len(faces)
        v = verts[faces]
        area = 0.5 * np.linalg.norm(
            np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=1).sum()
        # two 1.08×1.08 patches + stitched seam ≈ 2.5 m²
        assert 1.9 < area < 3.0, area


class TestExport:
    def test_ply_roundtrip(self, tmp_path):
        verts = np.random.default_rng(0).uniform(0, 1, (10, 3)).astype(np.float32)
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        p = str(tmp_path / "m.ply")
        save_ply(p, verts, faces)
        v2, f2 = load_ply(p)
        np.testing.assert_array_equal(v2, verts)
        np.testing.assert_array_equal(f2, faces)

    def test_smoothing_reduces_noise(self):
        g = np.arange(0, 2, 0.1, dtype=np.float32)
        X, Y = np.meshgrid(g, g)
        rng = np.random.default_rng(0)
        z = 0.05 * rng.standard_normal(X.size).astype(np.float32)
        verts = np.stack([X.ravel(), Y.ravel(), z], -1)
        from scipy.spatial import Delaunay as SciDelaunay
        faces = SciDelaunay(verts[:, :2].astype(np.float64)).simplices.astype(np.int32)
        sm = smooth_vertices(verts, faces, iterations=3)
        assert sm[:, 2].std() < 0.5 * verts[:, 2].std()

    def test_checkpoint_roundtrip(self, tmp_path):
        cfg = PRESETS["sim"]()
        pipe = MeshPipeline(cfg)
        pts = np.random.default_rng(0).uniform(0, 2, (300, 3)).astype(np.float32)
        pipe.step(pts, np.ones(300, bool), np.zeros(3, np.float32))
        p = str(tmp_path / "gm.npz")
        save_checkpoint(p, pipe.gm)
        gm2 = load_checkpoint(p, pipe.gm)
        assert int(gm2.pt_count) == int(pipe.gm.pt_count)
        np.testing.assert_array_equal(
            np.asarray(gm2.vox_n), np.asarray(pipe.gm.vox_n))
