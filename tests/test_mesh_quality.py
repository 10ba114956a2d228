"""Mesh-quality evidence (VERDICT round-1 item 9): quantitative accuracy vs
the simulator's analytic scene, and display-time Laplacian smoothing
(reference smooths displayed/exported vertices, mesh_rec_display.cpp:85-97)."""

import numpy as np
import pytest

import jax.numpy as jnp

from immesh_tpu.config import PRESETS
from immesh_tpu.eval.mesh_quality import (
    hole_stats, mesh_quality_report, point_rect_distance, store_faces,
    vertex_surface_distance,
)
from immesh_tpu.frontend.sim import Rect, default_scene
from immesh_tpu.mesh.pipeline import MeshPipeline
from immesh_tpu.runtime.export import smooth_vertices


def _rect_z0():
    return Rect(np.zeros(3), np.array([0.0, 0, 1]), np.array([1.0, 0, 0]),
                np.array([0.0, 1, 0]), 2.0, 3.0)


class TestDistances:
    def test_inside_projection(self):
        r = _rect_z0()
        d = point_rect_distance(np.array([[0.5, -1.0, 0.7]]), r)
        np.testing.assert_allclose(d, [0.7], atol=1e-12)

    def test_outside_overshoot(self):
        r = _rect_z0()
        # 1.0 beyond +u edge, 0.5 above plane
        d = point_rect_distance(np.array([[3.0, 0.0, 0.5]]), r)
        np.testing.assert_allclose(d, [np.hypot(1.0, 0.5)], atol=1e-12)

    def test_scene_min(self):
        scene = default_scene()
        d = vertex_surface_distance(np.array([[0.0, 0.0, 0.25]]), scene)
        np.testing.assert_allclose(d, [0.25], atol=1e-9)  # floor is nearest


class TestHoleStats:
    def test_closed_tetrahedron(self):
        faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
        s = hole_stats(faces)
        assert s["boundary_fraction"] == 0.0
        assert s["nonmanifold_edges"] == 0

    def test_single_triangle(self):
        s = hole_stats(np.array([[0, 1, 2]]))
        assert s["boundary_fraction"] == 1.0


class TestMeshAccuracy:
    """The incremental mesh of a noisy sampled plane must reconstruct the
    surface to well under the noise amplitude, with low hole density — the
    quantitative stand-in for the reference's visual parity check."""

    NOISE = 0.01

    def _mesh_noisy_plane(self, cfg, seed=0):
        rng = np.random.default_rng(seed)
        g = np.arange(-1.8, 1.8, 0.11, dtype=np.float32)
        X, Y = np.meshgrid(g, g)
        pts = np.stack([
            X.ravel(), Y.ravel(),
            self.NOISE * rng.standard_normal(X.size).astype(np.float32)], -1)
        mp = MeshPipeline(cfg)
        mp.step(pts, np.ones(len(pts), bool), np.array([0, 0, 3.0]))
        return mp

    @pytest.mark.slow
    def test_report_on_analytic_plane(self):
        cfg = PRESETS["sim"]()
        mp = self._mesh_noisy_plane(cfg)
        scene = [Rect(np.zeros(3), np.array([0.0, 0, 1]),
                      np.array([1.0, 0, 0]), np.array([0.0, 1, 0]),
                      2.0, 2.0)]
        verts = np.asarray(mp.gm.pts)
        faces = store_faces(mp.store)
        rep = mesh_quality_report(verts, faces, scene)
        assert rep["n_triangles"] > 1000
        # raw vertices sit at sample noise level
        assert rep["rms_m"] < 2 * self.NOISE, rep
        # interior is tight: boundary edges only at the patch rim
        assert rep["boundary_fraction"] < 0.12, rep
        assert rep["nonmanifold_edges"] < 0.02 * rep["n_edges"], rep

    def test_smoothing_improves_rms(self):
        cfg = PRESETS["sim"]()
        mp = self._mesh_noisy_plane(cfg, seed=1)
        scene = [Rect(np.zeros(3), np.array([0.0, 0, 1]),
                      np.array([1.0, 0, 0]), np.array([0.0, 1, 0]),
                      2.0, 2.0)]
        verts = np.asarray(mp.gm.pts)
        faces = store_faces(mp.store)
        raw = mesh_quality_report(verts, faces, scene)
        sm = mesh_quality_report(
            smooth_vertices(verts, faces, iterations=1, lam=0.8),
            faces, scene)
        assert sm["rms_m"] < 0.6 * raw["rms_m"], (sm["rms_m"], raw["rms_m"])


class TestDisplaySmoothing:
    def test_region_cache_serves_smoothed_vertices(self):
        """RegionCache with smooth_lam>0 must serve vertices closer to the
        true surface than the raw store positions (the reference's
        get_pos(1) display path)."""
        from immesh_tpu.render.live import RegionCache

        cfg = PRESETS["sim"]()
        rng = np.random.default_rng(2)
        g = np.arange(-1.5, 1.5, 0.12, dtype=np.float32)
        X, Y = np.meshgrid(g, g)
        pts = np.stack([X.ravel(), Y.ravel(),
                        0.01 * rng.standard_normal(X.size).astype(np.float32)],
                       -1)
        mp = MeshPipeline(cfg)
        mp.step(pts, np.ones(len(pts), bool), np.array([0, 0, 3.0]))

        def rms_of(cache):
            cache.sync(mp.gm, mp.store)
            zs = []
            for rid in cache.changed_since(-1):
                buf = cache._regions[rid]          # (n, 3 verts, 3)
                zs.append(buf[..., 2].ravel())
            z = np.concatenate(zs)
            return float(np.sqrt(np.mean(z ** 2)))

        raw_rms = rms_of(RegionCache(cfg.mesh.region_size,
                                     cfg.mesh.voxel_resolution,
                                     smooth_lam=0.0))
        sm_rms = rms_of(RegionCache(cfg.mesh.region_size,
                                    cfg.mesh.voxel_resolution,
                                    smooth_lam=0.8))
        assert sm_rms < 0.6 * raw_rms, (sm_rms, raw_rms)


class TestPullTimeSmoothing:
    @pytest.mark.slow
    def test_pull_smoothing_denoises_live_mesh(self):
        """Pull-time Laplacian smoothing (reference retrieves SMOOTHED
        positions for triangulation and stores them on the point record,
        mesh_rec_geometry.cpp:333-369 + RGB_pts::set_smooth_pos): the
        triangulation geometry (gm.pts_smooth = the reference's get_pos(1))
        must sit far below the sample noise, and the mesh it induces must
        have far better-aligned normals than the raw-geometry mesh — the
        'live mesh noisier than the reference' gap of VERDICT r2 item 7."""
        rng = np.random.default_rng(7)
        noise = 0.035
        g = np.arange(-1.5, 1.5, 0.11, dtype=np.float32)
        X, Y = np.meshgrid(g, g)
        pts = np.stack(
            [X.ravel(), Y.ravel(),
             noise * rng.standard_normal(X.size).astype(np.float32)], -1)
        mask = np.ones(len(pts), bool)

        def build(lam):
            cfg = PRESETS["sim"]()
            cfg = cfg.replace(mesh=cfg.mesh.__class__(
                points_capacity=2 ** 14, voxel_capacity=2 ** 10,
                pull_smooth_lam=lam))
            mp = MeshPipeline(cfg)
            mp.step(pts, mask, np.array([0, 0, 3.0]))
            tri = np.asarray(mp.store.tri_ids).reshape(-1, 3)
            tri = tri[np.all(tri >= 0, axis=-1)]
            return mp, tri

        def normal_dev(v, tri):
            n = np.cross(v[tri[:, 1]] - v[tri[:, 0]],
                         v[tri[:, 2]] - v[tri[:, 0]])
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
            return float(np.mean(np.degrees(
                np.arccos(np.clip(np.abs(n[:, 2]), 0, 1)))))

        mp_raw, tri_raw = build(0.0)
        mp_sm, tri_sm = build(1.0)
        assert len(tri_sm) > 0.7 * len(tri_raw)   # no mesh collapse

        # geometry denoising: smoothed positions ≪ sample noise; raw at noise
        n_used = int(mp_sm.gm.n_points())
        z_raw = np.asarray(mp_raw.gm.pts)[:n_used, 2]
        z_sm = np.asarray(mp_sm.gm.pts_smooth)[:n_used, 2]
        rms_raw = float(np.sqrt(np.mean(z_raw ** 2)))
        rms_sm = float(np.sqrt(np.mean(z_sm ** 2)))
        print(f"geometry z-RMS raw {rms_raw:.4f} smoothed {rms_sm:.4f}")
        assert rms_raw > 0.8 * noise
        assert rms_sm < 0.4 * rms_raw, (rms_raw, rms_sm)

        # the LIVE mesh (triangles over their triangulation geometry) is far
        # cleaner: mean normal deviation from the true surface normal
        dev_raw = normal_dev(np.asarray(mp_raw.gm.pts), tri_raw)
        dev_sm = normal_dev(np.asarray(mp_sm.gm.pts_smooth), tri_sm)
        print(f"normal dev raw {dev_raw:.2f}° smoothed {dev_sm:.2f}°")
        assert dev_sm < 0.5 * dev_raw, (dev_raw, dev_sm)


class TestOracleBoundary:
    """Watertightness oracle (VERDICT r4 item 7): the reference geometry
    (PCA project → exact Delaunay → sliver filter, scipy standing in for
    CGAL) over the same pulled neighborhoods, as a baseline for the store's
    boundary-edge fraction."""

    def test_oracle_vs_store_on_flat_grid(self):
        import numpy as np
        from immesh_tpu.config import PRESETS
        from immesh_tpu.eval.mesh_quality import (
            hole_stats, oracle_mesh_from_map, store_faces)
        from immesh_tpu.mesh.pipeline import MeshPipeline

        rng = np.random.default_rng(0)
        g = np.arange(-1.4, 1.4, 0.11, dtype=np.float32)
        X, Y = np.meshgrid(g, g)
        pts = np.stack([X.ravel(), Y.ravel(),
                        0.003 * rng.standard_normal(X.size).astype(np.float32)],
                       -1)
        mesh = MeshPipeline(PRESETS["sim"]())
        mesh.step(pts, np.ones(len(pts), bool), np.array([0, 0, 2.0]))
        import jax
        jax.block_until_ready(mesh.store.tri_n)

        faces_o = oracle_mesh_from_map(mesh.gm)
        assert len(faces_o) > 50
        hs_o = hole_stats(faces_o)
        hs_s = hole_stats(store_faces(mesh.store))
        # a flat grid's only boundary edges are its perimeter; both the
        # kernel mesh and the oracle must be near-watertight inside, so the
        # fractions must be small and comparable
        assert hs_s["boundary_fraction"] < 0.35
        assert hs_o["boundary_fraction"] < 0.35
        assert abs(hs_s["boundary_fraction"] - hs_o["boundary_fraction"]) < 0.2
