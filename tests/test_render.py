"""Depth rasterizer + reinforcement tests against analytic scenes."""

import numpy as np
import pytest

import jax.numpy as jnp

from immesh_tpu.render.raster import (
    PinholeCam, depth_rasterize, reinforce_scan, unproject_depth,
)


def _quad(z=2.0, half=1.0):
    """Two triangles forming a square centered on the optical axis at depth z
    (camera at origin looking +z in world)."""
    verts = jnp.asarray([
        [-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z],
    ], jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
    return verts, faces


def _cam():
    return PinholeCam.looking(
        pos=(0, 0, 0), target=(0, 0, 1), up=(0, -1, 0),
        fx=100.0, fy=100.0, cx=160.0, cy=120.0, width=320, height=240)


class TestRasterizer:
    def test_flat_quad_depth(self):
        verts, faces = _quad(z=2.0)
        cam = _cam()
        d = np.asarray(depth_rasterize(verts, faces, jnp.ones(2, bool), cam))
        # center pixel hits the quad at depth 2
        assert abs(d[120, 160] - 2.0) < 1e-3
        # quad spans ±1 m at 2 m with f=100 → ±50 px around center
        assert np.isfinite(d[120 - 45, 160 - 45])
        assert np.isinf(d[120, 160 + 60])
        # everything finite equals 2.0 (fronto-parallel plane)
        np.testing.assert_allclose(d[np.isfinite(d)], 2.0, atol=1e-2)

    def test_occlusion(self):
        v1, f1 = _quad(z=2.0, half=1.0)
        v2, f2 = _quad(z=1.0, half=0.2)   # small near quad occludes center
        verts = jnp.concatenate([v1, v2])
        faces = jnp.concatenate([f1, f2 + 4])
        d = np.asarray(depth_rasterize(verts, faces, jnp.ones(4, bool), _cam()))
        assert abs(d[120, 160] - 1.0) < 1e-3      # near surface wins
        assert abs(d[120, 160 + 40] - 2.0) < 1e-2  # far surface visible outside

    def test_tilted_plane_perspective_correct(self):
        # plane z = 2 + 0.5·x_world; at pixel u, x = z(u−cx)/fx
        verts = jnp.asarray([
            [-2, -2, 1.0], [2, -2, 3.0], [2, 2, 3.0], [-2, 2, 1.0],
        ], jnp.float32)
        faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
        cam = _cam()
        d = np.asarray(depth_rasterize(verts, faces, jnp.ones(2, bool), cam))
        for du in (-30, 0, 30):
            u = 160 + du
            z = d[120, u]
            assert np.isfinite(z)
            x = z * (u + 0.5 - 160) / 100.0
            np.testing.assert_allclose(z, 2.0 + 0.5 * x, atol=0.02)

    def test_unproject_roundtrip(self):
        verts, faces = _quad(z=2.0)
        cam = _cam()
        d = depth_rasterize(verts, faces, jnp.ones(2, bool), cam)
        pts, ok = unproject_depth(d, cam, stride=2)
        p = np.asarray(pts)[np.asarray(ok)]
        assert len(p) > 500
        np.testing.assert_allclose(p[:, 2], 2.0, atol=1e-2)
        assert np.abs(p[:, :2]).max() <= 1.01


class TestReinforcement:
    def test_densifies_sparse_mesh(self):
        """Mesh from sparse points → reinforcement yields denser synthetic
        cloud on the same surface (the reference's headline GUI feature)."""
        from immesh_tpu.config import PRESETS
        from immesh_tpu.mesh.pipeline import MeshPipeline

        rng = np.random.default_rng(0)
        cfg = PRESETS["sim"]()
        pipe = MeshPipeline(cfg)
        t = rng.uniform(-1.5, 1.5, (800, 2)).astype(np.float32)
        pts = np.stack([
            t[:, 0], t[:, 1],
            0.002 * rng.standard_normal(800).astype(np.float32)], -1)
        pipe.step(pts, np.ones(800, bool), np.array([0, 0, 3.0], np.float32))

        cam = PinholeCam.looking(pos=(0, 0, 3.0), target=(0, 0, 0),
                                 up=(0, 1, 0), fx=120, fy=120)
        dense, depth = reinforce_scan(pipe.store, pipe.gm, cam, stride=1)
        assert len(dense) > 3 * len(pts)
        # synthetic points lie on the meshed surface
        assert np.abs(dense[:, 2]).mean() < 0.05
