"""Texture path tests (SURVEY.md C26): batched projection/sampling, per-point
RGB Kalman render gates & convergence, pyramidal LK flow on known shifts,
colored-mesh export round trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from immesh_tpu.config import PRESETS
from immesh_tpu.mesh.pipeline import MeshPipeline
from immesh_tpu.runtime.export import load_ply, save_ply
from immesh_tpu.texture.camera import (
    PinholeCamera, bilinear_sample, project_points, to_gray,
)
from immesh_tpu.texture.optical_flow import build_pyramid, lk_track
from immesh_tpu.texture.pipeline import TexturePipeline
from immesh_tpu.texture.render import ColorStore, render_points


CAM = PinholeCamera.create(fx=200.0, fy=200.0, cx=160.0, cy=120.0,
                           width=320, height=240)
EYE = np.eye(3, dtype=np.float32)
ZERO = np.zeros(3, np.float32)


class TestCamera:
    def test_projection_pinhole(self):
        pts = jnp.asarray([[0.0, 0.0, 2.0], [0.5, -0.25, 2.0]])
        uv, z, ok = project_points(pts, jnp.asarray(EYE), jnp.asarray(ZERO), CAM)
        np.testing.assert_allclose(np.asarray(uv[0]), [160.0, 120.0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(uv[1]), [210.0, 95.0], atol=1e-4)
        np.testing.assert_allclose(np.asarray(z), [2.0, 2.0], atol=1e-6)
        assert bool(ok.all())

    def test_projection_gates(self):
        pts = jnp.asarray([
            [0.0, 0.0, -1.0],     # behind camera
            [10.0, 0.0, 2.0],     # off image
            [0.0, 0.0, 2.0],      # fine
        ])
        _, _, ok = project_points(pts, jnp.asarray(EYE), jnp.asarray(ZERO), CAM)
        assert list(np.asarray(ok)) == [False, False, True]

    def test_projection_with_pose(self, rng):
        """Random pose: project p_cam = R p + t manually and compare."""
        from immesh_tpu.core.so3 import exp as so3_exp
        R = np.asarray(so3_exp(jnp.asarray([0.2, -0.1, 0.3])))
        t = np.asarray([0.3, -0.2, 0.5], np.float32)
        pts = rng.uniform(-0.5, 0.5, (50, 3)).astype(np.float32)
        pts[:, 2] += 4.0
        pts_w = (pts - t) @ np.linalg.inv(R).T  # so that R pw + t = pts
        uv, z, ok = project_points(jnp.asarray(pts_w, jnp.float32),
                                   jnp.asarray(R, jnp.float32),
                                   jnp.asarray(t, jnp.float32), CAM)
        exp_u = 200.0 * pts[:, 0] / pts[:, 2] + 160.0
        exp_v = 200.0 * pts[:, 1] / pts[:, 2] + 120.0
        np.testing.assert_allclose(np.asarray(uv[:, 0]), exp_u, atol=1e-2)
        np.testing.assert_allclose(np.asarray(uv[:, 1]), exp_v, atol=1e-2)

    def test_bilinear_exact_and_midpoint(self):
        img = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4, 1))
        # integer coords → exact pixel
        v = bilinear_sample(img, jnp.asarray([[2.0, 1.0]]))  # col 2, row 1
        assert float(v[0, 0]) == 6.0
        # midpoint → average of 4 neighbors
        v = bilinear_sample(img, jnp.asarray([[0.5, 0.5]]))
        assert float(v[0, 0]) == pytest.approx((0 + 1 + 4 + 5) / 4)

    def test_gray(self):
        img = jnp.ones((4, 4, 3)) * jnp.asarray([100.0, 50.0, 20.0])
        g = to_gray(img)
        assert float(g[0, 0]) == pytest.approx(0.299 * 100 + 0.587 * 50 + 0.114 * 20)


def _const_image(rgb, h=240, w=320):
    return jnp.broadcast_to(jnp.asarray(rgb, jnp.float32), (h, w, 3))


class TestRender:
    def _render(self, store, pts, img, t=0.0, ids=None, mask=None,
                R=None, tvec=None, inv_exp=1.0):
        n = pts.shape[0]
        ids = jnp.arange(n, dtype=jnp.int32) if ids is None else ids
        mask = jnp.ones(n, bool) if mask is None else mask
        R = jnp.asarray(EYE) if R is None else R
        tvec = jnp.asarray(ZERO) if tvec is None else tvec
        return render_points(store, jnp.asarray(pts, jnp.float32), ids, mask,
                             img, CAM, R, tvec, jnp.float32(t),
                             jnp.float32(inv_exp))

    def test_first_observation_sets_color(self):
        store = ColorStore.create(8)
        pts = np.asarray([[0.0, 0.0, 2.0]], np.float32)
        store, n = self._render(store, pts, _const_image([120, 80, 40]))
        assert int(n) == 1
        np.testing.assert_allclose(np.asarray(store.colors_u8()[0]),
                                   [120, 80, 40], atol=1e-3)
        assert int(store.n_obs[0]) == 1
        assert float(store.obs_dis[0]) == pytest.approx(2.0)

    def test_kalman_converges_to_observed(self):
        """Repeated views of a constant image pull the color to the pixel
        value and shrink covariance (reference update_rgb,
        pointcloud_rgbd.cpp:144-166)."""
        store = ColorStore.create(8)
        pts = np.asarray([[0.0, 0.0, 2.0]], np.float32)
        # first obs with a wrong color, then many of the true color
        store, _ = self._render(store, pts, _const_image([10, 10, 10]), t=0.0)
        cov0 = float(store.cov[0, 0])
        for k in range(30):
            store, _ = self._render(store, pts, _const_image([200, 100, 50]),
                                    t=0.1 * (k + 1))
        c = np.asarray(store.colors_u8()[0])
        assert np.all(np.abs(c - [200, 100, 50]) < 15)
        assert float(store.cov[0, 0]) < cov0
        assert int(store.n_obs[0]) == 31

    def test_view_angle_gate(self):
        """Points >30° off the optical axis are skipped
        (pointcloud_rgbd.cpp:647-650)."""
        store = ColorStore.create(8)
        # ~36.9° off-axis but still inside the (wide) image? tan(30°)≈0.577
        # at z=1: x=0.75 ⇒ angle≈36.9°, u=200*0.75+160=310 < 320 (in image)
        pts = np.asarray([[0.75, 0.0, 1.0]], np.float32)
        store, n = self._render(store, pts, _const_image([100, 100, 100]))
        assert int(n) == 0
        assert int(store.n_obs[0]) == 0

    def test_obs_distance_gate(self):
        """A much farther view of an already-colored point is rejected
        (pointcloud_rgbd.cpp:138-141)."""
        store = ColorStore.create(8)
        pts = np.asarray([[0.0, 0.0, 2.0]], np.float32)
        store, _ = self._render(store, pts, _const_image([50, 50, 50]), t=0.0)
        # same point seen from 3x the distance: move camera back 4 m
        t_w2c = jnp.asarray([0.0, 0.0, 4.0], jnp.float32)  # p_cam.z = 6
        store, n = self._render(store, pts, _const_image([250, 250, 250]),
                                t=1.0, tvec=t_w2c)
        assert int(n) == 0
        np.testing.assert_allclose(np.asarray(store.colors_u8()[0]),
                                   [50, 50, 50], atol=1e-3)

    def test_zero_and_overexposed_rejected(self):
        store = ColorStore.create(8)
        pts = np.asarray([[0.0, 0.0, 2.0]], np.float32)
        store, n0 = self._render(store, pts, _const_image([0, 0, 0]))
        store, n1 = self._render(store, pts, _const_image([256, 256, 256]))
        assert int(n0) == 0 and int(n1) == 0

    def test_exposure_normalization(self):
        """Colors stored as radiance: a frame at half exposure (inv_exp=2)
        still reads back as the display color (pointcloud_rgbd.cpp:96-103)."""
        store = ColorStore.create(8)
        pts = np.asarray([[0.0, 0.0, 2.0]], np.float32)
        store, _ = self._render(store, pts, _const_image([100, 100, 100]),
                                inv_exp=2.0)
        np.testing.assert_allclose(np.asarray(store.colors_u8()[0]),
                                   [100, 100, 100], atol=1e-3)


class TestOpticalFlow:
    def _texture(self, rng, h=96, w=128):
        img = rng.uniform(0, 255, (h, w)).astype(np.float32)
        # smooth it so gradients are informative
        from scipy.ndimage import gaussian_filter
        return gaussian_filter(img, 2.0).astype(np.float32)

    def test_pyramid_shapes(self, rng):
        pyr = build_pyramid(jnp.asarray(self._texture(rng)), 3)
        assert pyr[0].shape == (96, 128)
        assert pyr[1].shape == (48, 64)
        assert pyr[2].shape == (24, 32)

    def test_tracks_known_shift(self, rng):
        """Integer shift of a smooth texture is recovered to sub-pixel
        (reference lkpyramid.cpp tracker behavior)."""
        img = self._texture(rng)
        dx, dy = 3, 2
        nxt = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
        pyr0 = build_pyramid(jnp.asarray(img), 3)
        pyr1 = build_pyramid(jnp.asarray(nxt), 3)
        pts = np.stack(np.meshgrid(
            np.arange(30, 100, 12), np.arange(30, 70, 12)), -1
        ).reshape(-1, 2).astype(np.float32)
        out, ok = lk_track(pyr0, pyr1, jnp.asarray(pts), win=15, iters=15)
        out, ok = np.asarray(out), np.asarray(ok)
        assert ok.sum() >= len(pts) * 0.8
        err = out[ok] - (pts[ok] + [dx, dy])
        assert np.abs(err).max() < 0.35

    def test_flat_patch_flagged(self, rng):
        img = np.zeros((64, 64), np.float32)
        pyr = build_pyramid(jnp.asarray(img), 2)
        pts = jnp.asarray([[32.0, 32.0]])
        _, ok = lk_track(pyr, pyr, pts, win=15, iters=5)
        assert not bool(ok[0])


class TestTexturePipeline:
    @pytest.mark.slow  # ~8-10 s; default gate keeps a faster sibling
    def test_colored_mesh_end_to_end(self, rng, tmp_path):
        """Mesh a plane, colorize from a camera straight above, export a
        vertex-colored PLY, read it back."""
        cfg = PRESETS["sim"]()
        mesh = MeshPipeline(cfg)
        tex = TexturePipeline(cfg, CAM)

        x, y = np.meshgrid(np.linspace(-2, 2, 40), np.linspace(-2, 2, 40))
        pts = np.stack([x, y, np.zeros_like(x)], -1).reshape(-1, 3)
        pts += rng.normal(0, 0.005, pts.shape)
        pts = pts.astype(np.float32)
        mesh.step(pts, np.ones(len(pts), bool), np.asarray([0, 0, 5.0], np.float32))

        # camera at (0,0,5) looking down (-z world): R maps world→cam so that
        # points below have positive cam-z: cam z = -(world z - 5)
        R = np.diag([1.0, -1.0, -1.0]).astype(np.float32)
        t = -R @ np.asarray([0, 0, 5.0], np.float32)
        n = tex.render(mesh, _const_image([30, 200, 90]), R, t, obs_time=0.0)
        assert n > 100

        verts, faces, cols = tex.extract_colored(mesh)
        assert len(verts) > 100 and len(faces) > 50
        colored = cols[np.any(cols > 0, axis=1)]
        assert len(colored) > 100
        med = np.median(colored, axis=0)
        np.testing.assert_allclose(med, [30, 200, 90], atol=3)

        p = tmp_path / "colored.ply"
        save_ply(str(p), verts, faces, cols)
        v2, f2, c2 = load_ply(str(p))
        np.testing.assert_allclose(v2, verts, atol=1e-6)
        np.testing.assert_array_equal(f2, faces)
        np.testing.assert_array_equal(c2, cols)
