"""Unit tests for core math: SO(3), state manifold, eigh3x3, plane fitting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from immesh_tpu.core import so3
from immesh_tpu.core.state import EsikfState, STATE_DIM
from immesh_tpu.core.geometry import (
    eigh3x3,
    lidar_point_cov_body,
    plane_from_moments,
    point_to_plane_sigma2,
)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        # keep ‖w‖ < π so log(exp(w)) = w exactly (beyond π it wraps)
        w = rng.normal(size=(64, 3)).astype(np.float32)
        w *= (0.9 * np.pi / np.maximum(np.linalg.norm(w, axis=1, keepdims=True), 1e-6)
              ) * rng.uniform(0.01, 1.0, size=(64, 1)).astype(np.float32)
        R = so3.exp(jnp.asarray(w))
        w2 = so3.log(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=2e-5)

    def test_exp_small_angle(self):
        w = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
        R = so3.exp(w)
        assert not np.any(np.isnan(np.asarray(R)))
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)

    def test_exp_orthogonal(self, rng):
        w = rng.normal(size=(32, 3)).astype(np.float32) * 2.0
        R = np.asarray(so3.exp(jnp.asarray(w)))
        for i in range(32):
            np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
            assert np.linalg.det(R[i]) > 0.9

    def test_log_near_pi(self):
        # rotation by π about z
        w = jnp.array([0.0, 0.0, np.pi - 1e-4])
        R = so3.exp(w)
        w2 = so3.log(R)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-3)

    def test_hat_vee(self, rng):
        w = rng.normal(size=(8, 3)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(so3.vee(so3.hat(jnp.asarray(w)))), w)

    def test_a_matrix_identity_at_zero(self):
        A = so3.a_matrix(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(A), np.eye(3), atol=1e-6)

    def test_jr_inv_is_inverse_of_a_matrix(self, rng):
        w = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        prod = so3.a_matrix(w) @ so3.jr_inv(w)
        np.testing.assert_allclose(
            np.asarray(prod), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-4
        )

    def test_quat_roundtrip(self, rng):
        w = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        R = so3.exp(w)
        q = so3.rot_to_quat(R)
        R2 = so3.quat_to_rot(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


class TestState:
    def test_boxplus_boxminus_roundtrip(self, rng):
        s = EsikfState.identity()
        delta = jnp.asarray(rng.normal(size=(STATE_DIM,)).astype(np.float32) * 0.1)
        s2 = s.boxplus(delta)
        d2 = s2.boxminus(s)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(delta), atol=1e-5)

    def test_transform_points(self, rng):
        s = EsikfState.identity().boxplus(
            jnp.asarray(rng.normal(size=(STATE_DIM,)).astype(np.float32))
        )
        pts = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
        out = s.transform_points(pts)
        expect = np.asarray(pts) @ np.asarray(s.rot).T + np.asarray(s.pos)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)

    def test_pytree(self):
        s = EsikfState.identity()
        leaves = jax.tree_util.tree_leaves(s)
        assert len(leaves) == 7
        s2 = jax.jit(lambda x: x.boxplus(jnp.ones(STATE_DIM) * 0.01))(s)
        assert s2.pos.shape == (3,)


class TestEigh3x3:
    def test_matches_numpy(self, rng):
        X = rng.normal(size=(256, 3, 3)).astype(np.float32)
        A = X @ np.swapaxes(X, -1, -2)  # PSD
        vals, vecs = eigh3x3(jnp.asarray(A))
        vals, vecs = np.asarray(vals), np.asarray(vecs)
        ref_vals = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(vals, ref_vals, rtol=1e-3, atol=1e-3)
        # eigenvector property: A v = λ v
        for k in range(3):
            Av = np.einsum("bij,bj->bi", A, vecs[:, :, k])
            lv = vals[:, k, None] * vecs[:, :, k]
            np.testing.assert_allclose(Av, lv, atol=2e-2)

    def test_orthonormal(self, rng):
        X = rng.normal(size=(64, 3, 3)).astype(np.float32)
        A = X @ np.swapaxes(X, -1, -2)
        _, vecs = eigh3x3(jnp.asarray(A))
        vecs = np.asarray(vecs)
        VtV = np.einsum("bki,bkj->bij", vecs, vecs)
        np.testing.assert_allclose(VtV, np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-4)

    def test_degenerate_isotropic(self):
        A = jnp.broadcast_to(jnp.eye(3) * 2.0, (4, 3, 3))
        vals, vecs = eigh3x3(A)
        np.testing.assert_allclose(np.asarray(vals), 2.0, atol=1e-6)
        assert not np.any(np.isnan(np.asarray(vecs)))

    def test_planar_case(self, rng):
        # points on a plane with normal [0,0,1]: cov has tiny z eigenvalue
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        pts[:, 2] *= 1e-3
        cov = np.cov(pts.T).astype(np.float32)
        vals, vecs = eigh3x3(jnp.asarray(cov))
        n = np.asarray(vecs)[:, 0]
        assert abs(n[2]) > 0.999
        assert np.asarray(vals)[0] < 1e-4


class TestPlaneFit:
    def _moments(self, pts):
        return (
            jnp.asarray(pts.sum(0)),
            jnp.asarray(np.einsum("ni,nj->ij", pts, pts)),
            jnp.asarray(float(len(pts))),
        )

    def test_plane_recovery(self, rng):
        # noisy samples of plane z = 0.5
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        pts[:, 2] = 0.5 + rng.normal(size=200).astype(np.float32) * 0.01
        sp, sppt, n = self._moments(pts)
        out = plane_from_moments(sp, sppt, n, jnp.asarray(1e-4))
        normal = np.asarray(out["normal"])
        assert abs(normal[2]) > 0.999
        d = np.asarray(out["d"])
        assert abs(-d / normal[2] - 0.5) < 0.01
        assert bool(out["valid"])
        assert np.asarray(out["lam"])[0] < 5e-4

    def test_batched(self, rng):
        pts = rng.normal(size=(8, 100, 3)).astype(np.float32)
        pts[..., 2] *= 0.01
        sp = jnp.asarray(pts.sum(1))
        sppt = jnp.asarray(np.einsum("bni,bnj->bij", pts, pts))
        n = jnp.full((8,), 100.0)
        out = plane_from_moments(sp, sppt, n, jnp.full((8,), 1e-4))
        assert out["normal"].shape == (8, 3)
        assert np.all(np.abs(np.asarray(out["normal"])[:, 2]) > 0.99)

    def test_insufficient_points(self):
        out = plane_from_moments(jnp.zeros(3), jnp.zeros((3, 3)), jnp.asarray(2.0),
                                 jnp.asarray(1e-4), min_count=5)
        assert not bool(out["valid"])

    def test_normal_cov_scales_with_noise(self, rng):
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        pts[:, 2] *= 0.01
        sp, sppt, n = self._moments(pts)
        lo = plane_from_moments(sp, sppt, n, jnp.asarray(1e-6))
        hi = plane_from_moments(sp, sppt, n, jnp.asarray(1e-2))
        assert float(jnp.trace(hi["cov_nn"])) > float(jnp.trace(lo["cov_nn"])) * 100


class TestPointCov:
    def test_shape_and_psd(self, rng):
        pts = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32) * 10)
        cov = lidar_point_cov_body(pts, 0.05, 0.02)
        assert cov.shape == (50, 3, 3)
        vals = np.linalg.eigvalsh(np.asarray(cov))
        assert np.all(vals > -1e-8)

    def test_range_noise_along_beam(self):
        p = jnp.array([[10.0, 0.0, 0.0]])
        cov = np.asarray(lidar_point_cov_body(p, 0.05, 0.001))[0]
        # beam along x: cov_xx ≈ range_err², tangential grows with r
        np.testing.assert_allclose(cov[0, 0], 0.05 ** 2, rtol=1e-3)
        np.testing.assert_allclose(cov[1, 1], (0.001 * 10) ** 2, rtol=1e-2)

    def test_sigma2_gate(self, rng):
        q = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
        s2 = point_to_plane_sigma2(
            q,
            jnp.broadcast_to(jnp.eye(3) * 1e-4, (16, 3, 3)),
            jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (16, 3)),
            jnp.zeros((16, 3)),
            jnp.broadcast_to(jnp.eye(3) * 1e-5, (16, 3, 3)),
            jnp.full((16,), 1e-6),
        )
        assert s2.shape == (16,)
        assert np.all(np.asarray(s2) > 0)


class TestConfig:
    def test_roundtrip(self, tmp_path):
        from immesh_tpu.config import ImMeshConfig, PRESETS

        cfg = PRESETS["kitti"]()
        p = str(tmp_path / "cfg.json")
        cfg.to_json(p)
        cfg2 = ImMeshConfig.from_json(p)
        assert cfg2 == cfg
        assert cfg2.voxel_map.voxel_size == 3.0

    def test_presets_exist(self):
        from immesh_tpu.config import PRESETS

        for name in ("avia", "kitti", "nclt", "ntu", "offline_pointcloud", "sim"):
            cfg = PRESETS[name]()
            assert cfg.preprocess.max_points > 0
