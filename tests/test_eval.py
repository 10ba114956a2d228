"""Trajectory evaluation (eval/ate.py): Umeyama alignment, stamp
association, ATE/RPE — the in-framework replacement for the external
evo-on-kitti_log evaluation loop the reference relies on (SURVEY.md §4.2)."""

import numpy as np
import pytest

from immesh_tpu.eval.ate import (
    Trajectory, align_umeyama, associate_stamps, ate_rmse, evaluate_ate,
    from_rows, load_tum, rpe,
)


def _rot(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def _quat_from_rot(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return np.array([x, y, z, w])


def _traj(rng, n=100, jitter=0.0, R=np.eye(3), t=np.zeros(3)):
    stamps = np.arange(n) * 0.1
    pos = np.cumsum(rng.normal(scale=0.3, size=(n, 3)), axis=0)
    pos = (R @ pos.T).T + t + rng.normal(scale=jitter, size=(n, 3))
    quat = np.tile(_quat_from_rot(np.eye(3)), (n, 1))
    return Trajectory(stamps, pos, quat), pos


class TestUmeyama:
    def test_recovers_exact_rigid_transform(self, rng):
        src = rng.normal(size=(50, 3))
        R = _rot([0.3, -1.0, 0.5], 1.1)
        t = np.array([4.0, -2.0, 0.7])
        dst = (R @ src.T).T + t
        Re, te, s = align_umeyama(src, dst)
        np.testing.assert_allclose(Re, R, atol=1e-10)
        np.testing.assert_allclose(te, t, atol=1e-10)
        assert s == 1.0

    def test_recovers_scale_in_sim3_mode(self, rng):
        src = rng.normal(size=(50, 3))
        R = _rot([1, 2, 3], -0.4)
        dst = 2.5 * (R @ src.T).T + np.array([1.0, 0, -1])
        _, _, s = align_umeyama(src, dst, with_scale=True)
        assert abs(s - 2.5) < 1e-9

    def test_reflection_guard(self, rng):
        """Planar (rank-2) point sets must still yield det(R)=+1."""
        src = rng.normal(size=(50, 3))
        src[:, 2] = 0.0
        dst = src[:, [1, 0, 2]]  # a reflection of the plane
        R, _, _ = align_umeyama(src, dst)
        assert np.linalg.det(R) > 0.99


class TestAte:
    def test_zero_error_after_alignment(self, rng):
        _, pos = _traj(rng)
        R = _rot([0, 0, 1], 0.7)
        est = (R @ pos.T).T + np.array([10.0, -3.0, 2.0])
        rmse, err = ate_rmse(est, pos)
        assert rmse < 1e-9
        assert err.shape == (100,)

    def test_known_noise_level(self, rng):
        _, pos = _traj(rng, n=2000)
        est = pos + rng.normal(scale=0.05, size=pos.shape)
        rmse, _ = ate_rmse(est, pos)
        # 3-dof gaussian: rmse ≈ sigma*sqrt(3)
        assert 0.07 < rmse < 0.11


class TestAssociation:
    def test_offset_stamps_match_greedily(self):
        ta = np.arange(10) * 0.1
        tb = ta + 0.004
        ia, ib = associate_stamps(ta, tb, max_dt=0.02)
        np.testing.assert_array_equal(ia, np.arange(10))
        np.testing.assert_array_equal(ib, np.arange(10))

    def test_unmatchable_dropped(self):
        ta = np.array([0.0, 1.0, 2.0])
        tb = np.array([0.001, 5.0])
        ia, ib = associate_stamps(ta, tb, max_dt=0.02)
        assert list(ia) == [0] and list(ib) == [0]

    def test_each_index_used_once(self):
        ta = np.array([0.0, 0.001])
        tb = np.array([0.0005])
        ia, ib = associate_stamps(ta, tb, max_dt=0.02)
        assert ia.size == 1 and ib.size == 1


class TestRpe:
    def test_identical_trajectories_zero(self, rng):
        tr, _ = _traj(rng)
        t_err, r_err = rpe(tr, tr, delta=1)
        assert t_err < 1e-12 and r_err < 1e-6


class TestEndToEnd:
    def test_evaluate_ate_via_tum_files(self, rng, tmp_path):
        tr, pos = _traj(rng, n=50)
        R = _rot([0, 1, 0], 0.3)
        est_pos = (R @ pos.T).T + 5.0 + rng.normal(scale=0.01, size=pos.shape)
        rows_gt = [(tr.stamps[i], *pos[i], 0, 0, 0, 1) for i in range(50)]
        rows_est = [(tr.stamps[i], *est_pos[i], 0, 0, 0, 1) for i in range(50)]
        for name, rows in (("gt.txt", rows_gt), ("est.txt", rows_est)):
            with open(tmp_path / name, "w") as f:
                for r in rows:
                    f.write(" ".join(f"{v:.6f}" for v in r) + "\n")
        out = evaluate_ate(load_tum(str(tmp_path / "est.txt")),
                           load_tum(str(tmp_path / "gt.txt")))
        assert out["n_pairs"] == 50
        assert out["ate_rmse"] < 0.03
        # RPE is NOT alignment-invariant: est positions are rotated 0.3 rad
        # while quats stay identity, so relative translations differ by
        # ~|step|·0.3 ≈ 0.15 m — it must see that, unlike ATE.
        assert 0.05 < out["rpe_trans"] < 0.25

    def test_from_rows_matches_logger_schema(self, rng):
        rows = [(0.1 * i, i, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0) for i in range(5)]
        tr = from_rows(rows)
        assert tr.n == 5
        np.testing.assert_allclose(tr.pos[:, 0], np.arange(5))

    def test_too_few_pairs_raises(self, rng):
        tr, _ = _traj(rng, n=2)
        with pytest.raises(ValueError):
            evaluate_ate(tr, tr)
