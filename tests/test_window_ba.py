"""Sliding-window plane-landmark BA with distributed Schur complement
(dist/window_ba.py) — the BASELINE.md north-star subsystem, which the
reference lacks entirely (it bounds its working set instead; SURVEY.md §5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from immesh_tpu.dist.window_ba import (
    WindowProblem, make_dist_window_ba, plane_tangent_basis, schur_solve,
    solve_window,
)

N_DEV = 8


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def _make_problem(rng, K=5, M=8, Np=256, pose_noise=0.03, drop_planes=False):
    """Ground-truth trajectory observing M random planes; initial poses
    perturbed. Returns (problem, gt_rot, gt_pos)."""
    # ground-truth poses: arc in the plane with yaw
    gt_rot = np.stack([_rotz(0.1 * k) for k in range(K)])
    gt_pos = np.stack([[0.5 * k, 0.2 * np.sin(k), 0.05 * k] for k in range(K)])

    normal = rng.normal(size=(M, 3))
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    d = rng.uniform(-3.0, 3.0, size=M)

    pts = np.zeros((K, Np, 3), np.float32)
    pid = np.zeros((K, Np), np.int32)
    w = np.ones((K, Np), np.float32)
    for k in range(K):
        for i in range(Np):
            m = rng.integers(0, M)
            # sample a world point on plane m near the trajectory
            x = rng.normal(scale=4.0, size=3) + gt_pos[k]
            x = x - (normal[m] @ x + d[m]) * normal[m]     # project onto plane
            pts[k, i] = gt_rot[k].T @ (x - gt_pos[k])       # to body frame
            pid[k, i] = m
    # mark a few slots padded
    w[:, -5:] = 0.0

    # perturbed initial poses (keyframe 0 = gauge anchor stays at gt)
    rot0 = gt_rot.copy()
    pos0 = gt_pos.copy()
    for k in range(1, K):
        ax = rng.normal(scale=pose_noise, size=3)
        angle = np.linalg.norm(ax)
        axn = ax / max(angle, 1e-12)
        Kx = np.array([[0, -axn[2], axn[1]], [axn[2], 0, -axn[0]],
                       [-axn[1], axn[0], 0]])
        dR = np.eye(3) + np.sin(angle) * Kx + (1 - np.cos(angle)) * Kx @ Kx
        rot0[k] = gt_rot[k] @ dR
        pos0[k] = gt_pos[k] + rng.normal(scale=pose_noise, size=3)

    # odometry measurements from ground truth (weak weight: the point factors
    # should do the work), relative pose expressed in frame k
    odo_rot = np.stack([gt_rot[k].T @ gt_rot[k + 1] for k in range(K - 1)])
    odo_t = np.stack([gt_rot[k].T @ (gt_pos[k + 1] - gt_pos[k])
                      for k in range(K - 1)])

    prob = WindowProblem(
        rot=jnp.asarray(rot0, jnp.float32), pos=jnp.asarray(pos0, jnp.float32),
        normal=jnp.asarray(normal, jnp.float32), d=jnp.asarray(d, jnp.float32),
        pts=jnp.asarray(pts), plane_id=jnp.asarray(pid), weight=jnp.asarray(w),
        odo_rot=jnp.asarray(odo_rot, jnp.float32),
        odo_t=jnp.asarray(odo_t, jnp.float32),
        odo_w_rot=jnp.full((K - 1,), 1e2, jnp.float32),
        odo_w_t=jnp.full((K - 1,), 1e2, jnp.float32),
    )
    return prob, gt_rot, gt_pos


class TestTangentBasis:
    def test_orthonormal_and_orthogonal_to_n(self, rng):
        n = rng.normal(size=(64, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        B = np.asarray(plane_tangent_basis(jnp.asarray(n)))
        np.testing.assert_allclose(
            np.einsum("mij,mik->mjk", B, B), np.tile(np.eye(2), (64, 1, 1)),
            atol=1e-5)
        np.testing.assert_allclose(
            np.einsum("mi,mij->mj", n, B), 0.0, atol=1e-5)


class TestSchurSolve:
    def test_matches_dense_joint_solve(self, rng):
        """Schur elimination must reproduce the full (6K+3M) dense solve."""
        K, M = 3, 5
        np_, nl = 6 * K, 3 * M
        # BA-structured SPD system: strong block diagonals, weak pose-plane
        # coupling, zero plane-plane coupling (as in the real problem)
        Ap = rng.normal(size=(np_, np_))
        H = np.zeros((np_ + nl, np_ + nl))
        H[:np_, :np_] = Ap @ Ap.T + 10.0 * np.eye(np_)
        for m in range(M):
            Al = rng.normal(size=(3, 3))
            sl = slice(np_ + 3 * m, np_ + 3 * m + 3)
            H[sl, sl] = Al @ Al.T + 10.0 * np.eye(3)
        C = 0.3 * rng.normal(size=(np_, nl))
        H[:np_, np_:] = C
        H[np_:, :np_] = C.T
        b = rng.normal(size=np_ + nl)
        ref = np.linalg.solve(H, b)

        f32 = jnp.float32
        Hpp = jnp.asarray(H[:np_, :np_], f32)
        Hpl = jnp.asarray(
            H[:np_, np_:].reshape(K, 6, M, 3).transpose(0, 2, 1, 3), f32)
        Hll = jnp.asarray(
            np.stack([H[np_ + 3 * m:np_ + 3 * m + 3,
                        np_ + 3 * m:np_ + 3 * m + 3] for m in range(M)]), f32)
        dp, dl = schur_solve(
            Hpp, Hpl, Hll, jnp.asarray(b[:np_], f32),
            jnp.asarray(b[np_:].reshape(M, 3), f32), damping=0.0)
        np.testing.assert_allclose(np.asarray(dp).reshape(-1), ref[:np_],
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dl).reshape(-1), ref[np_:],
                                   rtol=2e-3, atol=2e-3)


class TestWindowBA:
    def test_recovers_ground_truth_poses(self, rng):
        prob, gt_rot, gt_pos = _make_problem(rng)
        out = jax.jit(lambda p: solve_window(p, iterations=8))(prob)
        pos_err = np.linalg.norm(np.asarray(out["pos"]) - gt_pos, axis=1)
        assert pos_err.max() < 2e-3, pos_err
        for k in range(gt_rot.shape[0]):
            dR = gt_rot[k].T @ np.asarray(out["rot"][k])
            ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
            assert ang < 2e-3

    def test_improves_noisy_planes_too(self, rng):
        """Joint refinement: perturb the plane estimates as well; the Schur
        back-substitution must pull them back toward truth."""
        prob, gt_rot, gt_pos = _make_problem(rng)
        gt_n, gt_d = np.asarray(prob.normal), np.asarray(prob.d)
        noisy_n = gt_n + rng.normal(scale=0.02, size=gt_n.shape)
        noisy_n /= np.linalg.norm(noisy_n, axis=1, keepdims=True)
        prob2 = prob._replace(normal=jnp.asarray(noisy_n, jnp.float32),
                              d=prob.d + 0.02)
        out = jax.jit(lambda p: solve_window(p, iterations=10))(prob2)
        n_err = np.linalg.norm(np.asarray(out["normal"]) - gt_n, axis=1)
        d_err = np.abs(np.asarray(out["d"]) - gt_d)
        assert n_err.max() < 5e-3
        assert d_err.max() < 5e-3
        pos_err = np.linalg.norm(np.asarray(out["pos"]) - gt_pos, axis=1)
        assert pos_err.max() < 5e-3

    def test_fix_planes_pose_graph_mode(self, rng):
        prob, gt_rot, gt_pos = _make_problem(rng)
        out = jax.jit(
            lambda p: solve_window(p, iterations=8, fix_planes=True))(prob)
        np.testing.assert_allclose(np.asarray(out["normal"]),
                                   np.asarray(prob.normal), atol=1e-6)
        pos_err = np.linalg.norm(np.asarray(out["pos"]) - gt_pos, axis=1)
        assert pos_err.max() < 2e-3


class TestDistributedWindowBA:
    def test_matches_single_device(self, rng):
        """8-way point-sharded psum build == single-device build."""
        devs = np.array(jax.devices()[:N_DEV])
        mesh = Mesh(devs, ("dp",))
        prob, _, _ = _make_problem(rng)
        ref = jax.jit(lambda p: solve_window(p, iterations=6))(prob)
        dist = make_dist_window_ba(mesh, iterations=6)(prob)
        np.testing.assert_allclose(np.asarray(dist["pos"]),
                                   np.asarray(ref["pos"]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dist["rot"]),
                                   np.asarray(ref["rot"]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dist["d"]),
                                   np.asarray(ref["d"]), atol=1e-4)


# ---------------------------------------------------------------------------
# Runtime integration (lio/window.py): keyframe selection from the odometry
# stream, landmark extraction from the live VoxelMap, pose feedback.  The
# VERDICT round-1 requirement: BA must be a subsystem, not a solver.
# ---------------------------------------------------------------------------

def _bundle(f, cfg):
    from immesh_tpu.frontend.types import ScanBundle
    return ScanBundle.from_numpy(
        f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr, f.scan_duration,
        cfg.preprocess.max_points, cfg.imu.max_imu_per_scan)


class TestWindowBAIntegration:
    def test_keyframe_gating(self):
        """observe() admits frames only past the motion thresholds."""
        from immesh_tpu.config import PRESETS, BaConfig
        from immesh_tpu.lio.window import WindowBA
        from immesh_tpu.map.voxel_map import VoxelMap

        cfg = PRESETS["sim"]().replace(ba=BaConfig(
            enabled=True, window_size=64, kf_trans_thresh=0.5,
            kf_rot_thresh_deg=10.0, pts_per_keyframe=16))
        ba = WindowBA(cfg)
        vm = VoxelMap.create(cfg.voxel_map)
        scan = np.zeros((32, 3), np.float32)
        mask = np.ones(32, bool)
        eye = np.eye(3, dtype=np.float32)

        ba.observe(eye, np.zeros(3, np.float32), scan, mask, vm)
        assert len(ba.kf_rot) == 1
        # sub-threshold motion: rejected
        ba.observe(eye, np.array([0.3, 0, 0], np.float32), scan, mask, vm)
        assert len(ba.kf_rot) == 1
        # translation past threshold: accepted
        ba.observe(eye, np.array([0.6, 0, 0], np.float32), scan, mask, vm)
        assert len(ba.kf_rot) == 2
        # pure rotation past threshold: accepted
        ba.observe(_rotz(np.radians(15.0)).astype(np.float32),
                   np.array([0.6, 0, 0], np.float32), scan, mask, vm)
        assert len(ba.kf_rot) == 3

    def test_build_window_problem_extracts_live_map_planes(self, rng):
        """Landmarks must be the actual map planes the window's points hit,
        through the same two-level lookup odometry uses."""
        from immesh_tpu.config import PRESETS
        from immesh_tpu.lio.window import build_window_problem
        from immesh_tpu.map.voxel_map import VoxelMap

        cfg = PRESETS["sim"]()
        vm = VoxelMap.create(cfg.voxel_map)
        # populate one well-observed z=0 plane patch
        n_pts = 512
        pts = np.zeros((n_pts, 3), np.float32)
        pts[:, :2] = rng.uniform(0.1, cfg.voxel_map.voxel_size - 0.1,
                                 (n_pts, 2))
        pts[:, 2] = 0.3 + rng.normal(scale=0.003, size=n_pts)
        vm = vm.update(jnp.asarray(pts), jnp.full(n_pts, 1e-4),
                       jnp.ones(n_pts, bool))

        K, Np, M = 3, 64, 8
        kf_pts = jnp.asarray(
            np.tile(pts[:Np][None], (K, 1, 1)), jnp.float32)  # body == world
        eye3 = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (K, 1, 1))
        prob = build_window_problem(
            vm, eye3, jnp.zeros((K, 3), jnp.float32), kf_pts,
            jnp.ones((K, Np), bool),
            jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (K - 1, 1, 1)),
            jnp.zeros((K - 1, 3), jnp.float32), 1e2, 1e2, M)

        w = np.asarray(prob.weight)
        assert w.sum() > 0, "no point matched the live map plane"
        # every weighted point references a landmark whose plane is ~z=0.3
        pid = np.asarray(prob.plane_id)[w > 0]
        normals = np.asarray(prob.normal)[pid]
        ds = np.asarray(prob.d)[pid]
        assert np.all(np.abs(np.abs(normals[:, 2]) - 1.0) < 0.05)
        np.testing.assert_allclose(np.abs(ds), 0.3, atol=0.05)

    @pytest.mark.slow
    def test_localization_mode_ba_reduces_ate(self):
        """End-to-end: prebuilt map + weak filter + recurring disturbances;
        runtime-integrated window BA must reduce ATE vs the same run without
        it.  (Self-mapping drift is unobservable to BA — the map drifts with
        the filter — so localization mode is where feedback provably helps;
        see lio/window.py docstring.)"""
        from immesh_tpu.config import PRESETS, BaConfig, LioConfig
        from immesh_tpu.frontend.sim import LidarImuSimulator
        from immesh_tpu.lio.pipeline import LioPipeline
        from immesh_tpu.runtime.app import ImMeshRuntime

        # phase 1: clean map from the strong filter
        sim = LidarImuSimulator(n_rays=2048, seed=3)
        cfg_map = PRESETS["sim"]()
        pipe = LioPipeline(cfg_map)
        pipe.static_init(*sim.static_imu(100))
        for k in range(30):
            pipe.step(_bundle(sim.frame(k), cfg_map))
        vm_clean = pipe.vm
        R0_true, p0_true = sim.traj.pose(0.0)

        # phase 2: localization replay, handicapped filter, pos kicks
        def run(ba_on):
            sim2 = LidarImuSimulator(n_rays=1024, seed=11)
            cfg = PRESETS["sim"]().replace(
                lio=LioConfig(max_iterations=1, downsample_voxel=2.0,
                              map_update_points=64, update_map=False),
                ba=BaConfig(enabled=ba_on, window_size=5,
                            kf_trans_thresh=0.25, pts_per_keyframe=512,
                            iterations=8, huber_delta=0.3,
                            odo_w_rot=1e2, odo_w_t=1e2))
            rt = ImMeshRuntime(cfg, mesh_enabled=False)
            rt.static_init(*sim2.static_imu(100))
            rt.lio.vm = vm_clean
            R_align = R0_true @ np.asarray(rt.lio.state.rot).T
            kick = np.random.default_rng(0)
            errs = []
            for k in range(40):
                f = sim2.frame(k)
                if k % 10 == 5:  # recurring disturbances
                    rt.lio.state = rt.lio.state.replace(
                        pos=rt.lio.state.pos
                        + jnp.asarray(kick.normal(0, 0.2, 3), jnp.float32))
                rt.process_frame(_bundle(f, cfg), t=k * 0.1)
                est = R_align @ np.asarray(rt.lio.state.pos) + p0_true
                errs.append(np.linalg.norm(est - f.gt_pos))
            rt.close()
            n_ref = rt.ba.n_refinements if rt.ba else 0
            return float(np.sqrt(np.mean(np.square(errs)))), n_ref

        ate_on, n_ref = run(True)
        ate_off, _ = run(False)
        assert n_ref >= 3, "window never filled — gating broken"
        assert ate_on < ate_off, (ate_on, ate_off)


@pytest.mark.slow
@pytest.mark.parametrize("name", [
    "loc_kick0.2_w5", "loc_kick0.4_w8", "loc_kick0.1_w5", "slam_kick0.2_w5"])
def test_ba_scenario_sweep(name):
    """BA evidence per regime (VERDICT r4 item 5): in every bench scenario
    (kick magnitude × window size × localization/full-SLAM), BA-on must not
    be worse than BA-off, and must strictly help under the larger kicks.
    Reproduces bench.py's ba_ab_table rows."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    kw = dict(bench.BA_SCENARIOS[name])
    ate_off, ate_on = bench.run_ba_scenario(n_frames=40, **kw)
    # "not worse" with a 5% tolerance band for the smallest-kick regime
    # (where BA may correctly abstain); strict improvement where the kick
    # dominates the error budget
    if kw.get("kick_mag", 0.2) >= 0.2:
        assert ate_on < ate_off, (name, ate_on, ate_off)
    else:
        assert ate_on <= 1.05 * ate_off, (name, ate_on, ate_off)
