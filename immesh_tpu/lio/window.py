"""Runtime bridge: live VoxelMap + LIO trajectory → sliding-window plane BA.

The solver (dist/window_ba.py) is a pure function of a `WindowProblem`; this
module makes it a SUBSYSTEM (VERDICT.md round-1 item 5): keyframe selection
from the odometry stream, extraction of the touched plane landmarks out of the
live probabilistic voxel map, and feedback of the refined pose into the
running ESIKF.  The reference has no equivalent — it bounds its working set
instead of refining it (SURVEY.md §5 long-context) — so this is the
BASELINE.md north-star subsystem, all new design.

Flow per window:
  1. `observe(rot, pos, world_scan, mask)` each frame — gates keyframes by
     relative motion (translation / rotation thresholds, the usual SLAM
     keyframe policy) and stores a fixed-size body-frame point subset;
  2. when the window fills, `build_window_problem` (jitted) re-associates
     every stored keyframe point against the CURRENT map planes
     (vm.query_planes — same two-level lookup the odometry uses), collapses
     the touched plane set to ≤max_planes landmarks, and assembles odometry
     factors from the LIO's relative poses;
  3. `solve_window` Gauss-Newton (optionally sharded over chips via
     make_dist_window_ba) refines poses + planes;
  4. the last keyframe's world-frame correction ΔT = T_ref ∘ T_odo⁻¹ is
     returned for the caller to left-apply to the live filter state, and the
     refined last keyframe seeds the next window (overlap of one).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from immesh_tpu.config import ImMeshConfig
from immesh_tpu.dist.window_ba import WindowProblem, solve_window
from immesh_tpu.map.voxel_map import VoxelMap

_SENT = jnp.int32(1 << 30)


@functools.partial(jax.jit, static_argnames=("max_planes",))
def build_window_problem(vm: VoxelMap, rot: jnp.ndarray, pos: jnp.ndarray,
                         pts: jnp.ndarray, mask: jnp.ndarray,
                         odo_rot: jnp.ndarray, odo_t: jnp.ndarray,
                         w_rot: float, w_t: float,
                         max_planes: int) -> WindowProblem:
    """Assemble a WindowProblem from the live map.

    rot (K,3,3), pos (K,3): keyframe poses (the linearization points).
    pts (K,Np,3), mask (K,Np): stored body-frame keyframe points.
    odo_rot (K-1,3,3), odo_t (K-1,3): measured LIO relative poses.

    Landmarks are the ≤max_planes distinct map planes hit by the window's
    points through the same two-level lookup odometry uses
    (map/voxel_map.py:query_planes); points whose voxel has no plane get
    weight 0 (they pad the factor set, exactly like the reference's
    non-matched points drop out of lio_state_estimation).
    """
    K, Np, _ = pts.shape
    q = jnp.einsum("kij,kpj->kpi", rot, pts) + pos[:, None, :]
    res = vm.query_planes(q.reshape(K * Np, 3))
    found = res["found"] & mask.reshape(-1)

    slot = jnp.where(found, res["slot"], _SENT)
    uniq = jnp.unique(slot, size=max_planes, fill_value=_SENT)
    lid = jnp.searchsorted(uniq, slot).astype(jnp.int32)
    ok = found & (uniq[jnp.clip(lid, 0, max_planes - 1)] == slot)
    plane_id = jnp.clip(lid, 0, max_planes - 1).reshape(K, Np)
    weight = ok.astype(pts.dtype).reshape(K, Np)

    uvalid = uniq != _SENT
    us = jnp.where(uvalid, uniq, 0)
    normal = vm.normal[us]
    d = jnp.where(uvalid, vm.d[us], 0.0)

    Km1 = K - 1
    return WindowProblem(
        rot=rot, pos=pos, normal=normal, d=d, pts=pts,
        plane_id=plane_id, weight=weight,
        odo_rot=odo_rot, odo_t=odo_t,
        odo_w_rot=jnp.full((Km1,), w_rot, pts.dtype),
        odo_w_t=jnp.full((Km1,), w_t, pts.dtype),
    )


class WindowBA:
    """Host-side keyframe window manager around the distributed BA solver."""

    def __init__(self, cfg: ImMeshConfig, solver=None):
        """`solver`: optional replacement for the single-device
        `solve_window` (e.g. the shard_map'd one from make_dist_window_ba)."""
        self.cfg = cfg
        self.bc = cfg.ba
        self._solver = solver
        self.kf_rot: list = []
        self.kf_pos: list = []
        self.kf_pts: list = []
        self.kf_mask: list = []
        self.n_refinements = 0
        self.last_cost = None

    # ------------------------------------------------------------------
    def _is_keyframe(self, rot: np.ndarray, pos: np.ndarray) -> bool:
        if not self.kf_rot:
            return True
        dp = np.linalg.norm(pos - self.kf_pos[-1])
        dR = self.kf_rot[-1].T @ rot
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        return (dp > self.bc.kf_trans_thresh
                or ang > self.bc.kf_rot_thresh_deg)

    def _sample_points(self, world_scan, mask, rot, pos):
        """Fixed-size body-frame subset of the frame's valid points."""
        Np = self.bc.pts_per_keyframe
        world = np.asarray(world_scan)
        m = np.asarray(mask)
        idx = np.nonzero(m)[0]
        if idx.size == 0:
            return np.zeros((Np, 3), np.float32), np.zeros(Np, bool)
        stride = max(1, idx.size // Np)
        sel = idx[::stride][:Np]
        body = (world[sel] - pos) @ rot  # R.T applied from the right
        out = np.zeros((Np, 3), np.float32)
        ok = np.zeros(Np, bool)
        out[:len(sel)] = body
        ok[:len(sel)] = True
        return out, ok

    # ------------------------------------------------------------------
    def observe(self, rot, pos, world_scan, mask,
                vm: VoxelMap) -> Optional[dict]:
        """Feed one frame's posterior pose + world scan.  Returns the window
        correction dict once per filled window, else None."""
        rot = np.asarray(rot)
        pos = np.asarray(pos)
        if not self._is_keyframe(rot, pos):
            return None
        pts, pmask = self._sample_points(world_scan, mask, rot, pos)
        self.kf_rot.append(rot)
        self.kf_pos.append(pos)
        self.kf_pts.append(pts)
        self.kf_mask.append(pmask)
        if len(self.kf_rot) < self.bc.window_size:
            return None
        return self.refine(vm)

    def refine(self, vm: VoxelMap) -> dict:
        """Solve the current window; slide it; return the feedback dict:
        {"d_rot": ΔR (3,3), "d_pos": Δt (3,), "cost": scalar} with
        ΔT = T_refined[-1] ∘ T_odometry[-1]⁻¹ (world-frame left correction)."""
        bc = self.bc
        K = len(self.kf_rot)
        rot = jnp.asarray(np.stack(self.kf_rot), jnp.float32)
        pos = jnp.asarray(np.stack(self.kf_pos), jnp.float32)
        pts = jnp.asarray(np.stack(self.kf_pts), jnp.float32)
        mask = jnp.asarray(np.stack(self.kf_mask))
        # measured LIO relative poses between consecutive keyframes
        R_np = np.stack(self.kf_rot)
        p_np = np.stack(self.kf_pos)
        odo_rot = jnp.asarray(
            np.einsum("kji,kjl->kil", R_np[:-1], R_np[1:]), jnp.float32)
        odo_t = jnp.asarray(
            np.einsum("kji,kj->ki", R_np[:-1], p_np[1:] - p_np[:-1]),
            jnp.float32)

        prob = build_window_problem(
            vm, rot, pos, pts, mask, odo_rot, odo_t,
            bc.odo_w_rot, bc.odo_w_t, bc.max_planes)
        solver = self._solver or functools.partial(
            _solve_jit, iterations=bc.iterations, huber_delta=bc.huber_delta)
        sol = solver(prob)

        R_ref = np.asarray(sol["rot"][-1])
        p_ref = np.asarray(sol["pos"][-1])
        d_rot = R_ref @ R_np[-1].T
        d_pos = p_ref - d_rot @ p_np[-1]
        self.n_refinements += 1
        self.last_cost = float(sol["cost"])

        # slide: the REFINED last keyframe anchors the next window
        self.kf_rot = [R_ref]
        self.kf_pos = [p_ref]
        self.kf_pts = [self.kf_pts[-1]]
        self.kf_mask = [self.kf_mask[-1]]
        return {"d_rot": d_rot, "d_pos": d_pos, "cost": self.last_cost,
                "rot": np.asarray(sol["rot"]), "pos": np.asarray(sol["pos"])}


@functools.partial(jax.jit, static_argnames=("iterations",))
def _solve_jit(prob: WindowProblem, iterations: int = 4,
               huber_delta: float = 0.5):
    return solve_window(prob, iterations=iterations, huber_delta=huber_delta)
