"""Sliding-window pose-graph refinement with a distributed Schur complement.

The reference has NO global refinement: it bounds its working set instead of
scaling it (SURVEY.md §5 "long-context" — sliding local-map cube with box
deletes, reference voxel_mapping_common.cpp:214-288; voxel freeze at capacity,
voxel_loc.cpp:243-248).  BASELINE.md's north star maps "sequence scaling" onto
**keyframe-window partitioning across chips + distributed Schur-complement
bundle adjustment** — this module is that subsystem, all new design.

Problem.  A window of K keyframe poses {R_k, t_k} jointly refined against
M plane landmarks {n_m, d_m} (the planes of map/voxel_map touched by the
window), tied together by

  * point-to-plane factors   r = n_mᵀ (R_k p + t_k) + d_m     (one per point)
  * odometry factors between consecutive keyframes (from the LIO's relative
    poses, small-angle Jacobians)
  * a gauge prior anchoring keyframe 0.

Gauss-Newton normal equations in block form

      [ Hpp  Hpl ] [δx_p]   [b_p]
      [ Hplᵀ Hll ] [δx_l] = [b_l]

with Hll block-diagonal (3×3 per plane — planes touch many poses but poses
couple only THROUGH planes).  The plane block is eliminated by the Schur
complement  S = Hpp − Hpl Hll⁻¹ Hplᵀ,  δx_p from the (6K×6K) reduced system,
δx_l by back-substitution.  This is the classic reduced-camera-system BA,
specialized to plane landmarks.

Distribution (the TPU-native part).  The factor axis — points — is sharded
over the device mesh with `shard_map`.  Every chip builds the Gauss-Newton
blocks for ITS point shard only; the blocks are reduced with `jax.lax.psum`
over ICI; the (tiny) Schur solve runs replicated.  Communication per GN
iteration is exactly one psum of {Hpp(K,6,6), Hpl(K,M,6,3), Hll(M,3,3),
b_p(K,6), b_l(M,3), cost} — independent of the number of points, so scaling
efficiency is bounded only by the factor-build FLOPs, which are embarrassingly
parallel.

Plane parameterization: local tangent δ = (δu∈R², δd) with
n ← Exp([B(n)δu]ˣ) n  (B = any orthonormal basis of n's tangent plane) and
d ← d + δd — 3 DoF, no unit-norm constraint, no singularity.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from immesh_tpu.core import so3


class WindowProblem(NamedTuple):
    """A keyframe window, static shapes throughout.

    K keyframes, M plane landmarks, Np points per keyframe (padded).
    """

    rot: jnp.ndarray        # (K, 3, 3) world←body initial poses
    pos: jnp.ndarray        # (K, 3)
    normal: jnp.ndarray     # (M, 3) unit plane normals (world)
    d: jnp.ndarray          # (M,) plane offsets: n·x + d = 0
    pts: jnp.ndarray        # (K, Np, 3) body-frame points
    plane_id: jnp.ndarray   # (K, Np) int32 landmark index per point
    weight: jnp.ndarray     # (K, Np) information weight (0 = padded/invalid)
    # odometry measurements between keyframe k and k+1 (K-1 of them)
    odo_rot: jnp.ndarray    # (K-1, 3, 3) measured R_kᵀ R_{k+1}
    odo_t: jnp.ndarray      # (K-1, 3)   measured R_kᵀ (t_{k+1} − t_k)
    odo_w_rot: jnp.ndarray  # (K-1,) rotation information weights
    odo_w_t: jnp.ndarray    # (K-1,) translation information weights


def plane_tangent_basis(n: jnp.ndarray) -> jnp.ndarray:
    """(…,3) unit normal → (…,3,2) orthonormal tangent basis, branch-free."""
    # pick the world axis least aligned with n, Gram-Schmidt the other two
    a = jnp.where(jnp.abs(n[..., 0:1]) < 0.9,
                  jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape),
                  jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape))
    b1 = jnp.cross(n, a)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True), 1e-12)
    b2 = jnp.cross(n, b1)
    return jnp.stack([b1, b2], axis=-1)


def _point_factor_blocks(rot, pos, normal, d, pts, plane_id, weight,
                         huber_delta: float):
    """GN blocks from this shard's point-to-plane factors.

    Shapes: pts (K, P, 3) — P is the LOCAL shard width.  Returns dense
    {Hpp (K,6,6), Hpl (K,M,6,3), Hll (M,3,3), bp (K,6), bl (M,3), cost}.
    """
    K, Pl, _ = pts.shape
    M = normal.shape[0]

    n = normal[plane_id]                       # (K,P,3)
    dd = d[plane_id]                           # (K,P)
    q = jnp.einsum("kij,kpj->kpi", rot, pts) + pos[:, None, :]   # world pts
    r = jnp.sum(n * q, axis=-1) + dd           # (K,P) residuals

    # Huber: scale the weight, keeps the system PSD (IRLS form)
    absr = jnp.abs(r)
    w = weight * jnp.where(absr <= huber_delta, 1.0,
                           huber_delta / jnp.maximum(absr, 1e-12))

    # pose Jacobian rows [∂r/∂δθ, ∂r/∂δp] = [-nᵀ R [p]ˣ, nᵀ]  (right perturb,
    # same convention as lio/association.py)
    Rp_hat = so3.hat(pts)                      # (K,P,3,3)
    j_rot = -jnp.einsum("kpi,kij,kpjl->kpl", n, rot, Rp_hat)
    Jp = jnp.concatenate([j_rot, n], axis=-1)  # (K,P,6)

    # plane Jacobian rows [∂r/∂δu, ∂r/∂δd]: δn = −[n]ˣ B δu ⇒ ∂r/∂δu = −qᵀ[n]ˣB
    B = plane_tangent_basis(n)                 # (K,P,3,2)
    j_u = -jnp.einsum("kpi,kpij,kpjl->kpl", q, so3.hat(n), B)
    Jl = jnp.concatenate([j_u, jnp.ones_like(r)[..., None]], axis=-1)  # (K,P,3)

    Hpp = jnp.einsum("kpi,kpj,kp->kij", Jp, Jp, w)               # (K,6,6)
    bp = -jnp.einsum("kpi,kp->ki", Jp, w * r)                    # (K,6)

    # per-(k, m) coupling blocks via segment-sum over the flattened factor list
    flat_seg = (jnp.arange(K, dtype=jnp.int32)[:, None] * M
                + plane_id).reshape(-1)                          # (K·P,)
    JpJl = jnp.einsum("kpi,kpj,kp->kpij", Jp, Jl, w).reshape(K * Pl, 6, 3)
    Hpl = jax.ops.segment_sum(JpJl, flat_seg, num_segments=K * M)
    Hpl = Hpl.reshape(K, M, 6, 3)

    seg_m = plane_id.reshape(-1)
    JlJl = jnp.einsum("kpi,kpj,kp->kpij", Jl, Jl, w).reshape(K * Pl, 3, 3)
    Hll = jax.ops.segment_sum(JlJl, seg_m, num_segments=M)       # (M,3,3)
    bl = -jax.ops.segment_sum(
        (Jl * (w * r)[..., None]).reshape(K * Pl, 3), seg_m, num_segments=M)

    cost = jnp.sum(w * r * r)
    return {"Hpp": Hpp, "Hpl": Hpl, "Hll": Hll, "bp": bp, "bl": bl,
            "cost": cost}


def _odometry_blocks(rot, pos, prob: WindowProblem, anchor_rot, anchor_pos,
                     gauge_weight: float):
    """Replicated small factors: odometry chain + gauge prior on keyframe 0.

    Returns the dense (6K,6K) addition to the pose system and its (6K,) rhs.
    Small-angle Jacobians (residual is near zero at the linearization point):
      r_rot = Log(dR̂ᵀ R_kᵀ R_{k+1}):  ∂/∂δθ_k ≈ −dR̂ᵀ,  ∂/∂δθ_{k+1} ≈ I
      r_t   = R_kᵀ(t_{k+1}−t_k) − dt̂: ∂/∂δθ_k = [R_kᵀΔt]ˣ,
                                        ∂/∂t_k = −R_kᵀ, ∂/∂t_{k+1} = R_kᵀ
    """
    K = rot.shape[0]
    dtype = rot.dtype
    H = jnp.zeros((K * 6, K * 6), dtype)
    b = jnp.zeros((K * 6,), dtype)

    def add_factor(carry, k):
        H, b = carry
        Rk, Rk1 = rot[k], rot[k + 1]
        dt_w = pos[k + 1] - pos[k]
        r_rot = so3.log(prob.odo_rot[k].T @ (Rk.T @ Rk1))
        r_t = Rk.T @ dt_w - prob.odo_t[k]

        # J blocks into the 12-dim [δθ_k, δp_k, δθ_{k+1}, δp_{k+1}] sub-state
        Z = jnp.zeros((3, 3), dtype)
        J_rot = jnp.concatenate(
            [-prob.odo_rot[k].T, Z, jnp.eye(3, dtype=dtype), Z], axis=1)
        J_t = jnp.concatenate(
            [so3.hat(Rk.T @ dt_w), -Rk.T, Z, Rk.T], axis=1)
        J = jnp.concatenate([J_rot, J_t], axis=0)          # (6,12)
        W = jnp.concatenate([jnp.full((3,), prob.odo_w_rot[k], dtype),
                             jnp.full((3,), prob.odo_w_t[k], dtype)])
        JW = J * W[:, None]
        H12 = JW.T @ J                                      # (12,12)
        b12 = -JW.T @ jnp.concatenate([r_rot, r_t])
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (k * 6, k * 6), (12, 12)) + H12,
            (k * 6, k * 6))
        b = jax.lax.dynamic_update_slice(
            b, jax.lax.dynamic_slice(b, (k * 6,), (12,)) + b12, (k * 6,))
        return (H, b), None

    (H, b), _ = jax.lax.scan(add_factor, (H, b), jnp.arange(K - 1))

    # gauge prior: keyframe 0 stays at its anchor (the window's entry pose)
    r0 = jnp.concatenate([so3.log(anchor_rot.T @ rot[0]), pos[0] - anchor_pos])
    H = H.at[0:6, 0:6].add(gauge_weight * jnp.eye(6, dtype=dtype))
    b = b.at[0:6].add(-gauge_weight * r0)
    return H, b


def schur_solve(Hpp_full: jnp.ndarray, Hpl: jnp.ndarray, Hll: jnp.ndarray,
                bp: jnp.ndarray, bl: jnp.ndarray,
                damping: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eliminate the plane block; solve the reduced pose system.

    Hpp_full (6K,6K) dense, Hpl (K,M,6,3), Hll (M,3,3), bp (6K,), bl (M,3).
    Returns (δ_pose (K,6), δ_plane (M,3)).
    """
    K, M = Hpl.shape[0], Hpl.shape[1]
    dtype = Hpp_full.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    Hll_inv = jnp.linalg.inv(Hll + damping * eye3)          # batched (M,3,3)

    Hpl_f = jnp.transpose(Hpl, (0, 2, 1, 3)).reshape(K * 6, M, 3)
    # S = Hpp − Hpl Hll⁻¹ Hplᵀ ; bs = bp − Hpl Hll⁻¹ bl      (MXU-friendly)
    T = jnp.einsum("amx,mxy->amy", Hpl_f, Hll_inv)          # (6K,M,3)
    S = Hpp_full - jnp.einsum("amx,bmx->ab", T, Hpl_f)
    bs = bp - jnp.einsum("amx,mx->a", T, bl)

    S = S + damping * jnp.eye(K * 6, dtype=dtype)
    chol = jax.lax.linalg.cholesky(S)
    dp = jax.scipy.linalg.cho_solve((chol, True), bs)       # (6K,)

    # back-substitute: δl = Hll⁻¹ (bl − Hplᵀ δp)
    rhs_l = bl - jnp.einsum("amx,a->mx", Hpl_f, dp)
    dl = jnp.einsum("mxy,my->mx", Hll_inv, rhs_l)
    return dp.reshape(K, 6), dl


def _retract(rot, pos, normal, d, dp, dl):
    rot = jnp.einsum("kij,kjl->kil", rot, so3.exp(dp[:, 0:3]))
    pos = pos + dp[:, 3:6]
    B = plane_tangent_basis(normal)                          # (M,3,2)
    axis = jnp.einsum("mij,mj->mi", B, dl[:, 0:2])
    normal = jnp.einsum("mij,mj->mi", so3.exp(axis), normal)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12)
    d = d + dl[:, 2]
    return rot, pos, normal, d


def _gn_iteration(rot, pos, normal, d, prob: WindowProblem,
                  anchor_rot, anchor_pos, huber_delta, gauge_weight,
                  damping, plane_prior, fix_planes, axis):
    blocks = _point_factor_blocks(rot, pos, normal, d, prob.pts,
                                  prob.plane_id, prob.weight, huber_delta)
    if axis is not None:
        blocks = jax.lax.psum(blocks, axis)                  # ← ICI reduction

    K, M = blocks["Hpl"].shape[0], blocks["Hpl"].shape[1]
    H_odo, b_odo = _odometry_blocks(rot, pos, prob, anchor_rot, anchor_pos,
                                    gauge_weight)
    Hpp_full = H_odo + jax.scipy.linalg.block_diag(
        *[blocks["Hpp"][k] for k in range(K)])
    bp_full = b_odo + blocks["bp"].reshape(K * 6)

    # Plane prior: landmarks come from the live map where they were fitted
    # from far more points than this window sees, so a zero-mean prior on
    # their tangent increment is statistically justified — and it is also
    # what keeps the Schur complement PSD in f32 when a window plane has <3
    # supporting points (rank-deficient 3×3 block ⇒ unbounded Hll⁻¹).
    # fix_planes (pure pose-graph mode) = the same prior taken to ∞.
    Hll = blocks["Hll"] + (
        plane_prior + jnp.where(fix_planes, 1e12, 0.0)
    ) * jnp.eye(3, dtype=rot.dtype)
    dp, dl = schur_solve(Hpp_full, blocks["Hpl"], Hll, bp_full, blocks["bl"],
                         damping)
    dl = jnp.where(fix_planes, 0.0, dl)
    rot, pos, normal, d = _retract(rot, pos, normal, d, dp, dl)
    return rot, pos, normal, d, blocks["cost"], jnp.linalg.norm(dp)


def solve_window(prob: WindowProblem, *, iterations: int = 6,
                 huber_delta: float = 0.5, gauge_weight: float = 1e8,
                 damping: float = 1e-6, plane_prior: float = 10.0,
                 fix_planes: bool = False,
                 axis: str | None = None) -> Dict[str, jnp.ndarray]:
    """Run Gauss-Newton on the window.  Jittable; pass `axis` when called
    inside shard_map (points sharded over that axis) for the distributed
    psum-reduced build."""
    anchor_rot, anchor_pos = prob.rot[0], prob.pos[0]
    fix = jnp.asarray(fix_planes)

    def body(_, carry):
        rot, pos, normal, d, _, _ = carry
        return _gn_iteration(rot, pos, normal, d, prob, anchor_rot,
                             anchor_pos, huber_delta, gauge_weight,
                             damping, plane_prior, fix, axis)

    init = (prob.rot, prob.pos, prob.normal, prob.d,
            jnp.asarray(0.0, prob.rot.dtype), jnp.asarray(0.0, prob.rot.dtype))
    rot, pos, normal, d, cost, step = jax.lax.fori_loop(
        0, iterations, body, init)
    return {"rot": rot, "pos": pos, "normal": normal, "d": d,
            "cost": cost, "last_step_norm": step}


def make_dist_window_ba(mesh: Mesh, *, axis: str = "dp", **solve_kw):
    """Build the multi-chip window-BA solver.

    The point axis of `prob.pts/plane_id/weight` is sharded over `axis`;
    poses, planes, and odometry factors are replicated.  Each chip builds GN
    blocks for its shard; one psum per iteration reduces them; the Schur
    solve is replicated (6K×6K — trivia next to the factor build).
    """
    in_specs = WindowProblem(
        rot=P(), pos=P(), normal=P(), d=P(),
        pts=P(None, axis, None), plane_id=P(None, axis),
        weight=P(None, axis),
        odo_rot=P(), odo_t=P(), odo_w_rot=P(), odo_w_t=P(),
    )
    body = functools.partial(solve_window, axis=axis, **solve_kw)
    sharded = shard_map(body, mesh=mesh, in_specs=(in_specs,),
                        out_specs=P(), check_vma=False)
    return jax.jit(sharded)
