"""Iterated ESIKF measurement update — the LIO core, one fused jit program.

Re-design of `lio_state_estimation` (reference src/voxel_mapping.cpp:1284-1652):
the reference's per-iteration OpenMP association + Eigen solve becomes a
static `lax.fori_loop` of {batched associate → information-form accumulation →
18×18 solve → manifold ⊞}, with converged iterations masked to no-ops
(the reference's early break + rematch flags, :1619-1650, replaced by
branch-free masking so the program has one static shape).

Information form (algebraically identical to the reference's
K₁=(HᵀR⁻¹H+P⁻¹)⁻¹ update, :1585-1606):
    A  = HᵀR⁻¹H + P⁻¹            (18×18; H touches only [δθ, δp])
    δ  = A⁻¹ (HᵀR⁻¹(−z) + P⁻¹·(x_prop ⊟ x))
    x ← x ⊞ δ,   and at convergence  P⁺ = A⁻¹
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from immesh_tpu.config import LioConfig, VoxelMapConfig
from immesh_tpu.core.state import EsikfState, STATE_DIM
from immesh_tpu.lio.association import associate
from immesh_tpu.map.voxel_map import VoxelMap


def lio_update(state_prop: EsikfState, vm: VoxelMap, pts_body: jnp.ndarray,
               point_cov_body: jnp.ndarray, mask: jnp.ndarray,
               lio_cfg: LioConfig, map_cfg: VoxelMapConfig
               ) -> Tuple[EsikfState, dict]:
    """Iterated measurement update against the plane map.

    Args:
      state_prop: IMU-propagated prior (mean + covariance).
      pts_body: (N, 3) deskewed scan in the scan-end body frame.
      point_cov_body: (N, 3, 3) per-point measurement covariance.
      mask: (N,) validity.

    Returns (posterior state, diagnostics dict).
    """
    dtype = pts_body.dtype
    p_inv = jnp.linalg.inv(
        state_prop.cov + jnp.eye(STATE_DIM, dtype=dtype) * 1e-9
    )
    rot_thresh = jnp.asarray(lio_cfg.converge_rot_deg * jnp.pi / 180.0, dtype)
    trans_thresh = jnp.asarray(lio_cfg.converge_trans_m, dtype)

    def cond(carry):
        # early device exit on convergence — the former fori_loop masked
        # converged iterations to no-ops but still PAID their association
        # (the single most expensive per-iteration op, ~4-5 ms at KITTI
        # scale); a while_loop with the same convergence predicate computes
        # the identical posterior and skips the dead work
        it, state, converged, n_eff, A_last = carry
        return (it < lio_cfg.max_iterations) & ~converged

    def body(carry):
        it, state, converged, n_eff, A_last = carry

        assoc = associate(state, vm, pts_body, point_cov_body, mask, map_cfg)
        h6, z, r_inv = assoc["h6"], assoc["z"], assoc["r_inv"]

        # HᵀR⁻¹H (6×6) and HᵀR⁻¹(−z) (6,) as one fused reduction
        hw = h6 * r_inv[:, None]
        HtRH6 = hw.T @ h6
        HtRz6 = hw.T @ (-z)

        A = p_inv.at[0:6, 0:6].add(HtRH6)
        b = (p_inv @ state_prop.boxminus(state)).at[0:6].add(HtRz6)
        delta = jax.lax.linalg.cholesky(A + jnp.eye(STATE_DIM, dtype=dtype) * 1e-9)
        delta = jax.scipy.linalg.cho_solve((delta, True), b)

        state = state.boxplus(delta)
        # convergence on the pose increment (reference :1619-1622)
        step_rot = jnp.linalg.norm(delta[0:3])
        step_trans = jnp.linalg.norm(delta[3:6])
        now_conv = (step_rot < rot_thresh) & (step_trans < trans_thresh)
        return (it + 1, state, now_conv, jnp.sum(assoc["valid"]), A)

    init = (
        jnp.asarray(0, jnp.int32),
        state_prop,
        jnp.asarray(False),
        jnp.asarray(0, jnp.int32),
        p_inv,  # if zero matches, posterior = prior
    )
    _, state, converged, n_eff, A_last = jax.lax.while_loop(cond, body, init)

    # posterior covariance P⁺ = A⁻¹ (= (I−KH)P in gain form)
    cov_post = jnp.linalg.inv(A_last + jnp.eye(STATE_DIM, dtype=dtype) * 1e-9)
    cov_post = 0.5 * (cov_post + cov_post.T)
    state = state.replace(cov=cov_post)

    diag = {"converged": converged, "n_effective": n_eff}
    return state, diag
