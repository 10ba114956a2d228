"""Batched geometric primitives: analytic symmetric-3×3 eigendecomposition and
probabilistic plane fitting from running moments.

Replaces the reference's per-voxel Eigen::SelfAdjointEigenSolver plane fits
(reference src/voxel_loc.cpp:47-139 `init_plane` and :310-368 `updatePlane`)
with one vectorized closed-form eigensolve over every voxel simultaneously —
no per-voxel loops, no stored point lists.

Plane-uncertainty model.  The reference propagates each point's full 3×3
covariance through the eigenvector derivative (voxel_loc.cpp:79-107,
J = U·F per point, Σ_plane = Σᵢ JᵢΣᵢJᵢᵀ).  Storing every point per voxel to do
that is hostile to an SoA map, so we contract the same first-order series
under an isotropic per-point noise σ̄² (the running mean of tr(Σ_point)/3),
which collapses to the closed form (derivation in docs/plane_cov.md):

    Σ_normal = σ̄² · Σ_{m≠min} (λ_m + λ_min) / (N·(λ_m − λ_min)²) · u_m u_mᵀ
    Σ_center = σ̄²/N · I,   cross terms vanish exactly.

This keeps the probabilistic gate (voxel_mapping.cpp:264-269) and the ESIKF
measurement noise faithful in spirit with O(1) per-voxel state.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def eigh3x3(A: jnp.ndarray):
    """Analytic eigendecomposition of symmetric (..., 3, 3) matrices.

    Returns (eigvals, eigvecs) with eigvals ascending, eigvecs[..., :, k] the
    unit eigenvector for eigvals[..., k].  Trigonometric (Smith) eigenvalues +
    robust row-cross eigenvectors; fully branch-free for TPU.
    """
    dtype = A.dtype
    a00, a11, a22 = A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))

    # r = det(B)/2 with B = (A - qI)/p
    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_max - lam_min

    # near-scalar matrices (p2≈0): all eigenvalues = q
    scalar = p2 < 1e-10 * jnp.maximum(q * q, 1.0)
    lam_min = jnp.where(scalar, q, lam_min)
    lam_mid = jnp.where(scalar, q, lam_mid)
    lam_max = jnp.where(scalar, q, lam_max)

    def eigvec_for(lam):
        # rows of (A - λI)
        r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
        r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
        r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1)
        n02 = jnp.sum(c02 * c02, axis=-1)
        n12 = jnp.sum(c12 * c12, axis=-1)
        # pick the largest-magnitude cross product (branch-free)
        best12 = (n12 >= n01) & (n12 >= n02)
        best02 = (n02 >= n01) & ~best12
        v = jnp.where(best12[..., None], c12, jnp.where(best02[..., None], c02, c01))
        # EXACT normalization: clamping the norm to sqrt(_EPS) returned
        # short "unit" vectors (0.37·unit observed) for doubly-degenerate
        # covariances (λ_min ≈ λ_mid ⇒ tiny cross products) — the direction
        # of a tiny cross product is still a deterministic eigvec choice.
        # Only the exactly-zero case falls back to a fixed axis.
        nrm2 = jnp.sum(v * v, axis=-1, keepdims=True)
        unit = v / jnp.sqrt(jnp.where(nrm2 > 0, nrm2, 1.0))
        fallback = jnp.zeros_like(v).at[..., 0].set(1.0)
        return jnp.where(nrm2 > 0, unit, fallback)

    v_min = eigvec_for(lam_min)
    v_max = eigvec_for(lam_max)
    # orthonormalize: protect against degenerate (repeated-eigenvalue) cases
    v_max = v_max - jnp.sum(v_max * v_min, axis=-1, keepdims=True) * v_min
    vmn = jnp.sqrt(jnp.maximum(jnp.sum(v_max * v_max, axis=-1, keepdims=True), _EPS))
    # fallback basis when v_max collapsed onto v_min
    alt = jnp.cross(v_min, jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype), v_min.shape))
    alt2 = jnp.cross(v_min, jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], dtype), v_min.shape))
    alt = jnp.where(
        (jnp.sum(alt * alt, axis=-1, keepdims=True) > 1e-6), alt, alt2
    )
    alt = alt / jnp.sqrt(jnp.maximum(jnp.sum(alt * alt, axis=-1, keepdims=True), _EPS))
    collapsed = vmn[..., 0] < 1e-5
    v_max = jnp.where(collapsed[..., None], alt, v_max / vmn)
    v_mid = jnp.cross(v_min, v_max)

    # handle fully-scalar case: identity basis
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), A.shape)
    vecs = jnp.stack([v_min, v_mid, v_max], axis=-1)  # columns = ascending
    vecs = jnp.where(scalar[..., None, None], eye, vecs)

    vals = jnp.stack([lam_min, lam_mid, lam_max], axis=-1)
    return vals, vecs


def plane_from_moments(sum_p: jnp.ndarray, sum_ppT: jnp.ndarray, count: jnp.ndarray,
                       sigma2_mean: jnp.ndarray, min_count: int = 5,
                       anchor: jnp.ndarray = None):
    """Fit planes from per-voxel running moments, batched over voxels.

    Args:
      sum_p:       (..., 3)     Σ (pᵢ − anchor)
      sum_ppT:     (..., 3, 3)  Σ (pᵢ − anchor)(pᵢ − anchor)ᵀ
      count:       (...,)       N (float or int)
      sigma2_mean: (...,)       running mean of per-point isotropic noise σ̄²
      min_count:   minimum N for a valid fit (ref layer_init_size[0]=5)
      anchor:      (..., 3) per-voxel accumulation anchor, or None (= 0).
                   Moments MUST be accumulated anchored at world scale: with
                   raw coordinates |p| ≈ 100 m, Σppᵀ/N − μμᵀ cancels to f32
                   noise (~1e-3 m²) — larger than a thin plane's λ_min — and
                   eigh3x3's eigenvector cross-products collapse (observed
                   non-unit normals at 0.37·unit).  Anchored at the voxel
                   center, coordinates are O(voxel_size) where f32 is exact.

    Returns dict of per-voxel plane arrays:
      normal (...,3), d (...,), center (...,3), lam (...,3 ascending),
      cov_nn (...,3,3) normal covariance, var_c (...,) center variance,
      valid (...,) bool — N≥min_count.
    Planarity (λ_min < threshold) is judged by the caller; `lam` is returned
    raw so callers can apply the reference's `min_eigen_value` gate
    (voxel_loc.cpp:47-139) or subdivide.
    """
    n = jnp.maximum(count.astype(sum_p.dtype), 1.0)
    mean = sum_p / n[..., None]
    cov = sum_ppT / n[..., None, None] - mean[..., :, None] * mean[..., None, :]
    # symmetrize against accumulation drift
    cov = 0.5 * (cov + jnp.swapaxes(cov, -1, -2))
    lam, vecs = eigh3x3(cov)
    normal = vecs[..., :, 0]  # min-eigenvalue column
    if anchor is not None:
        mean = mean + anchor
    d = -jnp.sum(normal * mean, axis=-1)

    # closed-form normal covariance (see module docstring)
    lam_min = lam[..., 0]
    contrib = []
    for m in (1, 2):
        dlam = jnp.maximum(lam[..., m] - lam_min, 1e-8)
        w = sigma2_mean * (lam[..., m] + lam_min) / (n * dlam * dlam)
        u = vecs[..., :, m]
        contrib.append(w[..., None, None] * u[..., :, None] * u[..., None, :])
    cov_nn = contrib[0] + contrib[1]
    var_c = sigma2_mean / n

    valid = count >= min_count
    return {
        "normal": normal,
        "d": d,
        "center": mean,
        "lam": lam,
        "cov_nn": cov_nn,
        "var_c": var_c,
        "valid": valid,
    }


def point_to_plane_sigma2(q_world: jnp.ndarray, point_cov_world: jnp.ndarray,
                          normal: jnp.ndarray, center: jnp.ndarray,
                          cov_nn: jnp.ndarray, var_c: jnp.ndarray) -> jnp.ndarray:
    """Variance of the point-to-plane distance for the probabilistic gate.

    Mirrors the reference's J_nq·Σ_plane·J_nqᵀ + nᵀΣ_p n
    (voxel_mapping.cpp:246-269 `build_single_residual`), with our factored
    plane covariance: (q−c)ᵀ Σ_nn (q−c) + σ_c² + nᵀ Σ_p n.
    All args broadcast over leading batch axes.
    """
    qc = q_world - center
    s_plane = jnp.einsum("...i,...ij,...j->...", qc, cov_nn, qc) + var_c
    s_point = jnp.einsum("...i,...ij,...j->...", normal, point_cov_world, normal)
    return s_plane + s_point


def lidar_point_cov_body(pts_body: jnp.ndarray, range_err: float, bearing_err: float) -> jnp.ndarray:
    """Per-point measurement covariance in the body frame, batched.

    Mirrors `calcBodyVar` (reference voxel_mapping.cpp:1221-1241): range noise
    along the beam direction + tangential bearing noise growing with range.
    Returns (..., 3, 3).
    """
    r = jnp.linalg.norm(pts_body, axis=-1, keepdims=True)
    r = jnp.maximum(r, 1e-4)
    dirv = pts_body / r
    # orthogonal basis of the tangent plane
    ref = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], pts_body.dtype), dirv.shape)
    ref2 = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], pts_body.dtype), dirv.shape)
    use2 = jnp.abs(dirv[..., 2:3]) > 0.99
    refv = jnp.where(use2, ref2, ref)
    t1 = jnp.cross(dirv, refv)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-8)
    t2 = jnp.cross(dirv, t1)
    sr2 = range_err ** 2
    st2 = (bearing_err * r[..., 0]) ** 2  # tangential std grows with range
    cov = (
        sr2 * dirv[..., :, None] * dirv[..., None, :]
        + st2[..., None, None] * (t1[..., :, None] * t1[..., None, :]
                                  + t2[..., :, None] * t2[..., None, :])
    )
    return cov
