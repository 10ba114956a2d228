"""SO(3) utilities — batched, jit-safe, Taylor-guarded at small angles.

Functional re-design of the reference's header math (reference
include/so3_math.h:12-76: Exp / Log / skew and the A(θ) right-Jacobian used in
covariance propagation).  Everything here broadcasts over leading batch axes so
per-point / per-IMU-sample work is one fused vectorized op rather than the
reference's scalar loops.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix; w: (..., 3) → (..., 3, 3).

    Mirrors SKEW_SYM_MATRX (reference so3_math.h:8-10).
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat; (..., 3, 3) → (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map; w: (..., 3) → (..., 3, 3).

    Mirrors Exp(ang_vel, dt) (reference so3_math.h:33-76) with series fallback
    for ‖w‖→0 so it is differentiable and NaN-free under jit.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    # sin θ / θ and (1-cos θ)/θ² with Taylor guards
    small = theta2 < _EPS
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS * _EPS))
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map; (..., 3, 3) → (..., 3).

    Mirrors Log(R) (reference so3_math.h:78-86) but branch-free: uses the
    numerically-stable atan2 form, guarded near θ=0 and θ=π.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w_hat = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sinθ · axis
    sin_theta = jnp.sqrt(jnp.maximum(jnp.sum(w_hat * w_hat, axis=-1), 0.0))
    # θ / sinθ with guard (θ≈0) — near π sinθ→0 too; use axis from diagonal there.
    scale = jnp.where(sin_theta < _EPS, 1.0, theta / jnp.maximum(sin_theta, _EPS))
    w = w_hat * scale[..., None]
    # near-π fallback: axis from sqrt of diagonal of (R + I)/2
    near_pi = cos_theta < -1.0 + 1e-6
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(jnp.maximum((diag + 1.0) * 0.5, 0.0))
    # signs from off-diagonal sums (R + Rᵀ has rank-1 structure 2aaᵀ(1-cosθ)+...)
    sx = jnp.sign(R[..., 2, 1] - R[..., 1, 2])
    sy = jnp.sign(R[..., 0, 2] - R[..., 2, 0])
    sz = jnp.sign(R[..., 1, 0] - R[..., 0, 1])
    sgn = jnp.stack([jnp.where(sx == 0, 1.0, sx), jnp.where(sy == 0, 1.0, sy), jnp.where(sz == 0, 1.0, sz)], axis=-1)
    w_pi = axis_abs * sgn * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def jr_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian of SO(3); used in ESIKF boxminus linearization.

    J_r^{-1}(w) = I + ½ŵ + (1/θ² − (1+cosθ)/(2θ sinθ)) ŵ²
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        1.0 / jnp.maximum(theta2, _EPS * _EPS)
        - (1.0 + jnp.cos(theta)) / jnp.maximum(2.0 * theta * jnp.sin(theta), _EPS),
    )
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + coef[..., None, None] * (W @ W)


def a_matrix(w: jnp.ndarray) -> jnp.ndarray:
    """A(θ) = right Jacobian J_r(w) — the reference's A_T in covariance
    propagation (reference IMU_Processing.cpp:429-445 uses Exp/A matrices).

    J_r(w) = I − (1−cosθ)/θ² ŵ + (θ−sinθ)/θ³ ŵ²
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < _EPS
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS * _EPS))
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS ** 3),
    )
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - b[..., None, None] * W + c[..., None, None] * (W @ W)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z): (..., 4) → (..., 3, 3)."""
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) → unit quaternion (w, x, y, z), branch-free Shepperd-lite.

    Uses the trace form with a clamp; adequate away from θ=π (pose logging).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    qw = 0.5 * jnp.sqrt(jnp.maximum(1.0 + trace, _EPS))
    s = 0.25 / jnp.maximum(qw, _EPS)
    qx = (R[..., 2, 1] - R[..., 1, 2]) * s
    qy = (R[..., 0, 2] - R[..., 2, 0]) * s
    qz = (R[..., 1, 0] - R[..., 0, 1]) * s
    q = jnp.stack([qw, qx, qy, qz], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
