"""18-dim ESIKF manifold state as a pytree.

Re-design of the reference's `StatesGroup` (reference include/common_lib.h:199-288,
DIM_STATE=18 at common_lib.h:36): {rotation, position, velocity, gyro bias,
accel bias, gravity} with ⊞ / ⊟ where the rotation block composes through the
SO(3) exponential and everything else is additive.  Being a pytree makes the
whole filter state (and the covariance) trivially checkpointable and jit-safe,
unlike the reference's mutable C++ struct.

Error-state ordering (matches the reference's Jacobian layout):
    [0:3]   δθ   (rotation, right-multiplied: R ← R·Exp(δθ))
    [3:6]   δp
    [6:9]   δv
    [9:12]  δb_g
    [12:15] δb_a
    [15:18] δg
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from immesh_tpu.core import so3

STATE_DIM = 18


@struct.dataclass
class EsikfState:
    rot: jnp.ndarray    # (3, 3) world←body
    pos: jnp.ndarray    # (3,)
    vel: jnp.ndarray    # (3,)
    bg: jnp.ndarray     # (3,) gyro bias
    ba: jnp.ndarray     # (3,) accel bias
    grav: jnp.ndarray   # (3,) gravity in world frame
    cov: jnp.ndarray    # (18, 18)

    @classmethod
    def identity(cls, dtype=jnp.float32, gravity: float = 9.81,
                 init_rot_cov: float = 1e-5, init_pos_cov: float = 1e-5,
                 init_vel_cov: float = 1e-2, init_bias_cov: float = 1e-4,
                 init_grav_cov: float = 1e-3) -> "EsikfState":
        diag = jnp.concatenate([
            jnp.full((3,), init_rot_cov, dtype),
            jnp.full((3,), init_pos_cov, dtype),
            jnp.full((3,), init_vel_cov, dtype),
            jnp.full((6,), init_bias_cov, dtype),
            jnp.full((3,), init_grav_cov, dtype),
        ])
        return cls(
            rot=jnp.eye(3, dtype=dtype),
            pos=jnp.zeros(3, dtype),
            vel=jnp.zeros(3, dtype),
            bg=jnp.zeros(3, dtype),
            ba=jnp.zeros(3, dtype),
            grav=jnp.array([0.0, 0.0, -gravity], dtype),
            cov=jnp.diag(diag),
        )

    # ---- manifold ops (reference common_lib.h:236-271 operator+/-) --------
    def boxplus(self, delta: jnp.ndarray) -> "EsikfState":
        """state ⊞ δ, δ: (18,). Rotation right-composes through Exp."""
        return self.replace(
            rot=self.rot @ so3.exp(delta[0:3]),
            pos=self.pos + delta[3:6],
            vel=self.vel + delta[6:9],
            bg=self.bg + delta[9:12],
            ba=self.ba + delta[12:15],
            grav=self.grav + delta[15:18],
        )

    def boxminus(self, other: "EsikfState") -> jnp.ndarray:
        """self ⊟ other → (18,) error vector, inverse of other.boxplus."""
        return jnp.concatenate([
            so3.log(other.rot.T @ self.rot),
            self.pos - other.pos,
            self.vel - other.vel,
            self.bg - other.bg,
            self.ba - other.ba,
            self.grav - other.grav,
        ])

    def transform_points(self, pts_body: jnp.ndarray) -> jnp.ndarray:
        """Body→world for (..., 3) points."""
        return pts_body @ self.rot.T + self.pos

    def pose_matrix(self) -> jnp.ndarray:
        """4×4 homogeneous world←body."""
        T = jnp.eye(4, dtype=self.rot.dtype)
        T = T.at[:3, :3].set(self.rot)
        return T.at[:3, 3].set(self.pos)
