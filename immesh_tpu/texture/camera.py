"""Batched pinhole camera model + image sampling.

Re-design of the reference's `Image_frame` camera (reference
src/meshing/r3live/image_frame.{hpp,cpp}: `set_intrinsic` :94-107,
`project_3d_point_in_this_img` :323-339, sub-pixel sampling `getSubPixel`
:184-204, gamma/exposure response :206-260).  The reference projects one point
at a time inside per-voxel loops; here projection and color sampling are
single batched kernels over all candidate points — the natural TPU layout
(one gather + fused elementwise math, no per-point branching).

Images are float32 (H, W, C) arrays in [0, 255]; poses are world→camera
(R_w2c, t_w2c) so `p_cam = R_w2c @ p_world + t_w2c`, matching the reference's
`m_pose_c2w_*` refresh (image_frame.cpp:76-83, inverted convention).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PinholeCamera:
    """Intrinsics + response parameters (image_frame.cpp:94-107, gamma :52-53)."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = struct.field(pytree_node=False, default=640)
    height: int = struct.field(pytree_node=False, default=480)
    # linear photometric response y = gamma0 * x + gamma1 (m_gama_para)
    gamma0: jnp.ndarray = 1.0
    gamma1: jnp.ndarray = 0.0

    @classmethod
    def create(cls, fx, fy, cx, cy, width, height) -> "PinholeCamera":
        f32 = jnp.float32
        return cls(fx=f32(fx), fy=f32(fy), cx=f32(cx), cy=f32(cy),
                   width=int(width), height=int(height),
                   gamma0=f32(1.0), gamma1=f32(0.0))

    @classmethod
    def from_K(cls, K, width, height) -> "PinholeCamera":
        K = jnp.asarray(K, jnp.float32)
        return cls.create(K[0, 0], K[1, 1], K[0, 2], K[1, 2], width, height)


def project_points(pts_w: jnp.ndarray, R_w2c: jnp.ndarray, t_w2c: jnp.ndarray,
                   cam: PinholeCamera, margin: float = 1.0
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """World points → pixel coords.

    Returns (uv (N,2) float32, depth (N,), ok (N,) bool).  `ok` requires
    positive depth and the pixel inside the image with `margin` px border —
    the reference's in-image test (image_frame.cpp:323-339 returns false for
    out-of-frame / behind-camera points).
    """
    p_cam = pts_w @ R_w2c.T + t_w2c
    z = p_cam[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = cam.fx * p_cam[:, 0] / zs + cam.cx
    v = cam.fy * p_cam[:, 1] / zs + cam.cy
    ok = (
        (z > 1e-3)
        & (u >= margin) & (u <= cam.width - 1 - margin)
        & (v >= margin) & (v <= cam.height - 1 - margin)
    )
    return jnp.stack([u, v], axis=-1), z, ok


def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W, C) image at continuous (u=col, v=row) coords, (N, 2)→(N, C).

    Bilinear, clamped at borders — replaces the reference's per-pixel
    `getSubPixel` template (image_frame.cpp:184-204) with one batched gather.
    """
    H, W = img.shape[0], img.shape[1]
    u = jnp.clip(uv[:, 0], 0.0, W - 1.0)
    v = jnp.clip(uv[:, 1], 0.0, H - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, W - 1)
    v1 = jnp.minimum(v0 + 1, H - 1)
    fu = (u - u0.astype(u.dtype))[:, None]
    fv = (v - v0.astype(v.dtype))[:, None]
    i00 = img[v0, u0]
    i01 = img[v0, u1]
    i10 = img[v1, u0]
    i11 = img[v1, u1]
    top = i00 * (1 - fu) + i01 * fu
    bot = i10 * (1 - fu) + i11 * fu
    return top * (1 - fv) + bot * fv


def sample_with_gradient(img: jnp.ndarray, uv: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bilinear value + central-difference image gradients at uv.

    Returns (val (N,C), d/du (N,C), d/dv (N,C)); mirrors the optional
    rgb_dx/rgb_dy outputs of the reference's `get_rgb`
    (image_frame.cpp:206-245) in one fused kernel.
    """
    du = jnp.asarray([[0.5, 0.0]], img.dtype)
    dv = jnp.asarray([[0.0, 0.5]], img.dtype)
    val = bilinear_sample(img, uv)
    gx = bilinear_sample(img, uv + du) - bilinear_sample(img, uv - du)
    gy = bilinear_sample(img, uv + dv) - bilinear_sample(img, uv - dv)
    return val, gx, gy


def to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """RGB (H,W,3) → luma (H,W), BT.601 weights (cv::cvtColor RGB2GRAY)."""
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return img @ w
