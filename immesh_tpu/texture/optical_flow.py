"""Pyramidal Lucas-Kanade optical flow — batched over features.

Re-design of the reference's vendored LK tracker (reference
src/meshing/optical_flow/lkpyramid.{hpp,cpp} — an OpenCV-derived scalar
pyramidal LK used by the texture-reconstruction application).  The reference
tracks features one at a time with hand-unrolled SIMD; here each pyramid
level is one `vmap`'d Gauss-Newton kernel over ALL features:

  * pyramid: 5-tap binomial blur + stride-2 decimation (same kernel family
    as cv::buildOpticalFlowPyramid);
  * per level: gather the fixed-size patch around each feature from the
    previous image once, form the 2×2 structure tensor G, then a fixed
    number of masked iterations updating flow by solving G·δ = b (closed
    form 2×2 — no data-dependent early exit, XLA-friendly);
  * coarse→fine: flow is upscaled ×2 between levels (static Python loop —
    shapes differ per level).

Status per feature mirrors the reference's checks: a feature fails if its
patch leaves the image or G is near-singular (min eigenvalue below
`min_eig_threshold`, cf. lkpyramid.cpp minEigThreshold handling).
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp

_BINOMIAL = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _blur5(img: jnp.ndarray) -> jnp.ndarray:
    """Separable 5-tap binomial blur, edge-clamped, (H, W) → (H, W)."""
    k = _BINOMIAL.astype(img.dtype)
    pad = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    img = sum(k[i] * pad[i:i + img.shape[0]] for i in range(5))
    pad = jnp.pad(img, ((0, 0), (2, 2)), mode="edge")
    img = sum(k[i] * pad[:, i:i + img.shape[1]] for i in range(5))
    return img


def build_pyramid(img: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """Grayscale (H, W) → list of `levels` images, level 0 = full resolution."""
    pyr = [img]
    for _ in range(levels - 1):
        b = _blur5(pyr[-1])
        pyr.append(b[::2, ::2])
    return pyr


def _patch_coords(half: int, dtype) -> jnp.ndarray:
    r = jnp.arange(-half, half + 1, dtype=dtype)
    gy, gx = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (P, 2) u,v


def _sample(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of a (H, W) image at (P, 2) u(col), v(row) coords."""
    H, W = img.shape
    u = jnp.clip(uv[:, 0], 0.0, W - 1.001)
    v = jnp.clip(uv[:, 1], 0.0, H - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu, fv = u - u0, v - v0
    i00 = img[v0, u0]
    i01 = img[v0, u0 + 1]
    i10 = img[v0 + 1, u0]
    i11 = img[v0 + 1, u0 + 1]
    return (i00 * (1 - fu) * (1 - fv) + i01 * fu * (1 - fv)
            + i10 * (1 - fu) * fv + i11 * fu * fv)


@partial(jax.jit, static_argnames=("half", "iters"))
def _lk_level(prev: jnp.ndarray, nxt: jnp.ndarray, pts: jnp.ndarray,
              flow: jnp.ndarray, ok: jnp.ndarray, half: int, iters: int,
              min_eig: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One pyramid level of LK for all features: (N,2) flow refinement."""
    H, W = prev.shape
    offs = _patch_coords(half, pts.dtype)               # (P, 2)

    def one(pt, fl, o):
        base = pt[None] + offs                           # (P, 2)
        in_img = ((pt[0] >= half + 1) & (pt[0] <= W - half - 2)
                  & (pt[1] >= half + 1) & (pt[1] <= H - half - 2))
        tmpl = _sample(prev, base)
        gx = (_sample(prev, base + jnp.asarray([0.5, 0.0], pts.dtype))
              - _sample(prev, base - jnp.asarray([0.5, 0.0], pts.dtype)))
        gy = (_sample(prev, base + jnp.asarray([0.0, 0.5], pts.dtype))
              - _sample(prev, base - jnp.asarray([0.0, 0.5], pts.dtype)))
        gxx = jnp.sum(gx * gx)
        gxy = jnp.sum(gx * gy)
        gyy = jnp.sum(gy * gy)
        det = gxx * gyy - gxy * gxy
        tr = gxx + gyy
        eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        good = o & in_img & (eig_min / offs.shape[0] > min_eig)
        inv = jnp.asarray([[gyy, -gxy], [-gxy, gxx]], pts.dtype) / jnp.where(
            jnp.abs(det) < 1e-9, 1e-9, det)

        def body(_, f):
            cur = _sample(nxt, base + f[None])
            err = cur - tmpl
            b = jnp.asarray([jnp.sum(err * gx), jnp.sum(err * gy)])
            return f - inv @ b

        f = jax.lax.fori_loop(0, iters, body, fl)
        return jnp.where(good, f, fl), good

    return jax.vmap(one)(pts, flow, ok)


def lk_track(prev_pyr: List[jnp.ndarray], next_pyr: List[jnp.ndarray],
             pts: jnp.ndarray, win: int = 21, iters: int = 10,
             min_eig: float = 1e-4) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Track (N, 2) feature points (u, v) from prev to next.

    Returns (pts_next (N,2), status (N,) bool).  Mirrors the reference
    tracker's interface (lkpyramid.hpp calc signature): window `win`,
    `iters` fixed iterations per level, coarse→fine over the shared pyramid.
    """
    assert len(prev_pyr) == len(next_pyr)
    L = len(prev_pyr)
    half = win // 2
    flow = jnp.zeros_like(pts)
    ok = jnp.ones(pts.shape[0], bool)
    for lev in range(L - 1, -1, -1):
        p = pts / (2.0 ** lev)
        # coarse levels refine flow where the patch fits; only the finest
        # level decides trackability (a border point at a coarse level just
        # keeps the coarser flow estimate, as in the reference tracker)
        flow, good = _lk_level(prev_pyr[lev], next_pyr[lev], p, flow, ok,
                               half, iters, min_eig)
        if lev > 0:
            flow = flow * 2.0
    return pts + flow, ok & good
