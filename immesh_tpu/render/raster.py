"""Mesh depth rasterization + LiDAR point-cloud reinforcement.

Re-design of the reference's GL depth pipeline (reference
src/tools/openGL_libs/openGL_camera_view.cpp): the reference draws the mesh
with OpenGL, reads the depth buffer back (`read_depth` :418-476, glReadPixels
:448) and unprojects masked pixels into synthetic 3-D points (`unproject_point`
:409, depth→points :356-407) — the paper's "LiDAR point-cloud reinforcement"
(README.md:145-149).  No GL exists on a TPU, so rasterization becomes a
batched tile kernel:

  1. project triangles to screen space;
  2. bin triangles to image tiles by bounding box (deterministic rank-ordered
     scatter, same pattern as the voxel point-slot append);
  3. per tile, evaluate edge functions of its triangle list against its pixel
     block and min-reduce barycentric-interpolated depth — a z-buffer as a
     pure reduction, vmapped over tiles.

Everything is statically shaped: tiles × per-tile triangle cap; overflowing
triangles are dropped (far clutter), mirroring the bounded-loss discipline
used throughout the framework.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class PinholeCam:
    """Virtual pinhole camera (reference Cam_view, openGL_camera.hpp:185)."""

    rot: jnp.ndarray   # (3, 3) cam←world rotation
    pos: jnp.ndarray   # (3,) camera center in world
    fx: float = struct.field(pytree_node=False, default=200.0)
    fy: float = struct.field(pytree_node=False, default=200.0)
    cx: float = struct.field(pytree_node=False, default=160.0)
    cy: float = struct.field(pytree_node=False, default=120.0)
    width: int = struct.field(pytree_node=False, default=320)
    height: int = struct.field(pytree_node=False, default=240)
    znear: float = struct.field(pytree_node=False, default=0.1)
    zfar: float = struct.field(pytree_node=False, default=100.0)

    @classmethod
    def looking(cls, pos, target, up=(0, 0, 1.0), **kw) -> "PinholeCam":
        pos = np.asarray(pos, np.float32)
        fwd = np.asarray(target, np.float32) - pos
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, np.asarray(up, np.float32))
        right /= np.linalg.norm(right)
        dn = np.cross(fwd, right)
        rot = np.stack([right, dn, fwd])  # rows: cam axes in world
        return cls(rot=jnp.asarray(rot), pos=jnp.asarray(pos), **kw)


@functools.partial(jax.jit, static_argnames=("tile", "max_tri_per_tile"))
def depth_rasterize(verts: jnp.ndarray, faces: jnp.ndarray,
                    face_mask: jnp.ndarray, cam: PinholeCam,
                    tile: int = 16, max_tri_per_tile: int = 256
                    ) -> jnp.ndarray:
    """Z-buffer depth image (H, W) of the mesh; +inf where nothing hit."""
    H, W = cam.height, cam.width
    assert H % tile == 0 and W % tile == 0
    tx, ty = W // tile, H // tile
    n_tiles = tx * ty
    F = faces.shape[0]

    # ---- 1. project ---------------------------------------------------
    pc = (verts - cam.pos) @ cam.rot.T          # (P, 3) cam frame
    z = pc[:, 2]
    u = cam.fx * pc[:, 0] / jnp.maximum(z, 1e-6) + cam.cx
    v = cam.fy * pc[:, 1] / jnp.maximum(z, 1e-6) + cam.cy

    fu = u[faces]                                # (F, 3)
    fv = v[faces]
    fz = z[faces]
    ok = face_mask & jnp.all(fz > cam.znear, axis=-1) \
        & jnp.all(fz < cam.zfar, axis=-1)
    # screen-space area (degenerate / backface-agnostic: keep both windings)
    area = (
        (fu[:, 1] - fu[:, 0]) * (fv[:, 2] - fv[:, 0])
        - (fv[:, 1] - fv[:, 0]) * (fu[:, 2] - fu[:, 0])
    )
    ok = ok & (jnp.abs(area) > 1e-8)

    # ---- 2. tile binning ---------------------------------------------
    SPAN = 4   # bin span per axis; triangles wider than SPAN tiles go to a
    LARGE = 64  # shared large-triangle list tested by every tile
    u0 = jnp.clip(jnp.floor(jnp.min(fu, -1) / tile).astype(jnp.int32), 0, tx - 1)
    v0 = jnp.clip(jnp.floor(jnp.min(fv, -1) / tile).astype(jnp.int32), 0, ty - 1)
    u1 = jnp.clip(jnp.floor(jnp.max(fu, -1) / tile).astype(jnp.int32), 0, tx - 1)
    v1 = jnp.clip(jnp.floor(jnp.max(fv, -1) / tile).astype(jnp.int32), 0, ty - 1)
    # visible at all?
    ok = ok & (jnp.max(fu, -1) >= 0) & (jnp.min(fu, -1) < W) \
        & (jnp.max(fv, -1) >= 0) & (jnp.min(fv, -1) < H)

    is_large = ok & ((u1 - u0 >= SPAN) | (v1 - v0 >= SPAN))
    small = ok & ~is_large
    # shared list of large (close-up) triangles — typically a handful
    lpos = jnp.cumsum(is_large.astype(jnp.int32)) - 1
    lrows = jnp.full(LARGE, -1, jnp.int32).at[
        jnp.where(is_large & (lpos < LARGE), lpos, LARGE)
    ].set(jnp.arange(F, dtype=jnp.int32), mode="drop")

    du = jnp.arange(SPAN, dtype=jnp.int32)
    pair_tx = u0[:, None, None] + du[None, :, None]          # (F, S, 1)
    pair_ty = v0[:, None, None] + du[None, None, :]          # (F, 1, S)
    pair_ok = (
        small[:, None, None]
        & (pair_tx <= u1[:, None, None]) & (pair_ty <= v1[:, None, None])
    )                                                        # (F, S, S)
    pair_tile = (pair_ty * tx + pair_tx).reshape(F * SPAN * SPAN)
    pair_ok = pair_ok.reshape(F * SPAN * SPAN)
    pair_tri = jnp.repeat(
        jnp.arange(F, dtype=jnp.int32), SPAN * SPAN)

    # rank-ordered scatter into per-tile triangle lists
    pair_tile = jnp.where(pair_ok, pair_tile, n_tiles)
    order = jnp.argsort(pair_tile, stable=True)
    sorted_tile = pair_tile[order]
    sorted_tri = pair_tri[order]
    idxs = jnp.arange(sorted_tile.shape[0], dtype=jnp.int32)
    start = jnp.full(n_tiles + 1, sorted_tile.shape[0], jnp.int32).at[
        sorted_tile].min(idxs, mode="drop")
    rank = idxs - start[jnp.clip(sorted_tile, 0, n_tiles)]
    w_ok = (sorted_tile < n_tiles) & (rank < max_tri_per_tile)
    flat = jnp.where(w_ok, sorted_tile * max_tri_per_tile + rank,
                     n_tiles * max_tri_per_tile)
    tri_list = jnp.full(n_tiles * max_tri_per_tile, -1, jnp.int32).at[
        flat].set(sorted_tri, mode="drop").reshape(n_tiles, max_tri_per_tile)

    # ---- 3. per-tile z-buffer ----------------------------------------
    # pixel centers per tile
    px = jnp.arange(tile, dtype=jnp.float32) + 0.5
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_u0 = (tids % tx) * tile
    tile_v0 = (tids // tx) * tile

    # append the shared large-triangle list to every tile's bin
    tri_list = jnp.concatenate(
        [tri_list, jnp.broadcast_to(lrows[None], (n_tiles, LARGE))], axis=1)
    fu_l = fu[jnp.maximum(tri_list, 0)]          # (n_tiles, M+LARGE, 3)
    fv_l = fv[jnp.maximum(tri_list, 0)]
    fz_l = fz[jnp.maximum(tri_list, 0)]
    valid_l = tri_list >= 0

    def tile_depth(tu0, tv0, fu_t, fv_t, fz_t, val_t):
        pu = tu0 + px                             # (tile,)
        pv = tv0 + px
        PU = pu[None, :, None]                    # (1, tile, 1) → broadcast px along u
        PV = pv[:, None, None]                    # (tile, 1, 1)
        # edge functions vs each triangle (tile, tile, M)
        x0, x1, x2 = fu_t[:, 0], fu_t[:, 1], fu_t[:, 2]   # (M,)
        y0, y1, y2 = fv_t[:, 0], fv_t[:, 1], fv_t[:, 2]
        w0 = (x2 - x1) * (PV - y1) - (y2 - y1) * (PU - x1)
        w1 = (x0 - x2) * (PV - y2) - (y0 - y2) * (PU - x2)
        w2 = (x1 - x0) * (PV - y0) - (y1 - y0) * (PU - x0)
        den = w0 + w1 + w2
        same = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) | (
            (w0 <= 0) & (w1 <= 0) & (w2 <= 0))
        inside = same & (jnp.abs(den) > 1e-8) & val_t[None, None, :]
        # perspective-correct depth: interpolate 1/z with barycentrics
        izs = (
            w0 / fz_t[:, 0] + w1 / fz_t[:, 1] + w2 / fz_t[:, 2]
        ) / jnp.where(jnp.abs(den) > 1e-8, den, 1.0)
        depth = jnp.where(inside, 1.0 / jnp.maximum(izs, 1e-6), jnp.inf)
        return jnp.min(depth, axis=-1)            # (tile, tile)

    tiles = jax.vmap(tile_depth)(
        tile_u0.astype(jnp.float32), tile_v0.astype(jnp.float32),
        fu_l, fv_l, fz_l, valid_l)
    # assemble (ty, tx, tile, tile) → (H, W)
    img = tiles.reshape(ty, tx, tile, tile).transpose(0, 2, 1, 3)
    return img.reshape(H, W)


@functools.partial(jax.jit, static_argnames=("stride",))
def unproject_depth(depth: jnp.ndarray, cam: PinholeCam, stride: int = 1
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Depth image → world points (reference unproject_point,
    openGL_camera_view.cpp:409).  Returns ((N,3) points, (N,) mask)."""
    d = depth[::stride, ::stride]
    H, W = d.shape
    v, u = jnp.meshgrid(
        (jnp.arange(H) * stride + 0.5).astype(jnp.float32),
        (jnp.arange(W) * stride + 0.5).astype(jnp.float32), indexing="ij")
    ok = jnp.isfinite(d) & (d > cam.znear) & (d < cam.zfar)
    z = jnp.where(ok, d, 1.0)
    x = (u - cam.cx) / cam.fx * z
    y = (v - cam.cy) / cam.fy * z
    pc = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    pw = pc @ cam.rot + cam.pos
    return pw, ok.reshape(-1)


def reinforce_scan(store, gm, cam: PinholeCam, stride: int = 2,
                   max_depth: float = 0.0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """LiDAR point-cloud reinforcement: rasterize the current mesh from the
    sensor pose and synthesize densified points from the depth buffer
    (reference GUI wiring ImMesh_node.cpp:305-329, 422-432).

    stride = synthesized-point density (1 = every pixel), max_depth = drop
    synthesized points beyond this range (0 = unlimited) — the two
    parameters the reference exposes live in its GUI; the runtime reads
    them from the viewer controls (runtime/app.py:reinforce)."""
    tri = np.asarray(store.tri_ids).reshape(-1, 3)
    tri = tri[np.all(tri >= 0, axis=-1)]
    # pad to a shape bucket so repeated calls reuse the compiled program
    f = 1 << max(8, int(np.ceil(np.log2(max(len(tri), 1)))))
    fmask = np.zeros(f, bool)
    fmask[:len(tri)] = True
    tri_pad = np.zeros((f, 3), np.int32)
    tri_pad[:len(tri)] = tri
    depth = depth_rasterize(gm.pts, jnp.asarray(tri_pad),
                            jnp.asarray(fmask), cam)
    pts, ok = unproject_depth(depth, cam, stride)
    pts = np.asarray(pts)
    ok = np.asarray(ok)
    if max_depth > 0:
        d = np.asarray(depth)[::stride, ::stride].reshape(-1)
        ok = ok & (d <= max_depth)
    return pts[ok], np.asarray(depth)
