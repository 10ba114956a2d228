"""Batched bounded 2-D Delaunay triangulation — the meshing compute kernel.

Re-design of the reference's per-voxel CGAL call (`delaunay_triangulation`,
reference src/meshing/mesh_rec_geometry.cpp:174-295: PCA plane projection →
CGAL Delaunay_triangulation_2 → max-angle face filter): CGAL's incremental
pointer-based triangulator cannot run on a TPU, so we use the classic
*lifted-paraboloid characterization* — a triangle belongs to the Delaunay
triangulation iff its circumcircle contains no other point, which for points
lifted to (u, v, u²+v²) is one plane-side test — evaluated for ALL candidate
triangles of the ≤K pulled points at once:

    scores (T, K) = candidate_planes (T, 4) @ lifted_pts (4, K)   ← MXU matmul
    delaunay(t)   = no valid point with score < −ε

O(K⁴) work instead of O(K log K), but every op is a dense batched matmul over
voxels × triangles × points with zero control flow — exactly what the MXU is
fastest at, and K is small (≤64).  Degeneracies (collinear, cocircular) are
handled by area/ε masks rather than CGAL's exact predicates; ties err toward
keeping both diagonals (overdraw beats holes).

The reference's max-angle sliver filter (`is_face_is_ok`,
mesh_rec_geometry.cpp:40-57) is applied in the same pass.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from immesh_tpu.core.geometry import eigh3x3


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _incircle_kernel(uvlw_ref, tris_ref, scal_ref, out_ref):
    """Fully-fused Delaunay test for 8 voxels × one candidate tile.

    Everything from candidate-vertex gather to the incircle column-min runs
    in VMEM: the earlier two-stage version materialized twelve (A, T)
    vertex/edge/plane arrays in HBM before a score-only kernel — measured
    ~20 ms/frame of pure HBM traffic at A=512, T=17k.  Here the only HBM
    tensors are the (8ch, Kp) point block per voxel and the (8, TT) output.

    uvlw_ref: (8, 8, Kp) [voxel, channel, point]; channels:
              0-3 = [u, v, lift, 1]·valid   (score contraction, w-folded)
              4-6 = [u, v, lift] raw        (vertex extraction)
              7   = zero
    tris_ref: (8, TT) int32; rows 0-2 = candidate vertex indices (ia, ib, ic)
    scal_ref: (8, 128) f32; col 0 = per-voxel degeneracy gate ε·scale²
    out_ref:  (8, TT) min incircle score, or −inf for degenerate/invalid
              candidates (vertex masked out, |2·area| ≤ gate)

    Vertex extraction is a one-hot masked lane-reduction (exact in f32 —
    a gather via MXU would round coordinates unless run at HIGHEST).
    Invalid/padded point columns are all-zero in channels 0-3 ⇒ score 0 ⇒
    never < −ε.
    """
    ia = tris_ref[0, :]
    ib = tris_ref[1, :]
    ic = tris_ref[2, :]
    tt = ia.shape[0]
    kp = uvlw_ref.shape[2]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tt, kp), 1)

    for v in range(8):
        L = uvlw_ref[v]                                   # (8, Kp)

        def vert(idx):
            oh = lanes == idx[:, None]                    # (TT, Kp)
            pick = lambda row: jnp.sum(                   # noqa: E731
                jnp.where(oh, row[None, :], 0.0), axis=1)
            return pick(L[4]), pick(L[5]), pick(L[6]), pick(L[3])

        ua, va, la, wa = vert(ia)
        ub, vb, lb, wb = vert(ib)
        uc, vc, lc, wc = vert(ic)

        e1u, e1v, e1l = ub - ua, vb - va, lb - la
        e2u, e2v, e2l = uc - ua, vc - va, lc - la
        area2 = e1u * e2v - e1v * e2u
        ccw = jnp.sign(area2)
        # lifted plane through (a,b,c), oriented CCW (z-component positive)
        nx = (e1v * e2l - e1l * e2v) * ccw
        ny = (e1l * e2u - e1u * e2l) * ccw
        nz = area2 * ccw
        off = nx * ua + ny * va + nz * la

        z = jnp.zeros_like(nx)
        planes = jnp.stack([nx, ny, nz, -off, z, z, z, z], axis=0)  # (8, TT)
        s = jax.lax.dot_general(
            planes, L,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # exact-f32 MXU passes
        )                                                  # (TT, Kp)
        min_s = jnp.min(s, axis=1)

        ok = (wa > 0) & (wb > 0) & (wc > 0)
        ok &= jnp.abs(area2) > scal_ref[v, 0]
        out_ref[v, :] = jnp.where(ok, min_s, -jnp.inf)


def _incircle_min_scores(uvlw8: jnp.ndarray, tris8: jnp.ndarray,
                         min_area: jnp.ndarray, tt: int = 1024) -> jnp.ndarray:
    """(A, 8, Kp), (8, Tp), (A,) → (A, Tp) min incircle score per candidate
    (−inf = degenerate/invalid).  A must be a multiple of 8."""
    A, _, Kp = uvlw8.shape
    Tp = tris8.shape[1]
    assert Tp % tt == 0 and A % 8 == 0
    scal = jnp.zeros((A, 128), jnp.float32).at[:, 0].set(min_area)
    return pl.pallas_call(
        _incircle_kernel,
        grid=(A // 8, Tp // tt),
        in_specs=[
            pl.BlockSpec((8, 8, Kp), lambda a, t: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tt), lambda a, t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda a, t: (a, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tt), lambda a, t: (a, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A, Tp), jnp.float32),
    )(uvlw8, tris8, scal)


@functools.lru_cache(maxsize=8)
def _tri_candidates(k: int) -> np.ndarray:
    """All C(k,3) index triples (i<j<k), as an (T, 3) int32 host constant."""
    idx = np.arange(k)
    i, j, l = np.meshgrid(idx, idx, idx, indexing="ij")
    m = (i < j) & (j < l)
    return np.stack([i[m], j[m], l[m]], axis=-1).astype(np.int32)


@functools.lru_cache(maxsize=8)
def _own_vertex_mask(k: int) -> np.ndarray:
    """(T, K) bool — point column is a vertex of candidate row.  Own vertices
    sit exactly ON their circumcircle; f32 rounding would otherwise flip them
    randomly to 'inside' and kill valid triangles."""
    tris = _tri_candidates(k)
    cols = np.arange(k)[None, :]
    return (
        (cols == tris[:, 0:1]) | (cols == tris[:, 1:2]) | (cols == tris[:, 2:3])
    )


def pca_project(pts: jnp.ndarray, mask: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Masked PCA plane projection, batched over voxels.

    pts: (A, K, 3), mask: (A, K) → (uv (A, K, 2), origin (A, 3), axes (A, 3, 3))
    axes columns = [long, mid, short(=normal)], mirroring the reference's
    cached per-voxel PCA axes (mesh_rec_geometry.cpp:196-213).
    """
    w = mask.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(pts * w[..., None], axis=-2) / n
    q = (pts - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("aki,akj->aij", q, q) / n[..., None]
    lam, vecs = eigh3x3(cov)  # ascending; columns eigenvectors
    e_long = vecs[..., :, 2]
    e_mid = vecs[..., :, 1]
    uv = jnp.stack([
        jnp.einsum("aki,ai->ak", pts - mean[:, None, :], e_long),
        jnp.einsum("aki,ai->ak", pts - mean[:, None, :], e_mid),
    ], axis=-1)
    return uv, mean, vecs


def delaunay_mask(uv: jnp.ndarray, mask: jnp.ndarray,
                  eps_scale: float = 1e-6,
                  tiebreak: Optional[jnp.ndarray] = None,
                  tie_scale: float = 256.0 * 1e-6
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Delaunay test for every candidate triangle of every voxel.

    uv: (A, K, 2) projected points, mask: (A, K) validity.
    tiebreak: optional (A, K) int32 — stable per-point identity (position
    hash) used for symbolic perturbation of cocircular ties.
    tie_scale: perturbation amplitude as a fraction of scale² — must exceed
    eps_scale for decisive single-diagonal ties, and exceed the sensor-noise
    score band for voxel-to-voxel consistency (see mesh/triangles.py, which
    passes a noise-calibrated value).
    Returns (tris (T, 3) shared candidate triples, keep (A, T) bool).

    ε discipline (f32): |2·area| is O(scale²) and incircle scores are
    O(scale⁴), so thresholds scale accordingly.  Near-cocircular quads
    (gridded inputs, or noise-level scores seen through two voxels' slightly
    different PCA projections) are broken by perturbing the paraboloid lift
    with a hash of the point identity — frame/voxel/chip-independent, so
    every voxel resolves the tie the SAME way and exactly one diagonal
    survives (the incircle determinant is invariant to uv rigid motions and
    to affine lift terms, so the only cross-voxel variation is the
    noise-level plane tilt that tie_scale is sized to dominate).
    """
    A, K, _ = uv.shape
    tris = jnp.asarray(_tri_candidates(K))       # (T, 3)
    T = tris.shape[0]

    u, v = uv[..., 0], uv[..., 1]
    lift = u * u + v * v
    # characteristic scale for epsilons
    scale = jnp.maximum(
        jnp.max(jnp.where(mask, jnp.abs(u), 0.0), axis=-1)
        + jnp.max(jnp.where(mask, jnp.abs(v), 0.0), axis=-1),
        1e-3,
    )  # (A,)

    # symbolic perturbation of the lift (units L²): η·hash(id) ∈ [0, η)
    if tiebreak is None:
        tiebreak = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None], (A, K))
    tb = ((tiebreak * jnp.int32(-1640531527)) & jnp.int32(0xFFFF)).astype(
        uv.dtype) * (1.0 / 65536.0)
    eta = max(tie_scale, 256.0 * eps_scale) * scale * scale
    lift = lift + eta[:, None] * tb

    eps = eps_scale * scale[:, None] ** 4                        # (A, 1)
    min_area = eps_scale * scale ** 2                            # (A,)
    use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # fully-fused VMEM kernel: vertex gather, plane build, incircle
        # scores, and validity gates all stay on-chip (see _incircle_kernel)
        Kp = _round_up(K, 128)
        Tp = _round_up(T, 1024)
        Ap = _round_up(A, 8)
        w = mask.astype(uv.dtype)
        uvlw8 = jnp.zeros((Ap, 8, Kp), jnp.float32)
        uvlw8 = uvlw8.at[:A, 0, :K].set(u * w)
        uvlw8 = uvlw8.at[:A, 1, :K].set(v * w)
        uvlw8 = uvlw8.at[:A, 2, :K].set(lift * w)
        uvlw8 = uvlw8.at[:A, 3, :K].set(w)
        uvlw8 = uvlw8.at[:A, 4, :K].set(u)
        uvlw8 = uvlw8.at[:A, 5, :K].set(v)
        uvlw8 = uvlw8.at[:A, 6, :K].set(lift)
        # padded candidate rows are (0,0,0): zero area ⇒ −inf ⇒ dropped
        tris8 = jnp.zeros((8, Tp), jnp.int32)
        tris8 = tris8.at[0:3, :T].set(tris.T)
        ma = jnp.pad(min_area, (0, Ap - A))
        min_s = _incircle_min_scores(uvlw8, tris8, ma, tt=1024)[:A, :T]
        # own vertices score ±f32-rounding ≈ 1e-7·s⁴ ≪ ε — no exclusion
        # needed; −inf encodes masked-vertex / degenerate candidates
        return tris, min_s >= -eps

    # ---- jnp fallback (CPU tests / oracle comparisons) -------------------
    ia, ib, ic = tris[:, 0], tris[:, 1], tris[:, 2]
    tk = lambda x, idx: jnp.take(x, idx, axis=1)  # (A,K) -> (A,T)  # noqa: E731
    ua, va, la = tk(u, ia), tk(v, ia), tk(lift, ia)
    ub, vb, lb = tk(u, ib), tk(v, ib), tk(lift, ib)
    uc, vc, lc = tk(u, ic), tk(v, ic), tk(lift, ic)

    e1u, e1v, e1l = ub - ua, vb - va, lb - la
    e2u, e2v, e2l = uc - ua, vc - va, lc - la
    area2 = e1u * e2v - e1v * e2u                 # signed 2·area
    ccw = jnp.sign(area2)
    nondeg = jnp.abs(area2) > min_area[:, None]

    # lifted plane through (a,b,c): normal = (B−A)×(C−A) in 3-D lift space,
    # oriented so the z-component (=2·area) is positive (CCW convention)
    nx = (e1v * e2l - e1l * e2v) * ccw            # (A, T)
    ny = (e1l * e2u - e1u * e2l) * ccw
    nz = area2 * ccw
    off = nx * ua + ny * va + nz * la             # (A, T)

    planes = jnp.stack([nx, ny, nz, -off], axis=-1)            # (A, T, 4)
    lifted = jnp.stack(
        [u, v, lift, jnp.ones_like(u)], axis=-1)               # (A, K, 4)
    scores = jnp.einsum("atc,akc->atk", planes, lifted)
    own = jnp.asarray(_own_vertex_mask(K))                     # (T, K)
    inside = (scores < -eps[..., None]) & mask[:, None, :] & ~own[None]
    bad = jnp.any(inside, axis=-1)                             # (A, T)

    m3 = (
        mask[:, tris[:, 0]] & mask[:, tris[:, 1]] & mask[:, tris[:, 2]]
    )
    return tris, m3 & nondeg & ~bad


def _pairs_kernel(chan_ref, sm_ref, out_ref, *, K: int, Kp: int):
    """Edge-neighbor Delaunay argmin for EIGHT voxels, fully in VMEM.

    For every directed pair (i, j) find k* = argmin_k of the lifted-plane
    slope ratio Np/d over points strictly left of i→j (see delaunay_pairs).
    No (K,K,K) tensor ever exists — the XLA broadcast formulation
    materialized several in HBM with 48→128 lane padding and measured
    ~76 ms at (512, 48).

    Layout (round-5 rewrite): ONE fori over the edge tail i; each iteration
    builds (Kp8, Kp) tiles with k on SUBLANES and j on LANES from
    outer-product broadcasts of (col ⊗ row) vectors, then reduces the
    argmin over the sublane (k) axis — a (1, Kp) row written straight to
    W[v, i, :].  vs the previous i-block × k-scalar sweep this issues ~25 %
    fewer vector ops and 6× fewer SMEM scalar loads (48 iterations × 6
    scalars instead of 288 × 5), and `pl.when` skips the padded/invalid i
    rows entirely (typical voxels fill ~½ of pull_capacity); measured
    9.5 ms → see BENCH_DETAIL for the post-rewrite number.

    Eight voxels per grid step: with one voxel per step the launch/stream
    overhead of ~500 sequential grid iterations dominated the whole meshing
    frame; batching amortizes it 8× for the same per-voxel arithmetic.

    chan_ref: (8, 8, Kp) VMEM [voxel, channel, point]; channels 0-5 =
              [u, v, lift(perturbed), |p|²(raw), valid, ε·scale²];
              sm_ref: same array in SMEM for scalar loads.
    out_ref:  (8, Kp8, Kp) int32 — W[v, i, j] = k* or -1 (no valid left pt).
    """
    Kp8 = out_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (Kp8, Kp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Kp8, Kp), 1)
    eye = rows == cols
    kio = rows                           # sublane index = k
    big = jnp.float32(3.4e38)
    kbig = jnp.int32(0x3FFFFFFF)

    for vx in range(8):
        chan = chan_ref[vx]               # (8, Kp)
        u = chan[0:1, :]                  # (1, Kp) lane vectors (j-indexed)
        v = chan[1:2, :]
        L = chan[2:3, :]
        w = chan[4:5, :]
        eps = sm_ref[vx, 5, 0]

        # sublane (k-indexed) copies via one-hot masked reduction (exact in
        # f32; avoids unsupported lane-dim transposes)
        def to_col(row):
            return jnp.sum(jnp.where(eye, row, 0.0), axis=1, keepdims=True)

        uc, vc, Lc, wc = (to_col(x) for x in (u, v, L, w))
        okjk = (wc > 0.0) & (w > 0.0)     # (Kp8, Kp) valid(k) & valid(j)
        neg_row = jnp.full((1, Kp), -1, jnp.int32)

        def body(i, _, u=u, v=v, L=L, w=w, uc=uc, vc=vc, Lc=Lc,
                 okjk=okjk, eps=eps, vx=vx, neg_row=neg_row):
            ui = sm_ref[vx, 0, i]
            vi = sm_ref[vx, 1, i]
            Li = sm_ref[vx, 2, i]
            wi = sm_ref[vx, 4, i]

            @pl.when(wi > 0.0)
            def _():
                du_j, dv_j, dL_j = u - ui, v - vi, L - Li     # (1, Kp)
                du_k, dv_k, dL_k = uc - ui, vc - vi, Lc - Li  # (Kp8, 1)
                d = du_j * dv_k - dv_j * du_k   # 2·area, k left of i→j
                mp = du_k * du_j + dv_k * dv_j  # (p_k−p_i)·(p_j−p_i)
                e2 = du_j * du_j + dv_j * dv_j  # |p_j−p_i|², (1, Kp)
                Np = dL_k * e2 - mp * dL_j
                valid = okjk & (d > eps)
                r = jnp.where(valid, Np / jnp.where(valid, d, 1.0), big)
                best = jnp.min(r, axis=0, keepdims=True)      # (1, Kp)
                bk = jnp.min(jnp.where(r == best, kio, kbig),
                             axis=0, keepdims=True)           # first-min k
                out_ref[vx, pl.dslice(i, 1), :] = jnp.where(
                    best < big, bk, -1)

            @pl.when(wi <= 0.0)
            def _():
                out_ref[vx, pl.dslice(i, 1), :] = neg_row
            return 0

        jax.lax.fori_loop(0, K, body, 0)
        if Kp8 > K:
            out_ref[vx, K:, :] = jnp.full((Kp8 - K, Kp), -1, jnp.int32)


def _pairs_argmin_tpu(u, v, lift, gd, mask, d_eps, interpret: bool = False):
    """(A, K) channel arrays → W (A, K, K) int32 via the Pallas kernel;
    W[a, i, j] = empty-circumcircle third vertex of directed edge i→j,
    or -1.  `interpret=True` runs the kernel in Pallas interpret mode so the
    CPU test suite can cross-check it against the XLA formulation."""
    A, K = u.shape
    Kp = _round_up(K, 128)
    Kp8 = _round_up(K, 8)
    Ap = _round_up(A, 8)
    chan = jnp.zeros((Ap, 8, Kp), jnp.float32)
    chan = chan.at[:A, 0, :K].set(u)
    chan = chan.at[:A, 1, :K].set(v)
    chan = chan.at[:A, 2, :K].set(lift)
    chan = chan.at[:A, 3, :K].set(gd)
    chan = chan.at[:A, 4, :K].set(mask.astype(jnp.float32))
    chan = chan.at[:A, 5, 0].set(d_eps)
    W = pl.pallas_call(
        functools.partial(_pairs_kernel, K=K, Kp=Kp),
        grid=(Ap // 8,),
        in_specs=[
            pl.BlockSpec((8, 8, Kp), lambda a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 8, Kp), lambda a: (a, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, Kp8, Kp), lambda a: (a, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ap, Kp8, Kp), jnp.int32),
        interpret=interpret,
    )(chan, chan)
    return W[:A, :K, :K]


def _pairs_argmin_xla(uv, u, v, lift, gd, mask, d_eps_a):
    """XLA broadcast formulation of the same edge-neighbor argmin as
    `_pairs_argmin_tpu` (CPU/GPU path + the parity oracle for the Pallas
    kernel, tests/test_mesh.py).  Returns (W (A,K,K) int32, has (A,K,K))."""
    dt = uv.dtype
    # K×K building blocks: Gram and cross matrices
    G = jnp.einsum("aki,ali->akl", uv, uv)                 # (A, K, K)
    Cx = u[:, :, None] * v[:, None, :] - v[:, :, None] * u[:, None, :]
    e2 = gd[:, :, None] + gd[:, None, :] - 2.0 * G         # |p_j−p_i|²

    # (A, K, K, K) broadcast tensors, axes [a, i, j, k]
    # d = cross(p_j−p_i, p_k−p_i) = C[j,k]+C[i,j]−C[i,k] (2·area, >0 ⇔ left)
    d = (Cx[:, None, :, :] + Cx[:, :, :, None] - Cx[:, :, None, :])
    # m′ = (p_k−p_i)·(p_j−p_i) = G[j,k] − G[i,k] − G[i,j] + G[i,i]
    mp = (G[:, None, :, :] - G[:, :, None, :] - G[:, :, :, None]
          + gd[:, :, None, None])
    Li = lift[:, :, None, None]
    Lj = lift[:, None, :, None]
    Lk = lift[:, None, None, :]
    # plane slope along the left normal, ×(d·|e|²) — comparable as N′/d
    # since d > 0 on the valid set and |e|² > 0
    Np = (Lk - Li) * e2[:, :, :, None] - mp * (Lj - Li)

    d_eps = d_eps_a[:, None, None, None]
    valid = (mask[:, :, None, None] & mask[:, None, :, None]
             & mask[:, None, None, :] & (d > d_eps))
    big = jnp.asarray(jnp.finfo(dt).max, dt)
    ratio = jnp.where(valid, Np / jnp.where(valid, d, 1.0), big)
    W = jnp.argmin(ratio, axis=-1).astype(jnp.int32)       # (A, K, K)
    has = jnp.min(ratio, axis=-1) < big                    # some left k
    return W, has


def delaunay_pairs(uv: jnp.ndarray, mask: jnp.ndarray,
                   eps_scale: float = 1e-6,
                   tiebreak: Optional[jnp.ndarray] = None,
                   tie_scale: float = 256.0 * 1e-6,
                   impl: Optional[str] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """O(K³) Delaunay via the dual edge-neighbor characterization — the
    production kernel (delaunay_mask is the O(K⁴) oracle kept for tests).

    For every directed edge (i→j), the Delaunay triangle on its left has the
    third vertex k* that minimizes the lifted-plane slope through (i, j, k)
    among points strictly left of the edge (equivalently: maximizes the
    inscribed angle ∠ikj — the empty-circumcircle point).  A triangle
    (i, j, k) is Delaunay iff all three of its directed edges agree:
    W[i,j]=k, W[j,k]=i, W[k,i]=j.  This replaces the C(K,3)·K incircle sweep
    (reference CGAL call, mesh_rec_geometry.cpp:253-254) with K³ broadcasted
    arithmetic built entirely from two K×K matrices (Gram + cross), no
    per-candidate vertex gathers — ~7× less work and a 7.5× smaller
    candidate axis (K² pairs vs C(K,3) triples) for every downstream filter.

    Same symbolic perturbation of the lift as delaunay_mask (hash of the
    point identity), so cocircular ties resolve identically in every voxel
    and on every chip.

    uv: (A, K, 2), mask: (A, K).  Returns (trip (A, K², 3) int32 vertex
    index triples, keep (A, K²) bool) — triples are per-voxel (unlike
    delaunay_mask's shared candidate table).

    Hot-path note: production consumers (mesh/triangles.py) should use
    `delaunay_pairs_w` and reconstruct triples arithmetically from flat
    row ids — materializing and then gathering the (A, K², 3) trip tensor
    measured ~64 ms/frame at (512, 48) on v5e (generic axis-1 gather from
    the K² axis hits the TPU scalar path); this wrapper exists for tests
    and small callers.
    """
    W, emit = delaunay_pairs_w(uv, mask, eps_scale=eps_scale,
                               tiebreak=tiebreak, tie_scale=tie_scale,
                               impl=impl)
    A, K, _ = uv.shape
    ar = jnp.arange(K, dtype=jnp.int32)
    ii, jj = ar[:, None], ar[None, :]
    trip = jnp.stack([
        jnp.broadcast_to(ii[None], (A, K, K)),
        jnp.broadcast_to(jj[None], (A, K, K)),
        W,
    ], axis=-1).reshape(A, K * K, 3)
    return trip, emit.reshape(A, K * K)


def delaunay_pairs_w(uv: jnp.ndarray, mask: jnp.ndarray,
                     eps_scale: float = 1e-6,
                     tiebreak: Optional[jnp.ndarray] = None,
                     tie_scale: float = 256.0 * 1e-6,
                     impl: Optional[str] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Edge-neighbor Delaunay core: returns (W (A,K,K) int32 third-vertex
    table, emit (A,K,K) bool one-emission-per-triangle mask).  The triple
    for flat pair index f = i·K + j is (i, j, W[f]) — consumers reconstruct
    it arithmetically instead of gathering a materialized triple tensor
    (see delaunay_pairs docstring)."""
    A, K, _ = uv.shape
    dt = uv.dtype
    u, v = uv[..., 0], uv[..., 1]
    lift = u * u + v * v
    scale = jnp.maximum(
        jnp.max(jnp.where(mask, jnp.abs(u), 0.0), axis=-1)
        + jnp.max(jnp.where(mask, jnp.abs(v), 0.0), axis=-1),
        1e-3,
    )  # (A,)

    if tiebreak is None:
        tiebreak = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[None], (A, K))
    tb = ((tiebreak * jnp.int32(-1640531527)) & jnp.int32(0xFFFF)).astype(
        dt) * (1.0 / 65536.0)
    eta = max(tie_scale, 256.0 * eps_scale) * scale * scale
    lift = lift + eta[:, None] * tb

    gd = lift - eta[:, None] * tb                              # |p|² = u²+v²
    d_eps_a = eps_scale * scale * scale                        # (A,)

    if impl is None:
        impl = "tpu" if jax.default_backend() == "tpu" else "xla"
    if impl in ("tpu", "interpret"):
        # fused VMEM kernel: the k-sweep argmin without any (K,K,K) tensor —
        # the XLA broadcast formulation below materializes several K³
        # intermediates (48→128 lane padded) and measured ~76 ms at (512,48)
        # on-chip; the kernel runs the same sweep as VPU-resident f32.
        # impl='interpret' runs it in Pallas interpret mode (CPU parity test)
        W = _pairs_argmin_tpu(u, v, lift, gd, mask, d_eps_a,
                              interpret=(impl == "interpret"))  # (A, K, K)
        has = W >= 0
        W = jnp.maximum(W, 0)
    else:
        W, has = _pairs_argmin_xla(uv, u, v, lift, gd, mask, d_eps_a)

    # mutual agreement: W[i,j]=k ∧ W[j,k]=i ∧ W[k,i]=j.
    # The four indexed reads W/has[a, j, k] and W/has[a, k, i] (k = W[a,i,j])
    # are one-hot contractions over k, NOT take_along_axis gathers: the flat
    # (A, K²)-axis gather lowers to the TPU scalar path and measured
    # ~1.5 ms × 4 × 8 chunks ≈ 48 ms/frame at (512, 48) — the single
    # largest op in the whole joint program.  One-hot rows have exactly one
    # nonzero and W/has values are small ints, so f32 contraction is exact.
    ar = jnp.arange(K, dtype=jnp.int32)
    ii, jj = ar[:, None], ar[None, :]
    f32 = jnp.float32
    ohW = (W[..., None] == ar).astype(f32)                 # (A, K, K, Km)
    Wv = jnp.maximum(W, 0).astype(f32)
    hv = has.astype(f32)
    # X_jk[a,i,j] = X[a, j, m]·onehot_m ;  X_ki[a,i,j] = X[a, m, i]·onehot_m
    W_jk = jnp.einsum("aijm,ajm->aij", ohW, Wv)
    h_jk = jnp.einsum("aijm,ajm->aij", ohW, hv)
    W_ki = jnp.einsum("aijm,ami->aij", ohW, Wv)
    h_ki = jnp.einsum("aijm,ami->aij", ohW, hv)
    agree = (has & (h_jk > 0.5) & (h_ki > 0.5)
             & (W_jk == ii[None].astype(f32)) & (W_ki == jj[None].astype(f32)))
    # emit each triangle once, from the directed edge leaving its min vertex
    emit = agree & (ii[None] < jj[None]) & (ii[None] < W)
    return W, emit


def angle_filter(p0: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray,
                 max_angle_deg: float) -> jnp.ndarray:
    """Sliver filter on 3-D vertex triples (..., 3): max interior angle gate
    (reference is_face_is_ok, mesh_rec_geometry.cpp:40-57)."""
    def ang(a, b, c):
        u = b - a
        v = c - a
        cosv = jnp.sum(u * v, axis=-1) / jnp.maximum(
            jnp.linalg.norm(u, axis=-1) * jnp.linalg.norm(v, axis=-1), 1e-12
        )
        return jnp.arccos(jnp.clip(cosv, -1.0, 1.0))

    a0 = ang(p0, p1, p2)
    a1 = ang(p1, p2, p0)
    a2 = ang(p2, p0, p1)
    max_a = jnp.maximum(a0, jnp.maximum(a1, a2))
    return max_a < jnp.deg2rad(max_angle_deg)


def compact_triangles(keep: jnp.ndarray, tris, cap: int, payload=None,
                      payload_bits: int = 6):
    """Per-voxel compaction (A, T) bool → (A, cap) candidate-row ids, mask.

    Overflow beyond `cap` kept triangles per voxel is dropped (bounded loss,
    like the reference's queue back-pressure drops).

    Implemented as a top-k selection, NOT a cumsum+scatter: a scatter with
    A·T indices serializes on TPU and dominated the meshing frame time
    (~43 ms/frame at A=64, T=17k); top_k of a rank key is a parallel
    partial sort and keeps the same first-cap-in-order semantics.

    `payload` ((A, T) small non-negative int32, < 2^payload_bits): values
    carried through the compaction INSIDE the rank key's low bits — the
    selected rows' payloads come back as a third output with no gather.
    (A post-hoc payload lookup at the selected rows needs either a generic
    axis-1 gather — TPU scalar path, ~50 ms/frame at (512, 48²) — or exact
    one-hot matmuls, measured ~13 ms/frame; the key packing is free.)"""
    A, T = keep.shape
    # kept candidates rank by ascending position (T−i > 0); dropped rank −1
    rank = jnp.where(keep,
                     jnp.int32(T) - jnp.arange(T, dtype=jnp.int32)[None, :],
                     jnp.int32(-1))
    if payload is not None:
        assert T < (1 << (30 - payload_bits)), "rank·payload must fit int32"
        key = jnp.where(keep, (rank << payload_bits) | payload, jnp.int32(-1))
    else:
        key = rank
    k = min(cap, T)  # top_k requires k ≤ T (configs with cap > candidates)
    top_key, rows = jax.lax.top_k(key, k)                       # (A, k)
    if k < cap:
        top_key = jnp.pad(top_key, ((0, 0), (0, cap - k)),
                          constant_values=-1)
        rows = jnp.pad(rows, ((0, 0), (0, cap - k)))
    rmask = top_key > 0
    rows = jnp.where(rmask, rows, -1)
    if payload is not None:
        pay = jnp.where(rmask, top_key & ((1 << payload_bits) - 1), 0)
        return rows, rmask, pay
    return rows, rmask
