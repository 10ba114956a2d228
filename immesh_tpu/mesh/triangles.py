"""Owner-computes triangle store + the per-frame incremental mesh step.

Re-design of the reference's triangle management (reference
src/meshing/r3live/triangle.{hpp,cpp}: global `m_triangle_hash` keyed by
sorted vertex-id triples, per-point incidence maps, per-region mutex-guarded
`Sync_triangle_set`s; diffed per re-mesh by `triangle_compare`,
mesh_rec_geometry.cpp:137-172, and pushed under one big lock,
ImMesh_mesh_reconstruction.cpp:228-244).

TPU re-design — no global hash, no locks, no diff:
  * every triangle is OWNED by the meshing voxel its centroid falls in;
  * when a voxel re-meshes, its triangle list is REPLACED wholesale — a stale
    border triangle disappears because its owner re-meshes too (the active set
    is dilated to occupied neighbors, global_map.append_frame);
  * duplicate suppression is geometric instead of associative: the voxels
    around a border all compute the same Delaunay locally (their pulled point
    sets agree inside the shared circumcircles), and exactly one contains the
    centroid — so each triangle is emitted exactly once with no coordination.
This makes the triangle store embarrassingly shardable by space (the
multi-host partition dimension, SURVEY.md P6→§7).

Winding / orientation mirrors `correct_triangle_index`
(mesh_rec_geometry.cpp:399-433): triangle normal flipped to face the sensor.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from immesh_tpu.config import MeshConfig
from immesh_tpu.mesh.delaunay import (
    angle_filter, compact_triangles, delaunay_pairs_w, pca_project,
)
from immesh_tpu.mesh.global_map import GlobalPointMap


def _pos_hash(pts: jnp.ndarray) -> jnp.ndarray:
    """(…, 3) f32 → (…,) int32 hash of the position BITS.

    Used as the cocircular-tie perturbation key and the canonical vertex
    order so both are functions of the point itself, not of its store slot:
    a point's local id differs between map shards (dist/mesh.py bump-allocates
    per chip), but its stored position is bitwise identical, so neighboring
    shards break Delaunay ties identically and the owner-computes centroid
    dedup stays exact across chip boundaries."""
    b = jax.lax.bitcast_convert_type(pts, jnp.int32)
    return (b[..., 0] * jnp.int32(-1640531527)
            ^ b[..., 1] * jnp.int32(668265263)
            ^ b[..., 2] * jnp.int32(374761393))


def _consumed(zeros_tree, *xs):
    """DEBUG anti-DCE for cfg.ablate truncations: fold a runtime f32 zero
    that data-depends on every measured intermediate into the dummy
    outputs.  Must go through f32 — XLA's algebraic simplifier folds an
    INT ×0 to a constant and silently deletes the measured prefix (this
    bug made several round-4/5 ablation variants measure an empty
    program); f32 ×0.0 survives because NaN/Inf semantics must be
    preserved."""
    s = jnp.float32(0.0)
    for x in xs:
        s = s + jnp.sum(x).astype(jnp.float32)
    s = s * jnp.float32(0.0)
    return jax.tree_util.tree_map(lambda z: z + s.astype(z.dtype), zeros_tree)


@struct.dataclass
class TriangleStore:
    tri_ids: jnp.ndarray   # (V, C, 3) int32 global point ids, winding order; -1 pad
    tri_n: jnp.ndarray     # (V,) int32 triangles per voxel
    dirty: jnp.ndarray     # (V,) bool — re-meshed since last viz sync

    cfg: MeshConfig = struct.field(pytree_node=False)

    @classmethod
    def create(cls, cfg: MeshConfig) -> "TriangleStore":
        V, C = cfg.voxel_capacity, cfg.tris_per_voxel
        return cls(
            tri_ids=jnp.full((V, C, 3), -1, jnp.int32),
            tri_n=jnp.zeros(V, jnp.int32),
            dirty=jnp.zeros(V, bool),
            cfg=cfg,
        )

    def n_triangles(self) -> jnp.ndarray:
        return jnp.sum(self.tri_n)

    def clear_dirty(self) -> "TriangleStore":
        return self.replace(dirty=jnp.zeros_like(self.dirty))


def remap_store(store: TriangleStore, slot_map: jnp.ndarray,
                idmap: jnp.ndarray) -> TriangleStore:
    """Carry the triangle store through a GlobalPointMap.compact: move each
    surviving voxel's row to its new slot, rewrite vertex ids through the
    old→new point map, and drop triangles that lost a vertex (border
    triangles referencing halo points in evicted voxels).  Rows are
    re-compacted so tri_n stays the prefix length consumers rely on."""
    V, C, _ = store.tri_ids.shape
    ids = store.tri_ids
    remapped = jnp.where(ids >= 0, idmap[jnp.maximum(ids, 0)], -1)
    valid = jnp.all(remapped >= 0, axis=-1)                   # (V, C)
    # stable per-row compaction: valid triangles first, order preserved
    order = jnp.argsort(~valid, axis=-1, stable=True)          # (V, C)
    packed = jnp.take_along_axis(remapped, order[..., None], axis=1)
    vmask = jnp.take_along_axis(valid, order, axis=1)
    packed = jnp.where(vmask[..., None], packed, -1)
    counts = jnp.sum(vmask, axis=-1).astype(jnp.int32)

    keep = slot_map >= 0
    tgt = jnp.where(keep, jnp.maximum(slot_map, 0), V)
    tri_ids = jnp.full_like(store.tri_ids, -1).at[tgt].set(packed, mode="drop")
    tri_n = jnp.zeros_like(store.tri_n).at[tgt].set(counts, mode="drop")
    # everything moved: let the viewer resync every surviving region
    dirty = jnp.zeros_like(store.dirty).at[tgt].set(
        jnp.ones(V, bool), mode="drop")
    return store.replace(tri_ids=tri_ids, tri_n=tri_n, dirty=dirty)


def mesh_voxels(gm: GlobalPointMap, store: TriangleStore,
                slots: jnp.ndarray, smask: jnp.ndarray,
                sensor_pos: jnp.ndarray,
                chunk: int = 16) -> Tuple[TriangleStore, jnp.ndarray]:
    """Re-triangulate the active voxels and replace their triangle lists.
    Returns (store, n_emitted, n_dropped) — n_emitted is the number of
    triangles BUILT this frame (the mesh throughput unit, not net store
    growth); n_dropped counts capacity-cap losses."""
    ids, counts, dropped = triangulate_voxels(
        gm, slots, smask, sensor_pos, store.cfg, chunk)
    n_emitted = jnp.sum(jnp.where(smask, counts, 0))
    return apply_triangles(store, slots, smask, ids, counts), n_emitted, dropped


def apply_triangles(store: TriangleStore, slots: jnp.ndarray,
                    smask: jnp.ndarray, ids: jnp.ndarray,
                    counts: jnp.ndarray) -> TriangleStore:
    """Replace the owning voxels' triangle lists wholesale (the reference's
    remove/insert diff under one mutex, ImMesh_mesh_reconstruction.cpp:228-244,
    is unnecessary: full replace of owner lists is idempotent and lock-free)."""
    V = store.tri_n.shape[0]
    tgt = jnp.where(smask, slots, V)
    return store.replace(
        tri_ids=store.tri_ids.at[tgt].set(ids, mode="drop"),
        tri_n=store.tri_n.at[tgt].set(counts, mode="drop"),
        dirty=store.dirty.at[tgt].set(True, mode="drop"),
    )


def triangulate_voxels(gm: GlobalPointMap, slots: jnp.ndarray,
                       smask: jnp.ndarray, sensor_pos: jnp.ndarray,
                       cfg: MeshConfig, chunk: int = 16
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pure compute: active voxels → (ids (A, C, 3) global pt ids, counts (A,),
    dropped () — triangles lost to the per-voxel C2/C capacity caps).

    The per-voxel pipeline (pull → PCA project → Delaunay → filters →
    ownership → winding) matches `incremental_mesh_reconstruction`
    (reference ImMesh_mesh_reconstruction.cpp:92-267); the TBB
    parallel_for_each over voxels becomes chunked vmapped kernels.  Pure so
    the multi-chip path can shard voxels across devices and all_gather the
    results (dist/mesh.py).
    """
    A = slots.shape[0]
    C = cfg.tris_per_voxel
    res = cfg.voxel_resolution

    if cfg.ablate == "skip_tri":
        return (jnp.full((A, C, 3), -1, jnp.int32),
                jnp.zeros(A, jnp.int32), jnp.zeros((), jnp.int32))

    pull = gm.pull_neighborhood(slots, smask)
    pts, pmask, gidx = pull["pts"], pull["mask"], pull["idx"]
    pts_sm = pull["pts_sm"]     # smoothed geometry feeds the PCA/Delaunay;
    # raw positions keep feeding hashes/centroids/winding (chip-invariant)
    vox_key = gm.vox.keys[jnp.maximum(slots, 0), :3]          # (A, 3) int32

    # a full Delaunay of K pulled points has ≤ 2K−5 triangles, of which only
    # the voxel-owned subset (≤ C) survives; compacting to C2 right after the
    # Delaunay test keeps every later filter on a tiny (a, C2) set instead of
    # the full (a, K²) candidate axis
    C2 = min(4 * C, 2 * cfg.pull_capacity)

    def one_chunk(args):
        """Full per-chunk pipeline, skipped wholesale when the chunk has no
        active voxel: the active work list is compacted (valid slots first),
        so in steady state most chunks are padding — lax.cond makes their
        cost zero instead of full O(K⁴) (the reference's TBB loop likewise
        only visits voxels with new points,
        ImMesh_mesh_reconstruction.cpp:129-132)."""
        pts_c, sm_c, pmask_c, gidx_c, key_c = args
        a = pts_c.shape[0]
        return jax.lax.cond(
            jnp.any(pmask_c),
            lambda: _chunk_impl(pts_c, sm_c, pmask_c, gidx_c, key_c),
            lambda: (jnp.full((a, C, 3), -1, jnp.int32),
                     jnp.zeros(a, jnp.int32), jnp.zeros((), jnp.int32)),
        )

    def _zeros(a):
        return (jnp.full((a, C, 3), -1, jnp.int32),
                jnp.zeros(a, jnp.int32), jnp.zeros((), jnp.int32))

    def _chunk_impl(pts_c, sm_c, pmask_c, gidx_c, key_c):
        a = pts_c.shape[0]
        if cfg.ablate == "pull0":
            return _consumed(_zeros(a), pts_c, pmask_c)
        K = pts_c.shape[1]
        uv, _, _ = pca_project(sm_c, pmask_c)
        phash = _pos_hash(pts_c)                              # (a, K)
        if cfg.ablate == "argmin0":
            from immesh_tpu.mesh.delaunay import _pairs_argmin_tpu
            W = _pairs_argmin_tpu(uv[..., 0], uv[..., 1],
                                  uv[..., 0] ** 2 + uv[..., 1] ** 2,
                                  uv[..., 0] ** 2 + uv[..., 1] ** 2,
                                  pmask_c, jnp.full(a, 1e-6, jnp.float32))
            return _consumed(_zeros(a), W)
        W, emit = delaunay_pairs_w(uv, pmask_c, tiebreak=phash,
                                   tie_scale=cfg.tie_scale)   # (a,K,K) ×2
        keep = emit.reshape(a, K * K)
        if cfg.ablate == "pairs0":
            return _consumed(_zeros(a), keep, W)

        # the third-vertex index W[i,j] rides through the compaction inside
        # the top-k key's low bits (compact_triangles payload) — replacing
        # the two exact one-hot matmul lookups used previously, which the
        # r5 ablation measured at ~13 ms/frame at (1024, 48²) bench shapes
        pbits = max(6, (K - 1).bit_length())
        rows, rmask, t2 = compact_triangles(
            keep, None, C2,
            payload=jnp.maximum(W, 0).reshape(a, K * K).astype(jnp.int32),
            payload_bits=pbits)                               # (a, C2) ×3
        if cfg.ablate == "compact0":
            return _consumed(_zeros(a), rows, rmask, t2)
        drop1 = jnp.sum(jnp.maximum(
            jnp.sum(keep.astype(jnp.int32), axis=-1) - C2, 0))
        # i/j come for free as div/mod of the flat pair id
        rowc = jnp.maximum(rows, 0)
        t0 = rowc // K
        t1 = rowc - t0 * K
        if cfg.ablate == "fake_tri3":
            t2 = (t0 + t1) % K
        tri3 = jnp.stack([t0, t1, t2], axis=-1)               # (a, C2, 3)
        if cfg.ablate == "tri30":
            return _consumed(_zeros(pts_c.shape[0]), tri3)

        # vertex positions/ids via one-hot contractions (exact: one nonzero
        # per row, ids < 2²⁴) — take_along_axis from the K axis measured
        # ~1.5 ms per gather here (TPU scalar path), the einsums are ~µs
        ar = jnp.arange(K, dtype=jnp.int32)
        oh3 = (tri3[..., None] == ar).astype(pts_c.dtype)     # (a, C2, 3, K)
        v012 = jnp.einsum("actk,akd->actd", oh3, pts_c)       # (a, C2, 3, 3)
        v0, v1, v2 = v012[:, :, 0], v012[:, :, 1], v012[:, :, 2]
        gidx_f = jnp.maximum(gidx_c, -1).astype(pts_c.dtype)
        i012 = jnp.einsum("actk,ak->act", oh3, gidx_f)
        i0 = i012[..., 0].astype(jnp.int32)
        i1 = i012[..., 1].astype(jnp.int32)
        i2 = i012[..., 2].astype(jnp.int32)

        keep2 = rmask & angle_filter(v0, v1, v2, cfg.max_tri_angle_deg)
        if cfg.ablate == "gather0":
            return _consumed(_zeros(pts_c.shape[0]), v0, i0, i1, i2, keep2)
        if cfg.max_edge_scale > 0:
            emax = cfg.max_edge_scale * cfg.pts_minimum_scale
            keep2 = keep2 & (
                (jnp.linalg.norm(v1 - v0, axis=-1) < emax)
                & (jnp.linalg.norm(v2 - v1, axis=-1) < emax)
                & (jnp.linalg.norm(v0 - v2, axis=-1) < emax)
            )

        # canonical vertex order (ascending position hash — chip-invariant,
        # unlike store-local point ids) so the centroid is bitwise identical
        # in every voxel that generates this triangle — otherwise last-ulp
        # drift lets two voxels (possibly on two chips) both claim a triangle
        # whose centroid sits exactly on their shared face.  Hashes are
        # recomputed from the gathered vertex positions (hash = f(position
        # bits), so this equals gathering phash — without an int32 gather,
        # which f32 one-hot contractions cannot express exactly)
        h0 = _pos_hash(v0)
        h1 = _pos_hash(v1)
        h2 = _pos_hash(v2)

        def sort3(k0, k1, k2, a0, a1, a2, p0, p1, p2):
            def sw2(c, x, y):
                return jnp.where(c, y, x), jnp.where(c, x, y)

            def sw3(c, x, y):
                return (jnp.where(c[..., None], y, x),
                        jnp.where(c[..., None], x, y))

            c = k0 > k1
            k0, k1 = sw2(c, k0, k1)
            a0, a1 = sw2(c, a0, a1)
            p0, p1 = sw3(c, p0, p1)
            c = k1 > k2
            k1, k2 = sw2(c, k1, k2)
            a1, a2 = sw2(c, a1, a2)
            p1, p2 = sw3(c, p1, p2)
            c = k0 > k1
            a0, a1 = sw2(c, a0, a1)
            p0, p1 = sw3(c, p0, p1)
            return a0, a1, a2, p0, p1, p2

        s0, s1, s2, q0, q1, q2 = sort3(h0, h1, h2, i0, i1, i2, v0, v1, v2)
        cen = ((q0 + q1) + q2) * (1.0 / 3.0)
        cen_key = jnp.floor(cen / res).astype(jnp.int32)      # (a, C2, 3)
        keep2 = keep2 & jnp.all(cen_key == key_c[:, None, :], axis=-1)
        if cfg.ablate == "sort30":
            return _consumed(_zeros(pts_c.shape[0]), s0, s1, s2, q0, keep2)

        rows2, rmask2 = compact_triangles(keep2, tri3, C)     # (a, C) → C2 rows
        drop2 = jnp.sum(jnp.maximum(
            jnp.sum(keep2.astype(jnp.int32), axis=-1) - C, 0))
        r2 = jnp.maximum(rows2, 0)
        # same one-hot-contraction trick as above (sorted ids are global
        # point ids < 2²⁴, exact in f32; positions exact by construction)
        oh2 = (r2[..., None] == jnp.arange(C2, dtype=jnp.int32)
               ).astype(pts_c.dtype)                          # (a, C, C2)

        def takei(x):
            return jnp.einsum("acr,ar->ac", oh2,
                              x.astype(pts_c.dtype)).astype(jnp.int32)

        def takev(x):
            return jnp.einsum("acr,ard->acd", oh2, x)

        ids = jnp.stack([takei(s0), takei(s1), takei(s2)], axis=-1)  # (a,C,3)
        w0, w1, w2 = takev(q0), takev(q1), takev(q2)

        # winding: flip so normal faces the sensor (correct_triangle_index)
        nrm = jnp.cross(w1 - w0, w2 - w0)
        cen3 = ((w0 + w1) + w2) * (1.0 / 3.0)
        flip = jnp.sum(nrm * (sensor_pos - cen3), axis=-1) < 0
        ids = jnp.where(
            flip[..., None],
            jnp.stack([ids[..., 0], ids[..., 2], ids[..., 1]], axis=-1),
            ids,
        )
        ids = jnp.where(rmask2[..., None], ids, -1)
        return ids, rmask2.sum(axis=-1).astype(jnp.int32), drop1 + drop2

    # chunk over voxels to bound the (chunk, T, K) incircle intermediate
    pad = (-A) % chunk
    def padc(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    n_chunks = (A + pad) // chunk
    def reshape_c(x):
        return padc(x).reshape((n_chunks, chunk) + x.shape[1:])

    ids, counts, dropped = jax.lax.map(
        one_chunk,
        (reshape_c(pts), reshape_c(pts_sm), reshape_c(pmask),
         reshape_c(gidx), reshape_c(vox_key)),
    )
    return (ids.reshape(n_chunks * chunk, C, 3)[:A],
            counts.reshape(-1)[:A], jnp.sum(dropped))
