"""Multi-chip meshing: voxel-parallel Delaunay over the device mesh.

The reference parallelizes per-voxel triangulation with a 12-thread pool + TBB
(SURVEY.md P2/P3, ImMesh_mesh_reconstruction.cpp:129).  Here the active-voxel
batch — the dominant meshing cost — is sharded across chips on the same axis
the LIO uses for points:

  * the (already point-sharded) world scan is all_gathered and every replica
    applies the IDENTICAL global-map append (deterministic, so replicas stay
    bit-identical without communication beyond the gather);
  * each chip triangulates its slice of the active voxels (the expensive
    incircle kernels run voxel-parallel over ICI-connected chips);
  * per-chip triangle lists are all_gathered and applied identically.

Owner-computes (mesh/triangles.py) means no cross-chip write conflicts exist
by construction.  Two strategies live here:

  * `make_mp_mesh_step` — compute-parallel only: the global point map and
    triangle store are REPLICATED on every chip (capacity bounded by one
    chip's HBM); active voxels are sliced across chips, triangle lists
    all_gathered back.  Kept for the small-map / dp-matched path.
  * `ShardedMeshMap` + `make_sharded_mesh_step` — capacity-parallel: world
    space is striped into x-slabs of `slab_voxels` meshing voxels (the same
    mod-striping as dist/sharded_map.py, the TPU realization of the
    reference's 10 m spatial region shards, reference
    src/meshing/r3live/triangle.cpp:35-53); slab s is OWNED by chip
    s mod n, so each chip stores ~1/n of the points, voxels, and triangles —
    total mesh capacity scales linearly with the mesh.

The sharded path needs NO collective beyond the scan all_gather the
compute-parallel path already pays: because every chip sees the full scan,
each chip simply appends the points of its OWNED voxel columns plus a
2-column HALO on each slab edge.  The append is PRE-PARTITIONED: the
gathered scan is compacted to the owned+halo rows (an order-preserving
cumsum-scatter) before the in-frame dedup, and the per-frame budgets
(max_pts_per_frame / file_voxels_per_frame / active_voxels_per_frame) are
scaled by the keep fraction, so per-chip append cost is O(N/n + halo)
rather than O(N) — the term that previously made summed multi-chip mesh
cost grow ∝ n (docs/scaling.md).  Boundary voxels are therefore populated
bitwise-identically on both sides (same gathered scan, same in-frame dedup
representatives — the halo is wide enough that every dedup cell feeding a
pulled point is fully inside both chips' append masks), so the
centroid-ownership triangle dedup (mesh/triangles.py) stays exact across
chip boundaries: Delaunay ties and canonical vertex order are derived from
position bits (_pos_hash), not store-local ids.  Each chip triangulates only
the active voxels it owns; triangle rows land in the chip-local store.
`gather_mesh` assembles the shards into one host-side (pts, tris) pair for
export/viewing (ids offset by shard).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from immesh_tpu.config import ImMeshConfig, MeshConfig
from immesh_tpu.mesh.global_map import GlobalPointMap
from immesh_tpu.mesh.triangles import (
    TriangleStore, apply_triangles, triangulate_voxels,
)

# halo width in voxel columns on EACH side of an owned slab (see
# ShardedMeshMap docstring for the width-2 invariant)
_HALO_COLS = 2


def shard_keep_fraction(slab_voxels: int, n_shards: int) -> float:
    """Expected fraction of a (spatially uniform) scan a chip appends:
    its owned slabs plus the 2-column halo on each slab edge."""
    if n_shards <= 1:
        return 1.0
    return min(1.0, (slab_voxels + 2 * _HALO_COLS) / (slab_voxels * n_shards))


def shard_mesh_config(mesh_cfg: MeshConfig, n_shards: int,
                      slab_voxels: int, margin: float = 1.5) -> MeshConfig:
    """Scale the PER-FRAME budgets of a mesh config by the shard keep
    fraction (×margin headroom for spatial non-uniformity).

    This is the second half of the dedup pre-partition (docs/scaling.md): the
    compacted append buffer shrinks the O(N log N) in-frame dedup sort to
    O(N/n), but the budget-sized stages (hash-insert candidates =
    min(rows, max_pts_per_frame), voxel filing, active re-mesh set) would
    otherwise stay replicated at full size on every chip and cap mesh-append
    scaling at 1×.  CAPACITIES are untouched — each shard keeps a full-size
    store, which is exactly the capacity-scaling story.  Floors keep tiny
    test workloads behaving like the single-chip path."""
    f = shard_keep_fraction(slab_voxels, n_shards) * margin
    if f >= 1.0:
        return mesh_cfg

    def scale(v: int, floor: int) -> int:
        # never raise a budget above its configured value (tiny test
        # configs sit below the floors), never scale below the floor
        return max(min(v, floor), int(v * f))

    act = scale(mesh_cfg.active_voxels_per_frame, 128)
    return dataclasses.replace(
        mesh_cfg,
        max_pts_per_frame=scale(mesh_cfg.max_pts_per_frame, 2048),
        file_voxels_per_frame=scale(mesh_cfg.file_voxels_per_frame, 512),
        active_voxels_per_frame=act,
        # the kernel chunk must track the scaled active set: a chunk sized
        # for the single-chip budget makes each chip pad its small active
        # set to one mostly-empty mega-chunk (chunk=512 vs ~40 live voxels
        # at n=8 blew the r5 CPU scaling curve 4×)
        mesh_chunk=max(8, min(mesh_cfg.mesh_chunk, _round_up(act // 4, 8))),
    )


def _mp_mesh_body(gm: GlobalPointMap, store: TriangleStore,
                  scan_local: jnp.ndarray, mask_local: jnp.ndarray,
                  sensor_pos: jnp.ndarray,
                  cfg: ImMeshConfig, axis: str, n_dev: int):
    pts_all = jax.lax.all_gather(scan_local, axis).reshape(-1, 3)
    mask_all = jax.lax.all_gather(mask_local, axis).reshape(-1)

    gm, slots, smask, _ = gm.append_frame(pts_all, mask_all)  # identical/replica
    if cfg.mesh.pull_smooth_lam > 0:
        # replicated smoothing over the FULL active set before voxels are
        # sharded — every chip must read identical smoothed geometry
        gm = gm.smooth_active(slots, smask)

    # shard the active voxels over the axis
    A = slots.shape[0]
    per = A // n_dev
    d = jax.lax.axis_index(axis)
    sl = jax.lax.dynamic_slice_in_dim(slots, d * per, per)
    sm = jax.lax.dynamic_slice_in_dim(smask, d * per, per)

    ids, counts, _ = triangulate_voxels(
        gm, sl, sm, sensor_pos, cfg.mesh, cfg.mesh.mesh_chunk)

    # gather every chip's results → identical store update everywhere
    ids_all = jax.lax.all_gather(ids, axis).reshape(-1, *ids.shape[1:])
    counts_all = jax.lax.all_gather(counts, axis).reshape(-1)
    sl_all = jax.lax.all_gather(sl, axis).reshape(-1)
    sm_all = jax.lax.all_gather(sm, axis).reshape(-1)
    store = apply_triangles(store, sl_all, sm_all, ids_all, counts_all)

    gm = gm.mark_meshed(slots, smask)
    return gm, store, jnp.sum(smask.astype(jnp.int32))


def make_mp_mesh_step(mesh: Mesh, cfg: ImMeshConfig, axis: str = "dp"):
    """Jitted voxel-parallel mesh step; scan input sharded over `axis`
    (matching the dp LIO step's world-scan output sharding)."""
    body = functools.partial(_mp_mesh_body, cfg=cfg, axis=axis,
                             n_dev=mesh.shape[axis])
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


# ======================================================================
# capacity-sharded meshing: each chip owns x-slabs of meshing voxels
# ======================================================================

def mesh_column_owner(col: jnp.ndarray, slab_voxels: int, n_shards: int
                      ) -> jnp.ndarray:
    """x voxel column (at voxel_resolution) → owning shard id."""
    return (col // slab_voxels) % n_shards


@struct.dataclass
class ShardedMeshMap:
    """One chip's mesh shard: a GlobalPointMap + TriangleStore holding the
    chip's OWNED voxel columns plus a 2-column halo on each slab edge.

    The halo width-2 invariant: owned voxels pull 27-neighborhoods (±1
    column); a pulled point near the slab edge may belong to a dedup cell
    straddling a voxel boundary, and the in-frame dedup representative
    (map/hash.frame_unique_coords `first`) is only chip-consistent when every
    point of that cell is inside the chip's append mask — 2 columns of halo
    guarantee it for all points any owned voxel can pull."""

    gm: GlobalPointMap
    store: TriangleStore
    shard_id: jnp.ndarray         # () int32
    n_shards: int = struct.field(pytree_node=False)
    slab_voxels: int = struct.field(pytree_node=False)
    # headroom factor sizing the pre-partition append buffer (and the scaled
    # per-frame budgets) above the uniform-scan keep fraction — spatially
    # non-uniform frames overflow the buffer past this margin and the excess
    # is DROPPED (counted in the step's n_part_drops output)
    append_margin: float = struct.field(pytree_node=False, default=1.5)

    @classmethod
    def create(cls, cfg: ImMeshConfig, shard_id: int, n_shards: int,
               slab_voxels: int = 8, append_margin: float = 1.5
               ) -> "ShardedMeshMap":
        mc = shard_mesh_config(cfg.mesh, n_shards, slab_voxels, append_margin)
        return cls(gm=GlobalPointMap.create(mc),
                   store=TriangleStore.create(mc),
                   shard_id=jnp.asarray(shard_id, jnp.int32),
                   n_shards=n_shards, slab_voxels=slab_voxels,
                   append_margin=append_margin)

    def _owner(self, col: jnp.ndarray) -> jnp.ndarray:
        return mesh_column_owner(col, self.slab_voxels, self.n_shards)

    def append_keep(self, pts_world: jnp.ndarray) -> jnp.ndarray:
        """(N,) bool — point is in an owned column or the 2-column halo."""
        col = jnp.floor(
            pts_world[:, 0] / self.gm.cfg.voxel_resolution).astype(jnp.int32)
        keep = self._owner(col) == self.shard_id
        for d in range(-_HALO_COLS, _HALO_COLS + 1):
            if d:
                keep = keep | (self._owner(col + d) == self.shard_id)
        return keep

    def owns_voxel(self, slots: jnp.ndarray) -> jnp.ndarray:
        """(A,) bool — voxel slot's column is owned (not halo)."""
        col = self.gm.vox.keys[jnp.maximum(slots, 0), 0]
        return self._owner(col) == self.shard_id

    def n_owned_triangles(self) -> jnp.ndarray:
        return self.store.n_triangles()


def _round_up(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def _sharded_mesh_body(smm_stacked, scan_local, mask_local, sensor_pos,
                       cfg: ImMeshConfig, axis: str):
    smm: ShardedMeshMap = jax.tree_util.tree_map(
        lambda x: x[0], smm_stacked)
    pts_all = jax.lax.all_gather(scan_local, axis).reshape(-1, 3)
    mask_all = jax.lax.all_gather(mask_local, axis).reshape(-1)

    keep = mask_all & smm.append_keep(pts_all)

    # ---- dedup pre-partition (docs/scaling.md upgrade path) --------------
    # Compact the gathered scan to THIS chip's owned+halo rows before
    # append_frame, so the in-frame dedup (a lexicographic sort over the
    # append buffer) runs on ~N/n + halo rows instead of the full N — the
    # term that previously made summed multi-chip mesh cost grow ∝ n.  The
    # buffer M is static: expected keep fraction × append_margin, and a
    # cumsum-scatter (O(N) elementwise, no sort) preserves row order, so the
    # first-occurrence dedup representatives are bitwise those of the
    # uncompacted masked append.  Overflow beyond M (pathologically
    # non-uniform frames) drops the excess rows — counted, like every other
    # bounded loss.  Reference analogue being replaced: every mesh worker
    # locks and touches the whole global map (g_mutex_append_map,
    # ImMesh_mesh_reconstruction.cpp:113-116) vs region-sharded mutexes
    # (triangle.cpp:35-53).
    N = pts_all.shape[0]
    f = shard_keep_fraction(smm.slab_voxels, smm.n_shards)
    M = (N if f * smm.append_margin >= 1.0
         else min(N, _round_up(int(N * f * smm.append_margin), 256)))
    if M < N:
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        tgt = jnp.where(keep & (pos < M), pos, M)
        pts_c = jnp.zeros((M, 3), pts_all.dtype).at[tgt].set(
            pts_all, mode="drop")
        n_kept = jnp.sum(keep.astype(jnp.int32))
        mask_c = jnp.arange(M, dtype=jnp.int32) < n_kept
        n_part_drop = jnp.maximum(n_kept - M, 0)
    else:
        pts_c, mask_c = pts_all, keep
        n_part_drop = jnp.zeros((), jnp.int32)

    gm, slots, smask, _ = smm.gm.append_frame(pts_c, mask_c)
    mc = smm.gm.cfg     # the budget-SCALED mesh config (shard_mesh_config)
    if mc.pull_smooth_lam > 0:
        # smooth ALL active voxels this chip appended (own + halo): halo
        # copies of a point smooth from the same raw geometry, so owner and
        # neighbor read matching values up to summation order
        gm = gm.smooth_active(slots, smask)
    smm = smm.replace(gm=gm)  # ownership must read the POST-append table —
    # freshly inserted slots are EMPTY in the old one (key x = sentinel)

    # triangulate only the active voxels this chip OWNS — halo voxels are
    # re-meshed by their owner, whose halo covers this chip's edge points
    smask_own = smask & smm.owns_voxel(slots)
    ids, counts, _ = triangulate_voxels(
        gm, slots, smask_own, sensor_pos, mc, mc.mesh_chunk)
    store = apply_triangles(smm.store, slots, smask_own, ids, counts)
    # mark the FULL pre-ownership active set meshed: a halo voxel left
    # pending (vox_new>0) would re-enter the backlog every frame and
    # monotonically crowd owned voxels out of the active budget — clearing
    # it locally is safe because the owner chip keeps its own backlog and
    # this chip's owned border voxels were re-meshed via dilation this frame
    smm = smm.replace(gm=gm.mark_meshed(slots, smask), store=store)
    n_tris = jax.lax.psum(store.n_triangles(), axis)
    n_active = jax.lax.psum(jnp.sum(smask_own.astype(jnp.int32)), axis)
    n_part_drop = jax.lax.psum(n_part_drop, axis)
    smm_stacked = jax.tree_util.tree_map(lambda x: x[None], smm)
    return smm_stacked, n_active, n_tris, n_part_drop


def create_sharded_mesh(mesh: Mesh, cfg: ImMeshConfig, *, axis: str = "dp",
                        slab_voxels: int = 8, append_margin: float = 1.5):
    """Per-chip mesh shards in stacked form ((n_dev, …), sharded over axis)."""
    n = mesh.shape[axis]
    shards = [ShardedMeshMap.create(cfg, i, n, slab_voxels, append_margin)
              for i in range(n)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *shards)
    sh = jax.sharding.NamedSharding(mesh, P(axis))
    return jax.device_put(
        stacked, jax.tree_util.tree_map(lambda _: sh, stacked))


def make_sharded_mesh_step(mesh: Mesh, cfg: ImMeshConfig, axis: str = "dp"):
    """Jitted capacity-sharded mesh step.

    In: smm_stacked ((n_dev, …) sharded over axis), scan + mask sharded over
    axis (the dp LIO world-scan layout), sensor_pos replicated.
    Out: (smm_stacked, n_active, n_triangles, n_part_drops) — n_part_drops
    counts rows lost to pre-partition buffer overflow (≈0 unless a frame is
    pathologically concentrated in one chip's slabs)."""
    body = functools.partial(_sharded_mesh_body, cfg=cfg, axis=axis)
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis, None), P(axis), P()),
        out_specs=(P(axis), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def gather_mesh(smm_stacked) -> dict:
    """Host-side assembly of the shard stores into one mesh: concatenated
    vertex array + triangle ids offset per shard (id = shard·P + local)."""
    pts = np.asarray(smm_stacked.gm.pts)            # (n, P, 3)
    counts = np.asarray(smm_stacked.gm.pt_count)    # (n,)
    tri_ids = np.asarray(smm_stacked.store.tri_ids)  # (n, V, C, 3)
    n, Pcap = pts.shape[0], pts.shape[1]
    all_tris = []
    for s in range(n):
        t = tri_ids[s].reshape(-1, 3)
        t = t[np.all(t >= 0, axis=1)]
        all_tris.append(t + s * Pcap)
    tris = (np.concatenate(all_tris, axis=0) if all_tris
            else np.zeros((0, 3), np.int32))
    return {"pts": pts.reshape(n * Pcap, 3), "tris": tris,
            "n_pts_per_shard": counts}
