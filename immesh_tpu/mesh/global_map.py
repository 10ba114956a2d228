"""Global meshing point map — fixed-capacity SoA point store + voxel grid.

Re-design of the reference's `Global_map` (reference
src/meshing/r3live/pointcloud_rgbd.{hpp,cpp}): dual spatial hash
(`m_hashmap_3d_pts` dedup grid at `minimum_pts_size`=0.1 m and
`m_hashmap_voxels` meshing grid at `voxel_resolution`=0.4 m,
pointcloud_rgbd.hpp:257-258) plus an ikd-tree used only for min-distance
gating and small-radius neighbor pulls (append_points_to_global_map,
pointcloud_rgbd.cpp:412-552; retrieve_neighbor_pts_kdtree,
mesh_rec_geometry.cpp:336-377).

TPU re-design decisions:
  * the ikd-tree disappears entirely — the 0.1 m dedup grid already enforces
    min spacing (the kd-tree 1-NN gate, cpp:506-517, is redundant with grid
    occupancy at the same scale), and neighbor pulls become 3×3×3 voxel-slot
    gathers (the reference only ever queries radius ≈ one voxel);
  * RGB_pts records (pointcloud_rgbd.hpp:77-163) collapse to a bare (cap, 3)
    position array — color/Kalman fields belong to the dormant texture path
    (img_enable:0 in every reference config);
  * appends are one deterministic jitted scatter pipeline: in-frame grid
    dedup → map dedup via hash find-or-insert → bump allocation →
    rank-ordered scatter into per-voxel index slots.

Everything is functionally updated; the structure is a pytree and therefore
checkpointable (reference uses boost serialization, pointcloud_rgbd.hpp:303-374).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from immesh_tpu.config import MeshConfig
from immesh_tpu.map.hash import EMPTY, HashTable, frame_unique_coords

_SENTINEL = jnp.int32(1 << 30)


def _grid_coords(pts: jnp.ndarray, size: float, tag: int) -> jnp.ndarray:
    """(N,3) world pts → (N,4) int32 hash keys; `tag` separates key spaces."""
    c = jnp.floor(pts / size).astype(jnp.int32)
    t = jnp.full((pts.shape[0], 1), tag, jnp.int32)
    return jnp.concatenate([c, t], axis=-1)


@struct.dataclass
class GlobalPointMap:
    # point store
    pts: jnp.ndarray        # (P, 3) f32 world positions (raw, append-time)
    pts_smooth: jnp.ndarray  # (P, 3) f32 Laplacian-smoothed positions — the
    # triangulation geometry (reference RGB_pts keeps a persistent smoothed
    # pos, set during neighbor retrieval, pointcloud_rgbd.hpp:77-163 +
    # mesh_rec_geometry.cpp:333-369).  Stored globally, not per pulled set,
    # so every voxel/chip that pulls a point reads the IDENTICAL smoothed
    # coordinates — local smoothing would give adjacent voxels different
    # geometry and inconsistent border diagonals (holes).
    pt_count: jnp.ndarray   # () int32 bump pointer
    # dedup grid (presence-only) at pts_minimum_scale
    dedup: HashTable
    # meshing voxel grid at voxel_resolution
    vox: HashTable
    vox_pt_idx: jnp.ndarray   # (V, S) int32 indices into pts; -1 empty
    vox_pts: jnp.ndarray      # (V, S, 3) f32 — the SAME positions as
    # pts[vox_pt_idx], duplicated into the voxel's slot row at filing time:
    # the 27-neighborhood candidate pulls then read (S, 3) CONTIGUOUS rows
    # (384 B each) instead of per-point 12 B rows — TPU gathers pay a fixed
    # per-row cost (~1.6 GB/s at 12 B rows, measured), so the row layout is
    # ~10× cheaper for the same 5.3 MB pulled per KITTI frame
    vox_pts_sm: jnp.ndarray   # (V, S, 3) f32 smoothed twin (smooth_active)
    vox_n: jnp.ndarray        # (V,) int32 occupied slots
    vox_new: jnp.ndarray      # (V,) int32 points added since last re-mesh
    vox_meshed: jnp.ndarray   # (V,) bool ever meshed
    frame_no: jnp.ndarray     # () int32 append counter — rotates the backlog
    # drain start so no pending voxel is starved (the reference's mesh queue
    # is FIFO; lowest-slot-first with no aging could starve high slots
    # indefinitely under sustained n_pending > active_voxels_per_frame)

    cfg: MeshConfig = struct.field(pytree_node=False)

    @classmethod
    def create(cls, cfg: MeshConfig, dtype=jnp.float32) -> "GlobalPointMap":
        P, V, S = cfg.points_capacity, cfg.voxel_capacity, cfg.pts_per_voxel
        return cls(
            pts=jnp.zeros((P, 3), dtype),
            pts_smooth=jnp.zeros((P, 3), dtype),
            pt_count=jnp.asarray(0, jnp.int32),
            dedup=HashTable.create(_next_pow2(4 * P), max_probe=32),
            vox=HashTable.create(V, max_probe=32),
            vox_pt_idx=jnp.full((V, S), -1, jnp.int32),
            vox_pts=jnp.zeros((V, S, 3), dtype),
            vox_pts_sm=jnp.zeros((V, S, 3), dtype),
            vox_n=jnp.zeros(V, jnp.int32),
            vox_new=jnp.zeros(V, jnp.int32),
            vox_meshed=jnp.zeros(V, bool),
            frame_no=jnp.asarray(0, jnp.int32),
            cfg=cfg,
        )

    # ==================================================================
    def append_frame(self, pts_world: jnp.ndarray, mask: jnp.ndarray
                     ) -> Tuple["GlobalPointMap", jnp.ndarray, jnp.ndarray,
                                dict]:
        """Append one frame of world points (dedup'd); returns
        (new_map, active_slots (A,), active_mask (A,), drops) — the meshing
        work list plus bounded-loss accounting (all () int32 device scalars):
          drops["cells"]    distinct dedup cells beyond max_pts_per_frame
                            (after the uniform decimation this is ≈0)
          drops["points"]   fresh points lost to point-store capacity
          drops["voxels"]   touched voxels beyond file_voxels_per_frame,
                            plus voxel hash-insert failures
          drops["slots"]    fresh points lost to full per-voxel slot rows
          drops["deferred"] pending voxels beyond this frame's re-mesh
                            budget — deferred to later frames, NOT lost
        (the reference warns and drops on overload too,
        ImMesh_mesh_reconstruction.cpp:288-297 — here the counters make the
        loss observable instead of silent).

        Mirrors append_points_to_global_map + the recent-visited-voxel set
        (pointcloud_rgbd.cpp:412-552), with the active set dilated to occupied
        face/edge/corner neighbors so border triangulations refresh without the
        reference's global triangle removal (see mesh/triangles.py).
        """
        cfg = self.cfg
        N = pts_world.shape[0]
        k_cells = min(N, cfg.max_pts_per_frame)

        def _trunc(*consume):
            """DEBUG (cfg.ablate app_*): cut the append pipeline here —
            returns structurally-valid empty outputs that consume the
            computed values so XLA cannot DCE the measured prefix.

            Anti-DCE must go through f32: an INT ×0 is folded to 0 by XLA's
            algebraic simplifier (which silently deleted the measured
            prefix in the first round-5 sweep — every app_* variant
            measured the same DCE'd program); f32 ×0.0 survives because the
            simplifier must preserve NaN/Inf semantics."""
            A_ = cfg.active_voxels_per_frame
            s = jnp.float32(0.0)
            for c in consume:
                s = s + jnp.sum(c).astype(jnp.float32)
            z = (s * jnp.float32(0.0)).astype(jnp.int32)
            gm0 = self.replace(frame_no=self.frame_no + 1 + z)
            return (gm0, jnp.zeros(A_, jnp.int32) + z,
                    jnp.zeros(A_, bool),
                    {k: z for k in
                     ("cells", "points", "voxels", "slots", "deferred")})

        # ---- 0. uniform decimation to ≈max_pts_per_frame -----------------
        # the reference appends every step-th point with step =
        # pts_num / number_of_pts_append_to_map (ImMesh_mesh_reconstruction
        # .cpp:111) — spatially UNBIASED.  Capping the dedup list instead
        # would keep the 10k lexicographically-smallest cells, i.e. one
        # corner of the scan, and starve the rest of the frame.
        if N > cfg.max_pts_per_frame:
            n_valid = jnp.sum(mask.astype(jnp.int32))
            step = n_valid // cfg.max_pts_per_frame + 1
            vrank = jnp.cumsum(mask.astype(jnp.int32)) - 1
            mask = mask & (vrank % step == 0)

        # ---- 1. in-frame dedup at the min-spacing grid -------------------
        if N > cfg.max_pts_per_frame:
            # After decimation at most max_pts_per_frame rows are valid, so
            # the dedup's lexicographic sort need not touch all N rows: an
            # order-preserving cumsum scatter (O(N) elementwise, no sort)
            # compacts the surviving rows' ORIGINAL ids into an M0-row
            # buffer and only that is sorted — 13× fewer rows at the KITTI
            # bench shape (131,072 → 10,240).  Order preservation keeps the
            # first-occurrence representative per cell identical: min
            # compact index ⇔ min original row id.  Overflow is impossible
            # (the decimation count is ≤ max_pts_per_frame by construction).
            M0 = min(N, _round_up_int(cfg.max_pts_per_frame, 256))
            cpos = jnp.cumsum(mask.astype(jnp.int32)) - 1
            ctgt = jnp.where(mask & (cpos < M0), cpos, M0)
            ids0 = jnp.full(M0, N, jnp.int32).at[ctgt].set(
                jnp.arange(N, dtype=jnp.int32), mode="drop")
            cvalid = ids0 < N
            # cell coords computed on the COMPACT rows only — the former
            # full-N (N, 4) cell tensor existed just to be gathered here
            ccell = _grid_coords(pts_world[jnp.minimum(ids0, N - 1)],
                                 cfg.pts_minimum_scale, tag=0)[:, :3]
            _, firstc, n_cells = frame_unique_coords(ccell, cvalid, k_cells)
            first = jnp.where(
                firstc < M0, ids0[jnp.minimum(firstc, M0 - 1)], N)
        else:
            cell = _grid_coords(pts_world, cfg.pts_minimum_scale, tag=0)
            _, first, n_cells = frame_unique_coords(cell[:, :3], mask, k_cells)
        if cfg.ablate == "app_cell0":
            return _trunc(first, n_cells)

        # ---- 2. map-level dedup: find-or-insert into the presence grid ---
        # representative row per distinct cell → hash-insert sees unique keys
        cand_ok = first < N
        ci = jnp.minimum(first, N - 1)
        cand_cell = _grid_coords(pts_world[ci], cfg.pts_minimum_scale, tag=0)
        dedup, slots = self.dedup.insert(cand_cell, cand_ok)
        # fresh ⇔ inserted into a previously-empty slot: detect via old key
        was_present = self.dedup.keys[jnp.maximum(slots, 0), 0] != EMPTY
        fresh = cand_ok & (slots >= 0) & ~was_present
        if cfg.ablate == "app_insert0":
            return _trunc(slots, fresh, *jax.tree_util.tree_leaves(dedup))

        # ---- 3. bump-allocate point ids ----------------------------------
        order = jnp.cumsum(fresh.astype(jnp.int32)) - 1
        new_ids = jnp.where(fresh, self.pt_count + order, _SENTINEL)
        n_new = jnp.sum(fresh.astype(jnp.int32))
        cap_ok = new_ids < cfg.points_capacity
        drop_points = jnp.sum((fresh & ~cap_ok).astype(jnp.int32))
        fresh = fresh & cap_ok
        tgt = jnp.where(fresh, new_ids, cfg.points_capacity)
        pts_store = self.pts.at[tgt].set(pts_world[ci], mode="drop")
        # fresh points start unsmoothed; their voxel is active this frame so
        # the meshing step immediately computes their smoothed position
        pts_sm_store = self.pts_smooth.at[tgt].set(pts_world[ci], mode="drop")
        pt_count = jnp.minimum(self.pt_count + n_new,
                               jnp.asarray(cfg.points_capacity, jnp.int32))
        if cfg.ablate == "app_alloc0":
            return _trunc(pts_store, pts_sm_store, pt_count)

        # ---- 4. voxel membership: rank-ordered scatter append ------------
        # filing capacity F is independent of (and larger than) the re-mesh
        # cap: filing is cheap scatter work, and a filed-but-not-meshed voxel
        # stays in the pending backlog instead of orphaning its points
        vcell = _grid_coords(pts_world[ci], cfg.voxel_resolution, tag=0)
        F = cfg.file_voxels_per_frame
        vseg, vfirst, n_vox = frame_unique_coords(vcell[:, :3], fresh, F)
        # insert/find the unique voxels via their representative rows (uniq
        # order), so vslots[u] is the slot of uniq voxel u
        vok = vfirst < k_cells
        vfi = jnp.minimum(vfirst, k_cells - 1)
        vox, vslots = self.vox.insert(vcell[vfi], vok)
        vslot_of_cand = jnp.where(
            vseg < F, vslots[jnp.clip(vseg, 0, F - 1)], -1
        )
        # rank of each fresh point within its voxel (deterministic by row id)
        rank = _rank_in_segment(vseg, fresh, F)
        write_ok = fresh & (vslot_of_cand >= 0)
        S = cfg.pts_per_voxel
        base = jnp.where(write_ok, self.vox_n[jnp.maximum(vslot_of_cand, 0)], 0)
        pos = base + rank
        drop_slots = jnp.sum((write_ok & (pos >= S)).astype(jnp.int32))
        write_ok = write_ok & (pos < S)
        flat = jnp.where(
            write_ok, jnp.maximum(vslot_of_cand, 0) * S + pos,
            self.vox_pt_idx.size,
        )
        vox_pt_idx = self.vox_pt_idx.reshape(-1).at[flat].set(
            new_ids, mode="drop"
        ).reshape(self.vox_pt_idx.shape)
        # duplicate positions into the slot rows (see vox_pts field comment)
        Vsh = self.vox_pts.shape
        vox_pts = self.vox_pts.reshape(-1, 3).at[flat].set(
            pts_world[ci], mode="drop").reshape(Vsh)
        vox_pts_sm = self.vox_pts_sm.reshape(-1, 3).at[flat].set(
            pts_world[ci], mode="drop").reshape(Vsh)

        # per-voxel added counts
        addc = jax.ops.segment_sum(
            write_ok.astype(jnp.int32), jnp.where(write_ok, vseg, F),
            num_segments=F + 1)[:-1]
        vtgt = jnp.where(vok & (vslots >= 0), vslots, self.vox_n.shape[0])
        vox_n = self.vox_n.at[vtgt].add(addc, mode="drop")
        vox_new = self.vox_new.at[vtgt].add(addc, mode="drop")

        gm = self.replace(
            pts=pts_store, pts_smooth=pts_sm_store, pt_count=pt_count,
            dedup=dedup, vox=vox,
            vox_pt_idx=vox_pt_idx, vox_pts=vox_pts, vox_pts_sm=vox_pts_sm,
            vox_n=vox_n, vox_new=vox_new,
        )
        if cfg.ablate == "app_file0":
            return _trunc(*jax.tree_util.tree_leaves(
                (gm.vox_pt_idx, gm.vox_pts, gm.vox_n, gm.vox_new)))

        # ---- 5. active set = pending backlog ∪ occupied neighbors --------
        # every voxel with unmeshed new points (vox_new>0) is pending; the
        # per-frame re-mesh cap A defers the excess to later frames instead
        # of dropping it (the reference's mesh queue buffers overload the
        # same way, ImMesh_mesh_reconstruction.cpp:272-310).  Voxels with
        # <3 points cannot triangulate yet and wait in the backlog.
        V = gm.vox_n.shape[0]
        A = cfg.active_voxels_per_frame
        pending = (gm.vox_new > 0) & (gm.vox_n >= 3)
        n_pending = jnp.sum(pending.astype(jnp.int32))
        # age the drain: rotate the scan start by a per-frame stride so a
        # sustained n_pending > A backlog is served round-robin instead of
        # starving high slot indices (reference mesh queue is FIFO)
        off = (gm.frame_no * jnp.int32(40503)) % jnp.int32(V)
        psl_rot = jnp.nonzero(jnp.roll(pending, -off), size=A,
                              fill_value=V)[0]
        pmask = psl_rot < V
        psl = jnp.where(pmask, (psl_rot + off) % V, V)
        gm = gm.replace(frame_no=gm.frame_no + 1)
        active_slots, active_mask, drop_dilate = gm._dilate_active(
            jnp.minimum(psl, V - 1), pmask)
        if cfg.ablate == "app_active0":
            return _trunc(active_slots, active_mask, drop_dilate,
                          *jax.tree_util.tree_leaves(
                              (gm.vox_pt_idx, gm.vox_n, gm.vox_new)))
        drops = {
            "cells": jnp.maximum(n_cells - k_cells, 0),
            "points": drop_points,
            "voxels": (jnp.maximum(n_vox - F, 0)
                       + jnp.sum((vok & (vslots < 0)).astype(jnp.int32))),
            "slots": drop_slots,
            # deferred ≠ lost: backlog beyond this frame's re-mesh budget
            "deferred": jnp.maximum(n_pending - A, 0) + drop_dilate,
        }
        return gm, active_slots, active_mask, drops

    # ------------------------------------------------------------------
    def _dilate_active(self, touched: jnp.ndarray, tmask: jnp.ndarray):
        """Expand the touched-voxel set to its occupied 26-neighborhood,
        bounded to cfg.active_voxels_per_frame entries; returns
        (slots, mask, n_dropped) with the excess counted."""
        cfg = self.cfg
        A = cfg.active_voxels_per_frame
        keys = self.vox.keys[jnp.maximum(touched, 0)]       # (A, 4)
        offs = _neighbor_offsets()                           # (27, 3) np const
        nb = keys[:, None, :3] + offs[None]                  # (A, 27, 3)
        nb_keys = jnp.concatenate(
            [nb, jnp.zeros((A, 27, 1), jnp.int32)], axis=-1
        ).reshape(A * 27, 4)
        nb_slots = self.vox.lookup(nb_keys)                  # (A*27,)
        nb_ok = (
            tmask[:, None].repeat(27, 1).reshape(-1)
            & (nb_slots >= 0)
        )
        nb_ok = nb_ok & (self.vox_n[jnp.maximum(nb_slots, 0)] >= 3)
        # Dedup slots, then select ≤A SEEDS FIRST.  The old single-pass cap
        # followed the dedup key's sort order (slot id) — under sustained
        # backlog a pending seed whose id sorts above its own dilated
        # neighbors was crowded out of the cap every frame and STARVED (the
        # round-5 drain-to-zero drive caught the backlog plateauing at
        # exactly A).  Now every unique slot is tracked (k = 27·A bounds
        # the uniques exactly), each unique's priority is the MIN over its
        # candidate rows (0 = it is itself a seed / own-offset candidate),
        # and a top-k over (priority, unique-rank) picks the A winners —
        # all seeds retire every pass; neighbor border-refresh degrades
        # gracefully under overload instead of blocking the queue.
        nrows = nb_slots.shape[0]                      # = 27·A
        prio = jnp.broadcast_to(
            (jnp.arange(27, dtype=jnp.int32)
             != jnp.asarray(_OWN_OFFSET_IDX, jnp.int32))[None, :],
            (A, 27)).reshape(-1).astype(jnp.int32)
        seg, first, n_uniq = frame_unique_coords(
            jnp.where(nb_ok, nb_slots, 0)[:, None], nb_ok, nrows)
        prio_u = jnp.full(nrows + 1, 2, jnp.int32).at[
            jnp.where(nb_ok, seg, nrows)].min(prio, mode="drop")[:nrows]
        uvalid = first < nrows
        slot_u = nb_slots[jnp.minimum(first, nrows - 1)]
        big = jnp.int32(0x3FFFFFFF)
        sel_key = jnp.where(
            uvalid,
            prio_u * jnp.int32(nrows) + jnp.arange(nrows, dtype=jnp.int32),
            big)
        _, pick = jax.lax.top_k(-sel_key, A)
        ok = sel_key[pick] < big
        slots = slot_u[pick]
        return (jnp.where(ok, slots, self.vox_n.shape[0] - 1), ok,
                jnp.maximum(n_uniq - A, 0))

    # ------------------------------------------------------------------
    def pull_neighborhood(self, slots: jnp.ndarray, smask: jnp.ndarray
                          ) -> dict:
        """Gather per-voxel point neighborhoods for meshing.

        slots: (A,) voxel slots. Returns dict with
          idx (A, K) global point ids (-1 pad), pts (A, K, 3), mask (A, K)
        where K = pull_capacity: the voxel's own points first, then the
        nearest halo points from the 26 neighbors within knn_radius_scale ×
        voxel_resolution of the voxel center (mirrors
        retrieve_neighbor_pts_kdtree, mesh_rec_geometry.cpp:336-377).
        """
        cfg = self.cfg
        A, S, K = slots.shape[0], cfg.pts_per_voxel, cfg.pull_capacity
        s = jnp.maximum(slots, 0)
        keys = self.vox.keys[s]                              # (A, 4)
        center = (keys[:, :3].astype(self.pts.dtype) + 0.5) * cfg.voxel_resolution

        offs = _neighbor_offsets()
        nb = keys[:, None, :3] + offs[None]
        nb_keys = jnp.concatenate(
            [nb, jnp.zeros((A, 27, 1), jnp.int32)], axis=-1
        ).reshape(A * 27, 4)
        nb_slots = self.vox.lookup(nb_keys).reshape(A, 27)
        nb_valid = nb_slots >= 0

        nbs = jnp.maximum(nb_slots, 0)
        cand_idx = self.vox_pt_idx[nbs]                        # (A, 27, S)
        cand_ok = nb_valid[:, :, None] & (cand_idx >= 0)
        cand_idx = jnp.maximum(cand_idx, 0)
        # positions come from the slot-resident (V, S, 3) rows — contiguous
        # 384 B row gathers instead of 12 B per-point rows (see vox_pts)
        cand_pts = self.vox_pts[nbs]                           # (A, 27, S, 3)

        # own voxel (offset index 13 with our offset ordering) gets priority 0;
        # halo points ranked by distance to voxel center, radius-gated
        r = cfg.knn_radius_scale * cfg.voxel_resolution
        d = jnp.linalg.norm(cand_pts - center[:, None, None, :], axis=-1)
        own = jnp.asarray(_OWN_OFFSET_IDX, jnp.int32)
        is_own = (jnp.arange(27) == own)[None, :, None]
        in_r = d <= r
        usable = cand_ok & (is_own | in_r)
        # sort key: own-first then by distance; top_k picks the K best lanes
        # directly — a full (A, 27·S) argsort materializes and sorts 18×
        # more lanes than survive the cut (864 vs K=48 at bench shapes)
        key = jnp.where(usable, jnp.where(is_own, d - 1e3, d), jnp.inf)
        flat_key = key.reshape(A, 27 * S)
        _, order = jax.lax.top_k(-flat_key, K)                # (A, K)
        g_idx = jnp.take_along_axis(cand_idx.reshape(A, -1), order, axis=-1)
        g_ok = jnp.take_along_axis(usable.reshape(A, -1), order, axis=-1)
        g_ok = g_ok & smask[:, None]
        g_pts = jnp.take_along_axis(
            cand_pts.reshape(A, -1, 3), order[..., None], axis=1
        )
        if cfg.pull_smooth_lam > 0:
            # stored smoothed positions (smooth_active) — the triangulation
            # geometry; a small direct (A, K) gather from the point store
            g_sm = self.pts_smooth[jnp.maximum(g_idx, 0)]
        else:
            g_sm = g_pts
        return {
            "idx": jnp.where(g_ok, g_idx, -1),
            "pts": g_pts,
            "pts_sm": g_sm,
            "mask": g_ok,
            "center": center,
        }

    def smooth_active(self, slots: jnp.ndarray, smask: jnp.ndarray
                      ) -> "GlobalPointMap":
        """Recompute Laplacian-smoothed positions for the active voxels' OWN
        points (reference smooths pulled points during retrieval and stores
        the result on the point record, mesh_rec_geometry.cpp:333-369 +
        RGB_pts::set_smooth_pos) — the stored smoothed position is what the
        triangulation reads, so every voxel/chip pulling a point sees
        identical geometry.

        The mean is GAUSSIAN-WEIGHTED (σ = 2×min spacing ≈ the reference's
        20-NN footprint at its dedup density) rather than kNN-selected: a
        selection threshold is discontinuous — equal-distance ties (gridded
        dedup!) would resolve by chip-local point order and desynchronize
        shards — while a continuous kernel is order-invariant to the ulp.
        Each point is owned by exactly one voxel, so the scatter is
        conflict-free, and re-running is idempotent given the same map."""
        cfg = self.cfg
        lam = cfg.pull_smooth_lam
        A, S = slots.shape[0], cfg.pts_per_voxel
        s = jnp.maximum(slots, 0)
        keys = self.vox.keys[s]

        offs = _neighbor_offsets()
        nb = keys[:, None, :3] + offs[None]
        nb_keys = jnp.concatenate(
            [nb, jnp.zeros((A, 27, 1), jnp.int32)], axis=-1
        ).reshape(A * 27, 4)
        nb_slots = self.vox.lookup(nb_keys).reshape(A, 27)
        nbs = jnp.maximum(nb_slots, 0)
        cand_idx = self.vox_pt_idx[nbs]                        # (A, 27, S)
        cand_ok = (nb_slots >= 0)[:, :, None] & (cand_idx >= 0)
        # slot-resident positions: contiguous (S, 3) row gathers (vox_pts)
        cand_pts = self.vox_pts[nbs].reshape(A, 27 * S, 3)
        cand_ok = cand_ok.reshape(A, 27 * S)

        own_idx = self.vox_pt_idx[s]                           # (A, S)
        own_ok = (own_idx >= 0) & smask[:, None]
        p_own = self.vox_pts[s]                                # (A, S, 3)

        # d² via the Gram expansion on VOXEL-CENTERED coordinates — one small
        # batched matmul per voxel.  Centering is load-bearing: on raw world
        # coordinates |p|² ~ |position|² and the expansion cancels
        # catastrophically in f32 (~1 m² error at 1 km vs ~0.09 m² typical
        # neighbor d²), turning the Gaussian weights into noise at KITTI
        # scale; centered values are O(voxel_resolution) where f32 is exact.
        vcen = (keys[:, :3].astype(p_own.dtype) + 0.5) * cfg.voxel_resolution
        po_c = p_own - vcen[:, None, :]
        cp_c = cand_pts - vcen[:, None, :]
        d2 = (jnp.sum(po_c * po_c, -1)[:, :, None]
              + jnp.sum(cp_c * cp_c, -1)[:, None, :]
              - 2.0 * jnp.einsum("asc,akc->ask", po_c, cp_c))
        sig = 2.0 * cfg.pts_minimum_scale
        w = jnp.where(cand_ok[:, None, :] & (d2 < (3.0 * sig) ** 2),
                      jnp.exp(-d2 / (2.0 * sig * sig)), 0.0)   # (A, S, 27S)
        wsum = jnp.sum(w, axis=-1, keepdims=True)              # ≥ self weight
        mean = jnp.einsum("ask,akc->asc", w, cand_pts) / jnp.maximum(wsum, 1e-12)
        sm = (1.0 - lam) * p_own + lam * mean

        P = cfg.points_capacity
        tgt = jnp.where(own_ok, own_idx, P)
        # keep the slot-resident smoothed twin in sync (whole-row scatter;
        # non-own lanes preserve their current values)
        sm_row = jnp.where(own_ok[..., None], sm, self.vox_pts_sm[s])
        vtgt = jnp.where(smask, s, self.vox_n.shape[0])
        return self.replace(
            pts_smooth=self.pts_smooth.at[tgt].set(sm, mode="drop"),
            vox_pts_sm=self.vox_pts_sm.at[vtgt].set(sm_row, mode="drop"))

    def mark_meshed(self, slots: jnp.ndarray, smask: jnp.ndarray
                    ) -> "GlobalPointMap":
        tgt = jnp.where(smask, slots, self.vox_n.shape[0])
        return self.replace(
            vox_new=self.vox_new.at[tgt].set(0, mode="drop"),
            vox_meshed=self.vox_meshed.at[tgt].set(True, mode="drop"),
        )

    def n_points(self) -> jnp.ndarray:
        return self.pt_count

    # ==================================================================
    # lifetime management (reference bounds its working set by RAM reserves
    # and recent-voxel expiry, pointcloud_rgbd.cpp:278-294,425-455; our
    # fixed-capacity stores instead evict-outside-radius + compact, run from
    # the host when occupancy crosses the high-water mark)
    # ==================================================================
    def compact(self, center: jnp.ndarray, keep_radius: float
                ) -> Tuple["GlobalPointMap", dict]:
        """Drop every meshing voxel (and its member points) outside a
        Chebyshev `keep_radius` cube around `center`; rebuild both hash
        tables and compact the point store.

        Keep decisions are made at VOXEL granularity using the same formula
        for voxels and points (a stored point's voxel is floor(p/res), the
        key it was filed under in append_frame), so surviving vox_pt_idx rows
        reference only surviving points.  Returns (new_map, maps) where
        maps = {"idmap": (P,) old→new point id or -1,
                "slot_map": (V,) old→new voxel slot or -1} for the triangle
        store remap (mesh/triangles.py:remap_store).
        """
        cfg = self.cfg
        P = cfg.points_capacity
        V = self.vox_n.shape[0]
        dtype = self.pts.dtype
        res = cfg.voxel_resolution

        def vox_keep_of_coords(c3):
            vcen = (c3.astype(dtype) + 0.5) * res
            return jnp.max(jnp.abs(vcen - center[None, :]), axis=-1) <= keep_radius

        # ---- voxel table rebuild ----------------------------------------
        vkeys = self.vox.keys
        vlive = vkeys[:, 0] != EMPTY
        vkeep = vlive & vox_keep_of_coords(vkeys[:, :3])
        vox, vslots = HashTable.create(V, self.vox.max_probe).insert(vkeys, vkeep)
        vok = vkeep & (vslots >= 0)
        slot_map = jnp.where(vok, vslots, -1)

        # ---- point keep + old→new id map --------------------------------
        alloc = jnp.arange(P, dtype=jnp.int32) < self.pt_count
        pc3 = jnp.floor(self.pts / res).astype(jnp.int32)
        pkeep = alloc & vox_keep_of_coords(pc3)
        new_id = jnp.cumsum(pkeep.astype(jnp.int32)) - 1
        idmap = jnp.where(pkeep, new_id, -1)
        ptgt = jnp.where(pkeep, new_id, P)
        pts = jnp.zeros_like(self.pts).at[ptgt].set(self.pts, mode="drop")
        pts_smooth = jnp.zeros_like(self.pts_smooth).at[ptgt].set(
            self.pts_smooth, mode="drop")
        pt_count = jnp.sum(pkeep.astype(jnp.int32))

        # ---- dedup grid rebuild (cells of surviving points) --------------
        dcell = _grid_coords(self.pts, cfg.pts_minimum_scale, tag=0)
        dedup, _ = HashTable.create(
            self.dedup.capacity, self.dedup.max_probe).insert(dcell, pkeep)

        # ---- per-voxel rows: move to new slots, remap member ids ---------
        vtgt = jnp.where(vok, jnp.maximum(slot_map, 0), V)
        row_ids = self.vox_pt_idx                     # (V, S) old point ids
        row_new = jnp.where(row_ids >= 0,
                            idmap[jnp.maximum(row_ids, 0)], -1)

        def move_rows(src, fill):
            out = jnp.full_like(src, fill)
            return out.at[vtgt].set(src, mode="drop")

        vox_pt_idx = move_rows(row_new, -1)
        vox_n = move_rows(self.vox_n, 0)
        vox_new = move_rows(self.vox_new, 0)
        vox_meshed = move_rows(self.vox_meshed, False)
        vox_pts = move_rows(self.vox_pts, 0)
        vox_pts_sm = move_rows(self.vox_pts_sm, 0)

        gm = self.replace(
            pts=pts, pts_smooth=pts_smooth, pt_count=pt_count, dedup=dedup,
            vox=vox,
            vox_pt_idx=vox_pt_idx, vox_pts=vox_pts, vox_pts_sm=vox_pts_sm,
            vox_n=vox_n, vox_new=vox_new,
            vox_meshed=vox_meshed,
        )
        return gm, {"idmap": idmap, "slot_map": slot_map}


# ----------------------------------------------------------------------
def _round_up_int(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _compact_indices(keep: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of True entries, compacted to (k,); padded with N."""
    n = keep.shape[0]
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    out = jnp.full(k, n, jnp.int32)
    tgt = jnp.where(keep & (pos < k), pos, k)
    return out.at[tgt].set(jnp.arange(n, dtype=jnp.int32), mode="drop")


def _rank_in_segment(seg: jnp.ndarray, mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Rank (0-based) of each masked element within its segment, by row order."""
    n = seg.shape[0]
    s = jnp.where(mask, seg, k)
    # stable sort by segment; rank = position − segment start
    order = jnp.argsort(s, stable=True)
    sorted_seg = s[order]
    idx = jnp.arange(n, dtype=jnp.int32)
    start = jnp.full(k + 1, n, jnp.int32).at[sorted_seg].min(idx, mode="drop")
    rank_sorted = idx - start[jnp.clip(sorted_seg, 0, k)]
    rank = jnp.zeros(n, jnp.int32).at[order].set(rank_sorted)
    return jnp.where(mask, rank, 0)


import numpy as _np

_OFFS = _np.stack(_np.meshgrid(
    _np.arange(-1, 2), _np.arange(-1, 2), _np.arange(-1, 2), indexing="ij"
), axis=-1).reshape(27, 3).astype(_np.int32)
_OWN_OFFSET_IDX = int(_np.where((_OFFS == 0).all(axis=1))[0][0])


def _neighbor_offsets() -> jnp.ndarray:
    return jnp.asarray(_OFFS)
