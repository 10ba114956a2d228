"""Probabilistic hash-voxel plane map — the keystone structure.

Re-design of the reference's VoxelMap (reference src/voxel_loc.{hpp,cpp}:
VOXEL_LOC/Plane/OctoTree, plus the builders buildVoxelMap/updateVoxelMap in
src/voxel_mapping.cpp:110-151,320-354) as fixed-capacity structure-of-arrays
updated functionally inside one jitted program per frame:

  * hash-of-octrees → one open-addressing table keyed by (ix,iy,iz,level);
    level 0 = coarse voxel, level ℓ = half-size octant children of level-ℓ−1
    voxels whose fit is not planar (flattens OctoTree `cut_octo_tree`,
    voxel_loc.cpp:161-217); cfg.max_layers levels (2 for avia/nclt/ntu,
    4 for KITTI like reference velodyne.yaml:48);
  * per-voxel point lists → running moments {Σp, Σppᵀ, N, Σσ²} so plane
    refits are closed-form over all touched voxels at once (one batched
    eigh3x3) instead of per-voxel Eigen solves every 5 points
    (voxel_loc.cpp:219-308 UpdateOctoTree);
  * plane covariance → the isotropic-noise closed form documented in
    core/geometry.py, keeping the probabilistic residual gate;
  * voxels freeze at max_points like the reference (voxel_loc.cpp:243-248);
  * map growth is a deterministic scatter pipeline: per-scan segment
    aggregation → unique-voxel insert → moment scatter-add → batched refit.

Nothing here allocates: capacity exhaustion degrades gracefully (new voxels
are dropped until compaction), mirroring how the reference degrades by RAM.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from immesh_tpu.config import VoxelMapConfig
from immesh_tpu.core.geometry import plane_from_moments
from immesh_tpu.map.hash import (
    EMPTY, HashTable, frame_unique_coords, voxel_coords)

# upper-triangle index pairs for symmetric 3×3 ↔ length-6 storage
_TRI = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def _sym_pack(M: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([M[..., i, j] for i, j in _TRI], axis=-1)


def _sym_unpack(v: jnp.ndarray) -> jnp.ndarray:
    xx, xy, xz, yy, yz, zz = (v[..., k] for k in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


@struct.dataclass
class VoxelMap:
    table: HashTable
    # running moments
    sum_p: jnp.ndarray       # (cap, 3)
    sum_ppT: jnp.ndarray     # (cap, 6) packed symmetric
    count: jnp.ndarray       # (cap,) f32
    sigma2_sum: jnp.ndarray  # (cap,) Σ per-point isotropic noise
    # fitted plane
    normal: jnp.ndarray      # (cap, 3)
    d: jnp.ndarray           # (cap,)
    center: jnp.ndarray      # (cap, 3)
    cov_nn: jnp.ndarray      # (cap, 6) packed symmetric normal covariance
    var_c: jnp.ndarray       # (cap,)
    lam: jnp.ndarray         # (cap, 3) eigenvalues ascending
    plane_valid: jnp.ndarray  # (cap,) bool — fitted & planar
    subdivided: jnp.ndarray   # (cap,) bool — level-0 voxel spilled to children

    cfg: VoxelMapConfig = struct.field(pytree_node=False)

    @classmethod
    def create(cls, cfg: VoxelMapConfig, dtype=jnp.float32) -> "VoxelMap":
        cap = cfg.capacity
        z = lambda *s: jnp.zeros(s, dtype)  # noqa: E731
        return cls(
            table=HashTable.create(cap, cfg.max_probe),
            sum_p=z(cap, 3), sum_ppT=z(cap, 6), count=z(cap), sigma2_sum=z(cap),
            normal=z(cap, 3), d=z(cap), center=z(cap, 3), cov_nn=z(cap, 6),
            var_c=z(cap), lam=z(cap, 3),
            plane_valid=jnp.zeros(cap, bool), subdivided=jnp.zeros(cap, bool),
            cfg=cfg,
        )

    # ==================================================================
    # growth (reference buildVoxelMap / updateVoxelMap)
    # ==================================================================
    def update(self, pts_world: jnp.ndarray, point_sigma2: jnp.ndarray,
               mask: jnp.ndarray, max_voxels: int = 0) -> "VoxelMap":
        """Insert a scan into the map and refit touched planes. Jit-safe.

        Args:
          pts_world: (N, 3) world-frame points.
          point_sigma2: (N,) isotropic per-point noise tr(Σ)/3.
          mask: (N,) bool validity.
          max_voxels: static cap on unique voxels touched per scan per level
            (0 = cfg.touched_voxels_per_scan).
        """
        max_voxels = max_voxels or self.cfg.touched_voxels_per_scan
        vm = self._update_level(pts_world, point_sigma2, mask, 0, max_voxels)
        m = mask
        for lvl in range(1, self.cfg.max_layers):
            # points whose parent voxel spilled also feed its octants; the
            # mask accumulates so level ℓ only sees points whose FULL parent
            # chain is subdivided (reference cut_octo_tree recursion,
            # voxel_loc.cpp:161-217).  The level update itself runs under a
            # lax.cond: scans dominated by planar geometry spill few or no
            # voxels, and skipping the empty refinement levels removes their
            # full dedup/insert/refit pipelines from the frame (~4-5 ms/level
            # at KITTI bench shapes with max_layers=4) — an all-false mask
            # makes _update_level a pure no-op, so the skip is exact.
            cprev = voxel_coords(pts_world, self.cfg.voxel_size, lvl - 1)
            parent = vm.table.lookup(cprev)
            m = m & jnp.where(parent >= 0, vm.subdivided[parent], False)
            vm = jax.lax.cond(
                jnp.any(m),
                lambda vm_, m_=m, lvl_=lvl: vm_._update_level(
                    pts_world, point_sigma2, m_, lvl_, max_voxels),
                lambda vm_: vm_,
                vm)
        return vm

    def scan_aggregates(self, pts, sigma2, mask, level: int, max_voxels: int):
        """Per-scan segment aggregation: (uniq_coords (U,4), agg (U,11), ok).

        agg columns: Σp (3) | Σppᵀ packed (6) | N (1) | Σσ² (1).  Pure
        function of the scan — the distributed path all-gathers these
        aggregates across data-parallel shards before applying them, so every
        replica applies the identical update (dist/lio.py).
        """
        cfg = self.cfg
        n = pts.shape[0]
        coords = voxel_coords(pts, cfg.voxel_size, level)

        # exact scan-local dedup of the raw int32 coordinates (one variadic
        # sort — no packed-key extent bound; see map/hash.frame_unique_coords)
        seg, first, _ = frame_unique_coords(coords[:, :3], mask, max_voxels)
        seg_ok = seg < max_voxels

        # moments are accumulated relative to each point's VOXEL CENTER:
        # raw world coordinates cancel catastrophically in the f32 covariance
        # (see core/geometry.plane_from_moments anchor doc); every point of a
        # voxel shares the anchor, so Σ(p−c) moments stay exact per voxel
        size = cfg.voxel_size / (2 ** level)
        pl = pts - (coords[:, :3].astype(pts.dtype) + 0.5) * size
        w = seg_ok.astype(pts.dtype)
        feats = jnp.concatenate(
            [
                pl * w[:, None],                                    # Σ(p−c) (3)
                _sym_pack(pl[:, :, None] * pl[:, None, :]) * w[:, None],  # (6)
                w[:, None],                                         # N (1)
                (sigma2 * w)[:, None],                              # Σσ² (1)
            ],
            axis=-1,
        )
        agg = jax.ops.segment_sum(feats, seg, num_segments=max_voxels + 1)[:-1]

        uniq_valid = first < n
        uniq_coords = coords[jnp.minimum(first, n - 1)]
        return uniq_coords, agg, uniq_valid

    def apply_aggregates(self, uniq_coords, agg, uniq_valid, level: int
                         ) -> "VoxelMap":
        """Insert the aggregated voxels and scatter-add their moments."""
        cfg = self.cfg
        table, slots = self.table.insert(uniq_coords, uniq_valid)
        ok = uniq_valid & (slots >= 0)
        # freeze full voxels (reference voxel_loc.cpp:243-248)
        frozen = jnp.where(ok, self.count[slots] >= cfg.max_points_per_voxel, True)
        tgt = jnp.where(ok & ~frozen, slots, self.cfg.capacity)

        sum_p = self.sum_p.at[tgt].add(agg[:, 0:3], mode="drop")
        sum_ppT = self.sum_ppT.at[tgt].add(agg[:, 3:9], mode="drop")
        count = self.count.at[tgt].add(agg[:, 9], mode="drop")
        sigma2_sum = self.sigma2_sum.at[tgt].add(agg[:, 10], mode="drop")

        vm = self.replace(table=table, sum_p=sum_p, sum_ppT=sum_ppT,
                          count=count, sigma2_sum=sigma2_sum)
        return vm._refit(slots, ok, level)

    def _update_level(self, pts, sigma2, mask, level: int, max_voxels: int
                      ) -> "VoxelMap":
        uniq_coords, agg, ok = self.scan_aggregates(
            pts, sigma2, mask, level, max_voxels)
        return self.apply_aggregates(uniq_coords, agg, ok, level)

    def _refit(self, slots: jnp.ndarray, ok: jnp.ndarray, level: int) -> "VoxelMap":
        """Batched plane refit of the touched slots (gather → eigh → scatter)."""
        cfg = self.cfg
        s = jnp.where(ok, slots, 0)
        n = self.count[s]
        sigma2_mean = self.sigma2_sum[s] / jnp.maximum(n, 1.0)
        # anchor = the slot's voxel center (moments are center-relative)
        size = cfg.voxel_size / (2 ** level)
        anchor = (self.table.keys[s, :3].astype(self.sum_p.dtype) + 0.5) * size
        fit = plane_from_moments(
            self.sum_p[s], _sym_unpack(self.sum_ppT[s]), n, sigma2_mean,
            min_count=cfg.min_plane_points, anchor=anchor,
        )
        planar = fit["valid"] & (fit["lam"][..., 0] < cfg.planer_threshold)
        tgt = jnp.where(ok, slots, cfg.capacity)

        vm = self.replace(
            normal=self.normal.at[tgt].set(fit["normal"], mode="drop"),
            d=self.d.at[tgt].set(fit["d"], mode="drop"),
            center=self.center.at[tgt].set(fit["center"], mode="drop"),
            cov_nn=self.cov_nn.at[tgt].set(_sym_pack(fit["cov_nn"]), mode="drop"),
            var_c=self.var_c.at[tgt].set(fit["var_c"], mode="drop"),
            lam=self.lam.at[tgt].set(fit["lam"], mode="drop"),
            plane_valid=self.plane_valid.at[tgt].set(planar, mode="drop"),
        )
        if level < self.cfg.max_layers - 1:
            # non-finest levels spill to children when the fit is not planar
            spill = fit["valid"] & ~planar
            vm = vm.replace(
                subdivided=vm.subdivided.at[tgt].set(spill, mode="drop")
            )
        return vm

    # ==================================================================
    # queries
    # ==================================================================
    def query_planes(self, pts_world: jnp.ndarray):
        """Multi-level plane lookup for (N, 3) points.

        Mirrors the reference's octree descent in `build_single_residual`
        (voxel_mapping.cpp:247-318): use the COARSEST planar level, descending
        through subdivided (non-planar) parents down to max_layers.  Returns
        dict with per-point plane params and a `found` mask.
        """
        n = pts_world.shape[0]
        slot = jnp.zeros(n, jnp.int32)
        found = jnp.zeros(n, bool)
        descend = jnp.ones(n, bool)
        for lvl in range(self.cfg.max_layers):
            c = voxel_coords(pts_world, self.cfg.voxel_size, lvl)
            s = self.table.lookup(c)
            sc = jnp.maximum(s, 0)
            present = descend & (s >= 0)
            use = present & self.plane_valid[sc] & ~found
            slot = jnp.where(use, sc, slot)
            found = found | use
            descend = present & self.subdivided[sc]

        return {
            "found": found,
            "slot": slot,
            "normal": self.normal[slot],
            "d": self.d[slot],
            "center": self.center[slot],
            "cov_nn": _sym_unpack(self.cov_nn[slot]),
            "var_c": self.var_c[slot],
        }

    def lookup_planes_stack(self, pts_stack: jnp.ndarray):
        """Multi-level plane lookup for a STACK of query positions.

        pts_stack: (P, N, 3) — P probe positions per point (e.g. own voxel +
        face-neighbor shifts).  Returns (found (P, N), slot (P, N)).

        Same level-descent semantics as query_planes, but ALL P·max_layers
        hash lookups run as ONE batched probe loop: each lookup while_loop
        carries ~0.1-0.2 ms of fixed cost on-device, and the association path
        issues 4 probes × 4 levels × 3 ESIKF iterations = 48 of them per
        frame (~11 ms at KITTI scan sizes, measured) — batched, the fixed
        cost is paid 3× instead of 48×, and at sane table load the worst
        lane still resolves in 2-3 probe rounds.
        """
        P, N, _ = pts_stack.shape
        L = self.cfg.max_layers
        flat = pts_stack.reshape(P * N, 3)
        keys = jnp.concatenate(
            [voxel_coords(flat, self.cfg.voxel_size, lvl) for lvl in range(L)],
            axis=0)                                        # (L·P·N, 4)
        s_all = self.table.lookup(keys).reshape(L, P, N)

        slot = jnp.zeros((P, N), jnp.int32)
        found = jnp.zeros((P, N), bool)
        descend = jnp.ones((P, N), bool)
        for lvl in range(L):
            s = s_all[lvl]
            sc = jnp.maximum(s, 0)
            present = descend & (s >= 0)
            use = present & self.plane_valid[sc] & ~found
            slot = jnp.where(use, sc, slot)
            found = found | use
            descend = present & self.subdivided[sc]
        return found, slot

    def n_voxels(self) -> jnp.ndarray:
        return self.table.occupancy()

    def n_planes(self) -> jnp.ndarray:
        return jnp.sum(self.plane_valid)

    # ==================================================================
    # lifetime management (reference laser_map_fov_segment,
    # voxel_mapping_common.cpp:214-288: sliding local-map cube + box deletes)
    # ==================================================================
    def compact(self, center: jnp.ndarray, keep_radius: float) -> "VoxelMap":
        """Evict voxels outside a Chebyshev `keep_radius` cube around `center`
        and rehash the survivors into a fresh table.

        The reference box-deletes ikd-tree points when the sensor nears the
        local-map edge; with open addressing, deletion = full rebuild (keeps
        the probe-chain invariant, no tombstones).  One O(capacity) pass, run
        occasionally from the host when occupancy crosses the high-water mark
        — never in the per-frame hot loop.
        """
        cfg = self.cfg
        keys = self.table.keys
        live = keys[:, 0] != EMPTY
        # per-key voxel center at its own level (children are half-size)
        size = cfg.voxel_size / jnp.exp2(keys[:, 3].astype(self.sum_p.dtype))
        vcen = (keys[:, :3].astype(self.sum_p.dtype) + 0.5) * size[:, None]
        cheb = jnp.max(jnp.abs(vcen - center[None, :]), axis=-1)
        keep = live & (cheb <= keep_radius)

        fresh = HashTable.create(cfg.capacity, cfg.max_probe)
        table, slots = fresh.insert(keys, keep)
        ok = keep & (slots >= 0)
        tgt = jnp.where(ok, slots, cfg.capacity)

        def move(src):
            return jnp.zeros_like(src).at[tgt].set(src, mode="drop")

        return self.replace(
            table=table,
            sum_p=move(self.sum_p), sum_ppT=move(self.sum_ppT),
            count=move(self.count), sigma2_sum=move(self.sigma2_sum),
            normal=move(self.normal), d=move(self.d), center=move(self.center),
            cov_nn=move(self.cov_nn), var_c=move(self.var_c),
            lam=move(self.lam),
            plane_valid=move(self.plane_valid),
            subdivided=move(self.subdivided),
        )
