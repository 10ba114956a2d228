"""Spatially-sharded voxel map: owner-per-chip slabs + ppermute halo exchange.

dist/lio.py replicates the plane map on every chip (compute is sharded, the
MAP is not), which bounds map size by one chip's HBM.  This module removes
that bound: world space is striped into x-slabs of `slab_voxels` coarse
voxels, slab s is OWNED by chip s mod n — so each chip stores only ~1/n of
the voxels and total map capacity scales linearly with the mesh.

This is the TPU-native realization of the reference's spatial mutex sharding
(SURVEY.md P6: 10 m triangle regions guarded by per-region mutexes,
reference src/meshing/r3live/triangle.cpp:35-53) turned into the multi-chip
partition dimension: ownership replaces locking, and the only cross-chip
coupling — a point whose face-neighbor probe (lio/association.py
`_lookup_with_neighbors`, mirroring reference voxel_mapping.cpp:192-222)
crosses a slab edge — is served by a **halo**: each frame, every chip
ppermutes the plane parameters of its boundary voxel columns to the two
neighboring chips, which insert them into their own table flagged `is_halo`.
Mod-striping makes slab-adjacency == ring-adjacency, so the halo rides the
ICI neighbor links (one ppermute left, one right, O(halo) bytes — never a
gather of the map).

Per frame, inside `shard_map`:
  1. every chip computes the scan's voxel aggregates, masked to OWNED voxels
     → applies them locally (owner-computes: no conflicts, no replication);
  2. association runs on the full scan but each chip keeps only the residual
     rows of points whose voxel it owns (exactly one owner per point, so the
     psum'd Gauss-Newton normal equations count each point once);
  3. boundary planes are exchanged via two ppermutes and written into the
     local table as refreshed halo entries.

The filter state stays replicated (18 numbers); the MAP is what scales.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from immesh_tpu.config import ImMeshConfig
from immesh_tpu.core.geometry import lidar_point_cov_body
from immesh_tpu.core.state import EsikfState, STATE_DIM
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.lio import imu as imu_mod
from immesh_tpu.lio.association import associate
from immesh_tpu.lio.downsample import voxel_downsample
from immesh_tpu.map.hash import voxel_coords
from immesh_tpu.map.voxel_map import VoxelMap, _sym_pack, _sym_unpack


def owner_of_coords(coords: jnp.ndarray, slab_voxels: int, n_shards: int
                    ) -> jnp.ndarray:
    """(…, 4) int32 voxel keys → owning shard id in [0, n_shards).

    Ownership is defined on the LEVEL-0 (coarse) x column so a voxel and its
    octant children always share an owner: parent_x = key_x >> level
    (arithmetic shift == floor division, valid for negatives)."""
    px = coords[..., 0] >> coords[..., 3]
    return (px // slab_voxels) % n_shards


@struct.dataclass
class ShardedVoxelMap:
    """One chip's shard: a plain VoxelMap whose entries are either OWNED
    (inserted/refit locally) or HALO (read-only copies of neighbor boundary
    planes, refreshed every frame).  Halo entries live in the same table and
    arrays, so `lio/association.associate` works on it unchanged."""

    vm: VoxelMap
    is_halo: jnp.ndarray          # (capacity,) bool

    shard_id: jnp.ndarray         # () int32
    n_shards: int = struct.field(pytree_node=False)
    slab_voxels: int = struct.field(pytree_node=False)
    halo_capacity: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, cfg, shard_id: int, n_shards: int,
               slab_voxels: int = 32, halo_capacity: int = 1024
               ) -> "ShardedVoxelMap":
        vm = VoxelMap.create(cfg)
        return cls(vm=vm, is_halo=jnp.zeros(cfg.capacity, bool),
                   shard_id=jnp.asarray(shard_id, jnp.int32),
                   n_shards=n_shards, slab_voxels=slab_voxels,
                   halo_capacity=halo_capacity)

    # ------------------------------------------------------------------
    def owns(self, coords: jnp.ndarray) -> jnp.ndarray:
        return owner_of_coords(
            coords, self.slab_voxels, self.n_shards) == self.shard_id

    def update_owned(self, pts_world, point_sigma2, mask,
                     max_voxels: int = 4096) -> "ShardedVoxelMap":
        """Owner-computes map growth: identical to VoxelMap.update but each
        level's aggregate mask is restricted to voxels this shard owns."""
        c0 = voxel_coords(pts_world, self.vm.cfg.voxel_size, 0)
        own = self.owns(c0)
        vm = self.vm
        uc, agg, ok = vm.scan_aggregates(
            pts_world, point_sigma2, mask & own, 0, max_voxels)
        vm = vm.apply_aggregates(uc, agg, ok, 0)
        m = mask & own
        for lvl in range(1, vm.cfg.max_layers):
            cprev = voxel_coords(pts_world, vm.cfg.voxel_size, lvl - 1)
            parent = vm.table.lookup(cprev)
            m = m & jnp.where(parent >= 0, vm.subdivided[parent], False)
            uc, agg, ok = vm.scan_aggregates(
                pts_world, point_sigma2, m, lvl, max_voxels)
            vm = vm.apply_aggregates(uc, agg, ok, lvl)
        return self.replace(vm=vm)

    # ------------------------------------------------------------------
    def _extract_boundary(self, side: int):
        """Gather the plane records of owned occupied voxels in the boundary
        column toward `side` (+1: rightmost column of each owned slab, −1:
        leftmost), compacted to halo_capacity rows."""
        vm = self.vm
        keys = vm.table.keys                                   # (cap, 4)
        occupied = keys[:, 0] != jnp.int32(0x7FFFFFFF)
        px = keys[:, 0] >> keys[:, 3]
        col = px % self.slab_voxels
        at_edge = col == (self.slab_voxels - 1 if side > 0 else 0)
        pred = occupied & ~self.is_halo & at_edge & (
            vm.plane_valid | vm.subdivided)
        idx = jnp.nonzero(pred, size=self.halo_capacity,
                          fill_value=keys.shape[0] - 1)[0]
        valid = pred[idx]
        return {
            "coords": jnp.where(valid[:, None], keys[idx], 0x7FFFFFFF),
            "valid": valid,
            "normal": vm.normal[idx], "d": vm.d[idx],
            "center": vm.center[idx], "cov_nn": vm.cov_nn[idx],
            "var_c": vm.var_c[idx], "lam": vm.lam[idx],
            "plane_valid": vm.plane_valid[idx] & valid,
            "subdivided": vm.subdivided[idx] & valid,
        }

    def _insert_halo(self, rec) -> "ShardedVoxelMap":
        """Insert/refresh received boundary records as halo entries."""
        vm = self.vm
        table, slots = vm.table.insert(rec["coords"], rec["valid"])
        ok = rec["valid"] & (slots >= 0)
        tgt = jnp.where(ok, slots, vm.cfg.capacity)
        vm = vm.replace(
            table=table,
            normal=vm.normal.at[tgt].set(rec["normal"], mode="drop"),
            d=vm.d.at[tgt].set(rec["d"], mode="drop"),
            center=vm.center.at[tgt].set(rec["center"], mode="drop"),
            cov_nn=vm.cov_nn.at[tgt].set(rec["cov_nn"], mode="drop"),
            var_c=vm.var_c.at[tgt].set(rec["var_c"], mode="drop"),
            lam=vm.lam.at[tgt].set(rec["lam"], mode="drop"),
            plane_valid=vm.plane_valid.at[tgt].set(
                rec["plane_valid"], mode="drop"),
            subdivided=vm.subdivided.at[tgt].set(
                rec["subdivided"], mode="drop"),
        )
        return self.replace(
            vm=vm, is_halo=self.is_halo.at[tgt].set(True, mode="drop"))

    def halo_exchange(self, axis: str) -> "ShardedVoxelMap":
        """Refresh halos: my right boundary → right neighbor, my left → left
        (ring ppermutes over ICI; mod-striping makes slab adjacency == ring
        adjacency)."""
        n = self.n_shards
        to_right = [(i, (i + 1) % n) for i in range(n)]
        to_left = [(i, (i - 1) % n) for i in range(n)]
        svm = self
        for side, perm in ((+1, to_right), (-1, to_left)):
            rec = svm._extract_boundary(side)
            rec = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(x, axis, perm), rec)
            svm = svm._insert_halo(rec)
        return svm

    # ------------------------------------------------------------------
    def n_owned_voxels(self) -> jnp.ndarray:
        occupied = self.vm.table.keys[:, 0] != jnp.int32(0x7FFFFFFF)
        return jnp.sum(occupied & ~self.is_halo)


# ======================================================================
# the sharded-map LIO step
# ======================================================================

def _sharded_lio_body(state: EsikfState, svm: ShardedVoxelMap,
                      bundle: ScanBundle, cfg: ImMeshConfig, axis: str):
    """shard_map body: bundle replicated, map sharded by slab ownership."""
    lio_cfg, map_cfg, imu_cfg = cfg.lio, cfg.voxel_map, cfg.imu

    if imu_cfg.imu_en:
        state_prop, seg = imu_mod.imu_propagate(state, bundle, imu_cfg)
        pts_end = imu_mod.deskew(seg, state_prop, bundle.pts, bundle.t_rel)
    else:
        state_prop = imu_mod.const_velocity_propagate(
            state, bundle.scan_duration, imu_cfg)
        pts_end = imu_mod.deskew_const_twist(
            bundle.pts, bundle.t_rel, bundle.scan_duration,
            state.bg * bundle.scan_duration, state.vel * bundle.scan_duration)

    down_pts, down_mask = voxel_downsample(
        pts_end, bundle.mask, lio_cfg.downsample_voxel,
        lio_cfg.map_update_points)
    pcov = lidar_point_cov_body(down_pts, map_cfg.dept_err, map_cfg.beam_err)

    dtype = down_pts.dtype
    p_inv = jnp.linalg.inv(
        state_prop.cov + jnp.eye(STATE_DIM, dtype=dtype) * 1e-9)
    rot_thresh = jnp.asarray(lio_cfg.converge_rot_deg * jnp.pi / 180.0, dtype)
    trans_thresh = jnp.asarray(lio_cfg.converge_trans_m, dtype)

    def body(_, carry):
        st, converged, n_eff, A_last = carry
        # ownership of a point = ownership of its CURRENT-iterate voxel;
        # the state is replicated, so every chip assigns each point to the
        # same single owner — the psum counts every row exactly once
        q_world = st.transform_points(down_pts)
        own = svm.owns(voxel_coords(q_world, map_cfg.voxel_size, 0))
        assoc = associate(st, svm.vm, down_pts, pcov, down_mask & own, map_cfg)
        hw = assoc["h6"] * assoc["r_inv"][:, None]
        HtRH6 = jax.lax.psum(hw.T @ assoc["h6"], axis)          # ← ICI
        HtRz6 = jax.lax.psum(hw.T @ (-assoc["z"]), axis)        # ← ICI
        n_loc = jax.lax.psum(jnp.sum(assoc["valid"]), axis)

        A = p_inv.at[0:6, 0:6].add(HtRH6)
        b = (p_inv @ state_prop.boxminus(st)).at[0:6].add(HtRz6)
        chol = jax.lax.linalg.cholesky(
            A + jnp.eye(STATE_DIM, dtype=dtype) * 1e-9)
        delta = jax.scipy.linalg.cho_solve((chol, True), b)
        new_state = st.boxplus(delta)
        now_conv = (jnp.linalg.norm(delta[0:3]) < rot_thresh) & (
            jnp.linalg.norm(delta[3:6]) < trans_thresh)
        st = jax.tree_util.tree_map(
            lambda new, old: jnp.where(converged, old, new), new_state, st)
        A_last = jnp.where(converged, A_last, A)
        n_eff = jnp.where(converged, n_eff, n_loc)
        return st, converged | now_conv, n_eff, A_last

    init = (state_prop, jnp.asarray(False), jnp.asarray(0, jnp.int32), p_inv)
    st, converged, n_eff, A_last = jax.lax.fori_loop(
        0, lio_cfg.max_iterations, body, init)
    cov_post = jnp.linalg.inv(A_last + jnp.eye(STATE_DIM, dtype=dtype) * 1e-9)
    st = st.replace(cov=0.5 * (cov_post + cov_post.T))

    # owner-computes growth + halo refresh
    pts_world_down = st.transform_points(down_pts)
    sigma2 = (pcov[:, 0, 0] + pcov[:, 1, 1] + pcov[:, 2, 2]) / 3.0
    svm = svm.update_owned(pts_world_down, sigma2, down_mask)
    svm = svm.halo_exchange(axis)

    world_scan = st.transform_points(pts_end)
    diag = {"converged": converged, "n_effective": n_eff}
    # stacked-shard representation: leading device axis for out_specs P(axis)
    svm_stacked = jax.tree_util.tree_map(lambda x: x[None], svm)
    return st, svm_stacked, world_scan, diag


def create_sharded_map(mesh: Mesh, cfg: ImMeshConfig, *, axis: str = "dp",
                       slab_voxels: int = 32, halo_capacity: int = 1024):
    """Build the per-chip map shards in stacked form ((n_dev, …) leading axis,
    sharded over `axis`) ready to feed make_sharded_lio_step."""
    n = mesh.shape[axis]
    shards = [ShardedVoxelMap.create(cfg.voxel_map, i, n, slab_voxels,
                                     halo_capacity) for i in range(n)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *shards)
    sh = jax.sharding.NamedSharding(mesh, P(axis))
    return jax.device_put(stacked, jax.tree_util.tree_map(
        lambda _: sh, stacked))


def make_sharded_lio_step(mesh: Mesh, cfg: ImMeshConfig, axis: str = "dp"):
    """Jitted multi-chip LIO step over a spatially-sharded map.

    In: state (replicated), svm_stacked ((n_dev, …) sharded over axis),
    bundle (replicated).  Out: (state, svm_stacked, world_scan, diag)."""
    def body(state, svm_stacked, bundle):
        svm = jax.tree_util.tree_map(lambda x: x[0], svm_stacked)
        return _sharded_lio_body(state, svm, bundle, cfg, axis)

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P(axis), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
