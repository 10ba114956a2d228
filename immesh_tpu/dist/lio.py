"""Multi-chip LIO: explicit shard_map data parallelism over scan points.

The reference has NO distributed backend (SURVEY.md P7 — a single process
with OpenMP over 4 cores for residual association, voxel_mapping.cpp:167).
This module is the TPU-native replacement: the scan's point dimension is the
DP axis (the analogue of the reference's OpenMP parallel-for), laid out over
ICI with XLA collectives:

  * IMU propagation: replicated (identical tiny compute on every chip);
  * deskew + association + Jacobian rows: local to each chip's point shard;
  * ESIKF normal equations: `psum` of the 6×6/6 information contributions —
    the classic distributed Gauss–Newton reduction;
  * map growth: each chip aggregates its shard's voxel moments, the deduped
    aggregate lists are `all_gather`ed and re-deduped so every replica applies
    the IDENTICAL insert — replicas stay bit-identical without locks
    (owner-computes everywhere, reference's mutexes have no equivalent).

State and the plane map are replicated (planes are O(10 MB) — cheap); the
spatially-sharded map (halo exchange via ppermute) is the round-2+ upgrade
path once multi-host pods are reachable.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from immesh_tpu.config import ImMeshConfig
from immesh_tpu.core.geometry import lidar_point_cov_body
from immesh_tpu.core.state import EsikfState, STATE_DIM
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.lio import imu as imu_mod
from immesh_tpu.lio.association import associate
from immesh_tpu.lio.downsample import voxel_downsample
from immesh_tpu.map.voxel_map import VoxelMap


def _dp_lio_body(state: EsikfState, vm: VoxelMap, bundle: ScanBundle,
                 cfg: ImMeshConfig, axis: str, n_dev: int):
    """shard_map body: bundle point-arrays are the LOCAL shard."""
    lio_cfg, map_cfg, imu_cfg = cfg.lio, cfg.voxel_map, cfg.imu

    # 1. propagate — replicated
    if imu_cfg.imu_en:
        state_prop, seg = imu_mod.imu_propagate(state, bundle, imu_cfg)
        pts_end = imu_mod.deskew(seg, state_prop, bundle.pts, bundle.t_rel)
    else:
        state_prop = imu_mod.const_velocity_propagate(
            state, bundle.scan_duration, imu_cfg)
        pts_end = imu_mod.deskew_const_twist(
            bundle.pts, bundle.t_rel, bundle.scan_duration,
            state.bg * bundle.scan_duration, state.vel * bundle.scan_duration)

    # 2. per-shard downsample (shards own disjoint point subsets; cross-shard
    #    voxel duplicates just contribute a few extra residual rows)
    down_pts, down_mask = voxel_downsample(
        pts_end, bundle.mask, lio_cfg.downsample_voxel,
        lio_cfg.map_update_points // n_dev,
    )
    pcov = lidar_point_cov_body(down_pts, map_cfg.dept_err, map_cfg.beam_err)

    # 3. iterated ESIKF with psum'd information reductions
    dtype = down_pts.dtype
    p_inv = jnp.linalg.inv(
        state_prop.cov + jnp.eye(STATE_DIM, dtype=dtype) * 1e-9)
    rot_thresh = jnp.asarray(lio_cfg.converge_rot_deg * jnp.pi / 180.0, dtype)
    trans_thresh = jnp.asarray(lio_cfg.converge_trans_m, dtype)

    def body(_, carry):
        st, converged, n_eff, A_last = carry
        assoc = associate(st, vm, down_pts, pcov, down_mask, map_cfg)
        hw = assoc["h6"] * assoc["r_inv"][:, None]
        HtRH6 = jax.lax.psum(hw.T @ assoc["h6"], axis)          # ← ICI
        HtRz6 = jax.lax.psum(hw.T @ (-assoc["z"]), axis)        # ← ICI
        n_loc = jax.lax.psum(jnp.sum(assoc["valid"]), axis)

        A = p_inv.at[0:6, 0:6].add(HtRH6)
        b = (p_inv @ state_prop.boxminus(st)).at[0:6].add(HtRz6)
        chol = jax.lax.linalg.cholesky(A + jnp.eye(STATE_DIM, dtype=dtype) * 1e-9)
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

    # 4. replicated map growth from all-gathered per-shard aggregates
    pts_world_down = st.transform_points(down_pts)
    sigma2 = (pcov[:, 0, 0] + pcov[:, 1, 1] + pcov[:, 2, 2]) / 3.0
    max_vox = 4096 // n_dev
    lmask = down_mask
    for level in range(map_cfg.max_layers):
        if level > 0:
            from immesh_tpu.map.hash import voxel_coords
            cprev = voxel_coords(
                pts_world_down, map_cfg.voxel_size, level - 1)
            parent = vm.table.lookup(cprev)
            lmask = lmask & jnp.where(
                parent >= 0, vm.subdivided[parent], False)
        uc, agg, ok = vm.scan_aggregates(
            pts_world_down, sigma2, lmask, level, max_vox)
        # gather every shard's aggregates → identical combined list everywhere
        uc_all = jax.lax.all_gather(uc, axis).reshape(-1, 4)
        agg_all = jax.lax.all_gather(agg, axis).reshape(-1, agg.shape[-1])
        ok_all = jax.lax.all_gather(ok, axis).reshape(-1)
        # re-dedup across shards (same voxel may appear in several shards)
        uc_m, agg_m, ok_m = _merge_aggregates(uc_all, agg_all, ok_all)
        vm = vm.apply_aggregates(uc_m, agg_m, ok_m, level)

    world_scan = st.transform_points(pts_end)
    return st, vm, world_scan, {"converged": converged, "n_effective": n_eff}


def _merge_aggregates(uc, agg, ok):
    """Sum aggregate rows with identical voxel keys (cross-shard dedup).

    Keys are compared EXACTLY on all four int32 columns (one variadic
    lexicographic sort) — the earlier x+(y<<11) packing aliased coordinates
    beyond ±1024 cells (~256 m at level-1 avia resolution); the reference's
    equivalent is exact VOXEL_LOC key equality (voxel_loc.hpp:106-127)."""
    u = uc.shape[0]
    # primary key: validity (invalid rows last), then the 4 coord columns
    order = jnp.lexsort((uc[:, 3], uc[:, 2], uc[:, 1], uc[:, 0], ~ok))
    uc_s, agg_s, ok_s = uc[order], agg[order], ok[order]
    same = jnp.all(uc_s[1:] == uc_s[:-1], axis=-1) & ok_s[1:] & ok_s[:-1]
    head = jnp.concatenate([jnp.asarray([True]), ~same])
    # segment ids by cumulative heads, then sum aggregates per segment
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1
    agg_m = jax.ops.segment_sum(agg_s, seg, num_segments=u)
    # representative row per segment = first occurrence (heads)
    idx = jnp.nonzero(head, size=u, fill_value=u - 1)[0]
    uc_m = uc_s[idx]
    ok_m = ok_s[idx] & (jnp.arange(u) < jnp.sum(head))
    return uc_m, agg_m, ok_m


def make_dp_lio_step(mesh: Mesh, cfg: ImMeshConfig, axis: str = "dp"):
    """Build the jitted multi-chip LIO step for a device mesh.

    Point arrays of the bundle are sharded over `axis`; everything else is
    replicated.  Returns (step_fn, shard_bundle) where shard_bundle places a
    host bundle onto the mesh with the right shardings.
    """
    repl = NamedSharding(mesh, P())
    pts_sh = NamedSharding(mesh, P(axis))
    pts2_sh = NamedSharding(mesh, P(axis, None))

    def shard_bundle(b: ScanBundle) -> ScanBundle:
        return b.replace(
            pts=jax.device_put(b.pts, pts2_sh),
            t_rel=jax.device_put(b.t_rel, pts_sh),
            mask=jax.device_put(b.mask, pts_sh),
            imu_stamps=jax.device_put(b.imu_stamps, repl),
            imu_acc=jax.device_put(b.imu_acc, repl),
            imu_gyr=jax.device_put(b.imu_gyr, repl),
            imu_mask=jax.device_put(b.imu_mask, repl),
            scan_duration=jax.device_put(b.scan_duration, repl),
        )

    bundle_specs = ScanBundle(
        pts=P(axis, None), t_rel=P(axis), mask=P(axis),
        imu_stamps=P(), imu_acc=P(), imu_gyr=P(), imu_mask=P(),
        scan_duration=P(),
    )

    body = functools.partial(_dp_lio_body, cfg=cfg, axis=axis,
                             n_dev=mesh.shape[axis])
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), bundle_specs),
        out_specs=(P(), P(), P(axis, None), P()),
        check_vma=False,
    )
    return jax.jit(sharded), shard_bundle
