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
by construction — the spatial-shard upgrade (each chip OWNS a region of the
map, ppermute halo exchange) keeps the same kernel and drops the gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from immesh_tpu.config import ImMeshConfig
from immesh_tpu.mesh.global_map import GlobalPointMap
from immesh_tpu.mesh.triangles import (
    TriangleStore, apply_triangles, triangulate_voxels,
)


def _mp_mesh_body(gm: GlobalPointMap, store: TriangleStore,
                  scan_local: jnp.ndarray, mask_local: jnp.ndarray,
                  sensor_pos: jnp.ndarray,
                  cfg: ImMeshConfig, axis: str, n_dev: int):
    pts_all = jax.lax.all_gather(scan_local, axis).reshape(-1, 3)
    mask_all = jax.lax.all_gather(mask_local, axis).reshape(-1)

    gm, slots, smask = gm.append_frame(pts_all, mask_all)  # identical/replica

    # shard the active voxels over the axis
    A = slots.shape[0]
    per = A // n_dev
    d = jax.lax.axis_index(axis)
    sl = jax.lax.dynamic_slice_in_dim(slots, d * per, per)
    sm = jax.lax.dynamic_slice_in_dim(smask, d * per, per)

    ids, counts = triangulate_voxels(
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
