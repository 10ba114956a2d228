"""Decompose triangulate_voxels device time at KITTI scale.
Throwaway profiling aid: isolates pull / chunked-map / gather chain."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from immesh_tpu.config import PRESETS
from immesh_tpu.frontend.sim import LidarImuSimulator
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.lio.pipeline import LioPipeline, lio_step
from immesh_tpu.mesh.global_map import GlobalPointMap
from immesh_tpu.mesh.triangles import (
    TriangleStore, _pos_hash, triangulate_voxels)
from immesh_tpu.mesh.delaunay import (
    angle_filter, compact_triangles, delaunay_mask, pca_project,
    _tri_candidates)

base = PRESETS["kitti"]()
cfg = base.replace(
    preprocess=base.preprocess.__class__(
        lidar_type=100, blind=0.05, max_points=131072),
    imu=base.imu.__class__(imu_en=True),
)
mc = cfg.mesh

sim = LidarImuSimulator(n_rays=cfg.preprocess.max_points, seed=0)
lio = LioPipeline(cfg)
lio.static_init(*sim.static_imu(100))

def bundle(k):
    f = sim.frame(k)
    return ScanBundle.from_numpy(
        f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
        f.scan_duration, cfg.preprocess.max_points, cfg.imu.max_imu_per_scan)

gm = GlobalPointMap.create(mc)
append = jax.jit(lambda gm, p, m: gm.append_frame(p, m), donate_argnums=0)
for k in range(6):
    b = bundle(k)
    lio.state, lio.vm, ws, _ = lio_step(lio.state, lio.vm, b, cfg)
    gm, slots, smask = append(gm, ws, b.mask)
sp = lio.state.pos + 0
jax.block_until_ready(slots)
print("active voxels:", int(jnp.sum(smask)))

CH = mc.mesh_chunk


def bench(name, f, *args, reps=10):
    out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    ms = 1e3 * (time.perf_counter() - t0) / reps
    print(f"{name:32s} {ms:8.2f} ms/frame")
    return out


# full triangulate_voxels as shipped
f_full = jax.jit(lambda gm, s, sm, sp: triangulate_voxels(gm, s, sm, sp, mc, CH))
bench("triangulate_voxels FULL", f_full, gm, slots, smask, sp)

# pull only
f_pull = jax.jit(lambda gm, s, sm: gm.pull_neighborhood(s, sm))
pull = bench("pull_neighborhood", f_pull, gm, slots, smask)

pts, pmask, gidx = pull["pts"], pull["mask"], pull["idx"]
vox_key = gm.vox.keys[jnp.maximum(slots, 0), :3]
A = slots.shape[0]
C = mc.tris_per_voxel
C2 = min(4 * C, 2 * mc.pull_capacity)
res = mc.voxel_resolution


def stage_a(pts_c, pmask_c):
    """pca + delaunay + compact (per chunk)."""
    uv, _, _ = pca_project(pts_c, pmask_c)
    phash = _pos_hash(pts_c)
    tris, keep = delaunay_mask(uv, pmask_c, tiebreak=phash,
                               tie_scale=mc.tie_scale)
    rows, rmask = compact_triangles(keep, tris, C2)
    return rows, rmask, tris, phash


def stage_b(pts_c, pmask_c, gidx_c, key_c):
    """everything (the real _chunk_impl, replicated)."""
    rows, rmask, tris, phash = stage_a(pts_c, pmask_c)
    rowc = jnp.maximum(rows, 0)
    tri3 = tris[rowc]

    def gatherp(e):
        return jnp.take_along_axis(pts_c, tri3[..., e:e + 1].repeat(3, -1), 1)

    v0, v1, v2 = gatherp(0), gatherp(1), gatherp(2)
    i0 = jnp.take_along_axis(gidx_c, tri3[..., 0], axis=1)
    i1 = jnp.take_along_axis(gidx_c, tri3[..., 1], axis=1)
    i2 = jnp.take_along_axis(gidx_c, tri3[..., 2], axis=1)
    keep2 = rmask & angle_filter(v0, v1, v2, mc.max_tri_angle_deg)
    h0 = jnp.take_along_axis(phash, tri3[..., 0], axis=1)
    h1 = jnp.take_along_axis(phash, tri3[..., 1], axis=1)
    h2 = jnp.take_along_axis(phash, tri3[..., 2], axis=1)
    cen = (v0 + v1 + v2) / 3.0
    cen_key = jnp.floor(cen / res).astype(jnp.int32)
    keep2 = keep2 & jnp.all(cen_key == key_c[:, None, :], axis=-1)
    rows2, rmask2 = compact_triangles(keep2, tri3, C)
    return rows2, rmask2, i0, h0


def chunked(fn, n_in):
    def run(*arrs):
        pad = (-A) % CH
        def rc(x):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)).reshape(
                ((A + pad) // CH, CH) + x.shape[1:])
        return jax.lax.map(lambda a: fn(*a), tuple(rc(x) for x in arrs))
    return jax.jit(run)


bench("map: pca+del+compact", chunked(stage_a, 2), pts, pmask)
bench("map: full chunk impl", chunked(stage_b, 4), pts, pmask, gidx, vox_key)

# vmap instead of lax.map for the full chunk impl
f_vmap = jax.jit(lambda p, m, g, k: jax.vmap(
    lambda a, b, c, d: stage_b(a[None], b[None], c[None], d[None]))(p, m, g, k))
# vmap over single voxels is weird; instead reshape to chunks and vmap chunks
def vmap_chunks(*arrs):
    pad = (-A) % CH
    def rc(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)).reshape(
            ((A + pad) // CH, CH) + x.shape[1:])
    return jax.vmap(stage_b)(*(rc(x) for x in arrs))
bench("vmap: full chunk impl", jax.jit(vmap_chunks), pts, pmask, gidx, vox_key)

# no chunking at all: run stage_b on all A at once
bench("flat: full impl A=512", jax.jit(stage_b), pts, pmask, gidx, vox_key)
bench("flat: pca+del+compact", jax.jit(stage_a), pts, pmask)
