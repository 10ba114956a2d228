"""Bisect triangulate_voxels stages on the real chip. Throwaway."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from immesh_tpu.config import PRESETS
from immesh_tpu.frontend.sim import LidarImuSimulator
from immesh_tpu.mesh.delaunay import compact_triangles, delaunay_mask, pca_project
from immesh_tpu.mesh.global_map import GlobalPointMap

cfg = PRESETS["sim"]()
sim = LidarImuSimulator(n_rays=cfg.preprocess.max_points, seed=0)
gm = GlobalPointMap.create(cfg.mesh)

append = jax.jit(lambda gm, p, m: gm.append_frame(p, m))
pullj = jax.jit(lambda gm, s, sm: gm.pull_neighborhood(s, sm))
for k in range(3):
    f = sim.frame(k)
    gm, slots, smask = append(gm, jnp.asarray(f.pts),
                              jnp.ones(f.pts.shape[0], bool))
pull = pullj(gm, slots, smask)
pts, pmask, gidx = pull["pts"], pull["mask"], pull["idx"]
CH = cfg.mesh.mesh_chunk
A = slots.shape[0]
n_chunks = A // CH
rs = lambda x: x.reshape((n_chunks, CH) + x.shape[1:])
pts_c, pmask_c, gidx_c = rs(pts), rs(pmask), rs(gidx)

C2 = min(4 * cfg.mesh.tris_per_voxel, 2 * cfg.mesh.pull_capacity)


@jax.jit
def stage1(pts_c, pmask_c, gidx_c):
    def one(args):
        p, m, g = args
        uv, _, _ = pca_project(p, m)
        tris, keep = delaunay_mask(uv, m, tiebreak=g)
        return keep.sum(axis=-1)
    return jax.lax.map(one, (pts_c, pmask_c, gidx_c))


@jax.jit
def stage2(pts_c, pmask_c, gidx_c):
    def one(args):
        p, m, g = args
        uv, _, _ = pca_project(p, m)
        tris, keep = delaunay_mask(uv, m, tiebreak=g)
        rows, rmask = compact_triangles(keep, tris, C2)
        return rows.sum(axis=-1) + rmask.sum(axis=-1)
    return jax.lax.map(one, (pts_c, pmask_c, gidx_c))


@jax.jit
def stage_pca(pts_c, pmask_c):
    def one(args):
        p, m = args
        uv, _, _ = pca_project(p, m)
        return uv.sum(axis=(-1, -2))
    return jax.lax.map(one, (pts_c, pmask_c))


for name, fn, args in (
    ("pca", stage_pca, (pts_c, pmask_c)),
    ("pca+delaunay", stage1, (pts_c, pmask_c, gidx_c)),
    ("pca+del+compact", stage2, (pts_c, pmask_c, gidx_c)),
):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:18s} {(time.perf_counter() - t0) * 100:8.2f} ms/frame")
