"""Microbench the triangulation internals at KITTI-scale shapes.
Throwaway profiling aid."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from immesh_tpu.mesh.delaunay import (
    _tri_candidates, compact_triangles, delaunay_mask, pca_project)

A_TOTAL, CH, K = 512, 64, 48
C, C2 = 64, 96
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.normal(size=(CH, K, 3)).astype(np.float32))
mask = jnp.asarray(rng.random((CH, K)) < 0.9)
phash = jnp.asarray(rng.integers(0, 2**31, size=(CH, K), dtype=np.int32))

T = _tri_candidates(K).shape[0]
keep_rand = jnp.asarray(rng.random((CH, T)) < 0.004)
tris_const = jnp.asarray(_tri_candidates(K))

f_pca = jax.jit(lambda p, m: pca_project(p, m))
f_del = jax.jit(lambda uv, m, h: delaunay_mask(uv, m, tiebreak=h,
                                               tie_scale=0.02))
f_cmp = jax.jit(lambda k: compact_triangles(k, tris_const, C2))

N_CH = A_TOTAL // CH   # chunks per frame


def bench(name, f, *args, per_frame=N_CH):
    out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    ms = 1e3 * (time.perf_counter() - t0) / reps
    print(f"{name:24s} {ms:8.2f} ms/chunk  -> {ms * per_frame:7.1f} ms/frame")
    return out


uv, org, axes = bench("pca_project", f_pca, pts, mask)
tris, keep = bench("delaunay_mask(pallas)", f_del, uv, mask, phash)
bench("compact_triangles C2", f_cmp, keep_rand)

# fused delaunay+compact as used (they fuse in one jit in _chunk_impl)
f_both = jax.jit(lambda uv, m, h: compact_triangles(
    delaunay_mask(uv, m, tiebreak=h, tie_scale=0.02)[1], tris_const, C2))
bench("delaunay+compact fused", f_both, uv, mask, phash)
