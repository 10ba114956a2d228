"""Honest decomposition of the triangulation wall: pca / pallas incircle /
compact, each with VARYING inputs per rep (identical-arg reps mismeasure on
the axon backend). Throwaway profiling aid."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from immesh_tpu.mesh.delaunay import (
    _incircle_min_scores, _round_up, _tri_candidates, compact_triangles,
    delaunay_mask, pca_project)

A, K = 512, 48
REPS = 8
rng = np.random.default_rng(0)

def mkinputs(i):
    r = np.random.default_rng(i)
    pts = jnp.asarray(r.normal(size=(A, K, 3)).astype(np.float32))
    mask = jnp.asarray(r.random((A, K)) < 0.7)
    h = jnp.asarray(r.integers(0, 2**31, size=(A, K), dtype=np.int32))
    return pts, mask, h

INPUTS = [mkinputs(i) for i in range(REPS)]


def bench(name, f):
    outs = f(*INPUTS[0])
    jax.block_until_ready(jax.tree_util.tree_leaves(outs))
    t0 = time.perf_counter()
    for i in range(REPS):
        outs = f(*INPUTS[i])
    jax.block_until_ready(jax.tree_util.tree_leaves(outs))
    print(f"{name:36s} {1e3*(time.perf_counter()-t0)/REPS:8.2f} ms")


T = _tri_candidates(K).shape[0]
tris_c = jnp.asarray(_tri_candidates(K))
Kp, Tp, Ap = _round_up(K, 128), _round_up(T, 1024), _round_up(A, 8)

bench("pca only", jax.jit(lambda p, m, h: pca_project(p, m)))
bench("pca+delaunay", jax.jit(
    lambda p, m, h: delaunay_mask(pca_project(p, m)[0], m, tiebreak=h,
                                  tie_scale=0.02)[1]))
bench("pca+delaunay+compact C2=96", jax.jit(
    lambda p, m, h: compact_triangles(
        delaunay_mask(pca_project(p, m)[0], m, tiebreak=h,
                      tie_scale=0.02)[1], tris_c, 96)))

# pallas kernel alone, inputs prebuilt
def prep(p, m, h):
    uv, _, _ = pca_project(p, m)
    u, v = uv[..., 0], uv[..., 1]
    lift = u * u + v * v
    w = m.astype(jnp.float32)
    uvlw8 = jnp.zeros((Ap, 8, Kp), jnp.float32)
    uvlw8 = uvlw8.at[:A, 0, :K].set(u * w)
    uvlw8 = uvlw8.at[:A, 1, :K].set(v * w)
    uvlw8 = uvlw8.at[:A, 2, :K].set(lift * w)
    uvlw8 = uvlw8.at[:A, 3, :K].set(w)
    uvlw8 = uvlw8.at[:A, 4, :K].set(u)
    uvlw8 = uvlw8.at[:A, 5, :K].set(v)
    uvlw8 = uvlw8.at[:A, 6, :K].set(lift)
    tris8 = jnp.zeros((8, Tp), jnp.int32).at[0:3, :T].set(tris_c.T)
    ma = jnp.full((Ap,), 1e-6, jnp.float32)
    return uvlw8, tris8, ma

PREPPED = [jax.jit(prep)(*inp) for inp in INPUTS]
jax.block_until_ready(PREPPED[-1][0])
kern = jax.jit(lambda u, t, m: _incircle_min_scores(u, t, m, tt=1024))
outs = kern(*PREPPED[0])
jax.block_until_ready(outs)
t0 = time.perf_counter()
for i in range(REPS):
    outs = kern(*PREPPED[i])
jax.block_until_ready(outs)
print(f"{'pallas incircle alone':36s} {1e3*(time.perf_counter()-t0)/REPS:8.2f} ms")

# top_k compact alone on precomputed keeps
KEEPS = [jax.jit(lambda p, m, h: delaunay_mask(
    pca_project(p, m)[0], m, tiebreak=h, tie_scale=0.02)[1])(*inp)
    for inp in INPUTS]
jax.block_until_ready(KEEPS[-1])
comp = jax.jit(lambda k: compact_triangles(k, tris_c, 96))
outs = comp(KEEPS[0])
jax.block_until_ready(jax.tree_util.tree_leaves(outs))
t0 = time.perf_counter()
for i in range(REPS):
    outs = comp(KEEPS[i])
jax.block_until_ready(jax.tree_util.tree_leaves(outs))
print(f"{'compact(top_k) alone':36s} {1e3*(time.perf_counter()-t0)/REPS:8.2f} ms")
