"""Decompose mesh_step time on the real chip: append / pull / triangulate /
apply. Throwaway profiling aid (not part of the package)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from immesh_tpu.config import PRESETS
from immesh_tpu.frontend.sim import LidarImuSimulator
from immesh_tpu.mesh.global_map import GlobalPointMap
from immesh_tpu.mesh.triangles import TriangleStore, apply_triangles, triangulate_voxels

cfg = PRESETS["sim"]()
sim = LidarImuSimulator(n_rays=cfg.preprocess.max_points, seed=0)
gm = GlobalPointMap.create(cfg.mesh)
store = TriangleStore.create(cfg.mesh)

CH = cfg.mesh.mesh_chunk

append = jax.jit(lambda gm, p, m: gm.append_frame(p, m))
pull = jax.jit(lambda gm, s, sm: gm.pull_neighborhood(s, sm))
tri = jax.jit(lambda gm, s, sm, sp: triangulate_voxels(gm, s, sm, sp, cfg.mesh, CH))
appl = jax.jit(apply_triangles)

frames = []
for k in range(12):
    f = sim.frame(k)
    frames.append((jnp.asarray(f.pts), jnp.ones(f.pts.shape[0], bool),
                   jnp.asarray(f.gt_pos, jnp.float32)))

# warm
for k in range(2):
    p, m, sp = frames[k]
    gm, slots, smask = append(gm, p, m)
    out = pull(gm, slots, smask)
    ids, counts = tri(gm, slots, smask, sp)
    store = appl(store, slots, smask, ids, counts)
jax.block_until_ready(store.tri_n)

acc = {"append": 0.0, "pull": 0.0, "tri": 0.0, "apply": 0.0}
N = 10
for k in range(2, 2 + N):
    p, m, sp = frames[k]
    t0 = time.perf_counter()
    gm, slots, smask = append(gm, p, m)
    jax.block_until_ready(gm.pt_count); t1 = time.perf_counter()
    out = pull(gm, slots, smask)
    jax.block_until_ready(out["pts"]); t2 = time.perf_counter()
    ids, counts = tri(gm, slots, smask, sp)
    jax.block_until_ready(ids); t3 = time.perf_counter()
    store = appl(store, slots, smask, ids, counts)
    jax.block_until_ready(store.tri_n); t4 = time.perf_counter()
    acc["append"] += t1 - t0
    acc["pull"] += t2 - t1
    acc["tri"] += t3 - t2
    acc["apply"] += t4 - t3
for k, v in acc.items():
    print(f"{k:8s} {1e3 * v / N:8.2f} ms/frame")
