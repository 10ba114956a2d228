"""Stage timing at a FIXED realistic outdoor state with reps (no state
evolution, no donation) — separates real device cost from measurement
artifacts. Throwaway profiling aid."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import bench
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.lio.pipeline import LioPipeline, lio_step
from immesh_tpu.mesh.global_map import GlobalPointMap
from immesh_tpu.mesh.triangles import (
    TriangleStore, apply_triangles, triangulate_voxels)

cfg = bench.kitti_config()
sim = bench.make_sim(cfg, outdoor=True)
NF = 10
print("generating frames...", flush=True)
raw = [sim.frame(k) for k in range(NF)]
frames = [ScanBundle.from_numpy(
    f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr, f.scan_duration,
    cfg.preprocess.max_points, cfg.imu.max_imu_per_scan) for f in raw]

lio = LioPipeline(cfg)
scans = []
for k in range(NF):
    lio.state, lio.vm, ws, _ = lio_step(lio.state, lio.vm, frames[k], cfg)
    scans.append((ws, frames[k].mask, lio.state.pos + 0))
jax.block_until_ready(scans[-1][0])

gm = GlobalPointMap.create(cfg.mesh)
store = TriangleStore.create(cfg.mesh)
CH = cfg.mesh.mesh_chunk

append = jax.jit(lambda gm, p, m: gm.append_frame(p, m))
smooth = jax.jit(lambda gm, s, sm: gm.smooth_active(s, sm))
pull = jax.jit(lambda gm, s, sm: gm.pull_neighborhood(s, sm))
tri = jax.jit(lambda gm, s, sm, sp: triangulate_voxels(
    gm, s, sm, sp, cfg.mesh, CH))
appl = jax.jit(apply_triangles)
mark = jax.jit(lambda gm, s, sm: gm.mark_meshed(s, sm))

# evolve to steady state (frames 0..NF-2), keep the last frame for timing
for k in range(NF - 1):
    ws, m, sp = scans[k]
    gm, slots, smask, _ = append(gm, ws, m)
    gm = smooth(gm, slots, smask)
    ids, counts, _ = tri(gm, slots, smask, sp)
    store = appl(store, slots, smask, ids, counts)
    gm = mark(gm, slots, smask)
jax.block_until_ready(store.tri_n)

ws, m, sp = scans[NF - 1]

def reps(name, fn, *a, n=5):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    print(f"{name:15s} {1e3 * (time.perf_counter() - t0) / n:8.1f} ms")
    return out

gm2, slots, smask, drops = reps("append", append, gm, ws, m)
print("   actives:", int(jnp.sum(smask.astype(jnp.int32))))
gm3 = reps("smooth", smooth, gm2, slots, smask)
reps("pull", pull, gm3, slots, smask)
ids, counts, _ = reps("triangulate", tri, gm3, slots, smask, sp)
reps("apply", appl, store, slots, smask, ids, counts)
reps("mark", mark, gm3, slots, smask)
print("tris:", int(store.n_triangles()), "pts:", int(gm.n_points()))
