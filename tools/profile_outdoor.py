"""Decompose the OUTDOOR KITTI-scale joint frame step on the real chip:
lio / append / smooth / pull / triangulate / apply, at bench.py's exact
workload. Throwaway profiling aid."""
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
from immesh_tpu.runtime.joint import JointPipeline

cfg = bench.kitti_config()
sim = bench.make_sim(cfg, outdoor=True)

N_WARM, N = 6, 8
print("generating frames...", flush=True)
raw = [sim.frame(k) for k in range(N_WARM + N)]
frames = [ScanBundle.from_numpy(
    f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr, f.scan_duration,
    cfg.preprocess.max_points, cfg.imu.max_imu_per_scan) for f in raw]

# ---- joint, as the bench runs it -------------------------------------
pipe = JointPipeline(cfg)
for k in range(N_WARM):
    pipe.step(frames[k])
jax.block_until_ready(pipe.lio.state.pos)
t0 = time.perf_counter()
for k in range(N_WARM, N_WARM + N):
    pipe.step(frames[k])
jax.block_until_ready(pipe.lio.state.pos)
jax.block_until_ready(pipe.mesh.store.tri_n)
print(f"joint            {1e3 * (time.perf_counter() - t0) / N:8.1f} ms/frame")

# ---- lio_step alone ---------------------------------------------------
lio = LioPipeline(cfg)
for k in range(N_WARM):
    lio.state, lio.vm, ws, _ = lio_step(lio.state, lio.vm, frames[k], cfg)
jax.block_until_ready(lio.state.pos)
t0 = time.perf_counter()
for k in range(N_WARM, N_WARM + N):
    lio.state, lio.vm, ws, _ = lio_step(lio.state, lio.vm, frames[k], cfg)
jax.block_until_ready(lio.state.pos)
print(f"lio              {1e3 * (time.perf_counter() - t0) / N:8.1f} ms/frame")

# ---- mesh sub-stages on realistic evolving state ----------------------
lio2 = LioPipeline(cfg)
scans = []
for k in range(N_WARM + N):
    lio2.state, lio2.vm, ws, _ = lio_step(lio2.state, lio2.vm, frames[k], cfg)
    scans.append((ws, frames[k].mask, lio2.state.pos + 0))
jax.block_until_ready(scans[-1][0])

gm = GlobalPointMap.create(cfg.mesh)
store = TriangleStore.create(cfg.mesh)
CH = cfg.mesh.mesh_chunk

append = jax.jit(lambda gm, p, m: gm.append_frame(p, m), donate_argnums=0)
smooth = jax.jit(lambda gm, s, sm: gm.smooth_active(s, sm), donate_argnums=0)
pull = jax.jit(lambda gm, s, sm: gm.pull_neighborhood(s, sm))
tri = jax.jit(lambda gm, s, sm, sp: triangulate_voxels(
    gm, s, sm, sp, cfg.mesh, CH))
appl = jax.jit(apply_triangles, donate_argnums=0)
mark = jax.jit(lambda gm, s, sm: gm.mark_meshed(s, sm), donate_argnums=0)

t = {}
def lap(name, fn, *a):
    global t
    t0 = time.perf_counter()
    out = fn(*a)
    jax.block_until_ready(out)
    t[name] = t.get(name, 0.0) + time.perf_counter() - t0
    return out

n_act = []
for k in range(N_WARM + N):
    ws, m, sp = scans[k]
    timed = k >= N_WARM
    if not timed:
        gm, slots, smask, _ = append(gm, ws, m)
        gm = smooth(gm, slots, smask)
        p = pull(gm, slots, smask)
        ids, counts, _ = tri(gm, slots, smask, sp)
        store = appl(store, slots, smask, ids, counts)
        gm = mark(gm, slots, smask)
        jax.block_until_ready(store.tri_n)
        continue
    gm, slots, smask, drops = lap("append", append, gm, ws, m)
    gm = lap("smooth", smooth, gm, slots, smask)
    p = lap("pull", pull, gm, slots, smask)
    ids, counts, _ = lap("tri(incl pull)", tri, gm, slots, smask, sp)
    store = lap("apply", appl, store, slots, smask, ids, counts)
    gm = lap("mark", mark, gm, slots, smask)
    n_act.append(int(jnp.sum(smask.astype(jnp.int32))))

for name, v in t.items():
    print(f"{name:15s} {1e3 * v / N:8.1f} ms/frame")
print("active voxels/frame:", n_act)
print("tris:", int(store.n_triangles()), "pts:", int(gm.n_points()))
