"""Decompose mesh_step at KITTI scale: append / pull / triangulate / apply.
Throwaway profiling aid."""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from immesh_tpu.config import PRESETS
from immesh_tpu.frontend.sim import LidarImuSimulator
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.lio.pipeline import LioPipeline, lio_step
from immesh_tpu.mesh.global_map import GlobalPointMap
from immesh_tpu.mesh.triangles import TriangleStore, apply_triangles, triangulate_voxels

base = PRESETS["kitti"]()
cfg = base.replace(
    preprocess=base.preprocess.__class__(
        lidar_type=100, blind=0.05, max_points=131072),
    imu=base.imu.__class__(imu_en=True),
)

sim = LidarImuSimulator(n_rays=cfg.preprocess.max_points, seed=0)
lio = LioPipeline(cfg)
lio.static_init(*sim.static_imu(100))

def bundle(k):
    f = sim.frame(k)
    return ScanBundle.from_numpy(
        f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
        f.scan_duration, cfg.preprocess.max_points, cfg.imu.max_imu_per_scan)

N_WARM, N = 3, 10
scans = []
for k in range(N_WARM + N):
    b = bundle(k)
    lio.state, lio.vm, ws, _ = lio_step(lio.state, lio.vm, b, cfg)
    scans.append((ws, b.mask, lio.state.pos + 0))
jax.block_until_ready(scans[-1][0])

gm = GlobalPointMap.create(cfg.mesh)
store = TriangleStore.create(cfg.mesh)
CH = cfg.mesh.mesh_chunk

append = jax.jit(lambda gm, p, m: gm.append_frame(p, m), donate_argnums=0)
pull = jax.jit(lambda gm, s, sm: gm.pull_neighborhood(s, sm))
tri = jax.jit(lambda gm, s, sm, sp: triangulate_voxels(gm, s, sm, sp, cfg.mesh, CH))
appl = jax.jit(apply_triangles, donate_argnums=0)
mark = jax.jit(lambda gm, s, sm: gm.mark_meshed(s, sm), donate_argnums=0)

t = {"append": 0.0, "pull": 0.0, "tri": 0.0, "apply": 0.0, "mark": 0.0}

def run(k, time_it):
    global gm, store
    p, m, sp = scans[k]
    def lap(name, f, *a):
        global gm, store
        if time_it:
            jax.block_until_ready(jax.tree_util.tree_leaves(a)[0])
            t0 = time.perf_counter()
        out = f(*a)
        if time_it:
            jax.block_until_ready(jax.tree_util.tree_leaves(out))
            t[name] += time.perf_counter() - t0
        return out
    gm, slots, smask = lap("append", append, gm, p, m)
    out = lap("pull", pull, gm, slots, smask)
    ids, counts = lap("tri", tri, gm, slots, smask, sp)
    store = lap("apply", appl, store, slots, smask, ids, counts)
    gm = lap("mark", mark, gm, slots, smask)

for k in range(N_WARM):
    run(k, False)
jax.block_until_ready(store.tri_n)
for k in range(N_WARM, N_WARM + N):
    run(k, True)

for name, v in t.items():
    print(f"{name:8s} {1e3 * v / N:8.1f} ms/frame")
