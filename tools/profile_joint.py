"""Decompose the KITTI-scale joint frame step on the real chip.

Throwaway profiling aid: times lio_step alone, mesh_step alone, and the
mesh sub-stages (append / pull+triangulate / apply) at the bench's exact
KITTI-scale workload, so optimization effort lands where the ms are.
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from immesh_tpu.config import PRESETS
from immesh_tpu.frontend.sim import LidarImuSimulator
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.lio.pipeline import LioPipeline, lio_step
from immesh_tpu.mesh.pipeline import MeshPipeline, mesh_step
from immesh_tpu.runtime.joint import JointPipeline, joint_step

base = PRESETS["kitti"]()
cfg = base.replace(
    preprocess=base.preprocess.__class__(
        lidar_type=100, blind=0.05, max_points=131072),
    imu=base.imu.__class__(imu_en=True),
)

sim = LidarImuSimulator(n_rays=cfg.preprocess.max_points, seed=0)
pipe = JointPipeline(cfg)
pipe.static_init(*sim.static_imu(100))

def bundle(k):
    f = sim.frame(k)
    return ScanBundle.from_numpy(
        f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
        f.scan_duration, cfg.preprocess.max_points, cfg.imu.max_imu_per_scan)

N_WARM, N = 4, 12
frames = [bundle(k) for k in range(N_WARM + N)]

# ---- joint, as the bench runs it -------------------------------------
for k in range(N_WARM):
    pipe.step(frames[k])
jax.block_until_ready(pipe.lio.state.pos)
t0 = time.perf_counter()
for k in range(N_WARM, N_WARM + N):
    pipe.step(frames[k])
jax.block_until_ready(pipe.lio.state.pos)
jax.block_until_ready(pipe.mesh.store.tri_n)
joint_ms = 1e3 * (time.perf_counter() - t0) / N
print(f"joint            {joint_ms:8.1f} ms/frame")

# ---- lio_step alone (fresh state, same workload) ----------------------
lio = LioPipeline(cfg)
lio.static_init(*sim.static_imu(100))
for k in range(N_WARM):
    lio.state, lio.vm, ws, _ = lio_step(lio.state, lio.vm, frames[k], cfg)
jax.block_until_ready(lio.state.pos)
t0 = time.perf_counter()
for k in range(N_WARM, N_WARM + N):
    lio.state, lio.vm, ws, _ = lio_step(lio.state, lio.vm, frames[k], cfg)
jax.block_until_ready(lio.state.pos)
lio_ms = 1e3 * (time.perf_counter() - t0) / N
print(f"lio_step         {lio_ms:8.1f} ms/frame")

# ---- mesh_step alone, fed the joint pipeline's world scans ------------
mesh = MeshPipeline(cfg)
lio2 = LioPipeline(cfg)
lio2.static_init(*sim.static_imu(100))
scans = []
for k in range(N_WARM + N):
    lio2.state, lio2.vm, ws, _ = lio_step(lio2.state, lio2.vm, frames[k], cfg)
    scans.append((ws, frames[k].mask, lio2.state.pos + 0))
jax.block_until_ready(scans[-1][0])

msj = jax.jit(mesh_step, static_argnames=("chunk",),
              donate_argnames=("gm", "store"))
for k in range(N_WARM):
    ws, m, pos = scans[k]
    mesh.gm, mesh.store, na, sl, sm = msj(
        mesh.gm, mesh.store, ws, m, pos, cfg.mesh.mesh_chunk)
jax.block_until_ready(mesh.store.tri_n)
t0 = time.perf_counter()
for k in range(N_WARM, N_WARM + N):
    ws, m, pos = scans[k]
    mesh.gm, mesh.store, na, sl, sm = msj(
        mesh.gm, mesh.store, ws, m, pos, cfg.mesh.mesh_chunk)
jax.block_until_ready(mesh.store.tri_n)
mesh_ms = 1e3 * (time.perf_counter() - t0) / N
print(f"mesh_step        {mesh_ms:8.1f} ms/frame")
print(f"(lio+mesh = {lio_ms + mesh_ms:.1f}; joint measured {joint_ms:.1f})")
