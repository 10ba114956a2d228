"""Settle the 0.5ms-vs-63ms delaunay discrepancy: backend name, pallas
vs fallback, random vs real data. Throwaway profiling aid."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

print("default_backend:", jax.default_backend())
print("devices:", jax.devices())

from immesh_tpu.mesh.delaunay import delaunay_mask, pca_project
from immesh_tpu.mesh.triangles import _pos_hash

A, K = 512, 48
rng = np.random.default_rng(0)
pts_rand = jnp.asarray(rng.normal(size=(A, K, 3)).astype(np.float32))
mask_rand = jnp.asarray(rng.random((A, K)) < 0.9)
hash_rand = jnp.asarray(rng.integers(0, 2**31, size=(A, K), dtype=np.int32))

f = jax.jit(lambda p, m, h: delaunay_mask(
    pca_project(p, m)[0], m, tiebreak=h, tie_scale=0.02)[1])


def bench(name, *args, reps=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {1e3*(time.perf_counter()-t0)/reps:8.2f} ms  "
          f"kept={int(jnp.sum(out))}")


bench("rand A=512", pts_rand, mask_rand, hash_rand)

# real data
from immesh_tpu.config import PRESETS
from immesh_tpu.frontend.sim import LidarImuSimulator
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.lio.pipeline import LioPipeline, lio_step
from immesh_tpu.mesh.global_map import GlobalPointMap

base = PRESETS["kitti"]()
cfg = base.replace(
    preprocess=base.preprocess.__class__(
        lidar_type=100, blind=0.05, max_points=131072),
    imu=base.imu.__class__(imu_en=True),
)
sim = LidarImuSimulator(n_rays=cfg.preprocess.max_points, seed=0)
lio = LioPipeline(cfg)
lio.static_init(*sim.static_imu(100))
gm = GlobalPointMap.create(cfg.mesh)
append = jax.jit(lambda gm, p, m: gm.append_frame(p, m), donate_argnums=0)
for k in range(6):
    f0 = sim.frame(k)
    b = ScanBundle.from_numpy(
        f0.pts, f0.t_rel, f0.imu_stamps, f0.imu_acc, f0.imu_gyr,
        f0.scan_duration, cfg.preprocess.max_points, cfg.imu.max_imu_per_scan)
    lio.state, lio.vm, ws, _ = lio_step(lio.state, lio.vm, b, cfg)
    gm, slots, smask = append(gm, ws, b.mask)
pull = jax.jit(lambda gm, s, sm: gm.pull_neighborhood(s, sm))(gm, slots, smask)
pts_real, mask_real = pull["pts"], pull["mask"]
hash_real = _pos_hash(pts_real)
jax.block_until_ready(pts_real)
print("real mask density:", float(jnp.mean(mask_real.astype(jnp.float32))))

bench("real A=512", pts_real, mask_real, hash_real)
bench("real pts, rand mask", pts_real, mask_rand, hash_real)
bench("rand pts, real mask", pts_rand, mask_real, hash_rand)
# real pts magnitudes
print("pts abs max:", float(jnp.max(jnp.abs(jnp.where(mask_real[...,None], pts_real, 0)))),
      "rand abs max:", float(jnp.max(jnp.abs(pts_rand))))

# layout theory: round-trip real arrays through host -> default layout
pts_rt = jnp.asarray(np.asarray(pts_real))
mask_rt = jnp.asarray(np.asarray(mask_real))
hash_rt = jnp.asarray(np.asarray(hash_real))
bench("real roundtripped", pts_rt, mask_rt, hash_rt)
bench("rand again (order)", pts_rand, mask_rand, hash_rand)
try:
    print("layouts rand:", pts_rand.format, mask_rand.format)
    print("layouts real:", pts_real.format, mask_real.format)
except Exception as e:
    print("no .format:", e)
