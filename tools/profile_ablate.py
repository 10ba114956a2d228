"""Ablation profile of mesh_step: run the real fused per-frame loop
(bench-style: evolving state, async dispatch, one final block) with pieces
of the triangulation pipeline disabled via monkeypatch. Run one VARIANT per
process: python tools/profile_ablate.py <variant>

Variants:
  full        — shipped pipeline
  no_tri      — triangulate_voxels returns zeros (append+apply+mark only)
  no_del      — delaunay keep mask = all-False (kernel still runs? no — the
                whole delaunay_mask call is replaced; isolates incircle+compact)
  keep_all    — delaunay replaced by keep-first-C2 (no incircle, keeps the
                gather/sort3/winding chain + compactions)
  no_compact  — compact_triangles replaced by first-cap slice (isolates top_k)
  no_pull     — pull_neighborhood replaced by zeros (isolates gathers)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

variant = sys.argv[1] if len(sys.argv) > 1 else "full"

import immesh_tpu.mesh.triangles as tri_mod
import immesh_tpu.mesh.pipeline as pipe_mod
from immesh_tpu.mesh.delaunay import _tri_candidates

if variant == "no_tri":
    def fake_triangulate(gm, slots, smask, sensor_pos, cfg, chunk=16):
        A, C = slots.shape[0], cfg.tris_per_voxel
        return (jnp.full((A, C, 3), -1, jnp.int32), jnp.zeros(A, jnp.int32),
                jnp.zeros((), jnp.int32))
    tri_mod.triangulate_voxels = fake_triangulate
elif variant == "no_del":
    def fake_del(uv, mask, **kw):
        A, K = uv.shape[0], uv.shape[1]
        trip = jnp.zeros((A, K * K, 3), jnp.int32)
        return trip, jnp.zeros((A, K * K), bool)
    tri_mod.delaunay_pairs = fake_del
elif variant == "keep_all":
    def fake_del(uv, mask, **kw):
        A, K = uv.shape[0], uv.shape[1]
        ar = jnp.arange(K, dtype=jnp.int32)
        trip = jnp.stack([
            jnp.broadcast_to(ar[:, None], (K, K)),
            jnp.broadcast_to(ar[None, :], (K, K)),
            (ar[:, None] + ar[None, :] + 1) % K,
        ], axis=-1).reshape(1, K * K, 3)
        keep = (jnp.arange(K * K)[None, :] < 96) & mask[:, :1]
        return jnp.broadcast_to(trip, (A, K * K, 3)), keep
    tri_mod.delaunay_pairs = fake_del
elif variant == "no_compact":
    def fake_compact(keep, tris, cap):
        A, T = keep.shape
        k = min(cap, T)
        rows = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None], (A, k))
        rmask = keep[:, :k]
        if k < cap:
            rows = jnp.pad(rows, ((0, 0), (0, cap - k)))
            rmask = jnp.pad(rmask, ((0, 0), (0, cap - k)))
        return jnp.where(rmask, rows, -1), rmask
    tri_mod.compact_triangles = fake_compact
elif variant == "no_pull":
    from immesh_tpu.mesh.global_map import GlobalPointMap
    def fake_pull(self, slots, smask):
        cfg = self.cfg
        A, K = slots.shape[0], cfg.pull_capacity
        return {
            "idx": jnp.zeros((A, K), jnp.int32),
            "pts": jnp.zeros((A, K, 3), jnp.float32),
            "mask": jnp.broadcast_to(smask[:, None], (A, K)),
            "center": jnp.zeros((A, 3), jnp.float32),
        }
    GlobalPointMap.pull_neighborhood = fake_pull

from immesh_tpu.config import PRESETS
from immesh_tpu.frontend.sim import LidarImuSimulator
from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.lio.pipeline import LioPipeline, lio_step
from immesh_tpu.mesh.global_map import GlobalPointMap
from immesh_tpu.mesh.pipeline import mesh_step
from immesh_tpu.mesh.triangles import TriangleStore

base = PRESETS["kitti"]()
cfg = base.replace(
    preprocess=base.preprocess.__class__(
        lidar_type=100, blind=0.05, max_points=131072),
    imu=base.imu.__class__(imu_en=True),
)

sim = LidarImuSimulator(n_rays=cfg.preprocess.max_points, seed=0)
lio = LioPipeline(cfg)
lio.static_init(*sim.static_imu(100))

N_WARM, N = 3, 10
scans = []
for k in range(N_WARM + N):
    f = sim.frame(k)
    b = ScanBundle.from_numpy(
        f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
        f.scan_duration, cfg.preprocess.max_points, cfg.imu.max_imu_per_scan)
    lio.state, lio.vm, ws, _ = lio_step(lio.state, lio.vm, b, cfg)
    scans.append((ws, b.mask, lio.state.pos + 0))
jax.block_until_ready(scans[-1][0])

gm = GlobalPointMap.create(cfg.mesh)
store = TriangleStore.create(cfg.mesh)
step = jax.jit(
    lambda gm, store, p, m, sp: mesh_step(gm, store, p, m, sp,
                                          cfg.mesh.mesh_chunk),
    donate_argnums=(0, 1))

for k in range(N_WARM):
    gm, store, n_act, _, _, _ = step(gm, store, *scans[k])
jax.block_until_ready(store.tri_n)
t0 = time.perf_counter()
for k in range(N_WARM, N_WARM + N):
    gm, store, n_act, _, _, _ = step(gm, store, *scans[k])
jax.block_until_ready(store.tri_n)
ms = 1e3 * (time.perf_counter() - t0) / N
print(f"{variant:12s} {ms:8.1f} ms/frame   tris={int(store.n_triangles())}")
