"""Ablation profile of the fused mesh_step at the OUTDOOR bench workload.
Run one VARIANT per process: python tools/profile_ablate_outdoor.py <variant>

Variants: full | no_tri | no_del | keep_all | no_compact | no_pull |
          no_smooth | no_append_dedup

Outdoor frame synthesis is slow on host — frames + LIO world scans are
cached in /tmp/immesh_outdoor_cache.npz across invocations.
Throwaway profiling aid."""
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

variant = sys.argv[1] if len(sys.argv) > 1 else "full"

import immesh_tpu.mesh.triangles as tri_mod
import bench

cfg = bench.kitti_config()
_ch = int(os.environ.get("MESH_CHUNK", "0"))
if _ch:
    cfg = cfg.replace(mesh=cfg.mesh.__class__(**{
        **{f.name: getattr(cfg.mesh, f.name)
           for f in __import__("dataclasses").fields(cfg.mesh)},
        "mesh_chunk": _ch}))

if variant == "no_tri":
    def fake_triangulate(gm, slots, smask, sensor_pos, mcfg, chunk=16):
        A, C = slots.shape[0], mcfg.tris_per_voxel
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
        mcfg = self.cfg
        A, K = slots.shape[0], mcfg.pull_capacity
        z = jnp.zeros((A, K, 3), jnp.float32)
        return {
            "idx": jnp.zeros((A, K), jnp.int32),
            "pts": z, "pts_sm": z,
            "mask": jnp.broadcast_to(smask[:, None], (A, K)),
            "center": jnp.zeros((A, 3), jnp.float32),
        }
    GlobalPointMap.pull_neighborhood = fake_pull
elif variant == "no_smooth":
    from immesh_tpu.mesh.global_map import GlobalPointMap
    GlobalPointMap.smooth_active = lambda self, s, sm: self
elif variant == "no_append_dedup":
    from immesh_tpu.map import hash as hash_mod
    import immesh_tpu.mesh.global_map as gmod
    real = hash_mod.frame_unique_coords
    def fake_unique(coords, mask, k):
        n = coords.shape[0]
        ids = jnp.arange(n, dtype=jnp.int32)
        seg = jnp.where(mask & (ids < k), ids, k)
        first = jnp.where(jnp.arange(k) < n,
                          jnp.arange(k, dtype=jnp.int32), n)
        return seg, first, jnp.sum(mask.astype(jnp.int32))
    gmod.frame_unique_coords = fake_unique

from immesh_tpu.frontend.types import ScanBundle
from immesh_tpu.lio.pipeline import LioPipeline, lio_step
from immesh_tpu.mesh.global_map import GlobalPointMap
from immesh_tpu.mesh.pipeline import mesh_step
from immesh_tpu.mesh.triangles import TriangleStore

CACHE = "/tmp/immesh_outdoor_cache.npz"
N_WARM, N = 4, 8

if os.path.exists(CACHE):
    z = np.load(CACHE)
    scans = [(jnp.asarray(z[f"ws{k}"]), jnp.asarray(z[f"m{k}"]),
              jnp.asarray(z[f"sp{k}"])) for k in range(N_WARM + N)]
else:
    sim = bench.make_sim(cfg, outdoor=True)
    lio = LioPipeline(cfg)
    scans = []
    save = {}
    for k in range(N_WARM + N):
        f = sim.frame(k)
        b = ScanBundle.from_numpy(
            f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
            f.scan_duration, cfg.preprocess.max_points,
            cfg.imu.max_imu_per_scan)
        lio.state, lio.vm, ws, _ = lio_step(lio.state, lio.vm, b, cfg)
        sp = lio.state.pos + 0
        jax.block_until_ready(ws)
        scans.append((ws, b.mask, sp))
        save[f"ws{k}"] = np.asarray(ws)
        save[f"m{k}"] = np.asarray(b.mask)
        save[f"sp{k}"] = np.asarray(sp)
    np.savez(CACHE, **save)

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
print(f"{variant:16s} {ms:8.1f} ms/frame   tris={int(store.n_triangles())}")
