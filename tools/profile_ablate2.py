"""Stage-by-stage ablation INSIDE the triangulation chunk pipeline, using the
real mesh_step loop (evolving state, async dispatch). Run:
  python tools/profile_ablate2.py <stage>
stages: pull pca del compact gather3 verts angles sort full
Each stage runs everything up to and including itself; intermediates are
folded into the output via cheap reductions so XLA cannot DCE them."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

stage = sys.argv[1] if len(sys.argv) > 1 else "full"
ORDER = ["pull", "pca", "del", "compact", "gather3", "verts", "angles",
         "sort", "full"]
LVL = ORDER.index(stage)

import immesh_tpu.mesh.triangles as tri_mod
from immesh_tpu.mesh.delaunay import (
    angle_filter, compact_triangles, delaunay_pairs, pca_project)
from immesh_tpu.mesh.triangles import _pos_hash


def make_triangulate(cfg_mesh):
    C = cfg_mesh.tris_per_voxel
    C2 = min(4 * C, 2 * cfg_mesh.pull_capacity)
    res = cfg_mesh.voxel_resolution
    chunk = cfg_mesh.mesh_chunk

    def triangulate(gm, slots, smask, sensor_pos, cfg, chunk_arg=16):
        A = slots.shape[0]
        pull = gm.pull_neighborhood(slots, smask)
        pts, pmask, gidx = pull["pts"], pull["mask"], pull["idx"]
        vox_key = gm.vox.keys[jnp.maximum(slots, 0), :3]

        def one_chunk(args):
            pts_c, pmask_c, gidx_c, key_c = args
            a = pts_c.shape[0]
            zids = jnp.full((a, C, 3), -1, jnp.int32)
            zcnt = jnp.zeros(a, jnp.int32)

            def sink_f(x):  # fold float intermediate into counts (no DCE)
                return (jnp.sum(x).astype(jnp.int32) & 1)

            def sink_i(x):
                return (jnp.sum(x.astype(jnp.int32)) & 1)

            if LVL == 0:   # pull only
                return zids, zcnt + sink_f(pts_c)
            uv, _, _ = pca_project(pts_c, pmask_c)
            phash = _pos_hash(pts_c)
            if LVL == 1:
                return zids, zcnt + sink_f(uv) + sink_i(phash)
            trip, keep = delaunay_pairs(uv, pmask_c, tiebreak=phash,
                                        tie_scale=cfg.tie_scale)
            if LVL == 2:
                return zids, zcnt + sink_i(keep) + sink_i(trip)
            rows, rmask = compact_triangles(keep, trip, C2)
            if LVL == 3:
                return zids, zcnt + sink_i(rows) + sink_i(rmask)
            rowc = jnp.maximum(rows, 0)
            tri3 = jnp.take_along_axis(
                trip, rowc[..., None].repeat(3, -1), axis=1)
            if LVL == 4:
                return zids, zcnt + sink_i(tri3)

            def gatherp(e):
                return jnp.take_along_axis(
                    pts_c, tri3[..., e:e + 1].repeat(3, -1), 1)

            v0, v1, v2 = gatherp(0), gatherp(1), gatherp(2)
            i0 = jnp.take_along_axis(gidx_c, tri3[..., 0], axis=1)
            i1 = jnp.take_along_axis(gidx_c, tri3[..., 1], axis=1)
            i2 = jnp.take_along_axis(gidx_c, tri3[..., 2], axis=1)
            if LVL == 5:
                return zids, (zcnt + sink_f(v0) + sink_f(v1) + sink_f(v2)
                              + sink_i(i0) + sink_i(i1) + sink_i(i2))
            keep2 = rmask & angle_filter(v0, v1, v2, cfg.max_tri_angle_deg)
            if LVL == 6:
                return zids, zcnt + sink_i(keep2)
            h0 = jnp.take_along_axis(phash, tri3[..., 0], axis=1)
            h1 = jnp.take_along_axis(phash, tri3[..., 1], axis=1)
            h2 = jnp.take_along_axis(phash, tri3[..., 2], axis=1)
            s0, s1, s2, q0, q1, q2 = tri_mod.triangulate_voxels.__wrapped__ \
                if False else _sort3(h0, h1, h2, i0, i1, i2, v0, v1, v2)
            cen = ((q0 + q1) + q2) * (1.0 / 3.0)
            cen_key = jnp.floor(cen / res).astype(jnp.int32)
            keep2 = keep2 & jnp.all(cen_key == key_c[:, None, :], axis=-1)
            if LVL == 7:
                return zids, zcnt + sink_i(keep2) + sink_i(s0)
            rows2, rmask2 = compact_triangles(keep2, tri3, C)
            r2 = jnp.maximum(rows2, 0)
            take = lambda x: jnp.take_along_axis(x, r2, axis=1)  # noqa
            ids = jnp.stack([take(s0), take(s1), take(s2)], axis=-1)
            w0 = jnp.take_along_axis(q0, r2[..., None].repeat(3, -1), 1)
            w1 = jnp.take_along_axis(q1, r2[..., None].repeat(3, -1), 1)
            w2 = jnp.take_along_axis(q2, r2[..., None].repeat(3, -1), 1)
            nrm = jnp.cross(w1 - w0, w2 - w0)
            cen3 = ((w0 + w1) + w2) * (1.0 / 3.0)
            flip = jnp.sum(nrm * (sensor_pos - cen3), axis=-1) < 0
            ids = jnp.where(
                flip[..., None],
                jnp.stack([ids[..., 0], ids[..., 2], ids[..., 1]], axis=-1),
                ids)
            ids = jnp.where(rmask2[..., None], ids, -1)
            return ids, rmask2.sum(axis=-1).astype(jnp.int32)

        pad = (-A) % chunk
        def rc(x):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)).reshape(
                ((A + pad) // chunk, chunk) + x.shape[1:])
        ids, counts = jax.lax.map(
            one_chunk, (rc(pts), rc(pmask), rc(gidx), rc(vox_key)))
        return (ids.reshape(-1, C, 3)[:A], counts.reshape(-1)[:A],
                jnp.zeros((), jnp.int32))

    return triangulate


def _sort3(k0, k1, k2, a0, a1, a2, p0, p1, p2):
    def sw2(c, x, y):
        return jnp.where(c, y, x), jnp.where(c, x, y)

    def sw3(c, x, y):
        return (jnp.where(c[..., None], y, x), jnp.where(c[..., None], x, y))

    c = k0 > k1
    k0, k1 = sw2(c, k0, k1)
    a0, a1 = sw2(c, a0, a1)
    p0, p1 = sw3(c, p0, p1)
    c = k1 > k2
    k1, k2 = sw2(c, k1, k2)
    a1, a2 = sw2(c, a1, a2)
    p1, p2 = sw3(c, p1, p2)
    c = k0 > k1
    a0, a1 = sw2(c, a0, a1)
    p0, p1 = sw3(c, p0, p1)
    return a0, a1, a2, p0, p1, p2


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
tri_mod.triangulate_voxels = make_triangulate(cfg.mesh)

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
print(f"{stage:10s} {ms:8.1f} ms/frame   tris={int(store.n_triangles())}")
