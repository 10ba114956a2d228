"""Progressive-stage bisection of the REAL triangulate_voxels at the outdoor
steady state — every stage consumes live pull data (nothing const-folds).
Uses the frame cache written by profile_ablate_outdoor.py.
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

import bench
from immesh_tpu.mesh.delaunay import (
    angle_filter, compact_triangles, delaunay_pairs, pca_project)
from immesh_tpu.mesh.global_map import GlobalPointMap
from immesh_tpu.mesh.pipeline import mesh_step
from immesh_tpu.mesh.triangles import TriangleStore, _pos_hash

cfg = bench.kitti_config()
mc = cfg.mesh
CACHE = "/tmp/immesh_outdoor_cache.npz"
z = np.load(CACHE)
NF = len([k for k in z.files if k.startswith("ws")])
scans = [(jnp.asarray(z[f"ws{k}"]), jnp.asarray(z[f"m{k}"]),
          jnp.asarray(z[f"sp{k}"])) for k in range(NF)]

gm = GlobalPointMap.create(mc)
store = TriangleStore.create(mc)
step = jax.jit(lambda gm, store, p, m, sp: mesh_step(
    gm, store, p, m, sp, mc.mesh_chunk), donate_argnums=(0, 1))
appender = jax.jit(lambda gm, p, m: gm.append_frame(p, m))
for k in range(NF - 1):
    gm, store, *_ = step(gm, store, *scans[k])
jax.block_until_ready(store.tri_n)
gm2, slots, smask, _ = appender(gm, scans[-1][0], scans[-1][1])
sp = scans[-1][2]
jax.block_until_ready(slots)
print("actives:", int(jnp.sum(smask.astype(jnp.int32))))

C = mc.tris_per_voxel
C2 = min(4 * C, 2 * mc.pull_capacity)
res = mc.voxel_resolution
chunk = mc.mesh_chunk


def make_tri(stop_after):
    def tri(gm, slots, smask, sensor_pos):
        A = slots.shape[0]
        pull = gm.pull_neighborhood(slots, smask)
        pts, pmask, gidx = pull["pts"], pull["mask"], pull["idx"]
        pts_sm = pull["pts_sm"]
        vox_key = gm.vox.keys[jnp.maximum(slots, 0), :3]
        if stop_after == "pull":
            return pts, pmask, gidx, pts_sm, vox_key

        def one_chunk(args):
            pts_c, sm_c, pmask_c, gidx_c, key_c = args
            a = pts_c.shape[0]
            return jax.lax.cond(
                jnp.any(pmask_c),
                lambda: impl(pts_c, sm_c, pmask_c, gidx_c, key_c),
                lambda: (jnp.zeros((a,), jnp.int32),),
            )

        def impl(pts_c, sm_c, pmask_c, gidx_c, key_c):
            uv, _, _ = pca_project(sm_c, pmask_c)
            phash = _pos_hash(pts_c)
            if stop_after == "pca":
                return (jnp.sum(uv, axis=(1, 2)).astype(jnp.int32)
                        ^ jnp.sum(phash, axis=1),)
            trip, keep = delaunay_pairs(uv, pmask_c, tiebreak=phash,
                                        tie_scale=mc.tie_scale)
            if stop_after == "delaunay":
                return (jnp.sum(keep.astype(jnp.int32), axis=1)
                        ^ jnp.sum(trip[..., 0], axis=1),)
            rows, rmask = compact_triangles(keep, trip, C2)
            rowc = jnp.maximum(rows, 0)
            tri3 = jnp.take_along_axis(
                trip, rowc[..., None].repeat(3, -1), axis=1)
            if stop_after == "compact1":
                return (jnp.sum(tri3[..., 0], axis=1),)

            def gatherp(e):
                return jnp.take_along_axis(
                    pts_c, tri3[..., e:e + 1].repeat(3, -1), 1)
            v0, v1, v2 = gatherp(0), gatherp(1), gatherp(2)
            i0 = jnp.take_along_axis(gidx_c, tri3[..., 0], axis=1)
            i1 = jnp.take_along_axis(gidx_c, tri3[..., 1], axis=1)
            i2 = jnp.take_along_axis(gidx_c, tri3[..., 2], axis=1)
            keep2 = rmask & angle_filter(v0, v1, v2, mc.max_tri_angle_deg)
            if stop_after == "gathers":
                return (jnp.sum(keep2.astype(jnp.int32) + i0 + i1 + i2, 1)
                        ^ jnp.sum(v0[..., 0], 1).astype(jnp.int32),)

            h0 = jnp.take_along_axis(phash, tri3[..., 0], axis=1)
            h1 = jnp.take_along_axis(phash, tri3[..., 1], axis=1)
            h2 = jnp.take_along_axis(phash, tri3[..., 2], axis=1)

            def sw2(c, x, y):
                return jnp.where(c, y, x), jnp.where(c, x, y)

            def sw3(c, x, y):
                return (jnp.where(c[..., None], y, x),
                        jnp.where(c[..., None], x, y))
            k0, k1, k2, a0, a1, a2 = h0, h1, h2, i0, i1, i2
            p0, p1, p2 = v0, v1, v2
            c = k0 > k1
            k0, k1 = sw2(c, k0, k1); a0, a1 = sw2(c, a0, a1)
            p0, p1 = sw3(c, p0, p1)
            c = k1 > k2
            k1, k2 = sw2(c, k1, k2); a1, a2 = sw2(c, a1, a2)
            p1, p2 = sw3(c, p1, p2)
            c = k0 > k1
            a0, a1 = sw2(c, a0, a1); p0, p1 = sw3(c, p0, p1)
            cen = ((p0 + p1) + p2) * (1.0 / 3.0)
            cen_key = jnp.floor(cen / res).astype(jnp.int32)
            keep2 = keep2 & jnp.all(cen_key == key_c[:, None, :], axis=-1)
            if stop_after == "own":
                return (jnp.sum(keep2.astype(jnp.int32), 1),)
            rows2, rmask2 = compact_triangles(keep2, tri3, C)
            r2 = jnp.maximum(rows2, 0)
            take = lambda x: jnp.take_along_axis(x, r2, axis=1)  # noqa
            ids = jnp.stack([take(a0), take(a1), take(a2)], axis=-1)
            w0 = jnp.take_along_axis(p0, r2[..., None].repeat(3, -1), 1)
            w1 = jnp.take_along_axis(p1, r2[..., None].repeat(3, -1), 1)
            w2 = jnp.take_along_axis(p2, r2[..., None].repeat(3, -1), 1)
            nrm = jnp.cross(w1 - w0, w2 - w0)
            cen3 = ((w0 + w1) + w2) * (1.0 / 3.0)
            flip = jnp.sum(nrm * (sensor_pos - cen3), axis=-1) < 0
            ids = jnp.where(
                flip[..., None],
                jnp.stack([ids[..., 0], ids[..., 2], ids[..., 1]], -1), ids)
            return (jnp.sum(ids[..., 0], axis=1),)

        A = slots.shape[0]
        pad = (-A) % chunk
        def padc(x):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        n_chunks = (A + pad) // chunk
        def rc(x):
            return padc(x).reshape((n_chunks, chunk) + x.shape[1:])
        out = jax.lax.map(one_chunk,
                          (rc(pts), rc(pts_sm), rc(pmask), rc(gidx),
                           rc(vox_key)))
        return out
    return tri


# vary slots across reps by rolling (same set, different order → different
# program inputs so the backend cannot serve a cached result)
variants = ["pull", "pca", "delaunay", "compact1", "gathers", "own", "full"]
for v in variants:
    f = jax.jit(make_tri(v))
    out = f(gm2, slots, smask, sp)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(5):
        out = f(gm2, jnp.roll(slots, i), jnp.roll(smask, i), sp)
    jax.block_until_ready(out)
    print(f"{v:10s} {1e3 * (time.perf_counter() - t0) / 5:8.1f} ms")
