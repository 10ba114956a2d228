"""Per-frame incremental meshing step + host wrapper.

The device step fuses the reference's mesh-worker pipeline
(`incremental_mesh_reconstruction`, reference
ImMesh_mesh_reconstruction.cpp:92-267: append → per-voxel pull/commit/push)
into one jitted program per frame.  The host wrapper mirrors the handoff from
LIO (`map_incremental_grow` pushing {world scan, pose} into the frame queue,
ImMesh_mesh_reconstruction.cpp:377-444) — here the queue is simply JAX's async
dispatch: the LIO step for frame k+1 can be enqueued while this program runs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from immesh_tpu.config import ImMeshConfig
from immesh_tpu.mesh.global_map import GlobalPointMap
from immesh_tpu.mesh.triangles import TriangleStore, mesh_voxels, remap_store


@functools.partial(jax.jit, static_argnames=("chunk",))
def mesh_step(gm: GlobalPointMap, store: TriangleStore,
              pts_world: jnp.ndarray, mask: jnp.ndarray,
              sensor_pos: jnp.ndarray, chunk: int = 16
              ):
    """Append one world-frame scan and re-mesh the active voxels.

    Also returns the active (slots, smask) work list so downstream consumers
    (e.g. the texture renderer, immesh_tpu/texture/render.py) can reuse the
    same recently-visited-voxel set the reference shares between meshing and
    colorization (pointcloud_rgbd.cpp `m_voxels_recent_visited`)."""
    gm, slots, smask, drops = gm.append_frame(pts_world, mask)
    if gm.cfg.pull_smooth_lam > 0:
        # refresh the stored smoothed positions of the active voxels' own
        # points BEFORE triangulation, so every pulling voxel reads the same
        # values (reference smooths during retrieval and stores the result,
        # mesh_rec_geometry.cpp:333-369)
        gm = gm.smooth_active(slots, smask)
    store, n_emitted, tri_drop = mesh_voxels(
        gm, store, slots, smask, sensor_pos, chunk)
    gm = gm.mark_meshed(slots, smask)
    diag = {f"drop_{k}": v for k, v in drops.items()}
    diag["drop_tris"] = tri_drop
    diag["tris_emitted"] = n_emitted
    return gm, store, jnp.sum(smask.astype(jnp.int32)), slots, smask, diag


class MeshPipeline:
    """Host-side wrapper holding the global map + triangle store."""

    def __init__(self, cfg: ImMeshConfig):
        self.cfg = cfg
        self.gm = GlobalPointMap.create(cfg.mesh)
        self.store = TriangleStore.create(cfg.mesh)
        self.frame_idx = 0
        # active work list of the most recent step (device arrays), reused by
        # the texture renderer
        self.last_active = None
        # bounded-loss drop counters of the most recent step (device scalars)
        self.last_drops = None
        self.n_compactions = 0
        self.compact_ms = 0.0   # wall time spent inside compaction events
        self._occ_pending = None  # in-flight async occupancy copy

    def step(self, pts_world, mask, sensor_pos):
        """Returns the active-voxel count as a DEVICE scalar — callers that
        want the number must int() it themselves.  Syncing here would chain
        every frame to the previous mesh program's completion and kill the
        async LIO/mesh pipelining (reference overlaps them with threads,
        ImMesh_mesh_reconstruction.cpp:272-310; we overlap with async
        dispatch)."""
        # shape check only — never np.asarray the scan here, it may be a
        # device array handed straight from the LIO step (no host round-trip)
        if pts_world.shape[0] == 0:  # static shapes need ≥1 row; mask it out
            pts_world = np.zeros((1, 3), np.float32)
            mask = np.zeros(1, bool)
        (self.gm, self.store, n_active, slots, smask,
         self.last_drops) = mesh_step(
            self.gm, self.store, jnp.asarray(pts_world), jnp.asarray(mask),
            jnp.asarray(sensor_pos), self.cfg.mesh.mesh_chunk,
        )
        self.last_active = (slots, smask)
        self.frame_idx += 1
        self.maybe_compact(sensor_pos)
        return n_active

    def maybe_compact(self, sensor_pos) -> bool:
        """Occupancy-triggered lifetime management: when the point store or
        voxel table crosses the high-water mark, evict outside the local-map
        radius and remap the triangle store (reference bounds its working set
        by RAM reserves + recent-voxel expiry, pointcloud_rgbd.cpp:278-294,
        425-455; a sliding map is the fixed-capacity equivalent)."""
        mc = self.cfg.mesh
        if mc.compact_check_every <= 0:
            return False
        high_p = mc.compact_high_water * mc.points_capacity
        high_v = mc.compact_high_water * mc.voxel_capacity
        # one-FRAME-delayed async occupancy poll: a synchronous int() here
        # stalls the async frame pipeline for a full device round trip
        # (~26 ms through the tunneled chip); the async copy prefetches the
        # scalar so next frame's read is host-local and free, and the
        # high-water decision tolerates one frame of staleness
        pending = self._occ_pending
        # + 0 copies pt_count out of the gm pytree — the live buffer is
        # donated into the next frame's program and would be deleted under us
        n_p = self.gm.n_points() + 0
        n_v = self.gm.vox.occupancy()
        for x in (n_p, n_v):
            x.copy_to_host_async()
        self._occ_pending = (n_p, n_v)
        if pending is None:
            return False
        if (int(pending[0]) <= high_p and int(pending[1]) <= high_v):
            return False
        self._occ_pending = None  # state changes below invalidate the poll
        self.n_compactions += 1
        import time as _time
        _t0 = _time.perf_counter()
        # hysteresis: target the LOW water mark (growth headroom so a dense
        # map doesn't re-trigger a rebuild every few frames).  The keep
        # radius is solved in ONE device pass as the distance quantile at
        # the low-water count — the former shrink-until-under loop rebuilt
        # the full tables up to 8× with a host sync each round (~4 s per
        # compaction through the tunneled chip, measured in the r5 bench).
        low_p = mc.compact_low_water * mc.points_capacity
        low_v = mc.compact_low_water * mc.voxel_capacity
        center = jnp.asarray(sensor_pos)
        radius = _keep_radius_mesh(
            self.gm, center, int(low_p), int(low_v),
            mc.local_map_radius)
        self.gm, self.store = _compact_mesh_jit(
            self.gm, self.store, center, radius)
        # quantile granularity / voxel-vs-point keep mismatch guard: at most
        # two fallback shrinks (rarely taken)
        r = float(radius) * 0.7
        for _ in range(2):
            if (int(self.gm.n_points()) <= high_p
                    and int(self.gm.vox.occupancy()) <= high_v):
                break
            self.gm, self.store = _compact_mesh_jit(
                self.gm, self.store, center, jnp.asarray(r, jnp.float32))
            r *= 0.7
        self.compact_ms += 1e3 * (_time.perf_counter() - _t0)
        return True

    # ------------------------------------------------------------------
    def extract(self) -> Tuple[np.ndarray, np.ndarray]:
        return _extract(self.gm, self.store)


@jax.jit
def _compact_mesh_jit(gm: GlobalPointMap, store: TriangleStore,
                      center: jnp.ndarray, radius: jnp.ndarray):
    gm, maps = gm.compact(center, radius)
    store = remap_store(store, maps["slot_map"], maps["idmap"])
    return gm, store


@functools.partial(jax.jit, static_argnames=("low_p", "low_v", "r_max"))
def _keep_radius_mesh(gm: GlobalPointMap, center: jnp.ndarray,
                      low_p: int, low_v: int, r_max: float) -> jnp.ndarray:
    """Largest keep radius whose Chebyshev cube holds ≤ low-water voxels AND
    points: the (low_k)-th smallest live distance, one sort per table."""
    from immesh_tpu.map.hash import EMPTY
    res = gm.cfg.voxel_resolution
    big = jnp.float32(jnp.inf)

    vkeys = gm.vox.keys
    vlive = vkeys[:, 0] != EMPTY
    vcen = (vkeys[:, :3].astype(jnp.float32) + 0.5) * res
    dv = jnp.max(jnp.abs(vcen - center[None, :]), axis=-1)
    dv = jnp.sort(jnp.where(vlive, dv, big))
    rv = dv[min(low_v, dv.shape[0]) - 1]

    alloc = jnp.arange(gm.pts.shape[0], dtype=jnp.int32) < gm.pt_count
    # a point survives iff its VOXEL center is inside the cube (compact's
    # keep rule) — evaluate the same center formula per point
    pc = (jnp.floor(gm.pts / res) + 0.5) * res
    dp = jnp.max(jnp.abs(pc - center[None, :]), axis=-1)
    dp = jnp.sort(jnp.where(alloc, dp.astype(jnp.float32), big))
    rp = dp[min(low_p, dp.shape[0]) - 1]

    r = jnp.minimum(jnp.float32(r_max), jnp.minimum(rv, rp))
    # strictly below the quantile sample so the counted element is evicted
    return jnp.where(jnp.isfinite(r), r * (1.0 - 1e-6), jnp.float32(r_max))


def _extract(gm, store) -> Tuple[np.ndarray, np.ndarray]:
    """Gather the current mesh to host: (verts (P,3), faces (F,3)).

    Faces index into the returned vertex array (compacted); the global
    point ids are remapped host-side.
    """
    tri = np.asarray(store.tri_ids).reshape(-1, 3)
    valid = np.all(tri >= 0, axis=-1)
    tri = tri[valid]
    pts = np.asarray(gm.pts)
    used = np.unique(tri)
    remap = np.full(pts.shape[0], -1, np.int64)
    remap[used] = np.arange(used.size)
    return pts[used], remap[tri]
