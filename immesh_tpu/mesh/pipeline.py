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
from immesh_tpu.mesh.triangles import TriangleStore, mesh_voxels


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
    gm, slots, smask = gm.append_frame(pts_world, mask)
    store = mesh_voxels(gm, store, slots, smask, sensor_pos, chunk)
    gm = gm.mark_meshed(slots, smask)
    return gm, store, jnp.sum(smask.astype(jnp.int32)), slots, smask


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
        self.gm, self.store, n_active, slots, smask = mesh_step(
            self.gm, self.store, jnp.asarray(pts_world), jnp.asarray(mask),
            jnp.asarray(sensor_pos), self.cfg.mesh.mesh_chunk,
        )
        self.last_active = (slots, smask)
        self.frame_idx += 1
        return n_active

    # ------------------------------------------------------------------
    def extract(self) -> Tuple[np.ndarray, np.ndarray]:
        """Gather the current mesh to host: (verts (P,3), faces (F,3)).

        Faces index into the returned vertex array (compacted); the global
        point ids are remapped host-side.
        """
        tri = np.asarray(self.store.tri_ids).reshape(-1, 3)
        valid = np.all(tri >= 0, axis=-1)
        tri = tri[valid]
        pts = np.asarray(self.gm.pts)
        used = np.unique(tri)
        remap = np.full(pts.shape[0], -1, np.int64)
        remap[used] = np.arange(used.size)
        return pts[used], remap[tri]
