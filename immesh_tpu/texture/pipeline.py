"""Host wrapper for the texture path: camera frames → colored map → colored mesh.

The reference runs texture reconstruction as an application on top of ImMesh
(README.md: ImMesh + R3LIVE texturing; plumbing in
src/meshing/r3live/pointcloud_rgbd.cpp `render_pts_in_voxels_mp` :613-686 and
image_frame.cpp).  Here the pipeline is: after each mesh step, feed the
nearest camera frame to `TexturePipeline.render`, which colorizes the points
of the same active-voxel work list the mesher just used; `extract_colored`
then emits a vertex-colored mesh for PLY export.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from immesh_tpu.config import ImMeshConfig
from immesh_tpu.mesh.pipeline import MeshPipeline
from immesh_tpu.texture.camera import PinholeCamera
from immesh_tpu.texture.render import ColorStore, render_active_voxels


class TexturePipeline:
    """Owns the ColorStore parallel to a MeshPipeline's global point map."""

    def __init__(self, cfg: ImMeshConfig, cam: PinholeCamera):
        self.cfg = cfg
        self.cam = cam
        self.colors = ColorStore.create(cfg.mesh.points_capacity)
        self.n_rendered_total = 0

    def render(self, mesh: MeshPipeline, img, R_w2c, t_w2c, obs_time,
               inv_exposure: float = 1.0) -> int:
        """Fuse one camera frame; uses mesh.last_active (the voxels touched by
        the most recent mesh step) as the candidate set."""
        if mesh.last_active is None:
            return 0
        slots, smask = mesh.last_active
        self.colors, n = render_active_voxels(
            self.colors, mesh.gm, slots, smask, jnp.asarray(img, jnp.float32),
            self.cam, jnp.asarray(R_w2c, jnp.float32),
            jnp.asarray(t_w2c, jnp.float32), float(obs_time),
            float(inv_exposure))
        n = int(n)
        self.n_rendered_total += n
        return n

    def extract_colored(self, mesh: MeshPipeline
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(verts, faces, colors_u8): vertex-colored mesh for save_ply."""
        tri = np.asarray(mesh.store.tri_ids).reshape(-1, 3)
        valid = np.all(tri >= 0, axis=-1)
        tri = tri[valid]
        pts = np.asarray(mesh.gm.pts)
        cols = np.asarray(self.colors.colors_u8())
        used = np.unique(tri)
        remap = np.full(pts.shape[0], -1, np.int64)
        remap[used] = np.arange(used.size)
        return pts[used], remap[tri], cols[used].astype(np.uint8)
