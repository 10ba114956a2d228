"""Per-point RGB estimation — the texture-reconstruction path (SURVEY C26).

Re-design of the reference's point colorization (reference
src/meshing/r3live/pointcloud_rgbd.cpp: `RGB_pts::update_rgb` :126-195,
`render_pts_in_voxels` :554-605, `thread_render_pts_in_voxel` /
`render_pts_in_voxels_mp` :613-686).  The reference walks recently-visited
voxels point-by-point under a thread pool; here the whole render is ONE
batched masked kernel: project all candidate points, bilinear-sample the
image, and scatter a per-channel scalar-Kalman color update into the color
store.  Per-point `if/continue` gates become boolean masks.

Behavior kept from the reference:
  * view-angle gate: skip points >30° off the optical axis, with angle
    floored at 5° and distance at 1 m for the observation noise
    (pointcloud_rgbd.cpp:641-650);
  * observation-distance gate: once colored, a point only accepts closer or
    similar-range views (`obs_dis > m_obs_dis * 1.1` skip, :138-141);
  * zero-color and over-exposure rejection (:128-136);
  * scalar Kalman per channel with process noise scaled by time since last
    observation (:159-166, "State estimation for robotics" §2.2.6), noise
    σ_obs = image_obs_cov · view_dis · view_angle (:652-653);
  * exposure-time normalization: colors are stored as radiance
    (pixel · inverse_exposure) and read back normalized by the running mean
    first-observation exposure (:100-103, :167-175, :190-193);
  * >255 renormalization (:167-175).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from immesh_tpu.texture.camera import PinholeCamera, bilinear_sample, project_points

IMAGE_OBS_COV = 1.5          # reference pointcloud_rgbd.cpp:119 image_obs_cov
PROCESS_NOISE_SIGMA = 0.15   # :121 process_noise_sigma
OVEREXPOSURE = 255.0         # :125 THRESHOLD_OVEREXPOSURE
MAX_VIEW_ANGLE_DEG = 30.0    # :647-650


@struct.dataclass
class ColorStore:
    """SoA per-point color state, parallel to GlobalPointMap.pts.

    Fields mirror RGB_pts (reference pointcloud_rgbd.hpp:77-163) minus
    position (owned by the point map).
    """

    rgb: jnp.ndarray        # (P, 3) f32 radiance (pixel · inv_exposure)
    cov: jnp.ndarray        # (P, 3) f32 per-channel σ
    n_obs: jnp.ndarray      # (P,) int32 observation count (m_N_rgb)
    obs_dis: jnp.ndarray    # (P,) f32 closest observation distance
    last_obs_t: jnp.ndarray  # (P,) f32 last observation time
    first_exp: jnp.ndarray  # (P,) f32 running-mean first-obs inverse exposure

    @classmethod
    def create(cls, capacity: int, dtype=jnp.float32) -> "ColorStore":
        return cls(
            rgb=jnp.zeros((capacity, 3), dtype),
            cov=jnp.zeros((capacity, 3), dtype),
            n_obs=jnp.zeros(capacity, jnp.int32),
            obs_dis=jnp.zeros(capacity, dtype),
            last_obs_t=jnp.zeros(capacity, dtype),
            first_exp=jnp.ones(capacity, dtype),
        )

    def colors_u8(self) -> jnp.ndarray:
        """(P, 3) display colors in [0, 255]: radiance / first exposure
        (reference get_rgb, pointcloud_rgbd.cpp:96-99)."""
        c = self.rgb / jnp.maximum(self.first_exp[:, None], 1e-6)
        return jnp.clip(c, 0.0, 255.0)


@partial(jax.jit, static_argnames=())
def render_points(store: ColorStore, pts_w: jnp.ndarray, ids: jnp.ndarray,
                  mask: jnp.ndarray, img: jnp.ndarray, cam: PinholeCamera,
                  R_w2c: jnp.ndarray, t_w2c: jnp.ndarray,
                  obs_time: jnp.ndarray, inv_exposure: jnp.ndarray
                  ) -> Tuple[ColorStore, jnp.ndarray]:
    """Fuse one image into the color store for candidate points.

    pts_w: (N, 3) world positions; ids: (N,) rows into the store; mask: (N,).
    Returns (new_store, n_rendered).  One jitted program: project → sample →
    gated Kalman → scatter (replaces the reference's 6-gate per-point loop,
    pointcloud_rgbd.cpp:631-686).
    """
    f32 = pts_w.dtype
    cam_pos = -R_w2c.T @ t_w2c                     # camera center in world
    optical_axis = R_w2c[2]                        # world-frame +z of camera

    uv, _, in_img = project_points(pts_w, R_w2c, t_w2c, cam)
    view_vec = pts_w - cam_pos
    view_dis = jnp.linalg.norm(view_vec, axis=-1)
    cosang = jnp.sum(view_vec * optical_axis, axis=-1) / (view_dis + 1e-4)
    view_angle = jnp.degrees(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
    ok = mask & in_img & (view_angle <= MAX_VIEW_ANGLE_DEG)

    rgb_obs = bilinear_sample(img, uv)             # (N, 3) in [0,255]
    # zero-color (under-exposure) and over-exposure rejection (:128-136)
    ok = ok & (jnp.linalg.norm(rgb_obs, axis=-1) > 0)
    ok = ok & ~jnp.all(rgb_obs > OVEREXPOSURE, axis=-1)

    sid = jnp.clip(ids, 0, store.rgb.shape[0] - 1)
    n_obs = store.n_obs[sid]
    prev_dis = store.obs_dis[sid]
    # once observed, only accept similar-or-closer views (:138-141)
    ok = ok & ((n_obs == 0) | (view_dis <= prev_dis * 1.1))

    # observation noise grows with range and obliquity (:641-653)
    ang = jnp.maximum(view_angle, 5.0)
    dis = jnp.maximum(view_dis, 1.0)
    obs_sigma = (IMAGE_OBS_COV * dis * ang)[:, None]

    first = ok & (n_obs == 0)
    update = ok & (n_obs > 0)

    # ---- Kalman fusion in radiance units (:144-166) ----------------------
    old_cov = store.cov[sid] + PROCESS_NOISE_SIGMA * jnp.maximum(
        obs_time - store.last_obs_t[sid], 0.0)[:, None]
    old_cov = jnp.maximum(old_cov, 1e-6)
    new_var = 1.0 / (1.0 / old_cov**2 + 1.0 / obs_sigma**2)
    obs_rad = rgb_obs * inv_exposure
    fused = new_var * (store.rgb[sid] / old_cov**2 + obs_rad / obs_sigma**2)
    new_cov = jnp.sqrt(new_var)

    rgb_new = jnp.where(update[:, None], fused,
                        jnp.where(first[:, None], obs_rad, store.rgb[sid]))
    cov_new = jnp.where(update[:, None], new_cov,
                        jnp.where(first[:, None], obs_sigma, store.cov[sid]))

    # >255 display renormalization (:167-175)
    first_exp_new = jnp.where(
        first, inv_exposure,
        jnp.where(update,
                  (store.first_exp[sid] * (n_obs.astype(f32) + 1) + inv_exposure)
                  / (n_obs.astype(f32) + 2),
                  store.first_exp[sid]))
    disp_max = jnp.max(rgb_new, axis=-1) / jnp.maximum(first_exp_new, 1e-6)
    scale = jnp.where(disp_max > 255.0, 254.999 / jnp.maximum(disp_max, 1e-6), 1.0)
    rgb_new = rgb_new * jnp.where(ok, scale, 1.0)[:, None]

    dis_new = jnp.where(first, view_dis,
                        jnp.where(update, jnp.minimum(prev_dis, view_dis),
                                  prev_dis))
    t_new = jnp.where(ok, obs_time, store.last_obs_t[sid])
    cnt_new = n_obs + ok.astype(jnp.int32)

    tgt = jnp.where(ok, sid, store.rgb.shape[0])   # drop non-updates
    new_store = store.replace(
        rgb=store.rgb.at[tgt].set(rgb_new, mode="drop"),
        cov=store.cov.at[tgt].set(cov_new, mode="drop"),
        n_obs=store.n_obs.at[tgt].set(cnt_new, mode="drop"),
        obs_dis=store.obs_dis.at[tgt].set(dis_new, mode="drop"),
        last_obs_t=store.last_obs_t.at[tgt].set(t_new, mode="drop"),
        first_exp=store.first_exp.at[tgt].set(first_exp_new, mode="drop"),
    )
    return new_store, jnp.sum(ok.astype(jnp.int32))


def render_active_voxels(store: ColorStore, gm, slots: jnp.ndarray,
                         smask: jnp.ndarray, img: jnp.ndarray,
                         cam: PinholeCamera, R_w2c: jnp.ndarray,
                         t_w2c: jnp.ndarray, obs_time, inv_exposure=1.0
                         ) -> Tuple[ColorStore, jnp.ndarray]:
    """Colorize the points of the recently-visited voxels of a GlobalPointMap
    (the reference renders `m_voxels_recent_visited`,
    pointcloud_rgbd.cpp:676-686).  `slots`/`smask` is the active-voxel work
    list produced by GlobalPointMap.append_frame — same set the mesher uses,
    keeping candidate count static (A × pts_per_voxel)."""
    ids = jnp.where(smask[:, None],
                    gm.vox_pt_idx[jnp.maximum(slots, 0)], -1).reshape(-1)
    mask = ids >= 0
    pts = gm.pts[jnp.maximum(ids, 0)]
    return render_points(store, pts, jnp.maximum(ids, 0), mask, img, cam,
                         R_w2c, t_w2c, jnp.asarray(obs_time, pts.dtype),
                         jnp.asarray(inv_exposure, pts.dtype))
