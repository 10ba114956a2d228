"""LIO-stage device attribution at bench shapes (round-5 perf push).

Stage-isolated sub-jits, each dispatched REPEAT times back-to-back with one
block_until_ready at the end — per-call wall converges to device time
(pipelined dispatch amortizes the tunneled-chip RTT that inflates
tools/profile_stages.py's one-shot numbers).

Usage: python tools/profile_lio.py [--frames N] [--repeat R]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm-frames", type=int, default=5)
    ap.add_argument("--repeat", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import bench
    from immesh_tpu.core.geometry import lidar_point_cov_body
    from immesh_tpu.lio import imu as imu_mod
    from immesh_tpu.lio.association import associate
    from immesh_tpu.lio.downsample import voxel_downsample
    from immesh_tpu.lio.esikf import lio_update
    from immesh_tpu.lio.pipeline import LioPipeline

    cfg = bench.kitti_config()
    sim, gt, frames = bench.gen_frames(cfg, True, args.warm_frames + 1)
    pipe = LioPipeline(cfg)
    for k in range(args.warm_frames):
        pipe.step(frames[k])
    b = frames[args.warm_frames]
    state, vm = pipe.state, pipe.vm
    lio_cfg, map_cfg, imu_cfg = cfg.lio, cfg.voxel_map, cfg.imu

    # fixed intermediate inputs (computed once)
    @jax.jit
    def prep(state, b):
        state_prop = imu_mod.const_velocity_propagate(
            state, b.scan_duration, imu_cfg)
        pts_end = imu_mod.deskew_const_twist(
            b.pts, b.t_rel, b.scan_duration,
            state.bg * b.scan_duration, state.vel * b.scan_duration)
        down_pts, down_mask = voxel_downsample(
            pts_end, b.mask, lio_cfg.downsample_voxel, lio_cfg.map_update_points)
        pcov = lidar_point_cov_body(down_pts, map_cfg.dept_err, map_cfg.beam_err)
        return state_prop, pts_end, down_pts, down_mask, pcov

    state_prop, pts_end, down_pts, down_mask, pcov = jax.block_until_ready(
        prep(state, b))

    stages = {
        "deskew_const": jax.jit(lambda: imu_mod.deskew_const_twist(
            b.pts, b.t_rel, b.scan_duration,
            state.bg * b.scan_duration, state.vel * b.scan_duration)),
        "downsample": jax.jit(lambda: voxel_downsample(
            pts_end, b.mask, lio_cfg.downsample_voxel,
            lio_cfg.map_update_points)),
        "pcov": jax.jit(lambda: lidar_point_cov_body(
            down_pts, map_cfg.dept_err, map_cfg.beam_err)),
        "associate_x1": jax.jit(lambda: associate(
            state_prop, vm, down_pts, pcov, down_mask, map_cfg)),
        "esikf_update_x3": jax.jit(lambda: lio_update(
            state_prop, vm, down_pts, pcov, down_mask, lio_cfg, map_cfg)),
        "map_update": jax.jit(lambda: vm.update(
            state_prop.transform_points(down_pts),
            (pcov[:, 0, 0] + pcov[:, 1, 1] + pcov[:, 2, 2]) / 3.0, down_mask)),
        "world_transform": jax.jit(lambda: state_prop.transform_points(pts_end)),
    }

    out = {}
    for name, fn in stages.items():
        r = fn()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(args.repeat):
            r = fn()
        jax.block_until_ready(r)
        out[name] = round(1e3 * (time.perf_counter() - t0) / args.repeat, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
