"""Benchmark: joint LiDAR-inertial odometry + incremental meshing frames/s
on one chip (the reference's headline metric — real-time = 10 Hz scans with
the mesh keeping up, BASELINE.md).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = frames_per_second / 10 (reference ≈ 1.0× real time at 10 Hz on
an i9-10900).

Usage: python bench.py [--platform cpu] [--frames N] [--lio-only]
"""

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--lio-only", action="store_true")
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent compile cache: first-ever run pays the (slow, tunneled)
    # compile; subsequent processes reuse it
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import numpy as np
    from immesh_tpu.config import PRESETS
    from immesh_tpu.frontend.sim import LidarImuSimulator
    from immesh_tpu.frontend.types import ScanBundle
    from immesh_tpu.lio.pipeline import LioPipeline
    from immesh_tpu.runtime.joint import JointPipeline

    cfg = PRESETS["sim"]()
    sim = LidarImuSimulator(n_rays=cfg.preprocess.max_points, seed=0)
    if args.lio_only:
        lio, mesh = LioPipeline(cfg), None
    else:
        pipe = JointPipeline(cfg)      # fused 1-program/frame odom+mesh
        lio, mesh = pipe.lio, pipe.mesh
    lio.static_init(*sim.static_imu(100))

    def bundle(k):
        f = sim.frame(k)
        return ScanBundle.from_numpy(
            f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
            f.scan_duration, cfg.preprocess.max_points, cfg.imu.max_imu_per_scan)

    # pre-generate frames so host simulation isn't on the clock
    frames = [bundle(k) for k in range(args.warmup + args.frames)]

    def step(b):
        if mesh is None:
            lio.step(b)
        else:
            pipe.step(b)

    for k in range(args.warmup):
        step(frames[k])
    jax.block_until_ready(lio.state.pos)
    if mesh is not None:
        jax.block_until_ready(mesh.store.tri_n)

    t0 = time.perf_counter()
    for k in range(args.warmup, args.warmup + args.frames):
        step(frames[k])
    jax.block_until_ready(lio.state.pos)
    if mesh is not None:
        jax.block_until_ready(mesh.store.tri_n)
    dt = time.perf_counter() - t0

    fps = args.frames / dt
    metric = "lio_frames_per_s" if args.lio_only else "odom_mesh_frames_per_s"
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
