"""Benchmark: LiDAR-inertial odometry frames/s on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference runs ≈1.0× real time at 10 Hz scans on an i9-10900
(BASELINE.md — 583 s compute for a 578 s sequence), so vs_baseline is
frames_per_second / 10.

Usage: python bench.py [--platform cpu] [--frames N]
"""

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()

    if args.platform:
        import os
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    from immesh_tpu.config import PRESETS
    from immesh_tpu.frontend.sim import LidarImuSimulator
    from immesh_tpu.frontend.types import ScanBundle
    from immesh_tpu.lio.pipeline import LioPipeline

    cfg = PRESETS["sim"]()
    sim = LidarImuSimulator(n_rays=cfg.preprocess.max_points, seed=0)
    pipe = LioPipeline(cfg)
    pipe.static_init(*sim.static_imu(100))

    def bundle(k):
        f = sim.frame(k)
        return ScanBundle.from_numpy(
            f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
            f.scan_duration, cfg.preprocess.max_points, cfg.imu.max_imu_per_scan)

    # pre-generate frames so host simulation isn't on the clock
    frames = [bundle(k) for k in range(args.warmup + args.frames)]

    for k in range(args.warmup):
        pipe.step(frames[k])
    jax.block_until_ready(pipe.state.pos)

    t0 = time.perf_counter()
    for k in range(args.warmup, args.warmup + args.frames):
        pipe.step(frames[k])
    jax.block_until_ready(pipe.state.pos)
    dt = time.perf_counter() - t0

    fps = args.frames / dt
    print(json.dumps({
        "metric": "lio_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
