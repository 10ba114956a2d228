"""End-to-end demo: simulated LiDAR-inertial sequence → odometry + mesh.

    python -m immesh_tpu.runtime.demo [--frames N] [--out DIR] [--platform cpu]

The runnable equivalent of `roslaunch ImMesh mapping_avia.launch` + a bag
replay (reference README.md:93-134), with the built-in simulator standing in
for the rosbag (no datasets ship with this environment).
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--out", default="/tmp/immesh_out")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--preset", default="sim")
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    from immesh_tpu.config import PRESETS
    from immesh_tpu.frontend.sim import LidarImuSimulator
    from immesh_tpu.frontend.types import ScanBundle
    from immesh_tpu.runtime.app import ImMeshRuntime

    cfg = PRESETS[args.preset]()
    sim = LidarImuSimulator(n_rays=cfg.preprocess.max_points, seed=0)
    rt = ImMeshRuntime(cfg, log_dir=args.out)
    rt.static_init(*sim.static_imu(100))

    for k in range(args.frames):
        f = sim.frame(k)
        b = ScanBundle.from_numpy(
            f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
            f.scan_duration, cfg.preprocess.max_points,
            cfg.imu.max_imu_per_scan)
        stats = rt.process_frame(b, t=k * sim.scan_T)
        err = np.linalg.norm(stats["pos"] - f.gt_pos)
        n_vox = stats["n_active_voxels"]
        print(f"frame {k:3d}  lio {stats['lio_ms']:6.1f} ms  "
              f"mesh {stats['mesh_ms']:6.1f} ms  "
              f"voxels {0 if n_vox is None else int(n_vox):4d}  "
              f"matches {int(stats['n_effective']):5d}  |p-gt| {err:.3f} m")

    mesh_path = os.path.join(args.out, "mesh.ply")
    verts, faces = rt.save_mesh(mesh_path, smooth_iters=1)
    rt.save_state(os.path.join(args.out, "ckpt"))
    rt.close()
    print(f"mesh: {len(verts)} verts, {len(faces)} faces → {mesh_path}")
    print(f"trajectory: {os.path.join(args.out, 'kitti_log.txt')}")
    print(f"timing:     {rt.timer.report()}")


if __name__ == "__main__":
    main()
