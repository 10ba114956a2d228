"""Produce MULTICHIP_SCALING.json at BENCH scale (VERDICT r3 item 4).

Runs the dp-LIO + capacity-sharded mesh step over an 8-virtual-device CPU
mesh at the same workload bench.py measures on the real chip: 131,072-ray
outdoor scans, the kitti preset's odometry/mesh scales.  Emits both a
strong-scaling curve (fixed total work) and a weak-scaling curve (fixed
per-chip work), with per-stage timings and per-frame collective payloads.

All eight virtual devices share this host's physical cores, so wall time
CANNOT drop with n here — the honest metric is `overhead_factor_vs_1dev`
(sharding + collective cost at fixed total work; 1.0 = free).  See
docs/scaling.md for the ICI projection built from the payload numbers.

Usage: python tools/scaling_bench.py [--frames N] [--out MULTICHIP_SCALING.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--out", default="MULTICHIP_SCALING.json")
    args = ap.parse_args()

    import bench
    from immesh_tpu.dist.multihost import scaling_curve

    cfg = bench.kitti_config()
    strong = scaling_curve(cfg, [1, 2, 4, 8], frames=args.frames,
                           warmup=args.warmup, mode="strong")
    weak = scaling_curve(cfg, [1, 2, 4, 8], frames=args.frames,
                         warmup=args.warmup, mode="weak")
    out = {"strong": strong, "weak": weak,
           "note": ("8 virtual CPU devices share this host's physical cores;"
                    " overhead_factor_vs_1dev is the metric (1.0 = sharding"
                    " and collectives cost nothing at fixed work); real ICI"
                    " efficiency projection in docs/scaling.md")}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
