"""End-to-end KITTI-scale ablation: pipelined joint fps per config variant.

Per-stage sync timing through the tunneled chip is RTT-dominated (~26 ms per
block_until_ready), so the only reliable cost attribution is end-to-end
pipelined throughput deltas between config variants — the same way bench.py
measures (queue all frames, block once).

Usage: python tools/ablate_e2e.py [--frames N] [variant ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": {},
    "nosmooth": {"mesh.pull_smooth_lam": 0.0},
    "a256": {"mesh.active_voxels_per_frame": 256},
    "a1024": {"mesh.active_voxels_per_frame": 1024},
    "a2048": {"mesh.active_voxels_per_frame": 2048},
    "chunk128": {"mesh.mesh_chunk": 128},
    "chunk512": {"mesh.mesh_chunk": 512},
    "pull32": {"mesh.pull_capacity": 32},
    "file2048": {"mesh.file_voxels_per_frame": 2048},
    "lioonly": {"_lio_only": True},
    # cumulative in-program truncation (MeshConfig.ablate)
    "app_cell0": {"mesh.ablate": "app_cell0"},
    "app_insert0": {"mesh.ablate": "app_insert0"},
    "app_alloc0": {"mesh.ablate": "app_alloc0"},
    "app_file0": {"mesh.ablate": "app_file0"},
    "app_active0": {"mesh.ablate": "app_active0"},
    "skip_tri": {"mesh.ablate": "skip_tri"},
    "pull0": {"mesh.ablate": "pull0"},
    "argmin0": {"mesh.ablate": "argmin0"},
    "pairs0": {"mesh.ablate": "pairs0"},
    "compact0": {"mesh.ablate": "compact0"},
    "tri30": {"mesh.ablate": "tri30"},
    "fake_tri3": {"mesh.ablate": "fake_tri3"},
    "gather0": {"mesh.ablate": "gather0"},
    "sort30": {"mesh.ablate": "sort30"},
}


def apply_variant(cfg, kv):
    for k, v in kv.items():
        if k.startswith("_"):
            continue
        group, field = k.split(".")
        sub = getattr(cfg, group)
        cfg = cfg.replace(**{group: sub.__class__(
            **{**{f.name: getattr(sub, f.name)
                  for f in __import__("dataclasses").fields(sub)}, field: v})})
    return cfg


def run_variant(name, kv, frames, warmup, gen_cache={}):
    import jax
    import bench
    from immesh_tpu.lio.pipeline import LioPipeline
    from immesh_tpu.runtime.joint import JointPipeline

    cfg = apply_variant(bench.kitti_config(), kv)
    key = frames + warmup
    if key not in gen_cache:
        gen_cache[key] = bench.gen_frames(bench.kitti_config(), True, key)
    sim, gt, bundles = gen_cache[key]

    lio_only = kv.get("_lio_only", False)
    pipe = LioPipeline(cfg) if lio_only else JointPipeline(cfg)
    t0 = time.perf_counter()
    for k in range(warmup):
        pipe.step(bundles[k])
    jax.block_until_ready(pipe.state.pos if lio_only else pipe.lio.state.pos)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for k in range(warmup, warmup + frames):
        pipe.step(bundles[k])
    jax.block_until_ready(pipe.state.pos if lio_only else pipe.lio.state.pos)
    dt = time.perf_counter() - t0
    return {"variant": name, "fps": round(frames / dt, 2),
            "ms": round(1000 * dt / frames, 1),
            "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=15)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("variants", nargs="*", default=["base"])
    args = ap.parse_args()
    import jax
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(here, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    for name in args.variants:
        out = run_variant(name, VARIANTS[name], args.frames, args.warmup)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
