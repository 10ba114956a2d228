"""Multi-host scaffolding: process-group init, {hosts×chips} meshes, and a
scaling-efficiency harness.

The reference is a single shared-memory process — its only IPC is ROS
pub/sub (SURVEY.md P7) — so none of this has a reference analogue; it is the
TPU-native growth path: `jax.distributed` brings every host's chips into one
global device set, a `jax.sharding.Mesh` lays the dp axis across them (ICI
inside a host/slice, DCN between), and the dist/ steps (dp LIO, sharded map,
sharded mesh, window BA) run unchanged — they address the mesh axis, never
the transport.

Single-process use (tests, the virtual CPU mesh, one real chip) is the
default: `initialize()` is a no-op unless a coordinator is configured, and
every helper works on whatever `jax.devices()` shows.

The scaling harness measures STRONG scaling — a fixed per-frame workload
(one scan) over n ∈ {1, 2, 4, …} devices — because that is the deployment
shape: one sensor stream, more chips. frames/s per n and efficiency
(fps_n / (n · fps_1)) go into a JSON the driver archives next to the bench
(BASELINE.md target: ≥75 % efficiency 1→4 hosts).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

# env names for headless pod launches (one process per host)
ENV_COORDINATOR = "IMMESH_COORDINATOR"        # e.g. "10.0.0.1:8476"
ENV_NUM_PROCESSES = "IMMESH_NUM_PROCESSES"
ENV_PROCESS_ID = "IMMESH_PROCESS_ID"


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join the multi-host process group; no-op for single-process runs.

    Arguments fall back to IMMESH_COORDINATOR / IMMESH_NUM_PROCESSES /
    IMMESH_PROCESS_ID, then to jax.distributed's own auto-detection
    environments (SLURM, GKE).  Returns True iff a multi-process group was
    initialized.  Must be called before any other jax API touches a backend.
    """
    coordinator_address = coordinator_address or os.environ.get(
        ENV_COORDINATOR)
    if num_processes is None and ENV_NUM_PROCESSES in os.environ:
        num_processes = int(os.environ[ENV_NUM_PROCESSES])
    if process_id is None and ENV_PROCESS_ID in os.environ:
        process_id = int(os.environ[ENV_PROCESS_ID])

    if coordinator_address is None or (num_processes or 1) <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def build_mesh(axis: str = "dp",
               devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all GLOBAL devices (every host's chips after
    initialize()); the single axis is the dp/spatial-shard dimension every
    dist/ step addresses."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def build_host_mesh(host_axis: str = "host", chip_axis: str = "dp") -> Mesh:
    """2-D {hosts × chips_per_host} mesh: collectives over `chip_axis` ride
    ICI within a host/slice, `host_axis` crosses DCN — shard the map/voxel
    axes over chips and keyframe windows over hosts accordingly."""
    devs = jax.devices()
    n_proc = jax.process_count()
    per = len(devs) // n_proc
    grid = np.empty((n_proc, per), dtype=object)
    for d in devs:
        grid[d.process_index, d.id % per] = d
    return Mesh(grid, (host_axis, chip_axis))


def host_local_sharder(mesh: Mesh, axis: str = "dp"):
    """Returns fn(np_array) → global jax.Array whose leading dim is sharded
    over `axis`, fed with THIS process's local block only (each host loads
    its own slice of the scan; no host ever materializes the global array).
    Single-process: equivalent to device_put with a NamedSharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(local_block: np.ndarray) -> jax.Array:
        sharding = NamedSharding(mesh, P(axis))
        return jax.make_array_from_process_local_data(sharding, local_block)

    return put


# ======================================================================
# scaling harness
# ======================================================================

def _plane_scan(n_pts: int, n_imu: int, seed: int = 0):
    """Synthetic noisy-ground-plane bundle (same shape as the dryrun's)."""
    from immesh_tpu.frontend.types import ScanBundle

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-5, 5, (n_pts, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-0.02, 0.02, n_pts)
    t_rel = np.linspace(0, 0.1, n_pts).astype(np.float32)
    stamps = np.linspace(0.0, 0.1, n_imu).astype(np.float32)
    acc = np.tile(np.array([0, 0, 9.81], np.float32), (n_imu, 1))
    gyr = np.zeros((n_imu, 3), np.float32)
    return ScanBundle.from_numpy(pts, t_rel, stamps, acc, gyr, 0.1,
                                 n_pts, n_imu)


def _bench_frames(cfg, n_frames: int, outdoor: bool = True):
    """Bench-scale simulator frames (the same outdoor street canyon and
    131k-ray scans bench.py measures on one chip — VERDICT r3 item 4: the
    round-3 curve ran 1,024-pt frames, a workload so small that dispatch
    overhead was the entire measurement)."""
    from immesh_tpu.frontend.sim import (
        ForwardTrajectory, LidarImuSimulator, outdoor_scene)
    from immesh_tpu.frontend.types import ScanBundle

    n_pts = cfg.preprocess.max_points
    if outdoor:
        sim = LidarImuSimulator(
            scene=outdoor_scene(length=400.0), traj=ForwardTrajectory(),
            n_rays=n_pts, rings=64, max_range=120.0, seed=0)
    else:
        sim = LidarImuSimulator(n_rays=n_pts, seed=0)
    out = []
    for k in range(n_frames):
        f = sim.frame(k)
        out.append(ScanBundle.from_numpy(
            f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
            f.scan_duration, n_pts, cfg.imu.max_imu_per_scan))
    return out


def scaling_curve(cfg, ns: Sequence[int], *, frames: int = 4,
                  warmup: int = 2, with_mesh_step: bool = True,
                  outdoor: bool = True, mode: str = "strong",
                  out_path: Optional[str] = None) -> list[dict]:
    """Scaling sweep of the dp-LIO + capacity-sharded mesh step at BENCH
    scale, with per-stage (LIO / mesh) timing.

    mode="strong": fixed total workload (cfg.preprocess.max_points rays per
    frame) over sub-meshes of n devices.  mode="weak": fixed PER-CHIP
    workload — the frame is generated at max_points and each n-device run
    processes the first n·(max_points/max(ns)) points.

    Honesty note recorded in the output: on the virtual CPU mesh all
    "devices" share the host's physical cores, so strong-scaling wall time
    cannot improve with n; the meaningful CPU-mesh metric is the OVERHEAD
    FACTOR T(n)/T(1) — the cost of sharding + collectives at a fixed total
    workload (1.0 = free).  Real ICI efficiency requires real chips; the
    per-frame collective volume reported here feeds that projection (see
    docs/scaling.md).
    """
    import jax.numpy as jnp
    from immesh_tpu.core.state import EsikfState
    from immesh_tpu.dist.lio import make_dp_lio_step
    from immesh_tpu.dist.mesh import create_sharded_mesh, make_sharded_mesh_step
    from immesh_tpu.map.voxel_map import VoxelMap

    all_devs = jax.devices()
    n_pts_full = cfg.preprocess.max_points
    ns = [n for n in ns if n <= len(all_devs)]
    if not ns:
        return []
    bundles = _bench_frames(cfg, warmup + frames, outdoor)
    results = []
    t_base = None
    n_max = max(ns)
    for n in ns:
        if mode == "weak":
            keep = (n_pts_full // n_max) * n
            cfg_n = cfg.replace(preprocess=cfg.preprocess.__class__(
                **{**cfg.preprocess.__dict__, "max_points": keep}))
            bundles_n = [b.replace(
                pts=b.pts[:keep], t_rel=b.t_rel[:keep], mask=b.mask[:keep])
                for b in bundles]
        else:
            cfg_n, bundles_n = cfg, bundles
        mesh = Mesh(np.asarray(all_devs[:n]), ("dp",))
        lio_step, shard_bundle = make_dp_lio_step(mesh, cfg_n)
        mesh_step = (make_sharded_mesh_step(mesh, cfg_n)
                     if with_mesh_step else None)

        state = EsikfState.identity()
        vm = VoxelMap.create(cfg_n.voxel_map)
        smm = create_sharded_mesh(mesh, cfg_n) if with_mesh_step else None
        sharded = [shard_bundle(b) for b in bundles_n]

        t_lio = t_mesh = 0.0
        for k in range(warmup + frames):
            b = sharded[k]
            rec = k >= warmup
            t0 = time.perf_counter()
            state, vm, world, _ = lio_step(state, vm, b)
            jax.block_until_ready(world)
            if rec:
                t_lio += time.perf_counter() - t0
            if mesh_step is not None:
                t0 = time.perf_counter()
                smm, _, _, _ = mesh_step(smm, world, b.mask, state.pos)
                jax.block_until_ready(smm.gm.pt_count)
                if rec:
                    t_mesh += time.perf_counter() - t0
        dt = (t_lio + t_mesh) / frames
        if t_base is None:
            t_base = dt
        npts_n = bundles_n[0].pts.shape[0]
        fps = 1.0 / dt
        base_fps = 1.0 / t_base
        results.append({
            "n_devices": n,
            "mode": mode,
            "frames_per_s": round(fps, 3),
            "speedup": round(fps / base_fps, 3),
            "efficiency": round(fps / (base_fps * (n / ns[0])), 3),
            "t_lio_ms": round(1e3 * t_lio / frames, 1),
            "t_mesh_ms": round(1e3 * t_mesh / frames, 1),
            "overhead_factor_vs_1dev": round(dt / t_base, 3) if mode == "strong"
            else round(dt / (t_base * npts_n / (n_pts_full // n_max)), 3),
            "points_per_frame": npts_n,
            # per-frame collective payloads (bytes) for the ICI projection
            "allgather_scan_bytes": int(npts_n * 3 * 4 * (n - 1) / max(n, 1)),
            "psum_gn_bytes": 0 if n == 1 else (18 * 18 + 18) * 4,
            "cpu_virtual_mesh": jax.default_backend() == "cpu",
        })
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    return results
