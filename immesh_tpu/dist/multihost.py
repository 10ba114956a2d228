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


def scaling_curve(cfg, ns: Sequence[int], *, frames: int = 8,
                  warmup: int = 2, with_mesh_step: bool = True,
                  out_path: Optional[str] = None) -> list[dict]:
    """Strong-scaling sweep: run the joint dp-LIO + capacity-sharded mesh
    step on a FIXED workload over sub-meshes of n devices and record
    frames/s + efficiency per n.  Writes `out_path` (JSON list) if given.

    On real multi-chip hardware this measures the BASELINE.md 1→N scaling
    target; on the virtual CPU mesh it validates the harness (all "devices"
    share the same cores, so efficiency there is not meaningful).
    """
    import jax.numpy as jnp
    from immesh_tpu.core.state import EsikfState
    from immesh_tpu.dist.lio import make_dp_lio_step
    from immesh_tpu.dist.mesh import create_sharded_mesh, make_sharded_mesh_step
    from immesh_tpu.lio import imu as imu_mod
    from immesh_tpu.map.voxel_map import VoxelMap

    all_devs = jax.devices()
    results = []
    base_fps = None
    for n in ns:
        if n > len(all_devs):
            break
        mesh = Mesh(np.asarray(all_devs[:n]), ("dp",))
        lio_step, shard_bundle = make_dp_lio_step(mesh, cfg)
        mesh_step = make_sharded_mesh_step(mesh, cfg) if with_mesh_step else None

        state = EsikfState.identity()
        vm = VoxelMap.create(cfg.voxel_map)
        smm = create_sharded_mesh(mesh, cfg) if with_mesh_step else None
        n_pts = cfg.preprocess.max_points

        def one(state, vm, smm, k):
            b = shard_bundle(_plane_scan(n_pts, 32, seed=k))
            state, vm, world, _ = lio_step(state, vm, b)
            if mesh_step is not None:
                smm, _, _ = mesh_step(smm, world, b.mask, state.pos)
            return state, vm, smm

        for k in range(warmup):
            state, vm, smm = one(state, vm, smm, k)
        jax.block_until_ready(state.pos)
        t0 = time.perf_counter()
        for k in range(frames):
            state, vm, smm = one(state, vm, smm, warmup + k)
        jax.block_until_ready(state.pos)
        dt = time.perf_counter() - t0

        fps = frames / dt
        if base_fps is None:
            base_fps = fps
        results.append({
            "n_devices": n,
            "frames_per_s": round(fps, 3),
            "speedup": round(fps / base_fps, 3),
            "efficiency": round(fps / (base_fps * (n / ns[0])), 3),
            "points_per_frame": n_pts,
        })
    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    return results
