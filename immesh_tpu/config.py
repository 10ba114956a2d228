"""Typed configuration for the whole pipeline.

Replaces the reference's ROS-parameter config system (~60 params read in
`read_ros_parameters`, reference voxel_mapping_common.cpp:625-707, plus the
per-dataset YAMLs in config/*.yaml).  One frozen dataclass tree, loadable from
a plain dict / JSON file, with per-dataset presets mirroring the reference's
avia.yaml / velodyne.yaml / nclt.yaml / ntu.yaml / offline_pointcloud.yaml.

Capacity fields are the TPU-specific additions: every dynamic structure in the
reference (voxel hash map, per-voxel point lists, triangle sets) becomes a
fixed-capacity array here, so capacities are config, not malloc.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


class LidarType:
    """Sensor enum (reference preprocess.h:44-51 `lid_type`)."""

    AVIA = 1
    VELO16 = 2
    OUST64 = 3
    VELO32 = 4
    KITTI64 = 5  # reference 'velodyne' handler w/ calib_laser (preprocess.cpp:497)
    XT32 = 6
    L515 = 7
    SIM = 100  # built-in simulator


@dataclass(frozen=True)
class PreprocessConfig:
    """Scan preprocessing (reference preprocess.h:151-195)."""

    lidar_type: int = LidarType.AVIA
    n_scans: int = 6                # scan lines (preprocess.h `N_SCANS`)
    blind: float = 0.1              # blind-range gate, metres (preprocess.cpp `blind`)
    point_filter_num: int = 1       # keep 1-in-N decimation (preprocess.cpp `point_filter_num`)
    max_range: float = 150.0        # drop returns beyond this
    timestamp_unit: float = 1e-3    # per-point relative-time unit in seconds
    calib_laser: bool = False       # KITTI vertical-angle recalibration (voxel_mapping.cpp:1844-1859)
    max_points: int = 32768         # static per-scan point capacity (pad/truncate bucket)
    feature_extract_en: bool = False  # LOAM plane/edge feature extraction
    # (reference `feature_extract_en`, preprocess.cpp:900 give_feature; off in
    # every shipped reference config — the voxel map consumes raw points)


@dataclass(frozen=True)
class ImuConfig:
    """IMU handling / noise model (reference IMU_Processing.h:80-152)."""

    imu_en: bool = True
    init_frames: int = 20           # static-init frame count (IMU_Processing.cpp `imu_int_frame`)
    acc_cov: float = 0.1            # accel noise density
    gyr_cov: float = 0.1            # gyro noise density
    b_acc_cov: float = 1e-4         # accel bias random walk
    b_gyr_cov: float = 1e-4         # gyro bias random walk
    gravity: float = 9.81
    max_imu_per_scan: int = 64      # static capacity of IMU samples bundled per scan
    # LiDAR→IMU extrinsics (reference `extrinsic_T` / `extrinsic_R`)
    extrinsic_t: tuple = (0.0, 0.0, 0.0)
    extrinsic_r: tuple = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


@dataclass(frozen=True)
class VoxelMapConfig:
    """Probabilistic plane voxel map (reference voxel_loc.hpp + voxel_mapping.cpp).

    The reference's adaptive OctoTree (max_layer<=4, `cut_octo_tree`
    voxel_loc.cpp:161-217) becomes a flat multi-level scheme in ONE hash
    table keyed by (ix,iy,iz,level): level 0 = coarse voxel, level ℓ =
    half-size-of-ℓ−1 octant children of voxels whose level ℓ−1 fit is not
    planar.  `max_layers` levels total (2 matches avia/nclt/ntu; the KITTI
    preset uses 4 like reference velodyne.yaml:48).
    """

    voxel_size: float = 0.5                 # coarse voxel edge, m (avia.yaml 0.5)
    max_points_per_voxel: int = 128         # freeze threshold (ref max_points_size)
    min_plane_points: int = 5               # min pts before plane fit (ref layer_init_size[0]=5)
    planer_threshold: float = 0.01          # min-eigenvalue planarity gate (ref min_eigen_value)
    sigma_num: float = 3.0                  # residual χ gate multiplier (voxel_mapping.cpp:264-269)
    beam_err: float = 0.02                  # LiDAR bearing noise, rad-ish (ref beam_err)
    dept_err: float = 0.05                  # LiDAR range noise, m (ref dept_err)
    capacity: int = 2 ** 18                 # hash-table slots (power of two)
    max_probe: int = 32                     # open-addressing probe bound
    max_layers: int = 2                     # refinement levels (ref max_layer)
    touched_voxels_per_scan: int = 4096     # static cap on unique voxels a
    # scan may touch per level; sizes the per-level aggregation/insert/refit
    # pipelines (a downsampled scan at coarse voxels touches a few hundred —
    # large-voxel presets can shrink this 4× for ~the same ms saving)
    # lifetime management (reference laser_map_fov_segment sliding cube,
    # voxel_mapping_common.cpp:214-288; cube_side_length default 1000 m)
    local_map_radius: float = 500.0         # keep radius on compaction, m
    compact_high_water: float = 0.60        # occupancy fraction triggering compaction
    compact_low_water: float = 0.45         # compaction target occupancy —
    # hysteresis: shrinking the keep radius until occupancy ≤ low water
    # leaves growth headroom so a dense map doesn't re-trigger every frame
    compact_check_every: int = 32           # ≤0 disables compaction; any
    # positive value enables the occupancy poll, which runs every frame as a
    # free async copy with a one-frame-delayed read (a sync poll costs one
    # device round trip)


@dataclass(frozen=True)
class LioConfig:
    """Iterated ESIKF (reference lio_state_estimation, voxel_mapping.cpp:1284-1652)."""

    max_iterations: int = 4                 # ref NUM_MAX_ITERATIONS (2-4 per dataset)
    converge_rot_deg: float = 0.01          # convergence thresholds (voxel_mapping.cpp:1619-1622)
    converge_trans_m: float = 0.00015
    update_map: bool = True                 # False = localization-only against
                                            # a prebuilt map (no ref equivalent)
    map_update_points: int = 8192           # downsampled points fed to map update
    downsample_voxel: float = 0.25          # scan voxel-grid leaf (ref filter_size_surf)
    init_pos_cov: float = 1e-5
    init_rot_cov: float = 1e-5
    init_vel_cov: float = 1e-2
    init_bias_cov: float = 1e-4
    init_grav_cov: float = 1e-3


@dataclass(frozen=True)
class MeshConfig:
    """Incremental meshing (reference ImMesh_mesh_reconstruction.cpp + meshing/)."""

    pts_minimum_scale: float = 0.1          # point dedup grid, m (ref points_minimum_scale)
    voxel_resolution: float = 0.4           # meshing voxel edge, m (ref voxel_resolution)
    region_size: float = 10.0               # triangle region shard edge, m (ref region_size)
    max_pts_per_frame: int = 10000          # appended pts/frame (ref number_of_pts_append_to_map)
    points_capacity: int = 2 ** 20          # global point SoA capacity
    voxel_capacity: int = 2 ** 16           # meshing-voxel hash capacity
    pts_per_voxel: int = 32                 # per-voxel point-slot capacity
    pull_capacity: int = 48                 # pulled pts per voxel (voxel + halo ring)
    tris_per_voxel: int = 64                # per-voxel owned-triangle capacity
    active_voxels_per_frame: int = 512      # static cap on voxels re-meshed per frame
    file_voxels_per_frame: int = 4096       # static cap on voxels FILED per
    # frame (point→slot membership); filing is cheap scatter work so the cap
    # sits well above the re-mesh cap — voxels filed but not re-meshed stay
    # in the pending backlog (vox_new>0) and are drained on later frames
    mesh_chunk: int = 64                    # voxels triangulated per kernel launch
    knn_radius_scale: float = 1.25          # halo pull radius ×voxel (mesh_rec_geometry.cpp:343)
    pull_smooth_lam: float = 1.0            # pull-time Laplacian blend
    # (ref smooths pulled points DURING retrieval with factor 1.0 over
    # neighbors within 2×accept_dis, mesh_rec_geometry.cpp:333-369, so the
    # triangulation geometry itself is denoised; 0 = off)
    max_tri_angle_deg: float = 150.0        # sliver filter (ref is_face_is_ok)
    max_edge_scale: float = 0.0             # optional edge cap ×min spacing (0 = off, like ref)
    display_smooth_lam: float = 0.8         # display-time vertex Laplacian blend
    # (ref smooths displayed/exported vertices lazily, factor 1.0 over 20-NN,
    # mesh_rec_display.cpp:85-97 + ImMesh_node.cpp:130-131; 0 = off)
    tie_scale: float = 0.02                 # Delaunay tie perturbation ÷scale²
    # — sized to dominate sensor-noise incircle scores so every voxel/chip
    # picks the same diagonal of near-cocircular quads (mesh/delaunay.py)
    # lifetime management (reference recent-voxel expiry + RAM-bounded
    # reserves, pointcloud_rgbd.cpp:278-294,425-455)
    local_map_radius: float = 500.0         # keep radius on compaction, m
    compact_high_water: float = 0.60        # point/voxel occupancy trigger
    compact_low_water: float = 0.45         # compaction target (hysteresis —
    # see VoxelMapConfig.compact_low_water)
    compact_check_every: int = 32           # ≤0 disables compaction; any
    # positive value enables the every-frame async occupancy poll (see
    # VoxelMapConfig.compact_check_every)
    ablate: str = ""                        # DEBUG ONLY (tools/ablate_e2e.py):
    # truncate the triangulation pipeline after the named stage ("skip_tri",
    # "pull0", "argmin0", "pairs0", "compact0") to attribute in-program cost
    # — per-stage sync timing through the tunneled chip is RTT-bound, so
    # cumulative e2e deltas are the only reliable profile

    def __post_init__(self):
        # triangle vertex ids flow through exact f32 one-hot contractions
        # (mesh/triangles.py), which are only exact for ids < 2^24 — fail
        # loudly here instead of silently corrupting ids at larger capacity
        assert self.points_capacity < 2 ** 24, (
            "points_capacity must stay < 2^24: triangle vertex ids are "
            "carried through f32 contractions (mesh/triangles.py)")


@dataclass(frozen=True)
class BaConfig:
    """Sliding-window plane-landmark bundle adjustment (no reference
    equivalent — BASELINE.md's multi-host north star; solver in
    dist/window_ba.py, runtime bridge in lio/window.py)."""

    enabled: bool = False
    window_size: int = 8                    # keyframes per window
    pts_per_keyframe: int = 512             # stored body points per keyframe
    max_planes: int = 256                   # landmark capacity per window
    kf_trans_thresh: float = 0.5            # new keyframe past this motion, m
    kf_rot_thresh_deg: float = 10.0         # ... or this rotation
    iterations: int = 4                     # GN iterations per window
    huber_delta: float = 0.5                # residual robustifier, m
    odo_w_rot: float = 1e3                  # odometry factor information
    odo_w_t: float = 1e3
    apply_correction: bool = True           # feed refined pose back to filter


@dataclass(frozen=True)
class ParallelConfig:
    """Multi-chip layout — no reference equivalent (single-process CPU)."""

    mesh_axes: tuple = ("dp",)
    mesh_shape: tuple = (1,)


@dataclass(frozen=True)
class ImMeshConfig:
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    imu: ImuConfig = field(default_factory=ImuConfig)
    voxel_map: VoxelMapConfig = field(default_factory=VoxelMapConfig)
    lio: LioConfig = field(default_factory=LioConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    ba: BaConfig = field(default_factory=BaConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    dtype: str = "float32"

    # ---- dict / json round-trip ------------------------------------------
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "ImMeshConfig":
        def build(tp, val):
            if dataclasses.is_dataclass(tp) and isinstance(val, dict):
                fields = {f.name: f.type for f in dataclasses.fields(tp)}
                kw = {}
                for k, v in val.items():
                    if k not in fields:
                        raise KeyError(f"unknown config key {k!r} for {tp.__name__}")
                    sub = _FIELD_TYPES.get((tp, k))
                    kw[k] = build(sub, v) if sub else (tuple(v) if isinstance(v, list) else v)
                return tp(**kw)
            return val

        return build(cls, d)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def from_json(cls, path: str) -> "ImMeshConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def replace(self, **kw: Any) -> "ImMeshConfig":
        return dataclasses.replace(self, **kw)


_FIELD_TYPES = {
    (ImMeshConfig, "preprocess"): PreprocessConfig,
    (ImMeshConfig, "imu"): ImuConfig,
    (ImMeshConfig, "voxel_map"): VoxelMapConfig,
    (ImMeshConfig, "lio"): LioConfig,
    (ImMeshConfig, "mesh"): MeshConfig,
    (ImMeshConfig, "ba"): BaConfig,
    (ImMeshConfig, "parallel"): ParallelConfig,
}


# ---- dataset presets (mirror reference config/*.yaml) ------------------------

def preset_avia() -> ImMeshConfig:
    """Livox Avia + IMU (reference config/avia.yaml)."""
    return ImMeshConfig(
        preprocess=PreprocessConfig(lidar_type=LidarType.AVIA, n_scans=6, blind=0.1),
        # reference config/avia.yaml mapping/extrinsic_T
        imu=ImuConfig(extrinsic_t=(0.04165, 0.02326, -0.0284)),
        voxel_map=VoxelMapConfig(voxel_size=0.5),
        lio=LioConfig(max_iterations=4),
    )


def preset_kitti() -> ImMeshConfig:
    """Velodyne HDL-64 KITTI, IMU-less (reference config/velodyne.yaml)."""
    return ImMeshConfig(
        preprocess=PreprocessConfig(
            lidar_type=LidarType.KITTI64, n_scans=64, blind=1.0, calib_laser=True,
            max_points=131072,
        ),
        # acc/gyr cov act as velocity / angular-rate random walks in IMU-less
        # mode (reference velodyne.yaml acc_cov: 1.0, gyr_cov: 0.5)
        imu=ImuConfig(imu_en=False, acc_cov=1.0, gyr_cov=0.5),
        # velodyne.yaml voxel: 3 m voxels, 4 layers, 1000 pts freeze
        voxel_map=VoxelMapConfig(voxel_size=3.0, max_points_per_voxel=1000,
                                 max_layers=4),
        lio=LioConfig(max_iterations=3, downsample_voxel=0.5),
        mesh=MeshConfig(pts_minimum_scale=0.15, voxel_resolution=0.6),
    )


def preset_nclt() -> ImMeshConfig:
    """Velodyne-32 NCLT (reference config/nclt.yaml)."""
    return ImMeshConfig(
        preprocess=PreprocessConfig(lidar_type=LidarType.VELO32, n_scans=32, blind=2.0),
        # reference config/nclt.yaml mapping/extrinsic_T
        imu=ImuConfig(extrinsic_t=(0.0, 0.0, 0.28)),
        voxel_map=VoxelMapConfig(voxel_size=2.0),
        lio=LioConfig(max_iterations=2),
    )


def preset_ntu() -> ImMeshConfig:
    """Ouster-64 NTU-VIRAL (reference config/ntu.yaml)."""
    return ImMeshConfig(
        preprocess=PreprocessConfig(lidar_type=LidarType.OUST64, n_scans=64, blind=1.0),
        # reference config/ntu.yaml mapping/extrinsic_T
        imu=ImuConfig(extrinsic_t=(-0.050, 0.000, 0.055)),
        voxel_map=VoxelMapConfig(voxel_size=1.0),
        lio=LioConfig(max_iterations=4),
    )


def preset_offline_pointcloud() -> ImMeshConfig:
    """Offline .pcd meshing, no odometry (reference config/offline_pointcloud.yaml)."""
    return ImMeshConfig(
        imu=ImuConfig(imu_en=False),
        mesh=MeshConfig(max_pts_per_frame=50_000_000, points_capacity=2 ** 22),
    )


def preset_sim() -> ImMeshConfig:
    """Built-in simulator (tests / bench)."""
    return ImMeshConfig(
        preprocess=PreprocessConfig(lidar_type=LidarType.SIM, blind=0.05, max_points=8192),
        voxel_map=VoxelMapConfig(voxel_size=0.8, capacity=2 ** 16),
        lio=LioConfig(max_iterations=4, downsample_voxel=0.2, map_update_points=4096),
        mesh=MeshConfig(
            points_capacity=2 ** 18, voxel_capacity=2 ** 14,
        ),
    )


PRESETS = {
    "avia": preset_avia,
    "kitti": preset_kitti,
    "nclt": preset_nclt,
    "ntu": preset_ntu,
    "offline_pointcloud": preset_offline_pointcloud,
    "sim": preset_sim,
}
