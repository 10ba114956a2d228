#!/usr/bin/env python3
"""rosbag → .npz converter for the ROS-free immesh_tpu runtime.

The reference consumes live ROS topics (reference src/voxel_mapping_common.cpp:
290-370 callbacks; README.md:85-134 runs `rosbag play`).  immesh_tpu is
ROS-free by design, so datasets are converted ONCE, wherever ROS (or the pure
-python `rosbags` package) is available, into the npz schema
`immesh_tpu.frontend.preprocess.read_npz_sequence` consumes:

    scan{k}_xyz   (N, 3) float32   sensor-frame points
    scan{k}_time  (N,)   float32   per-point seconds from scan start (optional)
    scan{k}_stamp ()     float64   scan-start time, seconds
    imu_stamps    (M,)   float64   absolute seconds
    imu_acc       (M, 3) float32   m/s² (converted from g if needed)
    imu_gyr       (M, 3) float32   rad/s

The message-decoding core is ROS-independent (plain buffers + field tables,
mirroring the reference's byte-level handlers, src/preprocess.cpp:277-898)
so it is unit-tested in this repo without ROS; only `convert_bag` needs a bag
reader, and it is import-guarded.

Usage (on a machine with `rosbags` or ROS1 `rosbag`):
    python tools/rosbag_to_npz.py input.bag out.npz \
        --lidar-topic /livox/lidar --imu-topic /livox/imu [--imu-in-g]
"""

from __future__ import annotations

import argparse
import sys
from typing import Iterable, Optional, Sequence, Tuple

import numpy as np

# PointCloud2 field datatype codes (sensor_msgs/PointField)
_PF_DTYPES = {
    1: "i1", 2: "u1", 3: "<i2", 4: "<u2",
    5: "<i4", 6: "<u4", 7: "<f4", 8: "<f8",
}

# per-point relative-time field names seen across drivers, with the unit
# each driver emits (reference handlers: ouster `t` ns preprocess.cpp:277,
# velodyne `time` s :497, hesai `timestamp` absolute s :745, livox
# `offset_time` ns)
_TIME_FIELDS = {
    "t": 1e-9, "time": 1.0, "timestamp": 1.0,
    "time_offset": 1e-9, "offset_time": 1e-9,
}
_RING_FIELDS = ("ring", "line")


def decode_pointcloud2(data: bytes, point_step: int, n_points: int,
                       fields: Sequence[Tuple[str, int, int]],
                       ) -> Tuple[np.ndarray, Optional[np.ndarray],
                                  Optional[np.ndarray]]:
    """PointCloud2 payload → (xyz (N,3) f32, time_s (N,)? , ring (N,)?).

    fields: (name, offset, datatype_code) per PointField — the dynamic
    equivalent of the fixed LAYOUTS table (frontend/native.py), so any
    driver's field arrangement decodes without a hand-written layout.
    Absolute per-point timestamps are rebased to scan start.
    """
    raw = np.frombuffer(data, np.uint8)

    def column(off: int, code: int) -> np.ndarray:
        dt = np.dtype(_PF_DTYPES[code])
        b = np.lib.stride_tricks.as_strided(
            raw[off:], shape=(n_points, dt.itemsize), strides=(point_step, 1))
        return b.copy().view(dt).reshape(n_points)

    by_name = {f[0].lower(): (f[1], f[2]) for f in fields}
    missing = [ax for ax in "xyz" if ax not in by_name]
    if missing:
        raise ValueError(f"PointCloud2 lacks fields {missing}")
    xyz = np.stack([column(*by_name[ax]).astype(np.float32)
                    for ax in "xyz"], axis=-1)

    t = None
    for name, unit in _TIME_FIELDS.items():
        if name in by_name:
            t = column(*by_name[name]).astype(np.float64) * unit
            if len(t):
                t = t - t.min()          # absolute stamps → scan-relative
            t = t.astype(np.float32)
            break

    ring = None
    for name in _RING_FIELDS:
        if name in by_name:
            ring = column(*by_name[name]).astype(np.int32)
            break
    return xyz, t, ring


def decode_livox_custommsg(points: Iterable) -> Tuple[np.ndarray, np.ndarray,
                                                      np.ndarray]:
    """livox_ros_driver/CustomMsg point list → (xyz, time_s, tag).

    Each point carries {x, y, z, offset_time (ns), tag, line} (reference
    avia_handler consumes the same fields, src/preprocess.cpp:139-232)."""
    pts = [(p.x, p.y, p.z, p.offset_time, p.tag) for p in points]
    if not pts:
        return (np.zeros((0, 3), np.float32), np.zeros(0, np.float32),
                np.zeros(0, np.uint8))
    a = np.array(pts, np.float64)
    return (a[:, :3].astype(np.float32),
            (a[:, 3] * 1e-9).astype(np.float32),
            a[:, 4].astype(np.uint8))


GRAVITY = 9.81


def assemble_npz(scans: Sequence[dict], imu: Sequence[Tuple[float, np.ndarray,
                                                            np.ndarray]],
                 out_path: str, imu_in_g: bool = False) -> dict:
    """Pack decoded frames + IMU stream into the read_npz_sequence schema."""
    arrays: dict = {}
    for k, s in enumerate(scans):
        arrays[f"scan{k}_xyz"] = np.asarray(s["xyz"], np.float32)
        if s.get("time") is not None:
            arrays[f"scan{k}_time"] = np.asarray(s["time"], np.float32)
        arrays[f"scan{k}_stamp"] = np.float64(s["stamp"])
    if imu:
        arrays["imu_stamps"] = np.array([m[0] for m in imu], np.float64)
        acc = np.stack([m[1] for m in imu]).astype(np.float32)
        if imu_in_g:                     # e.g. Livox built-in IMU emits g
            acc = acc * GRAVITY
        arrays["imu_acc"] = acc
        arrays["imu_gyr"] = np.stack([m[2] for m in imu]).astype(np.float32)
    np.savez_compressed(out_path, **arrays)
    return arrays


# ----------------------------------------------------------------------
# bag readers (import-guarded; run where ROS / rosbags exists)
# ----------------------------------------------------------------------

def convert_bag(bag_path: str, out_path: str, lidar_topic: str,
                imu_topic: str, imu_in_g: bool = False,
                max_frames: Optional[int] = None) -> int:
    """Convert one ROS1 bag.  Prefers the pure-python `rosbags` package,
    falls back to the ROS1 `rosbag` API.  Returns the frame count."""
    reader = _open_rosbags(bag_path) or _open_ros1(bag_path)
    if reader is None:
        raise RuntimeError(
            "no bag reader available — install `rosbags` (pip) or run "
            "inside a ROS1 environment with `rosbag`")
    scans, imu = [], []
    for topic, msg, stamp_s in reader:
        if topic == lidar_topic:
            if hasattr(msg, "fields"):          # sensor_msgs/PointCloud2
                n = msg.width * msg.height
                fields = [(f.name, f.offset, f.datatype) for f in msg.fields]
                xyz, t, _ = decode_pointcloud2(
                    bytes(msg.data), msg.point_step, n, fields)
            elif hasattr(msg, "points"):        # livox CustomMsg
                xyz, t, _ = decode_livox_custommsg(msg.points)
            else:
                raise ValueError(f"unsupported LiDAR message {type(msg)}")
            scans.append({"xyz": xyz, "time": t, "stamp": stamp_s})
            if max_frames and len(scans) >= max_frames:
                break
        elif topic == imu_topic:
            imu.append((
                stamp_s,
                np.array([msg.linear_acceleration.x,
                          msg.linear_acceleration.y,
                          msg.linear_acceleration.z], np.float32),
                np.array([msg.angular_velocity.x, msg.angular_velocity.y,
                          msg.angular_velocity.z], np.float32)))
    assemble_npz(scans, imu, out_path, imu_in_g)
    return len(scans)


def _open_rosbags(path: str):
    try:
        from rosbags.highlevel import AnyReader
        from pathlib import Path
    except ImportError:
        return None

    def gen():
        with AnyReader([Path(path)]) as r:
            for conn, ts, raw in r.messages():
                yield conn.topic, r.deserialize(raw, conn.msgtype), ts * 1e-9

    return gen()


def _open_ros1(path: str):
    try:
        import rosbag
    except ImportError:
        return None

    def gen():
        with rosbag.Bag(path) as b:
            for topic, msg, ts in b.read_messages():
                yield topic, msg, ts.to_sec()

    return gen()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("bag")
    ap.add_argument("out")
    ap.add_argument("--lidar-topic", default="/livox/lidar")
    ap.add_argument("--imu-topic", default="/livox/imu")
    ap.add_argument("--imu-in-g", action="store_true",
                    help="IMU acceleration is in g (Livox built-in IMU)")
    ap.add_argument("--max-frames", type=int, default=None)
    a = ap.parse_args(argv)
    n = convert_bag(a.bag, a.out, a.lidar_topic, a.imu_topic,
                    a.imu_in_g, a.max_frames)
    print(f"wrote {a.out}: {n} frames")
    return 0


if __name__ == "__main__":
    sys.exit(main())
