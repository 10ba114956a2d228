"""ctypes bindings for the native scan decoder (native/scanpack.cpp).

The reference's frontend is C++ (src/preprocess.cpp); our runtime keeps a
native path for the byte-level work — strided PointCloud2-style decode with
fused gates, bundle packing, and a lock-free IMU ring — with a NumPy fallback
when the library isn't built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libscanpack.so")

# field dtype codes matching scanpack.cpp
DTYPE_F32, DTYPE_F64, DTYPE_U32, DTYPE_U16, DTYPE_U8, DTYPE_I32 = range(6)


def _load(build_if_missing: bool = True):
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH)],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.scanpack_decode_filter.restype = ctypes.c_int64
    lib.scanpack_imu_ring_new.restype = ctypes.c_void_p
    lib.scanpack_imu_ring_push.restype = ctypes.c_int32
    lib.scanpack_imu_ring_drain.restype = ctypes.c_int64
    lib.scanpack_imu_ring_size.restype = ctypes.c_int64
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def decode_filter(buf: bytes | np.ndarray, n: int, point_step: int,
                  off_xyz: Tuple[int, int, int],
                  t_off: int = -1, t_dtype: int = DTYPE_F32,
                  t_scale: float = 1.0,
                  ring_off: int = -1, ring_dtype: int = DTYPE_U16,
                  blind: float = 0.1, max_range: float = 150.0,
                  filter_num: int = 1, want_ring: bool = False):
    """Fused strided decode + gates. Returns (xyz (M,3) f32, t (M,), ring?)."""
    lib = _load()
    raw = np.frombuffer(buf, np.uint8) if isinstance(buf, (bytes, bytearray)) \
        else np.ascontiguousarray(buf, np.uint8)
    if lib is None:
        return _decode_filter_numpy(
            raw, n, point_step, off_xyz, t_off, t_dtype, t_scale,
            ring_off, ring_dtype, blind, max_range, filter_num, want_ring)
    out_xyz = np.empty((n, 3), np.float32)
    out_t = np.empty(n, np.float32)
    out_ring = np.empty(n, np.int32) if want_ring else None
    m = lib.scanpack_decode_filter(
        _ptr(raw, ctypes.c_uint8), ctypes.c_int64(n),
        ctypes.c_int32(point_step),
        ctypes.c_int32(off_xyz[0]), ctypes.c_int32(off_xyz[1]),
        ctypes.c_int32(off_xyz[2]),
        ctypes.c_int32(t_off), ctypes.c_int32(t_dtype),
        ctypes.c_double(t_scale),
        ctypes.c_int32(ring_off), ctypes.c_int32(ring_dtype),
        ctypes.c_float(blind * blind), ctypes.c_float(max_range * max_range),
        ctypes.c_int32(filter_num),
        _ptr(out_xyz, ctypes.c_float), _ptr(out_t, ctypes.c_float),
        _ptr(out_ring, ctypes.c_int32) if want_ring else None,
        ctypes.c_int64(n))
    if want_ring:
        return out_xyz[:m], out_t[:m], out_ring[:m]
    return out_xyz[:m], out_t[:m]


_NP_DTYPES = {DTYPE_F32: "<f4", DTYPE_F64: "<f8", DTYPE_U32: "<u4",
              DTYPE_U16: "<u2", DTYPE_U8: "u1", DTYPE_I32: "<i4"}


def _decode_filter_numpy(raw, n, step, off_xyz, t_off, t_dtype, t_scale,
                         ring_off, ring_dtype, blind, max_range,
                         filter_num, want_ring):
    """Pure-NumPy reference implementation (also the test oracle)."""
    def field(off, dt):
        sz = np.dtype(_NP_DTYPES[dt]).itemsize
        b = np.lib.stride_tricks.as_strided(
            raw[off:], shape=(n, sz), strides=(step, 1))
        return b.copy().view(_NP_DTYPES[dt]).reshape(n)

    xyz = np.stack([field(o, DTYPE_F32) for o in off_xyz], -1)
    idx = np.arange(0, n, max(filter_num, 1))
    xyz = xyz[idx]
    t = (field(t_off, t_dtype)[idx].astype(np.float64) * t_scale
         ).astype(np.float32) if t_off >= 0 else np.zeros(len(idx), np.float32)
    ring = field(ring_off, ring_dtype)[idx].astype(np.int32) \
        if ring_off >= 0 else np.zeros(len(idx), np.int32)
    r2 = np.einsum("ij,ij->i", xyz, xyz)
    keep = np.isfinite(xyz).all(1) & (r2 > blind ** 2) & (r2 < max_range ** 2)
    xyz, t, ring = xyz[keep], t[keep], ring[keep]
    if t_off >= 0 and len(t):
        t = t - t.min()
    if want_ring:
        return xyz.astype(np.float32), t, ring
    return xyz.astype(np.float32), t


class ImuRing:
    """Lock-free SPSC IMU buffer backed by the native ring (falls back to a
    Python list when the library isn't built)."""

    def __init__(self, cap: int = 4096):
        self._lib = _load()
        self.cap = cap
        if self._lib:
            self._h = ctypes.c_void_p(self._lib.scanpack_imu_ring_new(
                ctypes.c_int64(cap)))
        else:
            self._buf = []

    def push(self, stamp: float, acc, gyr) -> bool:
        if self._lib:
            a = np.asarray(acc, np.float32)
            g = np.asarray(gyr, np.float32)
            return bool(self._lib.scanpack_imu_ring_push(
                self._h, ctypes.c_double(stamp),
                _ptr(a, ctypes.c_float), _ptr(g, ctypes.c_float)))
        self._buf.append((stamp, np.asarray(acc, np.float32),
                          np.asarray(gyr, np.float32)))
        return True

    def drain_until(self, t: float, max_out: int = 4096):
        if self._lib:
            s = np.empty(max_out, np.float64)
            a = np.empty((max_out, 3), np.float32)
            g = np.empty((max_out, 3), np.float32)
            m = self._lib.scanpack_imu_ring_drain(
                self._h, ctypes.c_double(t), ctypes.c_int64(max_out),
                _ptr(s, ctypes.c_double), _ptr(a, ctypes.c_float),
                _ptr(g, ctypes.c_float))
            return s[:m], a[:m], g[:m]
        out = [x for x in self._buf if x[0] <= t][:max_out]
        self._buf = self._buf[len(out):]
        if not out:
            return (np.zeros(0), np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.float32))
        return (np.array([o[0] for o in out]),
                np.stack([o[1] for o in out]),
                np.stack([o[2] for o in out]))

    def __len__(self) -> int:
        if self._lib:
            return int(self._lib.scanpack_imu_ring_size(self._h))
        return len(self._buf)

    def __del__(self):
        if getattr(self, "_lib", None) and getattr(self, "_h", None):
            self._lib.scanpack_imu_ring_free(self._h)


# Common sensor buffer layouts (PointCloud2 field offsets, reference
# point-type registrations preprocess.h:95-149)
LAYOUTS = {
    # name: (point_step, (x,y,z) offsets, t_off, t_dtype, t_scale, ring_off, ring_dtype)
    # Packed driver-wire variants (PointCloud2 fields laid end-to-end):
    "velodyne": (22, (0, 4, 8), 18, DTYPE_F32, 1.0, 16, DTYPE_U16),
    "hesai_xt32": (26, (0, 4, 8), 18, DTYPE_F64, 1.0, 16, DTYPE_U16),
    "livox": (18, (0, 4, 8), 14, DTYPE_F32, 1e-3, -1, DTYPE_U8),
    # C++-padded struct layouts exactly as the reference registers them
    # (reference src/preprocess.h:95-149; PCL_ADD_POINT4D = x,y,z + 4 B pad,
    # EIGEN_ALIGN16 rounds sizeof to 16) — what pcl::toROSMsg serializes:
    #   ouster_ros::Point  {xyzw, intensity@16, t u32@20, reflectivity@24,
    #                       ring u8@26, ambient@28, range u32@32} → 48 B
    #   velodyne_ros::Point{xyzw, intensity@16, time f32@20, ring@24} → 32 B
    #   xt32_ros::Point    {xyzw, intensity@16, timestamp f64@24 (8-aligned),
    #                       ring@32} → 48 B
    "ouster64": (48, (0, 4, 8), 20, DTYPE_U32, 1e-9, 26, DTYPE_U8),
    "velodyne_pcl": (32, (0, 4, 8), 20, DTYPE_F32, 1.0, 24, DTYPE_U16),
    "xt32_pcl": (48, (0, 4, 8), 24, DTYPE_F64, 1.0, 32, DTYPE_U16),
    # livox_ros_driver CustomMsg CustomPoint wire layout (the message the
    # reference's avia_handler consumes, preprocess.cpp:139): offset_time
    # u32 ns @0, x/y/z f32 @4/8/12, reflectivity u8 @16, tag @17, line @18
    "livox_custommsg": (19, (4, 8, 12), 0, DTYPE_U32, 1e-9, 18, DTYPE_U8),
}
