"""Packet-level frontend fixtures (VERDICT round-1 item 7): every LAYOUTS
entry decodes a hand-built real-format byte buffer bit-exactly, and the
rosbag→npz converter's ROS-free core (tools/rosbag_to_npz.py) round-trips
through read_npz_sequence.  Mirrors the reference's per-sensor handlers
(reference src/preprocess.cpp:139-898)."""

import os
import sys

import numpy as np
import pytest

from immesh_tpu.frontend import native
from immesh_tpu.frontend.preprocess import (
    Preprocessor, decode_raw_buffer, read_npz_sequence,
)
from immesh_tpu.config import LidarType, PreprocessConfig

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import rosbag_to_npz as conv  # noqa: E402


_NP_OF = {native.DTYPE_F32: "<f4", native.DTYPE_F64: "<f8",
          native.DTYPE_U32: "<u4", native.DTYPE_U16: "<u2",
          native.DTYPE_U8: "u1", native.DTYPE_I32: "<i4"}


def _build_packet(layout: str, n: int, seed: int = 0):
    """Hand-build a strided sensor buffer in the given layout with known
    xyz / per-point time / ring values."""
    step, (ox, oy, oz), t_off, t_dt, t_sc, ring_off, ring_dt = \
        native.LAYOUTS[layout]
    rng = np.random.default_rng(seed)
    buf = np.zeros((n, step), np.uint8)

    xyz = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    for off, col in ((ox, 0), (oy, 1), (oz, 2)):
        buf[:, off:off + 4] = xyz[:, col:col + 1].view(np.uint8).reshape(n, 4)

    # raw time values in the sensor's native unit (pre t_scale)
    t_np = np.dtype(_NP_OF[t_dt])
    if t_np.kind == "u":
        t_raw = (rng.uniform(0, 0.1, n) / t_sc).astype(t_np)
    else:
        t_raw = (rng.uniform(0, 0.1, n) / t_sc).astype(t_np)
    buf[:, t_off:t_off + t_np.itemsize] = (
        t_raw[:, None].view(np.uint8).reshape(n, t_np.itemsize))

    ring = None
    if ring_off >= 0:
        r_np = np.dtype(_NP_OF[ring_dt])
        ring = rng.integers(0, 64, n).astype(r_np)
        buf[:, ring_off:ring_off + r_np.itemsize] = (
            ring[:, None].view(np.uint8).reshape(n, r_np.itemsize))
    return buf.tobytes(), xyz, t_raw, ring


@pytest.mark.parametrize("layout", sorted(native.LAYOUTS))
class TestLayoutGolden:
    def test_bit_exact_decode(self, layout):
        """Decoded xyz must be BIT-exact; time = raw·t_scale rebased; ring
        passes through exactly (reference handlers copy fields verbatim,
        preprocess.cpp:277-898)."""
        n = 256
        buf, xyz, t_raw, ring = _build_packet(layout, n)
        step, off_xyz, t_off, t_dt, t_sc, ring_off, ring_dt = \
            native.LAYOUTS[layout]
        dx, dt, dr = native.decode_filter(
            buf, n, point_step=step, off_xyz=off_xyz, t_off=t_off,
            t_dtype=t_dt, t_scale=t_sc, ring_off=ring_off,
            ring_dtype=ring_dt, blind=0.0, max_range=1e9, want_ring=True)
        assert len(dx) == n
        np.testing.assert_array_equal(
            dx.view(np.uint8), xyz.view(np.uint8))  # bit-exact
        t_want = t_raw.astype(np.float64) * t_sc
        t_want = (t_want - t_want.min()).astype(np.float32)
        np.testing.assert_allclose(dt, t_want, atol=2e-7)
        if ring is not None:
            np.testing.assert_array_equal(dr, ring.astype(np.int32))

    def test_gates(self, layout):
        """Blind / max-range / NaN gates drop exactly the bad rows."""
        n = 64
        buf, xyz, _, _ = _build_packet(layout, n, seed=1)
        step, off_xyz, t_off, t_dt, t_sc, ring_off, ring_dt = \
            native.LAYOUTS[layout]
        bad = np.array(bytearray(buf)).reshape(n, step)
        nanrow = np.full(3, np.nan, np.float32).view(np.uint8)
        bad[3, off_xyz[0]:off_xyz[0] + 12] = nanrow
        blindrow = np.array([0.01, 0, 0], np.float32).view(np.uint8)
        bad[7, off_xyz[0]:off_xyz[0] + 12] = blindrow
        dx, _ = native.decode_filter(
            bad.tobytes(), n, point_step=step, off_xyz=off_xyz,
            blind=0.5, max_range=1e3)
        r = np.linalg.norm(xyz, axis=1)
        want = int(np.sum((r > 0.5) & (r < 1e3))) - 2 + int(
            not (0.5 < r[3] < 1e3)) + int(not (0.5 < r[7] < 1e3))
        assert len(dx) == want

    def test_decode_raw_buffer_path(self, layout):
        """The public decode_raw_buffer → Preprocessor path produces
        in-range scan-relative times."""
        n = 128
        buf, xyz, _, _ = _build_packet(layout, n, seed=2)
        cfg = PreprocessConfig(lidar_type=LidarType.VELO32, blind=0.5,
                               max_range=1000.0)
        scan = decode_raw_buffer(buf, n, layout, cfg, duration=0.1)
        pts, t_rel = Preprocessor(cfg).process(scan)
        assert len(pts) > 0.8 * n
        assert t_rel.min() >= 0.0 and t_rel.max() <= 0.11


# ----------------------------------------------------------------------
# rosbag→npz converter core (ROS-free)
# ----------------------------------------------------------------------

def _pc2_payload(n, fields_spec, point_step, seed=0):
    """Build a PointCloud2-style payload given (name, offset, code, values)."""
    buf = np.zeros((n, point_step), np.uint8)
    for name, off, code, vals in fields_spec:
        dt = np.dtype(conv._PF_DTYPES[code])
        v = np.asarray(vals, dt)
        buf[:, off:off + dt.itemsize] = v[:, None].view(np.uint8).reshape(
            n, dt.itemsize)
    return buf.tobytes()


class TestPointCloud2Decode:
    def test_ouster_style_u32_ns(self):
        n = 100
        rng = np.random.default_rng(0)
        xyz = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
        t_ns = np.arange(n, dtype=np.uint32) * 100_000       # 0.1 ms steps
        ring = np.arange(n, dtype=np.uint16) % 64
        data = _pc2_payload(n, [
            ("x", 0, 7, xyz[:, 0]), ("y", 4, 7, xyz[:, 1]),
            ("z", 8, 7, xyz[:, 2]), ("t", 16, 6, t_ns),
            ("ring", 22, 4, ring)], 48)
        fields = [("x", 0, 7), ("y", 4, 7), ("z", 8, 7), ("t", 16, 6),
                  ("ring", 22, 4)]
        dx, dt, drg = conv.decode_pointcloud2(data, 48, n, fields)
        np.testing.assert_array_equal(dx, xyz)
        np.testing.assert_allclose(dt, t_ns * 1e-9, atol=1e-9)
        np.testing.assert_array_equal(drg, ring.astype(np.int32))

    def test_hesai_absolute_f64_rebased(self):
        n = 50
        xyz = np.ones((n, 3), np.float32)
        stamps = 1.7e9 + np.linspace(0, 0.1, n)               # absolute s
        data = _pc2_payload(n, [
            ("x", 0, 7, xyz[:, 0]), ("y", 4, 7, xyz[:, 1]),
            ("z", 8, 7, xyz[:, 2]), ("timestamp", 18, 8, stamps)], 26)
        fields = [("x", 0, 7), ("y", 4, 7), ("z", 8, 7),
                  ("timestamp", 18, 8)]
        _, dt, _ = conv.decode_pointcloud2(data, 26, n, fields)
        np.testing.assert_allclose(dt, stamps - stamps[0], atol=1e-6)

    def test_missing_xyz_raises(self):
        with pytest.raises(ValueError, match="lacks fields"):
            conv.decode_pointcloud2(b"", 16, 0, [("x", 0, 7), ("y", 4, 7)])


class _Pt:
    def __init__(self, x, y, z, off_ns, tag):
        self.x, self.y, self.z = x, y, z
        self.offset_time, self.tag = off_ns, tag


class TestLivoxCustomMsg:
    def test_decode(self):
        pts = [_Pt(1.0, 2.0, 3.0, 0, 16), _Pt(4.0, 5.0, 6.0, 50_000_000, 0)]
        xyz, t, tag = conv.decode_livox_custommsg(pts)
        np.testing.assert_array_equal(xyz, [[1, 2, 3], [4, 5, 6]])
        np.testing.assert_allclose(t, [0.0, 0.05])
        np.testing.assert_array_equal(tag, [16, 0])


class TestNpzRoundTrip:
    def test_assemble_then_read(self, tmp_path):
        rng = np.random.default_rng(1)
        scans = [{"xyz": rng.uniform(-5, 5, (64, 3)).astype(np.float32),
                  "time": np.linspace(0, 0.1, 64, dtype=np.float32),
                  "stamp": 10.0 + 0.1 * k} for k in range(3)]
        imu = [(10.0 + 0.01 * i, np.array([0, 0, 1.0], np.float32),
                np.zeros(3, np.float32)) for i in range(30)]
        out = tmp_path / "seq.npz"
        conv.assemble_npz(scans, imu, str(out), imu_in_g=True)

        frames = list(read_npz_sequence(str(out)))
        assert len(frames) == 3
        s0, imu0 = frames[0]
        np.testing.assert_array_equal(s0.xyz, scans[0]["xyz"])
        assert s0.stamp == 10.0
        # g → m/s² conversion applied
        assert abs(imu0["acc"][0, 2] - conv.GRAVITY) < 1e-6
        # imu windows are scan-relative and in range
        assert imu0["stamps"].min() >= 0.0
