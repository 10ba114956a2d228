"""Native scanpack library tests: C++ decode vs NumPy oracle, IMU ring."""

import numpy as np
import pytest

from immesh_tpu.frontend import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        pytest.skip("native scanpack not built and no compiler available")


def _velodyne_buffer(n, seed=0):
    """Synthetic PointCloud2-style buffer in the velodyne layout."""
    rng = np.random.default_rng(seed)
    step, (ox, oy, oz), t_off, _, _, ring_off, _ = \
        (22, (0, 4, 8), 18, 0, 1.0, 16, 3)
    buf = np.zeros((n, step), np.uint8)
    xyz = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    xyz[5] = np.nan                       # invalid row
    xyz[6] = [0.05, 0.0, 0.0]             # inside blind
    t = rng.uniform(0, 0.1, n).astype(np.float32)
    ring = rng.integers(0, 32, n).astype(np.uint16)
    buf[:, ox:ox + 4] = xyz[:, 0:1].view(np.uint8).reshape(n, 4)
    buf[:, oy:oy + 4] = xyz[:, 1:2].view(np.uint8).reshape(n, 4)
    buf[:, oz:oz + 4] = xyz[:, 2:3].view(np.uint8).reshape(n, 4)
    buf[:, t_off:t_off + 4] = t[:, None].view(np.uint8).reshape(n, 4)
    buf[:, ring_off:ring_off + 2] = ring[:, None].view(np.uint8).reshape(n, 2)
    return buf.tobytes(), xyz, t, ring


class TestDecode:
    def test_matches_numpy_oracle(self):
        n = 1000
        buf, xyz, t, ring = _velodyne_buffer(n)
        step, off_xyz, t_off, t_dt, t_sc, ring_off, ring_dt = \
            native.LAYOUTS["velodyne"]
        kw = dict(point_step=step, off_xyz=off_xyz, t_off=t_off,
                  t_dtype=t_dt, t_scale=t_sc, ring_off=ring_off,
                  ring_dtype=ring_dt, blind=1.0, max_range=100.0,
                  want_ring=True)
        cx, ct, cr = native.decode_filter(buf, n, **kw)
        raw = np.frombuffer(buf, np.uint8)
        nx, nt, nr = native._decode_filter_numpy(
            raw, n, step, off_xyz, t_off, t_dt, t_sc, ring_off, ring_dt,
            1.0, 100.0, 1, True)
        np.testing.assert_array_equal(cx, nx)
        np.testing.assert_allclose(ct, nt, atol=1e-6)
        np.testing.assert_array_equal(cr, nr)
        # gates actually dropped the bad rows
        assert len(cx) < n
        assert np.isfinite(cx).all()

    def test_decimation(self):
        n = 999
        buf, *_ = _velodyne_buffer(n, seed=1)
        step, off_xyz, t_off, t_dt, t_sc, ring_off, ring_dt = \
            native.LAYOUTS["velodyne"]
        full, _ = native.decode_filter(
            buf, n, point_step=step, off_xyz=off_xyz, blind=1.0,
            max_range=100.0)
        dec, _ = native.decode_filter(
            buf, n, point_step=step, off_xyz=off_xyz, blind=1.0,
            max_range=100.0, filter_num=3)
        assert len(dec) < 0.5 * len(full)

    def test_time_rebased(self):
        n = 100
        buf, _, t, _ = _velodyne_buffer(n, seed=2)
        step, off_xyz, t_off, t_dt, t_sc, ring_off, ring_dt = \
            native.LAYOUTS["velodyne"]
        _, ct = native.decode_filter(
            buf, n, point_step=step, off_xyz=off_xyz, t_off=t_off,
            t_dtype=t_dt, blind=1.0, max_range=100.0)
        assert ct.min() == 0.0


class TestImuRing:
    def test_push_drain(self):
        ring = native.ImuRing(cap=64)
        for k in range(20):
            assert ring.push(k * 0.01, [0, 0, 9.8], [0.1 * k, 0, 0])
        assert len(ring) == 20
        s, a, g = ring.drain_until(0.095)
        assert len(s) == 10
        np.testing.assert_allclose(s, np.arange(10) * 0.01)
        np.testing.assert_allclose(g[:, 0], 0.1 * np.arange(10), atol=1e-6)
        assert len(ring) == 10

    def test_full_rejects(self):
        ring = native.ImuRing(cap=4)
        for k in range(4):
            assert ring.push(float(k), [0, 0, 0], [0, 0, 0])
        assert not ring.push(5.0, [0, 0, 0], [0, 0, 0])
        ring.drain_until(10.0)
        assert ring.push(6.0, [0, 0, 0], [0, 0, 0])
