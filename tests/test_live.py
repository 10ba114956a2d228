"""Live mesh viewer (render/live.py): dirty-region host cache + HTTP server —
the TPU-native stand-in for the reference's GUI sync thread + per-region VBOs
(mesh_rec_display.cpp:220-282)."""

import http.client
import json
import struct

import numpy as np
import pytest

import jax.numpy as jnp

from immesh_tpu.config import PRESETS
from immesh_tpu.mesh.pipeline import MeshPipeline
from immesh_tpu.render.live import _MAGIC, LiveMeshServer, RegionCache


@pytest.fixture(scope="module")
def meshed():
    """A small meshed pipeline: two noisy ground-plane frames."""
    cfg = PRESETS["sim"]()
    cfg = cfg.replace(mesh=cfg.mesh.__class__(
        points_capacity=2 ** 14, voxel_capacity=2 ** 10,
        active_voxels_per_frame=64, mesh_chunk=8))
    pipe = MeshPipeline(cfg)
    rng = np.random.default_rng(3)
    for _ in range(2):
        pts = rng.uniform(-3, 3, (2048, 3)).astype(np.float32)
        pts[:, 2] = 0.01 * rng.standard_normal(2048)
        pipe.step(jnp.asarray(pts), jnp.ones(2048, bool),
                  jnp.zeros(3, jnp.float32))
    return cfg, pipe


class TestRegionCache:
    def test_sync_drains_dirty_and_builds_regions(self, meshed):
        cfg, pipe = meshed
        cache = RegionCache(cfg.mesh.region_size, cfg.mesh.voxel_resolution)
        store = cache.sync(pipe.gm, pipe.store)
        st = cache.stats()
        assert st["n_triangles"] > 0
        assert st["n_regions"] >= 1
        assert st["seq"] == 1
        # the returned store has its dirty flags cleared
        assert not np.asarray(store.dirty).any()
        # second sync with nothing dirty is a no-op
        seq0 = cache.seq
        cache.sync(pipe.gm, store)
        assert cache.seq == seq0

    def test_region_bytes_roundtrip(self, meshed):
        cfg, pipe = meshed
        # smoothing off: region membership is exact on RAW vertex positions
        # (the display-time Laplacian can drag a borderline centroid a few
        # centimetres across a region face — cosmetic, not an ownership bug)
        cache = RegionCache(cfg.mesh.region_size, cfg.mesh.voxel_resolution,
                            smooth_lam=0.0)
        cache.sync(pipe.gm, pipe.store)
        rid = cache.changed_since(0)[0]
        raw = cache.region_bytes(rid)
        magic, rx, ry, rz, n = struct.unpack_from("<Iiiii", raw)
        assert magic == _MAGIC and (rx, ry, rz) == rid
        tris = np.frombuffer(raw, "<f4", offset=20).reshape(n, 3, 3)
        assert np.isfinite(tris).all()
        # every triangle's centroid lies inside its 10 m region cube
        cen = tris.mean(axis=1)
        np.testing.assert_array_equal(
            np.floor(cen / cfg.mesh.region_size).astype(int),
            np.tile(rid, (n, 1)))

    def test_changed_since_tracks_seq(self, meshed):
        cfg, pipe = meshed
        cache = RegionCache(cfg.mesh.region_size, cfg.mesh.voxel_resolution)
        cache.sync(pipe.gm, pipe.store)
        assert cache.changed_since(0)
        assert cache.changed_since(cache.seq) == []


class TestServer:
    def _get(self, port, path):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", path)
        r = conn.getresponse()
        body = r.read()
        conn.close()
        return r.status, body

    def test_endpoints(self, meshed):
        cfg, pipe = meshed
        cache = RegionCache(cfg.mesh.region_size, cfg.mesh.voxel_resolution)
        cache.sync(pipe.gm, pipe.store)
        srv = LiveMeshServer(cache).start()
        try:
            srv.record_pose(0.1, [1.0, 2.0, 3.0])
            code, html = self._get(srv.port, "/")
            assert code == 200 and b"webgl2" in html
            code, body = self._get(srv.port, "/state?since=0")
            st = json.loads(body)
            assert st["n_triangles"] > 0 and st["changed"]
            assert st["traj"][0][1:4] == [1.0, 2.0, 3.0]
            rid = st["changed"][0]
            code, raw = self._get(srv.port, f"/region/{rid[0]},{rid[1]},{rid[2]}")
            assert code == 200
            assert struct.unpack_from("<I", raw)[0] == _MAGIC
            code, _ = self._get(srv.port, "/region/not,a,number")
            assert code == 400
            code, _ = self._get(srv.port, "/nope")
            assert code == 404
            # since=seq → nothing new
            code, body = self._get(srv.port, f"/state?since={st['seq']}")
            assert json.loads(body)["changed"] == []
        finally:
            srv.stop()

    def test_planes_endpoint_and_overlay_controls(self, meshed):
        """Plane-map overlay (VERDICT r3 item 8 / pubPlaneMap analogue):
        extract_planes yields sane patches from a live VoxelMap, the server
        publishes them on /planes, and the draw_planes toggle + runtime-
        mutable reinforcement params round-trip through /controls."""
        import numpy as np
        from immesh_tpu.config import PRESETS
        from immesh_tpu.frontend.sim import LidarImuSimulator
        from immesh_tpu.frontend.types import ScanBundle
        from immesh_tpu.lio.pipeline import LioPipeline
        from immesh_tpu.render.live import extract_planes

        cfg, pipe = meshed
        sim = LidarImuSimulator(n_rays=2048, seed=0)
        cfg2 = PRESETS["sim"]()
        lio = LioPipeline(cfg2)
        lio.static_init(*sim.static_imu(50))
        for k in range(3):
            f = sim.frame(k)
            lio.step(ScanBundle.from_numpy(
                f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
                f.scan_duration, cfg2.preprocess.max_points,
                cfg2.imu.max_imu_per_scan))
        planes = extract_planes(lio.vm)
        assert planes.shape[0] > 0 and planes.shape[1] == 8
        nrm = np.linalg.norm(planes[:, 3:6], axis=1)
        assert np.allclose(nrm, 1.0, atol=1e-3)          # unit normals
        assert (planes[:, 6] > 0).all()                  # positive extents
        assert (planes[:, 7] >= 0).all()                 # min-eig ≥ 0

        cache = RegionCache(cfg.mesh.region_size, cfg.mesh.voxel_resolution)
        srv = LiveMeshServer(cache).start()
        try:
            srv.record_planes(planes)
            code, raw = self._get(srv.port, "/planes")
            assert code == 200
            (m,) = struct.unpack_from("<i", raw)
            assert m == planes.shape[0]
            got = np.frombuffer(raw[4:], np.float32).reshape(m, 8)
            np.testing.assert_array_equal(got, planes)
            # toggle + reinforcement params are runtime-mutable controls
            assert srv.controls["draw_planes"] is False
            srv.set_control("draw_planes", True)
            srv.set_control("reinf_step", 4)
            srv.set_control("reinf_max_depth", 40.0)
            c = srv.controls
            assert c["draw_planes"] and c["reinf_step"] == 4
            assert c["reinf_max_depth"] == 40.0
            # viewer HTML carries the plane layer + key binding
            _, html = self._get(srv.port, "/")
            assert b"draw_planes" in html and b"buildPlanes" in html
        finally:
            srv.stop()

    @pytest.mark.slow  # ~8-10 s; default gate keeps a faster sibling
    def test_runtime_integration(self):
        """ImMeshRuntime.start_live_viewer serves the live mesh."""
        from immesh_tpu.frontend.sim import LidarImuSimulator
        from immesh_tpu.frontend.types import ScanBundle
        from immesh_tpu.runtime.app import ImMeshRuntime

        cfg = PRESETS["sim"]()
        cfg = cfg.replace(
            preprocess=cfg.preprocess.__class__(
                lidar_type=cfg.preprocess.lidar_type, max_points=2048),
            mesh=cfg.mesh.__class__(
                points_capacity=2 ** 14, voxel_capacity=2 ** 10,
                active_voxels_per_frame=64, mesh_chunk=8))
        rt = ImMeshRuntime(cfg)
        sim = LidarImuSimulator(n_rays=2048, seed=0)
        rt.static_init(*sim.static_imu(100))
        url = rt.start_live_viewer(sync_every=1)
        try:
            for k in range(2):
                f = sim.frame(k)
                b = ScanBundle.from_numpy(
                    f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
                    f.scan_duration, 2048, cfg.imu.max_imu_per_scan)
                rt.process_frame(b, t=0.1 * k)
            port = int(url.rsplit(":", 1)[1].rstrip("/"))
            code, body = self._get(port, "/state?since=0")
            st = json.loads(body)
            assert code == 200
            assert st["n_triangles"] > 0
            assert len(st["traj"]) == 2
        finally:
            rt.stop_live_viewer()


class TestControls:
    """Runtime-mutable controls — the reference's GUI-mutable parameter set
    (pause / draw toggles / follow cam, ImMesh_node.cpp:360-432) exposed over
    the same HTTP server."""

    def _req(self, port, method, path, body=None):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request(method, path, body=body)
        r = conn.getresponse()
        raw = r.read()
        conn.close()
        return r.status, raw

    def test_get_defaults_and_post_updates(self, meshed):
        cfg, pipe = meshed
        cache = RegionCache(cfg.mesh.region_size, cfg.mesh.voxel_resolution)
        srv = LiveMeshServer(cache).start()
        try:
            code, body = self._req(srv.port, "GET", "/controls")
            assert code == 200
            ctl = json.loads(body)
            assert ctl == {"pause": False, "draw_mesh": True,
                           "draw_traj": True, "draw_planes": False,
                           "follow": True,
                           "reinf_step": 2, "reinf_max_depth": 80.0}
            # POST flips pause; unknown keys are ignored, not errors
            code, body = self._req(
                srv.port, "POST", "/controls",
                json.dumps({"pause": True, "bogus": 1}).encode())
            assert code == 200
            assert json.loads(body)["pause"] is True
            assert "bogus" not in json.loads(body)
            assert srv.paused
            # malformed body → 400, state unchanged
            code, _ = self._req(srv.port, "POST", "/controls", b"{nope")
            assert code == 400
            assert srv.controls["pause"] is True
            # host-side setter round-trips too
            srv.set_control("pause", False)
            assert not srv.paused
            with pytest.raises(KeyError):
                srv.set_control("nonexistent", 1)
        finally:
            srv.stop()

    @pytest.mark.slow
    def test_runtime_pause_blocks_run(self, meshed):
        """ImMeshRuntime.run waits while the live viewer's pause is set."""
        import threading
        import time as _time
        from immesh_tpu.frontend.sim import LidarImuSimulator
        from immesh_tpu.frontend.types import ScanBundle
        from immesh_tpu.runtime.app import ImMeshRuntime

        cfg = PRESETS["sim"]()
        cfg = cfg.replace(
            preprocess=cfg.preprocess.__class__(
                lidar_type=cfg.preprocess.lidar_type, max_points=1024),
            mesh=cfg.mesh.__class__(
                points_capacity=2 ** 14, voxel_capacity=2 ** 10,
                active_voxels_per_frame=64, mesh_chunk=8))
        rt = ImMeshRuntime(cfg)
        sim = LidarImuSimulator(n_rays=1024, seed=0)
        rt.static_init(*sim.static_imu(100))
        rt.start_live_viewer()
        try:
            rt._live.set_control("pause", True)
            assert rt.paused

            def bundle(k):
                f = sim.frame(k)
                return ScanBundle.from_numpy(
                    f.pts, f.t_rel, f.imu_stamps, f.imu_acc, f.imu_gyr,
                    f.scan_duration, 1024, cfg.imu.max_imu_per_scan)

            done = []
            th = threading.Thread(
                target=lambda: done.extend(rt.run([bundle(0), bundle(1)])))
            th.start()
            _time.sleep(0.3)
            assert not done          # paused: no frame processed yet
            rt._live.set_control("pause", False)
            th.join(timeout=60)
            assert len(done) == 2    # resumed and finished
        finally:
            rt.stop_live_viewer()
