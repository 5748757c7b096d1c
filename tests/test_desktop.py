"""Desktop frontend (`frontends/desktop.py`) — headless-core tests.

The Tk shell is a thin adapter; everything it does per frame routes through
`DesktopFrontend.feed_*` / `render_frame()` / `drain_notifications()`,
driven here without a display against the hermetic backend fixture
(reference counterpart: `topo-renderer-desktop/src/main.rs:7-66`).
"""

import numpy as np
import pytest

from tests.test_backend_pipeline import make_fixtures
from topo_renderer_tpu.backend.server import BackendServer
from topo_renderer_tpu.config import Settings
from topo_renderer_tpu.frontends.desktop import DesktopFrontend
from topo_renderer_tpu.geo import GeoCoord


@pytest.fixture()
def backend(tmp_path):
    loc, heights = make_fixtures(tmp_path)
    settings = Settings(address="127.0.0.1", port=0, data_dir=str(tmp_path))
    server = BackendServer(settings)
    server.start()
    yield server, loc, heights
    server.stop()


def test_desktop_core_free_fly(backend):
    server, loc, _ = backend
    fe = DesktopFrontend(Settings(backend_url=server.url), width=96, height=64)
    try:
        fe.app.start(GeoCoord(49.35135, 20.21139))
        fe.app.wait_for_terrain(timeout=60)

        frame = fe.render_frame()
        assert frame is not None and frame.shape == (64, 96, 3)
        assert frame.dtype == np.uint8

        # Keyboard free-fly: hold W via the Tk keysym mapping; the camera
        # must advance between frames.
        eye0 = np.asarray(fe.app.data.camera.eye, np.float64)
        fe.feed_key("w", True)
        fe.render_frame()
        fe.feed_key("w", False)
        eye1 = np.asarray(fe.app.data.camera.eye, np.float64)
        assert np.linalg.norm(eye1 - eye0) > 0.05

        # Right-drag look: yaw/pitch change through the shared controller.
        yaw0 = float(fe.app.data.camera.yaw)
        pitch0 = float(fe.app.data.camera.pitch)
        fe.feed_mouse_button("right", True)
        fe.feed_mouse_position(40.0, 30.0)
        fe.feed_mouse_position(70.0, 18.0)
        fe.feed_mouse_button("right", False)
        fe.render_frame()
        assert (
            abs(float(fe.app.data.camera.yaw) - yaw0) > 1e-4
            or abs(float(fe.app.data.camera.pitch) - pitch0) > 1e-4
        )

        # Unknown keysyms are ignored, not crashes.
        fe.feed_key("Caps_Lock", True)

        # Notifications surface as a status line.
        status = fe.drain_notifications()
        assert isinstance(status, str)
    finally:
        fe.app.shutdown()


def test_desktop_release_stops_drag(backend):
    server, _, _ = backend
    fe = DesktopFrontend(Settings(backend_url=server.url), width=48, height=32)
    try:
        fe.app.start(GeoCoord(49.35135, 20.21139))
        fe.app.wait_for_terrain(timeout=60)
        fe.render_frame()
        fe.feed_mouse_button("right", True)
        fe.feed_mouse_position(10.0, 10.0)
        fe.feed_mouse_button("right", False)
        yaw0 = float(fe.app.data.camera.yaw)
        # Motion after release must not look (drag anchor cleared).
        fe.feed_mouse_position(40.0, 40.0)
        fe.render_frame()
        assert float(fe.app.data.camera.yaw) == pytest.approx(yaw0, abs=1e-6)
    finally:
        fe.app.shutdown()
