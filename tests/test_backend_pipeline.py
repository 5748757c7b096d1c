"""Hermetic end-to-end data pipeline: backend server -> fetch -> decode ->
background runner -> engine -> rendered frame.

Covers the reference's L1 service protocol (`topo-backend/src/main.rs`) and
the L3 async pipeline (`background_runner.rs`) against synthetic GeoTIFF
fixtures — the test strategy SURVEY §4 calls for (the reference never tested
this path).
"""

import numpy as np
import pytest

from topo_renderer_tpu.backend.server import (
    BackendServer,
    dem_file_name,
    peaks_file_name,
)
from topo_renderer_tpu.config import Settings
from topo_renderer_tpu.data.background import BackgroundRunner, DataRequested, fetch_terrain
from topo_renderer_tpu.data.fetch import get_peaks_from_http, get_tiff_from_http
from topo_renderer_tpu.data.tiff import write_geotiff
from topo_renderer_tpu.geo import GeoCoord, GeoLocation

TILE_N = 61
SPAN = 1.0


def make_fixtures(tmp_path):
    """A 49N/20E synthetic tile + peaks CSV laid out as the backend expects."""
    loc = GeoLocation.from_coord(49, 20)
    ps = SPAN / (TILE_N - 1)
    rng = np.random.default_rng(5)
    heights = rng.normal(1200.0, 150.0, (TILE_N, TILE_N)).astype(np.float32)

    dem_path = tmp_path / dem_file_name(loc)
    dem_path.parent.mkdir(parents=True, exist_ok=True)
    dem_path.write_bytes(
        write_geotiff(heights, (ps, ps, 0.0), (0.0, 0.0, 0.0, 20.0, 50.0, 0.0))
    )

    peaks_path = tmp_path / peaks_file_name(loc)
    peaks_path.parent.mkdir(parents=True, exist_ok=True)
    peaks_path.write_text(
        "latitude,longitude,name,elevation\n"
        "49.5,20.5,Testspitze,2500.0\n"
        "49.25,20.75,Kleiner Berg,1100.0\n",
        encoding="utf-8",
    )
    return loc, heights


@pytest.fixture()
def backend(tmp_path):
    loc, heights = make_fixtures(tmp_path)
    settings = Settings(address="127.0.0.1", port=0, data_dir=str(tmp_path))
    server = BackendServer(settings)
    server.start()
    yield server, loc, heights
    server.stop()


def test_http_protocol(backend):
    server, loc, heights = backend
    tiff = get_tiff_from_http(server.url, loc)
    assert tiff is not None
    from topo_renderer_tpu.data.tiff import read_geotiff

    decoded, info = read_geotiff(tiff)
    np.testing.assert_array_equal(decoded, heights)
    np.testing.assert_allclose(info.tiepoint[3:5], [20.0, 50.0])

    peaks = get_peaks_from_http(server.url, loc)
    assert peaks is not None and b"Testspitze" in peaks

    # Missing tile -> empty body -> None (`main.rs:56-59`).
    missing = GeoLocation.from_coord(10, 10)
    assert get_tiff_from_http(server.url, missing) is None
    assert get_peaks_from_http(server.url, missing) is None


def test_fetch_terrain(backend):
    server, loc, heights = backend
    settings = Settings(backend_url=server.url)
    peaks, (h, transform, size) = fetch_terrain(loc, settings)
    np.testing.assert_array_equal(h, heights)
    assert size == (TILE_N, TILE_N)
    # Peaks sorted by elevation descending (`background_runner.rs:142-147`).
    assert [p.name for p in peaks] == ["Testspitze", "Kleiner Berg"]
    # ECEF position ~ earth radius + terrain height + 10 m.
    r = np.linalg.norm(peaks[0].position)
    gx = (20.5 - transform.model_point[0]) / transform.pixel_scale[0]
    gy = (transform.model_point[1] - 49.5) / transform.pixel_scale[1]
    h_at = heights[int(gy), int(gx)]
    np.testing.assert_allclose(r - 6_371_000.0, h_at + 10.0, atol=1.0)


def test_background_runner_to_engine(backend):
    server, loc, heights = backend
    settings = Settings(backend_url=server.url)

    events = []
    runner = BackgroundRunner(settings, lambda kind, payload: events.append((kind, payload)))
    notes = runner.subscribe()
    runner.spawn()
    current = GeoCoord(49.35135, 20.21139)
    runner.send(DataRequested(requested=loc, current_location=current))
    runner.drain()
    runner.shutdown()

    kinds = [k for k, _ in events]
    # reset_camera first (requested tile contains the viewpoint), then peaks,
    # then terrain (`background_runner.rs:232-269`).
    assert kinds == ["reset_camera", "peaks_ready", "terrain_ready"]

    # Notifications observed.
    seen = [notes.get_nowait().kind for _ in range(notes.qsize())]
    assert seen == ["task_started", "task_finished"]

    # Feed the engine like the app shell would.
    from topo_renderer_tpu.models.camera import Camera
    from topo_renderer_tpu.render.engine import RenderEngine

    engine = RenderEngine()
    payloads = dict(events)
    engine.add_terrain(loc, payloads["terrain_ready"]["heights"], payloads["terrain_ready"]["transform"])
    engine.add_peaks(loc, payloads["peaks_ready"]["peaks"])
    cam = Camera().reset(
        payloads["reset_camera"]["location"],
        payloads["reset_camera"]["height"] + 50.0,  # `render_engine.rs:327`
    )
    res = engine.render(cam, 64, 40, n_steps=128, n_refine=8)
    assert res.color.shape == (40, 64, 3)


def test_task_errored_on_missing(backend):
    server, _, _ = backend
    settings = Settings(backend_url=server.url)
    events = []
    runner = BackgroundRunner(settings, lambda k, p: events.append((k, p)))
    notes = runner.subscribe()
    runner.spawn()
    runner.send(
        DataRequested(
            requested=GeoLocation.from_coord(11, 11),
            current_location=GeoCoord(11.5, 11.5),
        )
    )
    runner.drain()
    runner.shutdown()
    assert events == []
    seen = [notes.get_nowait() for _ in range(notes.qsize())]
    assert [n.kind for n in seen] == ["task_started", "task_errored"]
    assert "Empty terrain map" in seen[1].error


def test_fetch_retries_transient_failure(monkeypatch):
    """A transient URLError on the first attempt must not poison the tile;
    the bounded retry should succeed on the next attempt."""
    import urllib.error

    from topo_renderer_tpu.data import fetch as fetch_mod

    calls = {"n": 0}

    class _Resp:
        headers = {}

        def read(self):
            return b"payload"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def flaky(req, timeout=None):
        calls["n"] += 1
        if calls["n"] == 1:
            raise urllib.error.URLError("connection reset")
        return _Resp()

    monkeypatch.setattr(fetch_mod.urllib.request, "urlopen", flaky)
    monkeypatch.setattr(fetch_mod.time, "sleep", lambda s: None)
    assert fetch_mod._get("http://x/dem", timeout=1.0) == b"payload"
    assert calls["n"] == 2

    calls["n"] = 0

    def always_down(req, timeout=None):
        calls["n"] += 1
        raise urllib.error.URLError("refused")

    monkeypatch.setattr(fetch_mod.urllib.request, "urlopen", always_down)
    with pytest.raises(fetch_mod.FetchError):
        fetch_mod._get("http://x/dem", timeout=1.0, retries=2)
    assert calls["n"] == 3
