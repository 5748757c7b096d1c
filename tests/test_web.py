"""Web frontend integration: interactive free-fly endpoints over real HTTP.

Drives the session/frame/location API the browser uses
(counterpart of `topo-renderer-web/src/lib.rs:26-36` + the canvas input
wiring of `index.html:299-330`), against a hermetic fixture backend.
"""

import json
import threading
import urllib.request

import pytest

from tests.test_backend_pipeline import make_fixtures
from topo_renderer_tpu.backend.server import BackendServer
from topo_renderer_tpu.config import Settings
from topo_renderer_tpu.frontends.web.server import WebFrontend


@pytest.fixture()
def frontend(tmp_path):
    loc, heights = make_fixtures(tmp_path)
    backend = BackendServer(Settings(address="127.0.0.1", port=0, data_dir=str(tmp_path)))
    backend.start()
    fe = WebFrontend(Settings(backend_url=backend.url), port=0)
    thread = threading.Thread(target=fe.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{fe._httpd.server_address[1]}"
    yield fe, base, loc
    fe._httpd.shutdown()
    fe.app.shutdown()
    backend.stop()


def _post(base, path, body=None):
    req = urllib.request.Request(
        base + path,
        data=json.dumps(body or {}).encode(),
        method="POST",
    )
    try:
        resp = urllib.request.urlopen(req, timeout=120)
        return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:  # pragma: no cover - failure detail
        raise AssertionError(f"{path} -> {e.status}: {e.read()!r}") from e


def test_interactive_freefly_session(frontend):
    fe, base, loc = frontend

    # UI page is served.
    with urllib.request.urlopen(base + "/", timeout=30) as resp:
        page = resp.read().decode()
    assert "/frame?session=" in page and "pointerdown" in page

    # set_location streams the tile neighborhood (`lib.rs:26-36`).
    status, body, _ = _post(
        base, "/location", {"latitude": 49.35135, "longitude": 20.21139}
    )
    assert status == 200
    info = json.loads(body)
    assert info["loaded"] >= 1
    assert abs(info["camera"]["latitude"] - 49.35135) < 0.01

    # New free-fly session.
    status, body, _ = _post(base, "/session")
    assert status == 200
    sid = json.loads(body)["id"]

    # First frame (forced): a JPEG arrives with camera state in the header.
    status, jpg, headers = _post(
        base,
        f"/frame?session={sid}",
        {"events": [], "width": 96, "height": 64, "force": True},
    )
    assert status == 200
    assert jpg[:2] == b"\xff\xd8"  # JPEG SOI
    state0 = json.loads(headers["X-Camera-State"])

    # Idle frame with no input: 204, camera unchanged, client keeps the frame.
    req = urllib.request.Request(
        base + f"/frame?session={sid}",
        data=json.dumps({"events": [], "width": 96, "height": 64}).encode(),
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        assert resp.status == 204

    # Hold W + right-drag look: the camera moves and a new frame renders.
    events = [
        {"type": "key", "key": "w", "pressed": True},
        {"type": "mouse_button", "button": "right", "pressed": True},
        {"type": "mouse_motion", "dx": 40.0, "dy": 0.0},
    ]
    status, jpg, headers = _post(
        base,
        f"/frame?session={sid}",
        {"events": events, "width": 96, "height": 64},
    )
    assert status == 200 and jpg[:2] == b"\xff\xd8"
    state1 = json.loads(headers["X-Camera-State"])
    moved = (
        abs(state1["latitude"] - state0["latitude"])
        + abs(state1["longitude"] - state0["longitude"])
    )
    assert moved > 0 or state1["yaw"] != state0["yaw"]

    # Exact mode ("exact": true — the browser's checkbox): the same frame
    # loop renders the triangle-exact guided march instead of the LOD fast
    # path (reference analog: its ONLY render mode, terrain_renderer.rs).
    status, jpg_exact, headers = _post(
        base,
        f"/frame?session={sid}",
        {"events": [], "width": 96, "height": 64, "force": True, "exact": True},
    )
    assert status == 200 and jpg_exact[:2] == b"\xff\xd8"

    # Adaptive exact quality (the browser sends "interactive" on motion
    # frames): the cheap 9-round march rung serves a valid frame.
    status, jpg_int, _h = _post(
        base,
        f"/frame?session={sid}",
        {"events": [], "width": 96, "height": 64, "force": True,
         "exact": True, "exact_quality": "interactive"},
    )
    assert status == 200 and jpg_int[:2] == b"\xff\xd8"

    # Reduced-byte transport knob (the browser's "low-bw" checkbox): the
    # half-resolution yuv420 wire pull still serves a full-size JPEG.
    status, jpg_half, _h = _post(
        base,
        f"/frame?session={sid}",
        {"events": [], "width": 96, "height": 64, "force": True,
         "pixfmt": "yuv420_half"},
    )
    assert status == 200 and jpg_half[:2] == b"\xff\xd8"
    import io

    from PIL import Image

    assert Image.open(io.BytesIO(jpg_half)).size == (96, 64)

    # Unknown session id -> 410 Gone so the client re-establishes.
    req = urllib.request.Request(
        base + "/frame?session=deadbeef",
        data=json.dumps({"events": []}).encode(),
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.status == 410


def test_oneshot_render_cache(frontend):
    fe, base, loc = frontend
    url = (
        base + "/render?latitude=49.35135&longitude=20.21139"
        "&width=128&height=64&panorama=1"
    )
    with urllib.request.urlopen(url, timeout=180) as resp:
        png1 = resp.read()
    assert png1[:8] == b"\x89PNG\r\n\x1a\n"
    # Second request is served from the per-(location, spec, tiles) cache.
    import time

    t0 = time.monotonic()
    with urllib.request.urlopen(url, timeout=30) as resp:
        png2 = resp.read()
    assert png2 == png1
    assert time.monotonic() - t0 < 1.0


def test_frame_before_location_fails_cleanly(frontend):
    """A session created before any terrain is loaded must get a clean
    5xx with an explanatory body (not a hang or a blank frame)."""
    fe, base, _ = frontend
    status, body, _ = _post(base, "/session")
    assert status == 200
    sid = json.loads(body)["id"]
    req = urllib.request.Request(
        base + f"/frame?session={sid}",
        data=json.dumps({"width": 64, "height": 48, "force": True}).encode(),
        method="POST",
    )
    try:
        resp = urllib.request.urlopen(req, timeout=60)
        raise AssertionError(f"expected failure, got {resp.status}")
    except urllib.error.HTTPError as e:
        assert e.status == 500
        assert b"no terrain" in e.read()

    # Unknown session id -> 410 (gone), not a server error.
    req = urllib.request.Request(
        base + "/frame?session=doesnotexist",
        data=json.dumps({"force": True}).encode(),
        method="POST",
    )
    try:
        urllib.request.urlopen(req, timeout=60)
        raise AssertionError("expected 410")
    except urllib.error.HTTPError as e:
        assert e.status == 410
