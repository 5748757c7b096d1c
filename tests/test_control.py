"""UI controller + camera controller tests."""

import math

import numpy as np

from topo_renderer_tpu.control.camera_controller import (
    CameraController,
    get_rotation_and_fov_change,
)
from topo_renderer_tpu.control.events import (
    CursorLeft,
    Key,
    KeyInput,
    MouseButtonInput,
    MouseMotion,
    TouchInput,
    TouchPhase,
)
from topo_renderer_tpu.control.ui_controller import UiController, get_locations_range
from topo_renderer_tpu.geo import GeoCoord, GeoLocation
from topo_renderer_tpu.models.camera import Camera, ViewMode


def test_get_locations_range_tatra():
    # 100 km around the Tatra default viewpoint (`app.rs:197`).
    locs = get_locations_range(GeoCoord(49.35135, 20.21139), 100_000.0)
    lats = {loc.latitude.to_float() for loc in locs}
    lons = {loc.longitude.to_float() for loc in locs}
    assert lats == {48.0, 49.0}
    assert lons == {19.0, 20.0, 21.0}
    assert len(locs) == 6


def test_get_locations_range_near_pole():
    # Near the pole the 100 km circle spans many longitudes; must not raise
    # (the acos argument leaves [-1, 1] there).
    locs = get_locations_range(GeoCoord(89.5, 10.0), 100_000.0)
    assert len(locs) >= 10
    lats = {loc.latitude.to_float() for loc in locs}
    assert lats <= {88.0, 89.0}
    # And the degenerate exactly-at-pole case.
    locs = get_locations_range(GeoCoord(89.999, 0.0), 100_000.0)
    assert len(locs) > 0


def test_get_locations_range_wraps_longitude():
    locs = get_locations_range(GeoCoord(10.5, 179.9), 100_000.0)
    lons = {loc.longitude.to_float() for loc in locs}
    assert 179.0 in lons and -180.0 in lons


class _StubEngine:
    def __init__(self):
        self.unloaded = []

    def unload_terrain(self, loc):
        self.unloaded.append(loc)


class _StubData:
    def __init__(self, loaded):
        self.loaded_locations = set(loaded)
        self.current_location = None


def test_change_location_diff():
    requests = []
    ui = UiController(lambda loc, cur: requests.append(loc))
    stale = GeoLocation.from_coord(10, 10)
    keep = GeoLocation.from_coord(49, 20)
    data = _StubData([stale, keep])
    engine = _StubEngine()
    ui.change_location(GeoCoord(49.35135, 20.21139), data, engine)
    assert engine.unloaded == [stale]
    assert stale not in data.loaded_locations
    assert keep not in requests  # already loaded
    assert len(requests) == 5  # 6 in range minus the kept one
    assert data.current_location == GeoCoord(49.35135, 20.21139)


def make_camera():
    return Camera().reset(GeoCoord(49.35, 20.21), 2000.0)


def test_keyboard_movement():
    ctl = CameraController(speed=1.0)
    cam = make_camera()
    ctl.process_event(KeyInput(Key.W, True))
    cam2, changed = ctl.update_camera(cam, (800, 600), 0.016)
    assert changed
    moved = np.asarray(cam2.eye) - np.asarray(cam.eye)
    d = np.asarray(cam.direction())
    # Moved along the view direction by speed*0.1*dt_micros.
    expected = 1.0 * 0.1 * 16000.0
    # f32 position updates at ECEF magnitude quantize to ~0.5 m.
    np.testing.assert_allclose(np.linalg.norm(moved), expected, rtol=1e-3)
    np.testing.assert_allclose(moved / np.linalg.norm(moved), d, atol=1e-3)

    # Release -> no further movement.
    ctl.process_event(KeyInput(Key.W, False))
    cam3, changed = ctl.update_camera(cam2, (800, 600), 0.016)
    assert not changed


def test_mouse_look_and_sun():
    ctl = CameraController(speed=1.0)
    cam = make_camera()
    # Right-drag: yaw -= 0.01*dx, pitch += 0.01*dy.
    ctl.process_event(MouseButtonInput("right", True))
    ctl.process_device_event(MouseMotion(10.0, -4.0))
    cam2, changed = ctl.update_camera(cam, (800, 600), 0.016)
    assert changed
    np.testing.assert_allclose(float(cam2.yaw) - float(cam.yaw), -0.1, rtol=1e-5)
    np.testing.assert_allclose(float(cam2.pitch) - float(cam.pitch), -0.04, rtol=1e-5)

    # Ctrl-drag moves the sun instead.
    ctl.process_event(MouseButtonInput("right", False))
    ctl.process_event(KeyInput(Key.CTRL, True))
    ctl.process_device_event(MouseMotion(3.0, 7.0))
    cam3, changed = ctl.update_camera(cam2, (800, 600), 0.016)
    assert changed
    assert float(cam3.sun_angle.theta) - float(cam2.sun_angle.theta) == 3.0
    assert float(cam3.sun_angle.phi) - float(cam2.sun_angle.phi) == 7.0
    np.testing.assert_allclose(float(cam3.yaw), float(cam2.yaw))


def test_cursor_left_releases_keys():
    ctl = CameraController(speed=1.0)
    cam = make_camera()
    ctl.process_event(KeyInput(Key.W, True))
    ctl.process_event(CursorLeft())
    _, changed = ctl.update_camera(cam, (800, 600), 0.016)
    assert not changed


def test_view_mode_toggle_key():
    ctl = CameraController(speed=1.0)
    cam = make_camera()
    ctl.process_event(KeyInput(Key.F, True))
    cam2, changed = ctl.update_camera(cam, (800, 600), 0.016)
    assert changed and cam2.view_mode == ViewMode.NORMALS


def test_fov_keys_clamp():
    ctl = CameraController(speed=1.0)
    cam = make_camera()
    ctl.process_event(KeyInput(Key.E, True))
    cam2, _ = ctl.update_camera(cam, (800, 600), 10.0)  # huge dt
    np.testing.assert_allclose(float(cam2.fov_y), math.radians(160.0), rtol=1e-5)
    ctl2 = CameraController(speed=1.0)
    ctl2.process_event(KeyInput(Key.Q, True))
    cam3, _ = ctl2.update_camera(cam, (800, 600), 10.0)
    np.testing.assert_allclose(float(cam3.fov_y), math.radians(10.0), rtol=1e-5)


def test_single_touch_pan():
    ctl = CameraController(speed=1.0)
    cam = make_camera()
    ctl.process_event(TouchInput(TouchPhase.STARTED, 1, 100.0, 100.0))
    ctl.process_event(TouchInput(TouchPhase.MOVED, 1, 100.0, 110.0))
    cam2, changed = ctl.update_camera(cam, (800, 600), 0.016)
    assert changed
    moved = np.asarray(cam2.eye) - np.asarray(cam.eye)
    # dy=+10 -> forward by MOVE_SCALING*10 (f32 quantized at ECEF scale).
    np.testing.assert_allclose(np.linalg.norm(moved), 50.0, rtol=0.05)


def test_pinch_math_zoom_in():
    # Fingers spreading apart -> smaller fov (zoom in). The reference's
    # rotation term is centered on half the window *height*
    # (`camera_controller.rs:485-495`); a spread symmetric about x = h/2
    # yields no yaw.
    fov = math.radians(45.0)
    rot, new_fov = get_rotation_and_fov_change(
        ((200.0, 300.0), (400.0, 300.0)),
        ((100.0, 300.0), (500.0, 300.0)),
        fov,
        (800, 600),
    )
    np.testing.assert_allclose(new_fov, fov / 2, rtol=1e-6)
    np.testing.assert_allclose(rot, 0.0, atol=1e-6)
    # Degenerate pinch (fingers together) is a no-op.
    rot, new_fov = get_rotation_and_fov_change(
        ((300.0, 300.0), (500.0, 300.0)),
        ((400.0, 300.0), (400.5, 300.0)),
        fov,
        (800, 600),
    )
    assert rot == 0.0 and new_fov == fov
