"""Depth-state parity utils + controllers hub + profiling timer tests."""

import time

import numpy as np

from topo_renderer_tpu.control.controllers import ApplicationControllers
from topo_renderer_tpu.control.events import Key, KeyInput
from topo_renderer_tpu.geo import GeoCoord
from topo_renderer_tpu.models.camera import Camera
from topo_renderer_tpu.models.depth_state import DepthState, Size, pad_256
from topo_renderer_tpu.utils.profiling import FrameTimer


def test_pad_256():
    # `data/mod.rs:9-11`: depth-readback rows padded to 256 bytes.
    assert pad_256(0) == 0
    assert pad_256(1) == 256
    assert pad_256(256) == 256
    assert pad_256(257) == 512
    assert pad_256(800 * 4) == 3328


def test_depth_state_matching():
    cam = Camera().reset(GeoCoord(49.0, 20.0), 1500.0)
    state = DepthState(Size(800, 600), cam)
    assert state.matches(Size(800, 600), cam)
    assert not state.matches(Size(640, 480), cam)
    assert not state.matches(Size(800, 600), cam.rotate_yaw(0.1))


def test_controllers_hub():
    requested = []
    hub = ApplicationControllers(lambda loc, cur: requested.append(loc), camera_speed=1.0)
    cam = Camera().reset(GeoCoord(49.35, 20.21), 1500.0)
    assert hub.process_event(KeyInput(Key.W, True))
    time.sleep(0.01)
    cam2, changed = hub.update(cam, (800, 600))
    assert changed
    assert np.linalg.norm(np.asarray(cam2.eye) - np.asarray(cam.eye)) > 0


def test_frame_timer():
    t = FrameTimer()
    with t.stage("a"):
        time.sleep(0.002)
    with t.stage("a"):
        time.sleep(0.002)
    st = t.stats()["a"]
    assert st["n"] == 2 and st["mean_ms"] >= 1.0
    assert "a" in t.report()
