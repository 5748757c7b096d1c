"""Fast (panorama-warped) perspective vs the triangle-exact parity renderer."""

import dataclasses

import numpy as np

from tests.helpers import east_at, small_scene, yaw_towards
from topo_renderer_tpu.ops.raycast import render_perspective, render_perspective_fast


def test_fast_perspective_close_to_exact():
    mosaic, cam, _ = small_scene(n=65, span_deg=0.05, height_above=500.0)
    cam = dataclasses.replace(cam, yaw=yaw_towards(cam, east_at(cam)), pitch=-0.12)
    W, H = 160, 100

    exact = render_perspective(
        mosaic, cam, width=W, height=H, n_steps=768, n_refine=20,
        quantize_rt=False, apply_postprocess=False,
    )
    fast = render_perspective_fast(
        mosaic, cam, width=W, height=H, n_steps=384, supersample=1.5,
        fov_hint=float(cam.fov_y),
    )

    he, hf = np.asarray(exact["hit"]), np.asarray(fast["hit"])
    agree = (he == hf).mean()
    assert agree > 0.96, f"hit agreement {agree:.1%}"

    both = he & hf
    de = np.asarray(exact["distance"])[both]
    df = np.asarray(fast["distance"])[both]
    rel = np.abs(de - df) / np.maximum(de, 1.0)
    assert np.median(rel) < 0.05  # LOD-mode accuracy, same as the pano preset

    # Shading broadly agrees (LOD attrs + bilinear warp vs exact).
    ce = np.asarray(exact["color"])[both]
    cf = np.asarray(fast["color"])[both]
    assert np.median(np.abs(ce - cf)) < 0.06


def test_fast_perspective_pitch_changes_no_recompile_crash():
    """Different pitches run through the same static window (traced center)."""
    mosaic, cam, _ = small_scene(n=33, span_deg=0.03, height_above=400.0)
    cam = dataclasses.replace(cam, yaw=yaw_towards(cam, east_at(cam)))
    for pitch in (-0.3, -0.1, 0.1):
        out = render_perspective_fast(
            mosaic, dataclasses.replace(cam, pitch=pitch),
            width=64, height=40, n_steps=128, fov_hint=float(cam.fov_y),
        )
        assert np.isfinite(np.asarray(out["color"])).all()


def test_engine_fast_mode_with_labels():
    from tests.test_engine import build_engine

    engine, cam, tile = build_engine()
    res = engine.render(cam, 160, 100, fast=True)
    assert res.color.shape == (100, 160, 3)
    assert res.hit.mean() > 0.1
    # The summit label survives the fast depth buffer.
    assert engine._peaks[tile.location][0].visible
