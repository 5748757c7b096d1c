"""Parity regression at production-class frame size.

The suite's main oracle gate (`test_parity_independent.py`) runs at
160x100, where the silhouette tail measured a single fill-rule pixel —
too small to see the guided march's bracket-pooling behavior. These two
tests pin the 800x450-class behavior at a 400x225 operating point (~50 s
of CPU vs ~3 min at full size): the production-scene tail (round 3:
union pooling 0.22% -> split pooling 0.12%; round 4: own-texel sure leg
+ END-keyed selection 0.08-0.10% at 800x450 — PARITY.md "Round 4") and
the once-pathological steep patch-edge scene (2.3% -> 0.30%).
"""

import dataclasses
import math

import numpy as np

from tests.helpers import east_at, small_scene, yaw_towards
from tests.raster_oracle2 import rasterize2
from topo_renderer_tpu.models.camera import ViewMode
from topo_renderer_tpu.ops.raycast import render_perspective

W, H = 400, 225


def test_parity_tail_at_scale():
    mosaic, cam, _tile = small_scene(n=73, span_deg=0.06, height_above=500.0)
    cam = dataclasses.replace(
        cam, yaw=yaw_towards(cam, east_at(cam)), pitch=-0.1,
        view_mode=ViewMode.NORMALS,
    )
    vp = np.asarray(cam.build_view_proj_matrix(float(W), float(H)), np.float64)
    c2, d2 = rasterize2(
        np.asarray(mosaic.heights), np.asarray(mosaic.normals), (0.0, 0.0),
        np.asarray(mosaic.model_point), np.asarray(mosaic.pixel_scale), vp,
        np.asarray(cam.eye, np.float64),
        np.asarray(cam.sun_angle.to_vec3(), np.float64), W, H, view_mode=1,
    )
    assert (d2 < 1.0).mean() > 0.5  # scene sanity: mostly terrain

    # Round-4 defaults (own-leg guard march, nw=6, ss=1.0) measure 0.136%
    # guided / 0.079% unguided here — within 2x of the fill-rule floor
    # (round-3 verdict item 3's bar); the web exact mode's motion-frame
    # rung (union+own, 9 gather rounds, exact_quality="interactive")
    # measures 0.159%. Gates at ~1.7x measured so f32 jitter passes but a
    # pooling/selection/margin regression fails.
    interactive = (("n_window", 3), ("split_brackets", False))
    for guided, kw, gate in (
        (True, (), 0.0024),
        (True, interactive, 0.003),
        (False, (), 0.0015),
    ):
        out = render_perspective(
            mosaic, cam, width=W, height=H, n_steps=1024, n_refine=26,
            quantize_rt=False, apply_postprocess=False,
            guided=guided, fov_hint=math.radians(45.0), guided_kw=kw,
        )
        err = np.abs(np.asarray(out["color"]) - c2).max(axis=-1)
        frac_bad = (err > 2.0 / 255.0).mean()
        assert frac_bad < gate, (
            f"guided={guided} kw={kw}: {frac_bad:.3%} pixels differ by "
            f">2/255 (gate {gate:.2%})"
        )
        assert np.median(err) < 1.0 / 1020.0


def test_parity_steep_pitch_characterized():
    """Pin the steep-pitch / patch-edge scene (FIXED in round 4).

    Round 3 characterized a ~2% guided tail here (conservative-bound
    backward drag starving the window resolution); the round-4 own-texel
    sure leg + bracket-END-keyed selection collapse it to 0.30% at
    default knobs (dense floor 0.02%; PARITY.md "Round 4: the own-texel
    sure leg"). Gates at ~1.6x measured — the round-3 verdict's done bar
    was <=0.5%, and a selection/leg regression that reverts toward the
    old 2% fails loudly.
    """
    mosaic, cam, _tile = small_scene(n=73, span_deg=0.06, height_above=1200.0)
    cam = dataclasses.replace(
        cam, yaw=yaw_towards(cam, east_at(cam)) + 0.9, pitch=-0.22,
        view_mode=ViewMode.NORMALS,
    )
    vp = np.asarray(cam.build_view_proj_matrix(float(W), float(H)), np.float64)
    c2, d2 = rasterize2(
        np.asarray(mosaic.heights), np.asarray(mosaic.normals), (0.0, 0.0),
        np.asarray(mosaic.model_point), np.asarray(mosaic.pixel_scale), vp,
        np.asarray(cam.eye, np.float64),
        np.asarray(cam.sun_angle.to_vec3(), np.float64), W, H, view_mode=1,
    )
    assert 0.02 < (d2 < 1.0).mean() < 0.6  # steep strip, mostly sky

    for guided, gate in ((True, 0.005), (False, 0.003)):
        out = render_perspective(
            mosaic, cam, width=W, height=H, n_steps=1024, n_refine=26,
            quantize_rt=False, apply_postprocess=False,
            guided=guided, fov_hint=math.radians(45.0),
        )
        err = np.abs(np.asarray(out["color"]) - c2).max(axis=-1)
        frac_bad = (err > 2.0 / 255.0).mean()
        assert frac_bad < gate, (
            f"guided={guided}: {frac_bad:.3%} pixels differ by >2/255 "
            f"(gate {gate:.2%})"
        )
