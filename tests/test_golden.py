"""Golden-image regression tests.

The reference has no image tests at all (SURVEY §4); here small deterministic
CPU renders are pinned against stored golden arrays with the BASELINE
tolerance (2/255 per channel). Regenerate with
``python tests/test_golden.py --regen`` after *intentional* visual changes.
"""

import pathlib

import numpy as np

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def _perspective_frame():
    import dataclasses

    from tests.helpers import east_at, small_scene, yaw_towards
    from topo_renderer_tpu.models.camera import ViewMode
    from topo_renderer_tpu.ops.raycast import render_perspective
    from topo_renderer_tpu.ops.shading import to_srgb8_image

    mosaic, cam, _ = small_scene(n=49, span_deg=0.04, height_above=500.0)
    cam = dataclasses.replace(
        cam, yaw=yaw_towards(cam, east_at(cam)), pitch=-0.06
    )
    out = render_perspective(mosaic, cam, width=96, height=64, n_steps=384, n_refine=16)
    return np.asarray(to_srgb8_image(out["color"]))


def _panorama_frame():
    from tests.helpers import small_scene
    from topo_renderer_tpu.ops.panorama import PanoramaSpec, render_panorama
    from topo_renderer_tpu.ops.shading import to_srgb8_image

    mosaic, cam, _ = small_scene(n=49, span_deg=0.04, height_above=400.0)
    spec = PanoramaSpec.fast(
        width=128, height=48, n_steps=256, s_far=40_000.0
    )
    out = render_panorama(
        mosaic, cam.eye, spec, np.asarray(cam.sun_angle.to_vec3()), fog="atmosphere"
    )
    return np.asarray(to_srgb8_image(out["color"]))


def _guided_exact_frame():
    """The SHIPPED exact path (web "exact" toggle / engine fast=False):
    guided quad-track march with engine-default knobs — pins the
    production default end to end, not just the unguided parity
    configuration."""
    import dataclasses
    import math

    from tests.helpers import east_at, small_scene, yaw_towards
    from topo_renderer_tpu.ops.raycast import render_perspective
    from topo_renderer_tpu.ops.shading import to_srgb8_image

    mosaic, cam, _ = small_scene(n=49, span_deg=0.04, height_above=500.0)
    cam = dataclasses.replace(
        cam, yaw=yaw_towards(cam, east_at(cam)), pitch=-0.06
    )
    out = render_perspective(
        mosaic, cam, width=96, height=64, n_steps=384, n_refine=16,
        guided=True, fov_hint=math.radians(45.0),
    )
    return np.asarray(to_srgb8_image(out["color"]))


def _labeled_frame():
    """The composited label frame through the production engine path
    (fused frame + label visibility + greedy layout + overlay) — the
    layout is deterministic, so the full label pipeline pins."""
    from tests.test_engine import build_engine

    engine, cam, _tile = build_engine()
    res = engine.render(cam, 160, 100, n_steps=256, n_refine=8)
    assert res.layouts, "label layout must be non-empty for the golden"
    return np.asarray(res.color)


FRAMES = {
    "perspective_96x64": _perspective_frame,
    "panorama_128x48": _panorama_frame,
    "guided_exact_96x64": _guided_exact_frame,
    "labeled_160x100": _labeled_frame,
}


def _check(name, render):
    golden_path = GOLDEN_DIR / f"{name}.npy"
    img = render()
    if not golden_path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.save(golden_path, img)
        raise AssertionError(f"golden {name} was missing; wrote it — rerun")
    golden = np.load(golden_path)
    assert golden.shape == img.shape
    diff = np.abs(img.astype(np.int32) - golden.astype(np.int32))
    # BASELINE tolerance: <= 2/255 per channel; allow a sliver of pixels to
    # drift more (silhouette sub-sampling) across jax versions.
    frac_bad = (diff > 2).any(axis=-1).mean()
    assert frac_bad < 0.01, f"{name}: {frac_bad:.2%} pixels exceed 2/255"


def test_golden_perspective():
    _check("perspective_96x64", FRAMES["perspective_96x64"])


def test_golden_panorama():
    _check("panorama_128x48", FRAMES["panorama_128x48"])


def test_golden_guided_exact():
    _check("guided_exact_96x64", FRAMES["guided_exact_96x64"])


def test_golden_labeled():
    _check("labeled_160x100", FRAMES["labeled_160x100"])


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        GOLDEN_DIR.mkdir(exist_ok=True)
        for name, render in FRAMES.items():
            np.save(GOLDEN_DIR / f"{name}.npy", render())
            print("wrote", name)
