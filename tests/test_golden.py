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


def _wire_yuv420_frame():
    """Frozen one-transfer wire bytes (yuv420 pixels + label tail) for a
    fixed scene, through the production engine wire path — pins the BT.601
    constants, the plane layout, and the label byte encoding
    (`render/transport.py`) so a transport refactor can't silently change
    what the web client decodes."""
    from tests.test_engine import build_engine

    engine, cam, _tile = build_engine()
    res = engine.render(cam, 160, 100, n_steps=256, n_refine=8, wire="yuv420")
    return np.asarray(res.color)  # the flat u8 wire vector


FRAMES = {
    "perspective_96x64": _perspective_frame,
    "panorama_128x48": _panorama_frame,
    "guided_exact_96x64": _guided_exact_frame,
    "labeled_160x100": _labeled_frame,
    "wire_yuv420_160x100": _wire_yuv420_frame,
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


def test_golden_wire_yuv420():
    from topo_renderer_tpu.render import transport

    name = "wire_yuv420_160x100"
    golden_path = GOLDEN_DIR / f"{name}.npy"
    buf = FRAMES[name]()
    if not golden_path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.save(golden_path, buf)
        raise AssertionError(f"golden {name} was missing; wrote it — rerun")
    golden = np.load(golden_path)
    assert golden.shape == buf.shape, (golden.shape, buf.shape)
    npx = transport.pixel_bytes(100, 160, "yuv420")
    # Pixel payload: a BT.601 constant or plane-layout regression moves
    # bytes image-wide; cross-version float rounding moves a few by ±1.
    pix_diff = np.abs(
        buf[:npx].astype(np.int32) - golden[:npx].astype(np.int32)
    )
    assert (pix_diff > 1).mean() < 0.001, f"{(pix_diff > 1).mean():.2%} bytes off"
    assert pix_diff.max() <= 2
    # Label tail: integer encoding, must be byte-exact.
    np.testing.assert_array_equal(buf[npx:], golden[npx:])
    # And the decoded image must stay within the BASELINE tolerance of the
    # decoded golden (catches a decode-side regression too).
    img = transport.decode_pixels(buf, 100, 160, mode="yuv420")
    img_g = transport.decode_pixels(golden, 100, 160, mode="yuv420")
    ch_diff = np.abs(img.astype(np.int32) - img_g.astype(np.int32))
    assert (ch_diff > 2).any(axis=-1).mean() < 0.01


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        GOLDEN_DIR.mkdir(exist_ok=True)
        for name, render in FRAMES.items():
            np.save(GOLDEN_DIR / f"{name}.npy", render())
            print("wrote", name)
