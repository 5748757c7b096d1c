"""RenderEngine integration tests: tiles, peaks, occlusion, labels, overlay.

Covers the reference's core occlusion algorithm (SURVEY §3.4): a peak is
visible iff its linearized distance minus 10 m is closer than the depth
buffer at its projected pixel.
"""

import dataclasses

import numpy as np

from tests.helpers import east_at, make_tile, yaw_towards
from topo_renderer_tpu.geo import GeoCoord, GeoLocation
from topo_renderer_tpu.models.camera import Camera
from topo_renderer_tpu.models.uniforms import PeakInstance
from topo_renderer_tpu.ops.geometry import ecef_from_geo
from topo_renderer_tpu.ops.panorama import PanoramaSpec
from topo_renderer_tpu.render.engine import RenderEngine


def hill_tile(n=65, span=0.05, base=1000.0, hill=800.0):
    """Flat tile with a single Gaussian hill in the middle."""
    tile = make_tile(49, 20, n=n, span_deg=span)
    ys, xs = np.mgrid[0:n, 0:n] / (n - 1)
    tile.heights[:] = base + hill * np.exp(
        -(((xs - 0.5) ** 2 + (ys - 0.5) ** 2) / 0.003)
    ).astype(np.float32)
    return tile


def build_engine(n=65, span=0.05):
    tile = hill_tile(n=n, span=span)
    engine = RenderEngine()
    engine.add_terrain(tile.location, tile.heights, tile.transform)

    # Camera west of the hill, at base + 200, looking east at the hill.
    lat = 49.0 + span / 2
    lon_cam = 20.0 + span * 0.1
    cam = Camera().reset(GeoCoord(lat, lon_cam), 1400.0)
    cam = dataclasses.replace(cam, yaw=yaw_towards(cam, east_at(cam)), pitch=0.0)

    # Peak A: on the hill summit (visible). Peak B: at ground level on the
    # far side of the hill (occluded).
    lon_summit = 20.0 + span * 0.5
    lon_behind = 20.0 + span * 0.8
    peak_a = PeakInstance(
        position=np.asarray(ecef_from_geo(1800.0 + 10.0, lon_summit, lat)),
        name="Summit",
    )
    peak_b = PeakInstance(
        position=np.asarray(ecef_from_geo(1000.0 + 10.0, lon_behind, lat)),
        name="Hidden",
    )
    engine.add_peaks(tile.location, [peak_a, peak_b])
    return engine, cam, tile


def test_engine_render_with_labels():
    engine, cam, tile = build_engine()
    res = engine.render(cam, 160, 100, n_steps=512, n_refine=16)
    assert res.color.shape == (100, 160, 3)
    assert res.color.dtype == np.uint8
    assert res.hit.mean() > 0.1

    peaks = engine._peaks[tile.location]
    assert peaks[0].visible, "summit peak should be visible"
    assert not peaks[1].visible, "peak behind the hill should be occluded"
    assert len(res.layouts) == 1
    assert res.layouts[0].id == 0

    # Overlay puts a white label box somewhere.
    res_plain = engine.render(cam, 160, 100, n_steps=512, n_refine=16, composite=False)
    assert (res.color != res_plain.color).any()


def test_engine_unload():
    engine, cam, tile = build_engine()
    engine.render(cam, 32, 24, n_steps=64, n_refine=4, with_labels=False)
    engine.unload_terrain(tile.location)
    assert engine.loaded_locations == set()


def test_engine_panorama_and_batch():
    engine, cam, tile = build_engine()
    spec = PanoramaSpec(width=128, height=48, n_steps=256, n_refine=2)
    res = engine.render_panorama(cam, spec)
    assert res.color.shape == (48, 128, 3)
    assert res.hit.mean() > 0.05
    # Summit peak visible in the panorama too.
    assert engine._peaks[tile.location][0].visible

    eyes = np.stack([np.asarray(cam.eye)] * 3)
    suns = np.stack([np.asarray(cam.sun_angle.to_vec3())] * 3)
    batch = np.asarray(engine.render_batch(eyes, spec, suns))
    assert batch.shape == (3, 48, 128, 3)
    np.testing.assert_allclose(batch[0], batch[2], atol=1e-6)


def test_multi_tile_mosaic_engine():
    """Two adjacent tiles sharing a seam column render as one surface."""
    t_w = make_tile(49, 20, n=33, span_deg=0.03)
    t_e = make_tile(49, 20, n=33, span_deg=0.03)
    # Shift east tile's transform by the tile span; share the seam column.
    from topo_renderer_tpu.data.coordinate_transform import CoordinateTransform

    ps = t_w.transform.pixel_scale[0]
    t_e.location = GeoLocation.from_coord(49, 21)
    t_e.transform = CoordinateTransform(
        raster_point=(0.0, 0.0),
        model_point=(t_w.transform.model_point[0] + 0.03, t_w.transform.model_point[1]),
        pixel_scale=(ps, ps),
    )
    t_e.heights[:, 0] = t_w.heights[:, -1]

    engine = RenderEngine()
    engine.add_terrain(t_w.location, t_w.heights, t_w.transform)
    engine.add_terrain(t_e.location, t_e.heights, t_e.transform)
    mosaic = engine.mosaic
    assert mosaic.shape == (33, 65)
    # Seam column carries stitched (not border) normals.
    normals = np.asarray(mosaic.normals)
    assert not np.allclose(normals[16, 32], [-1, -1, -1])


def test_render_host_copy_false_keeps_device_arrays():
    """host_copy=False must still deliver a host u8 frame (the interactive
    loop's only need) while the f32 planes stay device-resident."""
    import jax

    engine, cam, _ = build_engine()
    res = engine.render(cam, 64, 40, n_steps=64, n_refine=4, fast=True,
                        host_copy=False)
    assert isinstance(res.color, np.ndarray) and res.color.dtype == np.uint8
    assert isinstance(res.depth, jax.Array)
    assert isinstance(res.color_linear, jax.Array)
    # Still materializable on demand.
    assert np.asarray(res.depth).shape == (40, 64)

    res2 = engine.render(cam, 64, 40, n_steps=64, n_refine=4, fast=True)
    assert isinstance(res2.depth, np.ndarray)


def test_render_wire_rgb888_matches_plain():
    """wire="rgb888" must reproduce the non-wire render exactly: same u8
    pixels, same label visibility/layouts — one transfer instead of two."""
    engine, cam, tile = build_engine()
    ref = engine.render(cam, 160, 100, n_steps=512, n_refine=16,
                        composite=False)
    res = engine.render(cam, 160, 100, n_steps=512, n_refine=16,
                        wire="rgb888")
    assert res.finish is not None
    assert res.visible_labels == {} and res.layouts == []
    buf = np.asarray(res.color)
    assert buf.ndim == 1 and buf.dtype == np.uint8
    frame, visible_labels, layouts, names = res.finish(buf)
    np.testing.assert_array_equal(frame, ref.color)
    assert {k: v for k, v in visible_labels.items()} == ref.visible_labels
    assert len(layouts) == len(ref.layouts) == 1
    assert names[(tile.location, 0)] == "Summit"


def test_render_wire_yuv420_close_and_fast_path():
    """The reduced-byte motion format: ~half the bytes, visually close."""
    from topo_renderer_tpu.render import transport

    engine, cam, _ = build_engine()
    ref = engine.render(cam, 160, 100, fast=True, composite=False)
    res = engine.render(cam, 160, 100, fast=True, wire="yuv420")
    buf = np.asarray(res.color)
    assert buf.size == transport.pixel_bytes(100, 160, "yuv420") + \
        transport.label_bytes(res_n_peaks := _padded_n(engine))
    frame, visible_labels, layouts, _ = res.finish(buf)
    assert frame.shape == (100, 160, 3)
    # Chroma-subsampled, luma-exact-ish: close to the rgb888 frame.
    err = np.abs(frame.astype(np.float32) - ref.color.astype(np.float32))
    assert err.mean() < 6.0
    assert visible_labels == ref.visible_labels


def test_render_wire_no_labels():
    engine, cam, _ = build_engine()
    res = engine.render(cam, 64, 40, n_steps=64, n_refine=4, fast=True,
                        with_labels=False, wire="yuv420")
    frame, visible_labels, layouts, names = res.finish(np.asarray(res.color))
    assert frame.shape == (40, 64, 3)
    assert visible_labels == {} and layouts == [] and names == {}


def _padded_n(engine):
    _entries, pos, _valid = engine._padded_peaks()
    return int(pos.shape[0])


def test_engine_render_batch_clipmap_uses_scan():
    """Engine render_batch with a clipmap LOD spec routes through the
    one-program scan path and matches the per-eye two-program render."""
    import dataclasses as dc

    from topo_renderer_tpu.ops.panorama import (
        extract_clipmap_windows,
        render_panorama,
    )

    engine, cam, _ = build_engine()
    spec = dc.replace(
        PanoramaSpec.fast(width=128, height=48, n_steps=128,
                          s_near=5.0, s_far=40_000.0),
        clipmap_threshold=0,
    )
    eyes = np.stack([np.asarray(cam.eye, np.float32)] * 2)
    suns = np.stack([np.asarray(cam.sun_angle.to_vec3(), np.float32)] * 2)
    batch = np.asarray(engine.render_batch(eyes, spec, suns))
    assert batch.shape == (2, 48, 128, 3)
    assert np.isfinite(batch).all()
    np.testing.assert_array_equal(batch[0], batch[1])

    win = extract_clipmap_windows(engine.mosaic, eyes[0], spec)
    want = np.asarray(
        render_panorama(engine.mosaic, eyes[0], spec, suns[0], windows=win)[
            "color"
        ],
        np.float32,
    )
    diff = np.abs(batch[0].astype(np.float32) - want)
    assert diff.max() <= 1.5 / 255.0


def test_layout_memo_lru_alternating_poses():
    """A/B visibility alternation (two camera poses toggled every frame)
    stays memoized: the greedy layout runs once per distinct packed result,
    not once per frame (round-3 verdict item 10 — the single-slot memo
    evicted on every alternation)."""
    engine, cam, tile = build_engine()
    entries, pos, valid = engine._padded_peaks()
    P = int(pos.shape[0])
    packed_a = np.zeros((3, P), np.int32)
    packed_a[:, 0] = (1, 10, 12)
    packed_b = np.zeros((3, P), np.int32)
    packed_b[:, 0] = (1, 40, 30)
    packed_b[:, 1] = (1, 80, 50)

    calls = []
    orig = engine._label_pass_packed_uncached

    def counting(entries_, packed_):
        calls.append(1)
        return orig(entries_, packed_)

    engine._label_pass_packed_uncached = counting
    for _ in range(4):
        vis_a, lay_a = engine._label_pass_packed(entries, packed_a)
        vis_b, lay_b = engine._label_pass_packed(entries, packed_b)
    assert len(calls) == 2, f"layout ran {len(calls)} times for 2 poses"
    assert len(lay_a) == 1 and len(lay_b) == 2
    # Eviction still bounded.
    for k in range(engine._LAYOUT_MEMO_CAP + 3):
        p = np.zeros((3, P), np.int32)
        p[:, 0] = (1, 100 + k, 9)
        engine._label_pass_packed(entries, p)
    assert len(engine._layout_memo) <= engine._LAYOUT_MEMO_CAP


def test_exact_quality_policy():
    """exact_quality="auto" (the engine default): first/settle exact renders
    pay the full parity budget; motion frames (pose changed since the last
    exact render) march the 9-round interactive rung — bit-identical to
    pinning either rung explicitly."""
    engine, cam, _ = build_engine()
    import dataclasses

    cam2 = dataclasses.replace(cam, yaw=cam.yaw + 0.01)
    kw = dict(n_steps=256, n_refine=8, with_labels=False)

    # First exact render: nothing to move from -> full budget.
    first = engine.render(cam, 96, 64, **kw)
    full = engine.render(cam, 96, 64, exact_quality="full", **kw)
    np.testing.assert_array_equal(first.color, full.color)

    # Pose change -> the interactive rung.
    moved = engine.render(cam2, 96, 64, **kw)
    rung = engine.render(cam2, 96, 64, exact_quality="interactive", **kw)
    np.testing.assert_array_equal(moved.color, rung.color)

    # Re-render at the rested pose -> back to the full budget.
    settled = engine.render(cam2, 96, 64, **kw)
    full2 = engine.render(cam2, 96, 64, exact_quality="full", **kw)
    np.testing.assert_array_equal(settled.color, full2.color)

    # The rung and the full budget genuinely differ somewhere on this
    # scene (otherwise the assertions above prove nothing).
    if np.array_equal(np.asarray(rung.color), np.asarray(full2.color)):
        # Tiny scenes can agree; the knob resolution itself must differ.
        assert engine._resolve_exact_quality(cam2, "interactive", ()) != ()

    # Caller guided_kw overrides the policy's knobs.
    res = engine._resolve_exact_quality(cam2, "interactive", (("n_window", 5),))
    assert dict(res)["n_window"] == 5 and dict(res)["split_brackets"] is False

    import pytest

    with pytest.raises(ValueError):
        engine.render(cam, 96, 64, exact_quality="bogus", **kw)
