"""Incremental mosaic slot updates vs from-scratch builds (bit-identity).

The round-2 verdict's item 2: tile add/unload must touch O(one tile), not
rebuild the mosaic, and the updated tables must be bit-identical to a
from-scratch build of the same tile set on the same canvas.
"""

import numpy as np
import jax.numpy as jnp

from topo_renderer_tpu.data.coordinate_transform import CoordinateTransform
from topo_renderer_tpu.geo import GeoLocation
from topo_renderer_tpu.models.mosaic_update import streaming_canvas_dim
from topo_renderer_tpu.models.scene import TerrainTile, build_mosaic
from topo_renderer_tpu.render.engine import RenderEngine

N = 33  # tile texels per side (shared-seam layout: offsets of N-1)
SPAN = 0.032  # degrees covered by N-1 cells
PS = SPAN / (N - 1)


def _field(gx, gy):
    """Deterministic smooth height field evaluated on the GLOBAL grid, so
    adjacent tiles share identical seam values like real COP-90 data."""
    return (
        1200.0
        + 420.0 * np.sin(0.11 * gx) * np.cos(0.13 * gy)
        + 230.0 * np.sin(0.031 * gx + 0.7) * np.sin(0.027 * gy + 0.2)
    ).astype(np.float32)


def tile_at(row: int, col: int) -> TerrainTile:
    """Tile whose NW texel sits at global texel (row*(N-1), col*(N-1))."""
    gy = row * (N - 1) + np.arange(N)
    gx = col * (N - 1) + np.arange(N)
    heights = _field(gx[None, :], gy[:, None])
    lon0 = 20.0 + PS * col * (N - 1)
    lat0 = 49.0 - PS * row * (N - 1)
    return TerrainTile(
        # Distinct integer-degree keys per slot (engine dict/sort key only;
        # the transform carries the actual geometry).
        location=GeoLocation.from_coord(49 - row, 20 + col),
        heights=heights,
        transform=CoordinateTransform((0.0, 0.0), (lon0, lat0), (PS, PS)),
    )


def _assert_mosaics_bitwise(a, b):
    np.testing.assert_array_equal(np.asarray(a.heights_flat), np.asarray(b.heights_flat))
    np.testing.assert_array_equal(
        np.asarray(a.attr_packed_flat).view(np.uint32),
        np.asarray(b.attr_packed_flat).view(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(a.cell_heights_flat), np.asarray(b.cell_heights_flat)
    )
    assert a.mip_shapes == b.mip_shapes
    for x, y in zip(a.mip_heights_flat, b.mip_heights_flat):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(a.mip_attr_flat, b.mip_attr_flat):
        np.testing.assert_array_equal(
            np.asarray(x).view(np.uint32), np.asarray(y).view(np.uint32)
        )
    for x, y in zip(a.mip_hmax_flat, b.mip_hmax_flat):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(a.mip_hmax_raw_flat, b.mip_hmax_raw_flat):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert len(a.win_attr_2d) == len(b.win_attr_2d)
    for x, y in zip(a.win_attr_2d, b.win_attr_2d):
        assert (x is None) == (y is None)
        if x is not None:
            np.testing.assert_array_equal(
                np.asarray(x).view(np.uint32), np.asarray(y).view(np.uint32)
            )
    np.testing.assert_array_equal(float(a.hmax), float(b.hmax))
    np.testing.assert_array_equal(float(a.bound_radius), float(b.bound_radius))
    np.testing.assert_array_equal(
        np.asarray(a.bound_center), np.asarray(b.bound_center)
    )


def _streaming_engine():
    eng = RenderEngine(streaming=True)
    eng._window_table_min = 500  # exercise the 2-D window tables at test scale
    return eng


def _reference_build(engine, tiles):
    lon_nw, lat_nw, h_m, w_m, _, _ = engine._canvas
    return build_mosaic(
        tiles,
        on_device=True,
        canvas=(lon_nw, lat_nw, h_m, w_m),
        keep_hmax_raw=True,
        window_table_min=500,
    )


def test_streaming_canvas_dim():
    for n in (8, 9, 100, 1200, 2401, 12001):
        d = streaming_canvas_dim(n)
        assert d >= n and d <= 2 * n
        # the chain must halve exactly down to < 8
        while d >= 8:
            assert d % 2 == 0
            d //= 2


def test_streaming_canvas_dim_multiple():
    import pytest

    # Geo-sharded streaming: dims must be 8*n_dev*4-aligned AND halving.
    for n, mult in ((112, 64), (1281, 256), (100, 96), (12001, 256)):
        d = streaming_canvas_dim(n, mult)
        assert d >= n and d % mult == 0
        while d >= 8:
            assert d % 2 == 0
            d //= 2
    # Odd factors that no b in 4..7 carries cannot halve exactly: raise
    # rather than search forever (e.g. a 9-device geo mesh).
    with pytest.raises(ValueError):
        streaming_canvas_dim(1281, 8 * 9 * 4)


def test_incremental_add_matches_full_build():
    eng = _streaming_engine()
    a, b = tile_at(0, 0), tile_at(0, 1)
    eng.add_terrain(a.location, a.heights, a.transform)
    eng.add_terrain(b.location, b.heights, b.transform)
    m0 = eng.mosaic  # full streaming build of {a, b}
    assert eng._canvas is not None
    assert not eng._pending

    c = tile_at(1, 1)
    # distinct key (c is south of a/b; GeoLocation differs)
    eng.add_terrain(c.location, c.heights, c.transform)
    assert eng._pending, "add should queue an incremental op, not a rebuild"
    m1 = eng.mosaic
    ref = _reference_build(eng, [a, b, c])
    _assert_mosaics_bitwise(m1, ref)


def test_incremental_unload_matches_full_build():
    eng = _streaming_engine()
    a, b, c = tile_at(0, 0), tile_at(0, 1), tile_at(1, 0)
    for t in (a, b, c):
        eng.add_terrain(t.location, t.heights, t.transform)
    eng.mosaic  # settle the full build
    eng.unload_terrain(b.location)
    assert eng._pending, "unload should queue an incremental op"
    m1 = eng.mosaic
    ref = _reference_build(eng, [a, c])
    _assert_mosaics_bitwise(m1, ref)


def test_incremental_add_then_unload_round_trip():
    eng = _streaming_engine()
    a, b = tile_at(0, 0), tile_at(0, 1)
    eng.add_terrain(a.location, a.heights, a.transform)
    eng.add_terrain(b.location, b.heights, b.transform)
    eng.mosaic
    c = tile_at(1, 0)
    eng.add_terrain(c.location, c.heights, c.transform)
    eng.mosaic
    eng.unload_terrain(c.location)
    m = eng.mosaic
    ref = _reference_build(eng, [a, b])
    _assert_mosaics_bitwise(m, ref)


def test_out_of_canvas_tile_falls_back_to_rebuild():
    eng = _streaming_engine()
    a = tile_at(0, 0)
    eng.add_terrain(a.location, a.heights, a.transform)
    eng.mosaic
    far = tile_at(0, 7)  # beyond the 1-tile margin
    eng.add_terrain(far.location, far.heights, far.transform)
    assert eng._dirty and not eng._pending
    m = eng.mosaic  # rebuild on a fresh canvas containing both
    assert m is not None and eng._canvas is not None


def test_streaming_render_smoke():
    """The streaming engine renders through the normal paths after updates."""
    from topo_renderer_tpu.models.camera import Camera
    from topo_renderer_tpu.ops.geometry import R0

    eng = _streaming_engine()
    a, b = tile_at(0, 0), tile_at(0, 1)
    eng.add_terrain(a.location, a.heights, a.transform)
    eng.add_terrain(b.location, b.heights, b.transform)
    eng.mosaic
    c = tile_at(1, 0)
    eng.add_terrain(c.location, c.heights, c.transform)

    lat, lon = 48.985, 20.03
    lam, phi = np.radians(lon), np.radians(lat)
    r = R0 + 2400.0
    eye = jnp.asarray(
        [r * np.cos(phi) * np.cos(lam), r * np.cos(phi) * np.sin(lam), r * np.sin(phi)],
        jnp.float32,
    )
    cam = Camera(eye=eye, pitch=0.6, yaw=0.6)  # downward view at this yaw
    res = eng.render(cam, 96, 64, n_steps=256, n_refine=8, with_labels=False)
    assert np.asarray(res.hit).mean() > 0.1
    assert np.isfinite(np.asarray(res.color_linear)).all()


def test_add_then_unload_before_render():
    """Queued add followed by unload of the same tile before any mosaic
    access must not crash (the add op's tile is gone; the remove op
    rebuilds the region)."""
    eng = _streaming_engine()
    a, b = tile_at(0, 0), tile_at(0, 1)
    eng.add_terrain(a.location, a.heights, a.transform)
    eng.add_terrain(b.location, b.heights, b.transform)
    eng.mosaic
    c = tile_at(1, 0)
    eng.add_terrain(c.location, c.heights, c.transform)
    eng.unload_terrain(c.location)  # before any render
    m = eng.mosaic
    ref = _reference_build(eng, [a, b])
    _assert_mosaics_bitwise(m, ref)


def test_two_engines_do_not_share_host_state():
    """`MosaicHostData` hashes/eqs as a constant (so host bookkeeping can't
    fragment the jit cache) — which meant a jitted update's CACHED output
    treedef handed every caller the first-traced engine's host object:
    two streaming engines in one process cross-mutated valid/cell_tile
    (measured: the second engine's owner windows carried the first
    engine's tile pattern — one wrong packed normal at a halo texel).
    `apply_slot_update` now reattaches the caller's host; pin both the
    identity and the bit-exact round trip under interleaving."""
    eng1 = _streaming_engine()
    a1, b1 = tile_at(0, 0), tile_at(0, 1)
    eng1.add_terrain(a1.location, a1.heights, a1.transform)
    eng1.add_terrain(b1.location, b1.heights, b1.transform)
    eng1.mosaic
    c1 = tile_at(1, 1)
    eng1.add_terrain(c1.location, c1.heights, c1.transform)
    eng1.mosaic
    eng1.unload_terrain(b1.location)
    m1 = eng1.mosaic

    eng2 = _streaming_engine()
    a2, b2 = tile_at(0, 0), tile_at(0, 1)
    eng2.add_terrain(a2.location, a2.heights, a2.transform)
    eng2.add_terrain(b2.location, b2.heights, b2.transform)
    eng2.mosaic
    c2 = tile_at(1, 0)
    eng2.add_terrain(c2.location, c2.heights, c2.transform)
    eng2.mosaic
    eng2.unload_terrain(c2.location)
    m2 = eng2.mosaic

    assert m1.host is not m2.host, "engines must keep their own host state"
    ref = _reference_build(eng2, [a2, b2])
    _assert_mosaics_bitwise(m2, ref)
