"""Mixed COP-90 latitude bands: coarser-longitude tiles resample into the
mosaic's fine lattice (the reference renders per-tile grids; SURVEY §7
requires the mosaic design to handle band boundaries)."""

import numpy as np

from topo_renderer_tpu.data.coordinate_transform import CoordinateTransform
from topo_renderer_tpu.geo import GeoLocation
from topo_renderer_tpu.models.scene import TerrainTile, build_mosaic


def make_band_tiles():
    """South tile at fine lon spacing, north tile (above the band edge) at
    2x coarser lon spacing, sharing the seam row."""
    n = 33
    span = 0.032
    ps = span / (n - 1)
    lat_edge = 50.0

    rng = np.random.default_rng(3)
    south = rng.normal(1000, 80, (n, n)).astype(np.float32)
    south_t = CoordinateTransform((0.0, 0.0), (20.0, lat_edge), (ps, ps))

    n_coarse = (n - 1) // 2 + 1
    north = rng.normal(1000, 80, (n, n_coarse)).astype(np.float32)
    north_t = CoordinateTransform(
        (0.0, 0.0), (20.0, lat_edge + span), (2 * ps, ps)
    )
    # Share the seam row (north's last row == south's first row, on the
    # coarse grid = every second fine sample).
    north[-1, :] = south[0, ::2]

    return (
        TerrainTile(GeoLocation.from_coord(49, 20), south, south_t),
        TerrainTile(GeoLocation.from_coord(50, 20), north, north_t),
        ps,
    )


def test_mixed_band_mosaic():
    south, north, ps = make_band_tiles()
    mosaic = build_mosaic([south, north])
    hm, wm = mosaic.shape
    assert wm == south.heights.shape[1]
    # Rows: north (33) + south (33) - shared seam row = 65.
    assert hm == 65
    np.testing.assert_allclose(float(mosaic.pixel_scale[0]), ps, rtol=1e-6)

    H = np.asarray(mosaic.heights)
    # South tile texels are exact.
    np.testing.assert_array_equal(H[32:, :], south.heights)
    # North tile (above the seam row, which keeps the fine tile's data):
    # every even fine column matches the coarse sample exactly, odd columns
    # are midpoints.
    np.testing.assert_allclose(H[:32, ::2], north.heights[:-1], rtol=1e-6)
    mid = 0.5 * (north.heights[:-1, :-1] + north.heights[:-1, 1:])
    np.testing.assert_allclose(H[:32, 1::2], mid, rtol=1e-5)
    # Everything valid, no holes at the band boundary.
    assert np.asarray(mosaic.valid).all()


def test_mixed_band_renders():
    import jax.numpy as jnp

    from topo_renderer_tpu.geo import GeoCoord
    from topo_renderer_tpu.models.camera import Camera
    from topo_renderer_tpu.ops.panorama import PanoramaSpec, render_panorama

    south, north, ps = make_band_tiles()
    mosaic = build_mosaic([south, north])
    cam = Camera().reset(GeoCoord(50.0, 20.016), 1500.0)
    spec = PanoramaSpec.fast(width=64, height=32, n_steps=128, s_far=20_000.0)
    out = render_panorama(
        mosaic, cam.eye, spec, np.asarray(cam.sun_angle.to_vec3())
    )
    assert np.isfinite(np.asarray(out["color"])).all()
    assert np.asarray(out["hit"]).mean() > 0.05


def test_device_mosaic_build_matches_host():
    """build_mosaic(on_device=True) must reproduce the host numpy tables:
    heights/mips/max-pyramid/cell bitwise, packed normals to quantization
    LSBs (f32 vs f64 intermediate rounding can flip the last bit of a
    10-bit channel on a tiny fraction of texels)."""
    import numpy as np

    from tests.helpers import make_tile
    from topo_renderer_tpu.models.scene import build_mosaic

    tiles = [
        make_tile(49, 20, n=49, span_deg=0.04),
        make_tile(49, 20.04, n=49, span_deg=0.04, seed=7),
    ]
    a = build_mosaic(tiles)  # host
    b = build_mosaic(tiles, on_device=True)
    assert a.shape == b.shape and a.mip_shapes == b.mip_shapes
    np.testing.assert_array_equal(
        np.asarray(a.heights_flat), np.asarray(b.heights_flat)
    )
    np.testing.assert_array_equal(
        np.asarray(a.cell_heights_flat), np.asarray(b.cell_heights_flat)
    )
    for ma, mb in zip(a.mip_hmax_flat, b.mip_hmax_flat):
        np.testing.assert_array_equal(np.asarray(ma), np.asarray(mb))
    for ma, mb in zip(a.mip_heights_flat, b.mip_heights_flat):
        np.testing.assert_allclose(np.asarray(ma), np.asarray(mb), rtol=1e-6)

    def unpack(attr):
        bits = np.asarray(attr)[:, 1].view(np.uint32)
        return np.stack(
            [bits & 0x3FF, (bits >> 10) & 0x3FF, (bits >> 20) & 0x3FF], -1
        ).astype(np.int32)

    for ta, tb in [(a.attr_packed_flat, b.attr_packed_flat)] + list(
        zip(a.mip_attr_flat, b.mip_attr_flat)
    ):
        np.testing.assert_allclose(
            np.asarray(ta)[:, 0], np.asarray(tb)[:, 0], rtol=1e-6
        )
        da, db = unpack(ta), unpack(tb)
        diff = np.abs(da - db)
        assert diff.max() <= 1, f"normal channel differs by {diff.max()} LSB"
        assert (diff > 0).mean() < 0.02, "too many LSB flips vs host build"
