"""Triangle-exact heightfield surface sampling.

The reference renders each tile as a regular grid mesh whose cells are split
into two triangles along a diagonal that alternates with ``(i + j) % 2``
(`topo-renderer/src/render/render_buffer.rs:191-219`). The rendered surface is
therefore piecewise-linear over cells with a parity-dependent diagonal. The
TPU ray-marcher reproduces **that exact surface** by interpolating heights and
vertex attributes triangle-exactly, so silhouettes and depths match what the
reference's rasterizer produces.

Cell-local convention (matching the raster): fx grows east (columns), fy grows
south (rows); the NW corner is texel (cy, cx).
  parity 0: diagonal NW-SE; lower-left triangle {NW, SW, SE} where fx <= fy,
            upper-right {NW, NE, SE}
  parity 1: diagonal SW-NE; upper {NW, NE, SW} where fx + fy <= 1,
            lower {SE, NE, SW}

(Global cell parity equals tile-local parity because COP-90 tile offsets are
multiples of 1200 texels — even.)
"""

from __future__ import annotations

import jax.numpy as jnp

INVALID_HEIGHT = -1.0e9


def raster_from_geo(mosaic, lon_deg, lat_deg):
    """Geographic degrees -> mosaic raster coordinates (gx, gy)."""
    gx = (lon_deg - mosaic.model_point[0]) / mosaic.pixel_scale[0]
    gy = (mosaic.model_point[1] - lat_deg) / mosaic.pixel_scale[1]
    return gx, gy


def geo_from_raster(mosaic, gx, gy):
    lon = gx * mosaic.pixel_scale[0] + mosaic.model_point[0]
    lat = mosaic.model_point[1] - gy * mosaic.pixel_scale[1]
    return lon, lat


def tri_interp(v_nw, v_ne, v_sw, v_se, fx, fy, parity):
    """Interpolate a per-vertex attribute triangle-exactly within a cell.

    All corner values broadcast; ``fx``/``fy`` in [0, 1]; ``parity`` in {0, 1}.
    Channel axes must come last (fx/fy are expanded as needed by callers).
    """
    # parity 0
    lower0 = v_nw + (v_se - v_sw) * fx + (v_sw - v_nw) * fy
    upper0 = v_nw + (v_ne - v_nw) * fx + (v_se - v_ne) * fy
    p0 = jnp.where(fx <= fy, lower0, upper0)
    # parity 1
    upper1 = v_nw + (v_ne - v_nw) * fx + (v_sw - v_nw) * fy
    lower1 = v_se + (v_ne - v_se) * (1.0 - fy) + (v_sw - v_se) * (1.0 - fx)
    p1 = jnp.where(fx + fy <= 1.0, upper1, lower1)
    return jnp.where(parity == 0, p0, p1)


def _cell_indices(mosaic, gx, gy):
    h, w = mosaic.heights.shape
    cx = jnp.floor(gx).astype(jnp.int32)
    cy = jnp.floor(gy).astype(jnp.int32)
    in_bounds = (gx >= 0.0) & (gy >= 0.0) & (gx <= w - 1.0) & (gy <= h - 1.0)
    cxc = jnp.clip(cx, 0, w - 2)
    cyc = jnp.clip(cy, 0, h - 2)
    fx = gx - cxc
    fy = gy - cyc
    parity = (cxc + cyc) % 2
    return cxc, cyc, fx, fy, parity, in_bounds


def sample_height(mosaic, gx, gy):
    """Triangle-exact surface height at raster coords; INVALID_HEIGHT outside
    the valid tile area (so ray tests can never report a hit there)."""
    cx, cy, fx, fy, parity, in_bounds = _cell_indices(mosaic, gx, gy)
    hgt = mosaic.heights
    v_nw = hgt[cy, cx]
    v_ne = hgt[cy, cx + 1]
    v_sw = hgt[cy + 1, cx]
    v_se = hgt[cy + 1, cx + 1]
    h = tri_interp(v_nw, v_ne, v_sw, v_se, fx, fy, parity)
    cell_ok = in_bounds & (mosaic.cell_tile[cy, cx] >= 0)
    return jnp.where(cell_ok, h, INVALID_HEIGHT)


def sample_attributes(mosaic, gx, gy):
    """Height, world-space normal and validity at raster coords.

    The three vertex normals of the containing triangle are interpolated with
    the same triangle weights the rasterizer would use, then rotated by the
    owning tile's normal->world matrix — exactly the vertex shader's
    ``normal_to_world_rotation * normal`` (`render_shader.wgsl:66-67`)
    followed by perspective-correct interpolation.
    """
    cx, cy, fx, fy, parity, in_bounds = _cell_indices(mosaic, gx, gy)
    hgt = mosaic.heights
    h = tri_interp(
        hgt[cy, cx], hgt[cy, cx + 1], hgt[cy + 1, cx], hgt[cy + 1, cx + 1],
        fx, fy, parity,
    )
    nrm = mosaic.normals
    fxc = fx[..., None]
    fyc = fy[..., None]
    n_local = tri_interp(
        nrm[cy, cx], nrm[cy, cx + 1], nrm[cy + 1, cx], nrm[cy + 1, cx + 1],
        fxc, fyc, parity[..., None],
    )
    tile_idx = mosaic.cell_tile[cy, cx]
    rot = mosaic.tile_rot[jnp.maximum(tile_idx, 0)]  # [..., 3, 3]
    n_world = jnp.einsum("...ij,...j->...i", rot, n_local)
    cell_ok = in_bounds & (tile_idx >= 0)
    return jnp.where(cell_ok, h, INVALID_HEIGHT), n_world, cell_ok
