"""Terrain surface normals: latitude-corrected central differences.

TPU-native replacement for the reference's *three* WGSL compute shaders —
interior (`resources/shaders/compute_normals_shader.wgsl:22-58`), edge seams
(`compute_normals_edge_shader.wgsl:25-105`) and 4-tile corners
(`compute_normals_corner_shader.wgsl:29-70`) — plus their dispatch logic
(`topo-renderer/src/render/terrain_renderer.rs:192-347`).

Key observation (SURVEY §7): the reference needs separate edge/corner shaders
only because each tile's heightmap texture is an island. Once tiles are
assembled into a single mosaic array (adjacent COP-90 tiles share their seam
row/column), one dense central-difference over the mosaic reproduces the
interior *and* the stitched seams exactly. Cross-device mosaics exchange
1-texel halos via `ppermute` (see `topo_renderer_tpu.parallel.halo`).

Reference semantics replicated exactly:
  * metric spacing: ``x = radians(ps.x) * R0``; ``y = radians(ps.y) * R0 *
    cos(lat)`` — the reference applies the cos-latitude correction to the
    *latitude* spacing (`compute_normals_shader.wgsl:39-40`). Geographically
    the correction belongs on the longitude axis; we reproduce the
    reference's behavior for shading parity and expose
    ``correct_axes=True`` to opt into the fixed version.
  * normal = normalize(cross(right-left, top-bottom)) with top at row-1
    (`compute_normals_shader.wgsl:42-47,53-58`), i.e. local frame
    x=east, y=north, z=up.
  * u8 quantization through the Rgba8Unorm storage texture: encoded
    (n+1)/2, stored as round(v*255)/255 (`compute_normals_shader.wgsl:47-50`).
  * texels with no complete 4-neighborhood keep the texture's zero
    initialization, which decodes to (-1,-1,-1)
    (`compute_normals_shader.wgsl:27-30`, wgpu zero-init).
"""

from __future__ import annotations

import jax.numpy as jnp

from topo_renderer_tpu.ops.geometry import R0


def quantize_unorm8(v):
    """Emulate an Rgba8Unorm storage-texture round trip: clamp to [0,1] and
    round to the nearest of 256 levels."""
    return jnp.round(jnp.clip(v, 0.0, 1.0) * 255.0) / 255.0


def compute_normals_soa(
    heights,
    pixel_scale,
    raster_point,
    model_point,
    valid=None,
    quantize=True,
    correct_axes=False,
):
    """SoA variant of :func:`compute_normals`: returns the three decoded
    normal planes ``(nx, ny, nz)`` separately. The device-side mosaic build
    uses this — a materialized ``[H, W, 3]`` array pads its trailing axis to
    128 lanes on TPU (64x the memory at 100-tile scale)."""
    heights = jnp.asarray(heights, jnp.float32)
    h, w = heights.shape[-2], heights.shape[-1]

    ps_x = jnp.float32(pixel_scale[0])
    ps_y = jnp.float32(pixel_scale[1])

    rows = jnp.arange(h, dtype=jnp.float32)
    # to_latitude (`compute_normals_shader.wgsl:15-20`)
    lat_deg = (rows - jnp.float32(raster_point[1])) * -ps_y + jnp.float32(model_point[1])

    x_m = jnp.radians(ps_x) * R0
    y_m = jnp.radians(ps_y) * R0
    cos_lat = jnp.cos(jnp.radians(lat_deg))
    if correct_axes:
        x_row = x_m * cos_lat  # [H]
        y_row = jnp.broadcast_to(y_m, cos_lat.shape)
    else:
        # Reference behavior: cos on the latitude spacing
        # (`compute_normals_shader.wgsl:39-40`).
        x_row = jnp.broadcast_to(x_m, cos_lat.shape)
        y_row = y_m * cos_lat

    pad = [(0, 0)] * (heights.ndim - 2) + [(1, 1), (1, 1)]
    hp = jnp.pad(heights, pad, mode="edge")
    dhx = hp[..., 1:-1, 2:] - hp[..., 1:-1, :-2]  # h(right) - h(left)
    dhy = hp[..., :-2, 1:-1] - hp[..., 2:, 1:-1]  # h(top=row-1) - h(bottom=row+1)

    x_b = x_row.reshape((1,) * (heights.ndim - 2) + (h, 1))
    y_b = y_row.reshape((1,) * (heights.ndim - 2) + (h, 1))
    # cross(right-left, top-bottom) with right-left=(2x,0,dhx),
    # top-bottom=(0,2y,dhy)  ->  (-2y*dhx, -2x*dhy, 4xy)
    nx = -2.0 * y_b * dhx
    ny = -2.0 * x_b * dhy
    nz = 4.0 * x_b * y_b * jnp.ones_like(dhx)
    # Divide (not multiply-by-reciprocal): bitwise identical to the previous
    # jnp.linalg.norm-based normalization, which pinned goldens depend on.
    nrm = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    nx, ny, nz = nx / nrm, ny / nrm, nz / nrm

    # Complete-neighborhood mask: interior texels only
    # (`compute_normals_shader.wgsl:27-30`); the mosaic's outer ring keeps the
    # zero-encoded normal like an unstitched tile border.
    row_idx = jnp.arange(h).reshape(h, 1)
    col_idx = jnp.arange(w).reshape(1, w)
    interior = (row_idx > 0) & (row_idx < h - 1) & (col_idx > 0) & (col_idx < w - 1)
    if valid is not None:
        v = jnp.asarray(valid)
        vp = jnp.pad(v, pad, mode="edge")
        neigh_ok = (
            vp[..., 1:-1, 1:-1]
            & vp[..., 1:-1, 2:]
            & vp[..., 1:-1, :-2]
            & vp[..., :-2, 1:-1]
            & vp[..., 2:, 1:-1]
        )
        interior = interior & neigh_ok

    out = []
    for comp in (nx, ny, nz):
        encoded = 0.5 * (comp + 1.0)
        if quantize:
            encoded = quantize_unorm8(encoded)
        encoded = jnp.where(interior, encoded, 0.0)
        # Decode like the vertex shader: 2*texel - 1 (`render_shader.wgsl:66`).
        out.append(2.0 * encoded - 1.0)
    return tuple(out)


def compute_normals(
    heights,
    pixel_scale,
    raster_point,
    model_point,
    valid=None,
    quantize=True,
    correct_axes=False,
):
    """Per-texel normals for a heightfield (tile or mosaic).

    Args:
      heights: ``f32[..., H, W]`` heightfield. Rows run north -> south like the
        GeoTIFF raster.
      pixel_scale: ``(ps_x, ps_y)`` degrees per texel.
      raster_point / model_point: the tile's CoordinateTransform anchor; used
        to recover each row's latitude (`compute_normals_shader.wgsl:15-20`).
      valid: optional ``bool[..., H, W]``; texels whose 4-neighborhood is not
        fully valid fall back to the zero-encoded normal.
      quantize: run the (n+1)/2 u8 round trip of the reference's Rgba8Unorm
        normal texture. Disable for higher-quality shading.
      correct_axes: apply the cos-latitude correction to the longitude axis
        (geographically correct) instead of the reference's latitude axis.

    Returns:
      ``f32[..., H, W, 3]`` decoded normals in the tile-local frame
      (x=east, y=north, z=up), exactly what the vertex shader reads back
      (`render_shader.wgsl:66`).
    """
    nx, ny, nz = compute_normals_soa(
        heights,
        pixel_scale,
        raster_point,
        model_point,
        valid=valid,
        quantize=quantize,
        correct_axes=correct_axes,
    )
    return jnp.stack([nx, ny, nz], axis=-1)
