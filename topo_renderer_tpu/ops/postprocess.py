"""Postprocessing pass: depth-contour outlines + optional pixelization + fog.

Parity with `resources/shaders/postprocessing_shader.wgsl:52-96` (dispatched by
the second render pass, `topo-renderer/src/render/terrain_renderer.rs:423-450`):

  * ``dist_from_depth`` linearizes the 0..1 depth with NEAR=50 / FAR=500000
    (`postprocessing_shader.wgsl:19-20,52-54`).
  * contour = 8 * lin(center) - sum of the 8 neighbors' lin(depth), i.e. a
    3x3 Laplacian of linearized depth (`postprocessing_shader.wgsl:79-90`).
  * final = mix(render, black, smoothstep(0.05, 0.15, contour / center))
    (`postprocessing_shader.wgsl:92-95`).
  * pixelization when ``pixelize_n < 99.99999``: uv = floor(uv*n)/n, bilinear
    color fetch (`postprocessing_shader.wgsl:70-73`). Depth is always sampled
    at the original pixel.

``distance_fog`` / ``atmospheric_shading`` have no reference equivalent —
they implement the driver baseline's config 2/4 requirements (BASELINE.md) as
fused elementwise ops on the linear color + ray distance.

Everything is a dense jnp image op (fused by XLA) batched over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from topo_renderer_tpu.models.camera import dist_from_depth
from topo_renderer_tpu.ops.sampling import bilinear_sample_hwc


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def postprocess(color, depth, pixelize_n=100.0):
    """Apply the contour/pixelize postprocessing pass.

    Args:
      color: ``f32[..., H, W, 3]`` linear color from the terrain pass (sky
        already cleared to SKY_COLOR, and — for strict parity — already
        passed through ``shading.quantize_srgb8``).
      depth: ``f32[..., H, W]`` 0..1 depth, 1.0 where sky.
      pixelize_n: scalar; >= ~100 disables pixelization.

    Returns ``f32[..., H, W, 3]`` linear color.
    """
    color = jnp.asarray(color, jnp.float32)
    depth = jnp.asarray(depth, jnp.float32)
    h, w = depth.shape[-2], depth.shape[-1]

    pixelize_n = jnp.float32(pixelize_n)

    # --- color fetch (pixelized or passthrough) --------------------------
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    u = jnp.broadcast_to(xs[None, :], (h, w))
    v = jnp.broadcast_to(ys[:, None], (h, w))
    up = jnp.floor(u * pixelize_n) / pixelize_n
    vp = jnp.floor(v * pixelize_n) / pixelize_n
    pix_color = bilinear_sample_hwc(color, up * w - 0.5, vp * h - 0.5)
    use_pix = pixelize_n < jnp.float32(99.99999)
    render_color = jnp.where(use_pix, pix_color, color)

    # --- contour: 3x3 Laplacian of linearized depth ----------------------
    lin = dist_from_depth(depth)
    pad = [(0, 0)] * (lin.ndim - 2) + [(1, 1), (1, 1)]
    lp = jnp.pad(lin, pad, mode="edge")
    neighbor_sum = (
        lp[..., 0:-2, 0:-2]
        + lp[..., 0:-2, 1:-1]
        + lp[..., 0:-2, 2:]
        + lp[..., 1:-1, 0:-2]
        + lp[..., 1:-1, 2:]
        + lp[..., 2:, 0:-2]
        + lp[..., 2:, 1:-1]
        + lp[..., 2:, 2:]
    )
    contour = 8.0 * lin - neighbor_sum

    mixf = smoothstep(0.05, 0.15, contour / lin)
    return render_color * (1.0 - mixf[..., None])  # mix toward black


def distance_fog(color, distance, fog_color, density=1.0 / 80_000.0, sky_mask=None):
    """Exponential distance fog (TPU-native extension, BASELINE config 2).

    ``f = 1 - exp(-(d * density))``; sky pixels (distance == FAR / mask) keep
    the sky color untouched when ``sky_mask`` is given.
    """
    color = jnp.asarray(color, jnp.float32)
    d = jnp.asarray(distance, jnp.float32)
    f = 1.0 - jnp.exp(-d * density)
    fogged = color + (jnp.asarray(fog_color, jnp.float32) - color) * f[..., None]
    if sky_mask is not None:
        fogged = jnp.where(sky_mask[..., None], color, fogged)
    return fogged


def atmospheric_shading(
    color,
    distance,
    sky_color,
    rayleigh_density=1.0 / 60_000.0,
    mie_density=1.0 / 220_000.0,
    sky_mask=None,
):
    """Simple two-term aerial perspective (TPU-native extension, BASELINE
    config 4): wavelength-dependent extinction toward the sky color plus a
    neutral haze term. Fused elementwise; negligible cost next to the march.
    """
    color = jnp.asarray(color, jnp.float32)
    d = jnp.asarray(distance, jnp.float32)[..., None]
    sky = jnp.asarray(sky_color, jnp.float32)
    # Rayleigh-ish: blue scatters in more strongly.
    wavelength = jnp.array([1.8, 1.0, 0.65], jnp.float32)
    t_r = jnp.exp(-d * rayleigh_density / wavelength)
    t_m = jnp.exp(-d * mie_density)
    out = color * t_r * t_m + sky * (1.0 - t_r)
    if sky_mask is not None:
        out = jnp.where(jnp.asarray(sky_mask)[..., None], color, out)
    return out
