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
    at the original pixel. When ``pixelize_n`` is a static Python number that
    disables the effect, the bilinear fetch is not even compiled.

``distance_fog`` / ``atmospheric_shading`` have no reference equivalent —
they implement the driver baseline's config 2/4 requirements (BASELINE.md) as
fused elementwise ops on the linear color + ray distance.

Internally everything runs on single-channel [H, W] planes so the VPU's 128
lanes stay filled (a trailing channel axis of 3 would waste 125 of them).
"""

from __future__ import annotations

import jax.numpy as jnp

from topo_renderer_tpu.models.camera import dist_from_depth
from topo_renderer_tpu.ops.sampling import bilinear_sample_hw


def smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _sum3_last(x):
    """Edge-clamped 3-tap box sum along the last axis (lane shifts)."""
    left = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    right = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
    return left + x + right


def _sum3_rows(x):
    """Edge-clamped 3-tap box sum along the second-to-last axis."""
    up = jnp.concatenate([x[..., :1, :], x[..., :-1, :]], axis=-2)
    down = jnp.concatenate([x[..., 1:, :], x[..., -1:, :]], axis=-2)
    return up + x + down


def _contour_mix(depth):
    """smoothstep(0.05, 0.15, contour/center) factor, [..., H, W].

    The 3x3 neighbor sum is separable (row pass then lane pass), which keeps
    the whole pass in the depth buffer's native layout — a `jnp.pad`-based
    formulation forced a full relayout copy of the padded buffer on TPU.
    """
    lin = dist_from_depth(depth)
    total = _sum3_rows(_sum3_last(lin))  # includes the center tap
    contour = 9.0 * lin - total
    return smoothstep(0.05, 0.15, contour / lin)


def postprocess_soa(channels, depth, pixelize_n=None):
    """Postprocess on a tuple of channel planes; returns a same-length tuple."""
    depth = jnp.asarray(depth, jnp.float32)
    h, w = depth.shape[-2], depth.shape[-1]

    static_off = pixelize_n is None or (
        isinstance(pixelize_n, (int, float)) and pixelize_n >= 99.99999
    )
    if not static_off:
        n = jnp.float32(pixelize_n)
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        u = jnp.broadcast_to(xs[None, :], (h, w))
        v = jnp.broadcast_to(ys[:, None], (h, w))
        up = jnp.floor(u * n) / n
        vp = jnp.floor(v * n) / n
        use_pix = n < jnp.float32(99.99999)
        sx = up * w - 0.5
        sy = vp * h - 0.5
        channels = tuple(
            jnp.where(use_pix, bilinear_sample_hw(c, sx, sy), c) for c in channels
        )

    mixf = _contour_mix(depth)
    return tuple(c * (1.0 - mixf) for c in channels)


def postprocess(color, depth, pixelize_n=None):
    """Channels-last convenience wrapper: ``color[..., H, W, 3]``."""
    color = jnp.asarray(color, jnp.float32)
    chans = tuple(color[..., c] for c in range(color.shape[-1]))
    out = postprocess_soa(chans, depth, pixelize_n)
    return jnp.stack(out, axis=-1)


def distance_fog_soa(channels, distance, fog_color, density=1.0 / 80_000.0, sky_mask=None):
    d = jnp.asarray(distance, jnp.float32)
    f = 1.0 - jnp.exp(-d * density)
    fog = jnp.asarray(fog_color, jnp.float32)
    out = []
    for c, fc in zip(channels, fog):
        mixed = c + (fc - c) * f
        if sky_mask is not None:
            mixed = jnp.where(sky_mask, c, mixed)
        out.append(mixed)
    return tuple(out)


def distance_fog(color, distance, fog_color, density=1.0 / 80_000.0, sky_mask=None):
    """Exponential distance fog (TPU-native extension, BASELINE config 2)."""
    color = jnp.asarray(color, jnp.float32)
    chans = tuple(color[..., c] for c in range(3))
    out = distance_fog_soa(chans, distance, fog_color, density, sky_mask)
    return jnp.stack(out, axis=-1)


def atmospheric_shading_soa(
    channels,
    distance,
    sky_color,
    rayleigh_density=1.0 / 60_000.0,
    mie_density=1.0 / 220_000.0,
    sky_mask=None,
):
    d = jnp.asarray(distance, jnp.float32)
    sky = jnp.asarray(sky_color, jnp.float32)
    wavelength = (1.8, 1.0, 0.65)
    t_m = jnp.exp(-d * mie_density)
    out = []
    for c, sc, wl in zip(channels, sky, wavelength):
        t_r = jnp.exp(-d * (rayleigh_density / wl))
        mixed = c * t_r * t_m + sc * (1.0 - t_r)
        if sky_mask is not None:
            mixed = jnp.where(sky_mask, c, mixed)
        out.append(mixed)
    return tuple(out)


def atmospheric_shading(
    color,
    distance,
    sky_color,
    rayleigh_density=1.0 / 60_000.0,
    mie_density=1.0 / 220_000.0,
    sky_mask=None,
):
    """Two-term aerial perspective (TPU-native extension, BASELINE config 4):
    wavelength-dependent extinction toward the sky color plus neutral haze."""
    color = jnp.asarray(color, jnp.float32)
    chans = tuple(color[..., c] for c in range(3))
    out = atmospheric_shading_soa(
        chans, distance, sky_color, rayleigh_density, mie_density, sky_mask
    )
    return jnp.stack(out, axis=-1)
