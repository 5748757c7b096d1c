"""Fragment shading: diffuse sun lighting, hash dither, view modes, sRGB.

Parity with the terrain fragment shader
(`resources/shaders/render_shader.wgsl:75-115`):
  * ambient 0.01, diffuse 0.7 * max(dot(normalize(n), sun), 0), white light
  * ``ditherRGB`` — the exact fract-hash (`render_shader.wgsl:75-87`) seeded
    with ``clip_position.xy + camera_pos.xy - world_position.xy``
    (`render_shader.wgsl:103`)
  * view modes (`render_shader.wgsl:107-114`): 0 = dithered shading,
    1 = raw linear shading, 2 = normal visualisation 0.5*(n+1)
  * ``linear_to_srgb`` — the hardware sRGB surface conversion the reference
    relies on (its in-shader `lin2srgb` at `render_shader.wgsl:89-94` is dead
    code; the swapchain format does the conversion)

All functions broadcast over arbitrary leading pixel axes and are jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

AMBIENT_STRENGTH = 0.01
DIFFUSE_STRENGTH = 0.7
# sky clear color, linear RGB (`terrain_renderer.rs:379-384`)
SKY_COLOR = (0.0, 0.71, 0.885)


def _fract(x):
    return x - jnp.floor(x)


def hash12n(seed):
    """`render_shader.wgsl:75-79` — 2D -> 1D fract hash. ``seed[..., 2]``."""
    seed = jnp.asarray(seed, jnp.float32)
    p = _fract(seed * jnp.array([5.3987, 5.4421], jnp.float32))
    # dot(p.yx, p.xy + vec2(21.5351, 14.3137)) added to both components
    d = p[..., 1] * (p[..., 0] + jnp.float32(21.5351)) + p[..., 0] * (
        p[..., 1] + jnp.float32(14.3137)
    )
    p = p + d[..., None]
    return _fract(p[..., 0] * p[..., 1] * jnp.float32(95.4307))


def hash42n(p):
    """`render_shader.wgsl:81-83` — three decorrelated hashes."""
    return jnp.stack(
        [hash12n(p), hash12n(p + jnp.float32(0.07)), hash12n(p + jnp.float32(0.11))],
        axis=-1,
    )


def dither_rgb(color, p):
    """`render_shader.wgsl:85-87`: +- 1/255 triangular-ish hash noise."""
    noise = hash42n(p) + hash42n(p + jnp.float32(0.13)) - 1.0
    return color + noise / jnp.float32(255.0)


def shade(world_normal, sun_direction, view_mode, dither_seed):
    """Terrain fragment shading (`render_shader.wgsl:96-115`).

    Args:
      world_normal: ``f32[..., 3]`` interpolated world normal (not necessarily
        unit; the shader normalizes).
      sun_direction: ``f32[3]`` (or broadcastable) sun direction.
      view_mode: i32 scalar 0/1/2.
      dither_seed: ``f32[..., 2]`` per-pixel seed.

    Returns linear-space RGB ``f32[..., 3]``.
    """
    n = world_normal / jnp.maximum(
        jnp.linalg.norm(world_normal, axis=-1, keepdims=True), 1e-20
    )
    diffuse = DIFFUSE_STRENGTH * jnp.maximum(
        jnp.sum(n * sun_direction, axis=-1), 0.0
    )
    intensity = AMBIENT_STRENGTH + diffuse
    result_lin = jnp.broadcast_to(intensity[..., None], n.shape).astype(jnp.float32)
    result = dither_rgb(result_lin, dither_seed)
    normal_vis = 0.5 * (world_normal + 1.0)

    view_mode = jnp.asarray(view_mode, jnp.int32)
    out = jnp.where(view_mode == 2, normal_vis, jnp.where(view_mode == 1, result_lin, result))
    return out


def hash12n_soa(sx, sy):
    """`hash12n` on separate seed planes (TPU lane-friendly)."""
    px = _fract(sx * jnp.float32(5.3987))
    py = _fract(sy * jnp.float32(5.4421))
    d = py * (px + jnp.float32(21.5351)) + px * (py + jnp.float32(14.3137))
    px = px + d
    py = py + d
    return _fract(px * py * jnp.float32(95.4307))


def shade_soa(nx, ny, nz, sun_direction, view_mode, seed_x, seed_y):
    """`shade` on scalar planes; returns (r, g, b) planes.

    Identical math to the fragment shader (`render_shader.wgsl:96-115`), laid
    out so every array keeps its full trailing pixel axis on the VPU lanes.
    """
    norm2 = nx * nx + ny * ny + nz * nz
    inv = 1.0 / jnp.sqrt(jnp.maximum(norm2, 1e-30))
    sun = jnp.asarray(sun_direction, jnp.float32)
    ndots = (nx * sun[0] + ny * sun[1] + nz * sun[2]) * inv
    intensity = AMBIENT_STRENGTH + DIFFUSE_STRENGTH * jnp.maximum(ndots, 0.0)

    channels = []
    for off in (0.0, 0.07, 0.11):
        o = jnp.float32(off)
        noise = (
            hash12n_soa(seed_x + o, seed_y + o)
            + hash12n_soa(seed_x + jnp.float32(0.13) + o, seed_y + jnp.float32(0.13) + o)
            - 1.0
        ) / jnp.float32(255.0)
        channels.append(intensity + noise)
    vis = (0.5 * (nx + 1.0), 0.5 * (ny + 1.0), 0.5 * (nz + 1.0))

    view_mode = jnp.asarray(view_mode, jnp.int32)
    out = []
    for c in range(3):
        out.append(
            jnp.where(
                view_mode == 2,
                vis[c],
                jnp.where(view_mode == 1, intensity, channels[c]),
            )
        )
    return tuple(out)


def linear_to_srgb(c):
    """Standard sRGB OETF — what the wgpu sRGB surface applies on write."""
    c = jnp.clip(c, 0.0, 1.0)
    lo = 12.92 * c
    hi = 1.055 * jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4) - 0.055
    return jnp.where(c <= 0.0031308, lo, hi)


def srgb_to_linear(c):
    """Inverse OETF — what sampling an sRGB texture applies on read."""
    c = jnp.clip(c, 0.0, 1.0)
    lo = c / 12.92
    hi = jnp.power((c + 0.055) / 1.055, 2.4)
    return jnp.where(c <= 0.04045, lo, hi)


def quantize_srgb8(linear_rgb):
    """Emulate storing linear color into an 8-bit sRGB render target and
    reading it back: encode, round to 256 levels, decode.

    The reference's intermediate offscreen target is rgba8unorm-srgb
    (surface-format preference, `render_engine.rs:75-85`), so pixel-parity
    requires this quantization between the terrain pass and postprocessing.
    """
    return srgb_to_linear(jnp.round(linear_to_srgb(linear_rgb) * 255.0) / 255.0)


def to_srgb8_image(linear_rgb):
    """Final framebuffer conversion: linear f32 -> u8 sRGB."""
    return jnp.round(linear_to_srgb(linear_rgb) * 255.0).astype(jnp.uint8)
