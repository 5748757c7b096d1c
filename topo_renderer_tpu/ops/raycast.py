"""Perspective terrain renderer: per-pixel ray march against the mosaic.

TPU-native replacement for the reference's wgpu rasterization pipeline
(`topo-renderer/src/render/pipeline.rs:35-122` + the terrain render pass
`src/render/terrain_renderer.rs:373-421` + vertex/fragment shader
`resources/shaders/render_shader.wgsl`). Instead of rasterizing ~2.9M grid
triangles per tile, each pixel's ray is marched through the spherical shell
that can contain terrain and the first crossing with the **exact
piecewise-linear mesh surface** (see `ops/surface.py`) is found by uniform
stepping + bisection refinement. The hit's depth, interpolated vertex normal
and shading replicate the rasterizer's output pixel-for-pixel (the surface,
the attribute interpolation, the depth convention and the dither are all
identical); only silhouette sub-sampling differs, bounded by the march step.

Design notes for TPU:
  * all state is dense ``[H, W]`` float32 arrays; the march is a
    `lax.fori_loop` of fused VPU ops + 4-texel height gathers;
  * the ray interval is clipped analytically to the shell
    ``|x| <= R0 + hmax`` (solving a stabilized quadratic), to the near plane
    (50 m, `camera.rs:7`) and to the far plane (500 km), so step budget is
    spent only where terrain can exist;
  * no data-dependent shapes; `n_steps`/`n_refine` are static.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from topo_renderer_tpu.models.camera import Camera, FAR, NEAR
from topo_renderer_tpu.ops import shading as shd
from topo_renderer_tpu.ops.geometry import R0
from topo_renderer_tpu.ops.postprocess import postprocess
from topo_renderer_tpu.ops.surface import (
    raster_from_geo,
    sample_attributes,
    sample_height,
)
from topo_renderer_tpu.ops import mathx


def camera_rays(camera: Camera, width: int, height: int):
    """World-space unit ray directions for every pixel center.

    Reproduces the wgpu viewport mapping: ndc_x = 2(px+0.5)/W - 1,
    ndc_y = 1 - 2(py+0.5)/H, camera axes from `look_to_rh` (s, u, -f).
    """
    f = camera.direction()
    up = camera.up()
    s = mathx.normalize(jnp.cross(f, up))
    u = jnp.cross(s, f)
    tan_v = jnp.tan(0.5 * jnp.float32(camera.fov_y))
    tan_h = tan_v * (jnp.float32(width) / jnp.float32(height))

    px = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
    ndc_x = 2.0 * px - 1.0
    ndc_y = 1.0 - 2.0 * py
    d = (
        f
        + ndc_x[None, :, None] * tan_h * s
        + ndc_y[:, None, None] * tan_v * u
    )
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True), f


def _surface_f(mosaic, eye, dirs, c0, b, t):
    """Signed clearance above the terrain surface at ray parameter t.

    Altitude is derived from the stabilized quadratic
    q(t) = |eye + t d|^2 - R0^2 = c0 + 2 t b + t^2  (|d| = 1), which avoids
    the catastrophic cancellation of ``|p| - R0`` at ECEF magnitudes.
    """
    t_ = t[..., None]
    pos = eye + t_ * dirs
    q = c0 + 2.0 * t * b + t * t
    r = jnp.sqrt(jnp.maximum(R0 * R0 + q, 0.0))
    alt = q / (r + R0)
    lat = jnp.degrees(jnp.arcsin(jnp.clip(pos[..., 2] / r, -1.0, 1.0)))
    lon = jnp.degrees(jnp.arctan2(pos[..., 1], pos[..., 0]))
    gx, gy = raster_from_geo(mosaic, lon, lat)
    h = sample_height(mosaic, gx, gy)
    return alt - h, pos


def march(mosaic, eye, dirs, *, n_steps: int, n_refine: int, altitude=None):
    """Find the first ray/surface crossing for a dense ray grid.

    Args:
      mosaic: TerrainMosaic.
      eye: ``f32[3]`` ECEF camera position.
      dirs: ``f32[..., 3]`` unit ray directions.
      n_steps / n_refine: static step budgets.
      altitude: optional precomputed camera altitude (meters above R0).

    Returns ``(hit, t_hit, pos_hit)``.
    """
    eye = jnp.asarray(eye, jnp.float32)
    e_norm = jnp.linalg.norm(eye)
    a0 = e_norm - R0 if altitude is None else jnp.float32(altitude)
    hmax = mosaic.hmax + 1.0
    r_shell = R0 + hmax

    b = jnp.sum(dirs * eye, axis=-1)  # [...]
    # c = |E|^2 - r_shell^2, computed stably via the altitude difference.
    c = (a0 - hmax) * (e_norm + r_shell)
    c0 = a0 * (e_norm + R0)  # |E|^2 - R0^2, stable
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inside = c <= 0.0
    t_enter = jnp.where(inside, 0.0, -b - sq)
    t_exit = -b + sq
    feasible = (disc > 0.0) & (t_exit > 0.0)

    # Additionally clip to the mosaic's bounding sphere — the terrain shell
    # spans the whole horizon, but loaded tiles usually don't.
    rel = eye - mosaic.bound_center
    bb = jnp.sum(dirs * rel, axis=-1)
    cb = jnp.sum(rel * rel) - mosaic.bound_radius * mosaic.bound_radius
    disc_b = bb * bb - cb
    sqb = jnp.sqrt(jnp.maximum(disc_b, 0.0))
    tb0 = -bb - sqb
    tb1 = -bb + sqb
    feasible = feasible & (disc_b > 0.0) & (tb1 > 0.0)

    t0 = jnp.maximum(jnp.maximum(t_enter, tb0), 0.0)
    t1 = jnp.where(feasible, jnp.minimum(jnp.minimum(t_exit, tb1), FAR), 0.0)
    t1 = jnp.maximum(t1, t0)
    dt = (t1 - t0) / n_steps

    f0, _ = _surface_f(mosaic, eye, dirs, c0, b, t0)
    hit0 = f0 <= 0.0  # started at/below the surface

    def body(k, state):
        found, t_lo, t_hi, f_prev = state
        t_k = t0 + dt * k
        f_k, _ = _surface_f(mosaic, eye, dirs, c0, b, t_k)
        crossing = (~found) & (f_prev > 0.0) & (f_k <= 0.0)
        t_lo = jnp.where(crossing, t_k - dt, t_lo)
        t_hi = jnp.where(crossing, t_k, t_hi)
        return found | crossing, t_lo, t_hi, f_k

    found, t_lo, t_hi, _ = jax.lax.fori_loop(
        1,
        n_steps + 1,
        body,
        (hit0, jnp.where(hit0, t0, t0), jnp.where(hit0, t0, t1), f0),
    )

    def refine(_, state):
        t_lo, t_hi = state
        tm = 0.5 * (t_lo + t_hi)
        fm, _ = _surface_f(mosaic, eye, dirs, c0, b, tm)
        below = fm <= 0.0
        return jnp.where(below, t_lo, tm), jnp.where(below, tm, t_hi)

    t_lo, t_hi = jax.lax.fori_loop(0, n_refine, refine, (t_lo, t_hi))
    t_hit = t_hi
    pos_hit = eye + t_hit[..., None] * dirs
    return found, t_hit, pos_hit


@partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "n_steps",
        "n_refine",
        "quantize_rt",
        "apply_postprocess",
    ),
)
def render_perspective(
    mosaic,
    camera: Camera,
    *,
    width: int,
    height: int,
    n_steps: int = 1024,
    n_refine: int = 24,
    pixelize_n=100.0,
    quantize_rt: bool = True,
    apply_postprocess: bool = True,
):
    """Render one perspective frame: the full terrain + postprocess pipeline.

    Mirrors the reference's two render passes
    (`terrain_renderer.rs:373-450`): terrain shading into an offscreen target
    (with the sky clear color and 0..1 depth), then contour/pixelize
    postprocessing. Returns a dict with linear-color image, depth, hit
    distance and mask — callers convert with `shading.to_srgb8_image`.
    """
    dirs, fwd = camera_rays(camera, width, height)
    eye = jnp.asarray(camera.eye, jnp.float32)

    # Near/far plane clipping along the view axis (matches rasterizer clip,
    # `camera.rs:7-8`): pixels march only where near <= z_view <= far.
    cosf = jnp.sum(dirs * fwd, axis=-1)
    hit, t_hit, pos = march(mosaic, eye, dirs, n_steps=n_steps, n_refine=n_refine)
    z_view = t_hit * cosf
    hit = hit & (z_view >= NEAR) & (z_view <= FAR)

    # Depth in the reference's convention: ndc z from the view-projection.
    vp = camera.build_view_proj_matrix(jnp.float32(width), jnp.float32(height))
    ndc = mathx.project_point3(vp, pos)
    depth = jnp.where(hit, ndc[..., 2], 1.0)

    # Attributes + shading at the hit point.
    r = jnp.linalg.norm(pos, axis=-1)
    lat = jnp.degrees(jnp.arcsin(jnp.clip(pos[..., 2] / r, -1.0, 1.0)))
    lon = jnp.degrees(jnp.arctan2(pos[..., 1], pos[..., 0]))
    gx, gy = raster_from_geo(mosaic, lon, lat)
    _, n_world, _ = sample_attributes(mosaic, gx, gy)

    px = jnp.arange(width, dtype=jnp.float32) + 0.5
    py = jnp.arange(height, dtype=jnp.float32) + 0.5
    seed = jnp.stack(
        [
            px[None, :] + eye[0] - pos[..., 0],
            py[:, None] + eye[1] - pos[..., 1],
        ],
        axis=-1,
    )
    sun = camera.sun_angle.to_vec3()
    view_mode = jnp.int32(int(camera.view_mode))
    color = shd.shade(n_world, sun, view_mode, seed)

    sky = jnp.asarray(shd.SKY_COLOR, jnp.float32)
    color = jnp.where(hit[..., None], color, sky)

    if quantize_rt:
        color = shd.quantize_srgb8(color)
    if apply_postprocess:
        color = postprocess(color, depth, pixelize_n=pixelize_n)

    return {
        "color": color,
        "depth": depth,
        "distance": jnp.where(hit, t_hit, FAR),
        "hit": hit,
    }
