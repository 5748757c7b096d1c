"""Cylindrical panorama renderer: great-circle column marching.

This is the TPU throughput path (BASELINE configs 2/4/5). It exploits a
geometric fact the per-pixel marcher can't: every *vertical* image column of a
panorama lies in a plane through the eye **and the Earth's center** (the eye's
up vector is radial). Within such a great-circle plane, terrain visibility is
monotone in elevation angle, so one column needs only:

  1. a 1-D profile of terrain elevation angles sampled along the ground trace
     (``[N, W]`` height gathers — the only random memory access), computed
     with cancellation-free geometry,
  2. a running maximum over the profile (`lax.cummax` along the sublane
     axis — the classic "y-buffer" of terrain renderers, as a scan),
  3. a per-pixel binary search of the monotone running max to find the first
     profile sample occluding each pixel's angle (log2 N lane-aligned
     `take_along_axis` steps),
  4. triangle-exact attribute sampling at the refined crossing.

Compared to rasterizing ~8.6M triangles per tile per frame
(`topo-renderer/src/render/render_buffer.rs:191-219`), the work is
O(W·N + H·W·log N) dense vector ops. Log-spaced sample distances double as
continuous LOD: step length tracks distance, so far terrain is sampled at the
rate it subtends pixels.

TPU layout rules used throughout (see SURVEY §7 / pallas guide):
  * everything is scalar planes ``[N, W]`` (profile) or ``[H, W]`` (pixels) —
    W rides the 128-lane axis; no ``[..., 3]`` vector trailing axes;
  * scans run along the sublane axis;
  * sample distances are an analytic function of the step index, so crossing
    refinement needs no extra profile gathers.

The reference has no panorama mode; camera/shading/postprocess semantics are
shared with the perspective path for drop-in parity of the image content.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from topo_renderer_tpu.models.camera import FAR, NEAR, depth_from_dist
from topo_renderer_tpu.ops import shading as shd
from topo_renderer_tpu.ops.geometry import R0
from topo_renderer_tpu.ops.postprocess import (
    atmospheric_shading_soa,
    distance_fog_soa,
    postprocess_soa,
)
from topo_renderer_tpu.ops.surface import raster_from_geo, sample_attributes_soa, sample_height


@dataclasses.dataclass(frozen=True)
class PanoramaSpec:
    """Static panorama parameters (part of the jit cache key)."""

    width: int = 2048
    height: int = 512
    azimuth_start: float = 0.0  # radians, 0 = north, increasing eastward
    azimuth_span: float = 6.283185307179586  # full circle
    elev_min: float | None = None  # radians; default: square pixels
    elev_max: float | None = None
    n_steps: int = 1024
    s_near: float = 5.0  # meters along the ground
    s_far: float = FAR
    n_refine: int = 2

    def elevation_range(self) -> tuple[float, float]:
        if self.elev_min is not None and self.elev_max is not None:
            return (self.elev_min, self.elev_max)
        half = 0.5 * self.azimuth_span * self.height / self.width
        return (-half, half)


def _eye_frame(eye):
    """(a0, up-, east-, north- component scalars) for the eye position."""
    e_norm = jnp.linalg.norm(eye)
    a0 = e_norm - R0
    ux, uy, uz = eye[0] / e_norm, eye[1] / e_norm, eye[2] / e_norm
    lon0 = jnp.arctan2(eye[1], eye[0])
    lat0 = jnp.arcsin(jnp.clip(eye[2] / e_norm, -1.0, 1.0))
    ex, ey = -jnp.sin(lon0), jnp.cos(lon0)
    nx = -jnp.sin(lat0) * jnp.cos(lon0)
    ny = -jnp.sin(lat0) * jnp.sin(lon0)
    nz = jnp.cos(lat0)
    return a0, (ux, uy, uz), (ex, ey), (nx, ny, nz)


def _surface_elevation(mosaic, a0, up, h_col, sig):
    """Elevation angle of the terrain surface along columns at angular ground
    distance ``sig`` (broadcastable against the column planes in ``h_col``).

    Cancellation-free at ECEF scale:
      y = h cos(sig) - a0 - 2 R0 sin^2(sig/2),   x = (R0 + h) sin(sig).
    """
    ux, uy, uz = up
    hx, hy, hz = h_col
    cs = jnp.cos(sig)
    sn = jnp.sin(sig)
    sdx = ux * cs + hx * sn
    sdy = uy * cs + hy * sn
    sdz = uz * cs + hz * sn
    lat = jnp.degrees(jnp.arcsin(jnp.clip(sdz, -1.0, 1.0)))
    lon = jnp.degrees(jnp.arctan2(sdy, sdx))
    gx, gy = raster_from_geo(mosaic, lon, lat)
    h = sample_height(mosaic, gx, gy)
    y = h * cs - a0 - 2.0 * R0 * jnp.sin(0.5 * sig) ** 2
    x = (R0 + h) * sn
    return jnp.arctan2(y, x), (sdx, sdy, sdz), h, (x, y)


@partial(jax.jit, static_argnames=("spec", "quantize_rt", "apply_postprocess", "fog", "pixelize_n"))
def render_panorama(
    mosaic,
    eye,
    spec: PanoramaSpec,
    sun_direction,
    view_mode=0,
    pixelize_n=None,
    quantize_rt: bool = True,
    apply_postprocess: bool = True,
    fog: str | None = None,
    fog_density: float = 1.0 / 80_000.0,
    azimuth_offset=0.0,
    pixel_offset_x=0.0,
):
    """Render a cylindrical panorama around ``eye``.

    Returns the same output dict as `ops.raycast.render_perspective` (color,
    depth in the reference 0..1 convention, distance, hit mask).
    ``fog``: None | "distance" | "atmosphere". ``azimuth_offset`` is a traced
    extra rotation — azimuth-sharded rendering passes each shard's slice
    offset here (`parallel/sharded.py`).
    """
    eye = jnp.asarray(eye, jnp.float32)
    W, H, N = spec.width, spec.height, spec.n_steps

    a0, up, (ex, ey), (nx0, ny0, nz0) = _eye_frame(eye)

    phi = spec.azimuth_start + jnp.float32(azimuth_offset) + spec.azimuth_span * (
        (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    )
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    h_col = (nx0 * cphi + ex * sphi, ny0 * cphi + ey * sphi, nz0 * cphi)  # [W]

    # Log-spaced ground distances; sigma is an analytic function of step
    # index so refinement never needs to gather the schedule.
    log_near = jnp.float32(jnp.log(spec.s_near))
    log_ratio = jnp.float32(jnp.log(spec.s_far / spec.s_near))

    def sigma_of(kf):
        return jnp.exp(log_near + log_ratio * (kf / (N - 1))) / R0

    k = jnp.arange(N, dtype=jnp.float32)[:, None]  # [N, 1]
    sigma = sigma_of(k)  # [N, 1] broadcasts over W

    h_col_b = tuple(c[None, :] for c in h_col)
    e_prof, _, _, _ = _surface_elevation(mosaic, a0, up, h_col_b, sigma)  # [N, W]
    m_prof = jax.lax.cummax(e_prof, axis=0)

    # Pixel elevation angles, row 0 at the top.
    e_lo, e_hi = spec.elevation_range()
    rows = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    e_pix = (jnp.float32(e_hi) - rows * jnp.float32(e_hi - e_lo))[:, None]  # [H, 1]

    # First-crossing search as a forward scan over profile chunks. A binary
    # search (or XLA searchsorted) would cost O(log N) random gathers of
    # [H, W] values — each such gather measures ~100x slower on TPU than the
    # equivalent dense compare — so instead each profile step broadcasts
    # against all pixel rows and the crossing state is carried densely.
    # At the first k with M_k > e_pix the running max must have just risen,
    # so theta_k == M_k; M_{k-1} comes from the shifted profile.
    m_prev = jnp.concatenate(
        [jnp.full((1, W), -1.0e30, jnp.float32), m_prof[:-1]], axis=0
    )
    CHUNK = 16
    assert N % CHUNK == 0, "n_steps must be a multiple of 16"

    def body(carry, i):
        kf, th_c, mb_c = carry
        base = i * CHUNK
        m_chunk = jax.lax.dynamic_slice_in_dim(m_prof, base, CHUNK, 0)
        p_chunk = jax.lax.dynamic_slice_in_dim(m_prev, base, CHUNK, 0)
        for c in range(CHUNK):
            m_k = m_chunk[c][None, :]
            cross = (kf >= jnp.float32(N)) & (m_k > e_pix)
            th_c = jnp.where(cross, m_k, th_c)
            mb_c = jnp.where(cross, p_chunk[c][None, :], mb_c)
            kf = jnp.where(cross, (base + c).astype(jnp.float32), kf)
        return (kf, th_c, mb_c), None

    init = (
        jnp.full((H, W), jnp.float32(N)),
        jnp.zeros((H, W), jnp.float32),
        jnp.zeros((H, W), jnp.float32),
    )
    (kf, theta_hi, m_lo), _ = jax.lax.scan(
        body, init, jnp.arange(N // CHUNK, dtype=jnp.int32)
    )
    hit = kf < jnp.float32(N)
    kstar = jnp.clip(kf, 0.0, jnp.float32(N - 1))

    sig_hi = sigma_of(kstar)
    sig_lo = jnp.where(kstar > 0, sigma_of(jnp.maximum(kstar - 1.0, 0.0)), sigma_of(0.0))

    denom = theta_hi - m_lo
    tfrac = jnp.clip(
        (e_pix - m_lo) / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom), 0.0, 1.0
    )
    tfrac = jnp.where(kstar > 0, tfrac, 0.0)
    sig_star = sig_lo + tfrac * (sig_hi - sig_lo)

    # Optional bisection against the true surface between bracketing samples.
    if spec.n_refine > 0:
        h_col_p = tuple(c[None, :] for c in h_col)  # [1, W] vs [H, W] planes

        def refine(_, state):
            slo, shi = state
            mid = 0.5 * (slo + shi)
            e_mid, _, _, _ = _surface_elevation(mosaic, a0, up, h_col_p, mid)
            below = e_mid < e_pix
            return jnp.where(below, mid, slo), jnp.where(below, shi, mid)

        slo, shi = jax.lax.fori_loop(0, spec.n_refine, refine, (sig_lo, sig_hi))
        sig_star = jnp.where(kstar > 0, shi, sig_star)

    # Attributes at the crossing (per-pixel planes).
    h_col_p = tuple(c[None, :] for c in h_col)
    cs = jnp.cos(sig_star)
    sn = jnp.sin(sig_star)
    ux, uy, uz = up
    hx, hy, hz = h_col_p
    sdx = ux * cs + hx * sn
    sdy = uy * cs + hy * sn
    sdz = uz * cs + hz * sn
    lat = jnp.degrees(jnp.arcsin(jnp.clip(sdz, -1.0, 1.0)))
    lon = jnp.degrees(jnp.arctan2(sdy, sdx))
    gx, gy = raster_from_geo(mosaic, lon, lat)
    h_star, n_x, n_y, n_z, _ = sample_attributes_soa(mosaic, gx, gy)
    h_star = jnp.maximum(h_star, -1e4)  # keep sky distances sane

    y_ip = h_star * cs - a0 - 2.0 * R0 * jnp.sin(0.5 * sig_star) ** 2
    x_ip = (R0 + h_star) * sn
    dist = jnp.sqrt(x_ip * x_ip + y_ip * y_ip)

    depth = jnp.where(hit, depth_from_dist(jnp.clip(dist, NEAR, FAR)), 1.0)

    # Dither seed: pixel center + eye.xy - world position.xy
    # (`render_shader.wgsl:103`), all in f32 like the reference.
    pos_x = (R0 + h_star) * sdx
    pos_y = (R0 + h_star) * sdy
    px = jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5 + jnp.float32(pixel_offset_x)
    py = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5
    seed_x = px + eye[0] - pos_x
    seed_y = py + eye[1] - pos_y

    sun = jnp.asarray(sun_direction, jnp.float32)
    r, g, b = shd.shade_soa(n_x, n_y, n_z, sun, view_mode, seed_x, seed_y)
    sky = shd.SKY_COLOR
    r = jnp.where(hit, r, sky[0])
    g = jnp.where(hit, g, sky[1])
    b = jnp.where(hit, b, sky[2])
    channels = (r, g, b)

    if fog == "distance":
        channels = distance_fog_soa(channels, dist, sky, density=fog_density, sky_mask=~hit)
    elif fog == "atmosphere":
        channels = atmospheric_shading_soa(channels, dist, sky, sky_mask=~hit)

    if quantize_rt:
        channels = tuple(shd.quantize_srgb8(c) for c in channels)
    if apply_postprocess:
        channels = postprocess_soa(channels, depth, pixelize_n=pixelize_n)

    return {
        "color": jnp.stack(channels, axis=-1),
        "depth": depth,
        "distance": jnp.where(hit, dist, FAR),
        "hit": hit,
    }
