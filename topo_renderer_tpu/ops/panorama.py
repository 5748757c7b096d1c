"""Cylindrical panorama renderer: great-circle column marching.

This is the TPU throughput path (BASELINE configs 2/4/5). It exploits a
geometric fact the per-pixel marcher can't: every *vertical* image column of a
panorama lies in a plane through the eye **and the Earth's center** (the eye's
up vector is radial). Within such a great-circle plane, terrain visibility is
monotone in elevation angle, so one column needs only:

  1. a 1-D profile of terrain elevation angles sampled along the ground trace
     (``[W, N]`` height gathers — the only random memory access), computed
     with cancellation-free geometry,
  2. a running maximum over the profile (`lax.cummax` — the classic
     "y-buffer" of terrain renderers, expressed as a scan),
  3. a per-pixel binary search of the monotone running max (`searchsorted`)
     to find the first profile sample that occludes each pixel's angle,
  4. triangle-exact attribute sampling at the refined crossing.

Compared to rasterizing ~8.6M triangles per tile per frame
(`topo-renderer/src/render/render_buffer.rs:191-219`), the work is
O(W·N + H·W·log N) dense vector ops — a shape XLA maps well onto the VPU.
Log-spaced sample distances double as continuous LOD: step length tracks
distance, so far terrain is sampled at the rate it subtends pixels.

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
    atmospheric_shading,
    distance_fog,
    postprocess,
)
from topo_renderer_tpu.ops.surface import raster_from_geo, sample_attributes, sample_height


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
    n_refine: int = 6

    def elevation_range(self) -> tuple[float, float]:
        if self.elev_min is not None and self.elev_max is not None:
            return (self.elev_min, self.elev_max)
        half = 0.5 * self.azimuth_span * self.height / self.width
        return (-half, half)


def _profile_angles(mosaic, up, h_az, a0, sigma):
    """Elevation angle + in-plane coordinates of terrain samples.

    ``up`` [3], ``h_az`` [W, 3] horizontal azimuth direction, ``sigma`` [N]
    angular ground distances. Returns (e [W, N], x [W, N], y [W, N], h [W, N]).

    Cancellation-free forms (f32-safe at ECEF magnitudes):
      y = h cos(sigma) - a0 - 2 R0 sin^2(sigma/2)   (height above horizontal)
      x = (R0 + h) sin(sigma)                        (horizontal reach)
    """
    cs = jnp.cos(sigma)[None, :]
    sn = jnp.sin(sigma)[None, :]
    shalf2 = jnp.sin(0.5 * sigma)[None, :] ** 2

    s_dir = up[None, None, :] * cs[..., None] + h_az[:, None, :] * sn[..., None]
    lat = jnp.degrees(jnp.arcsin(jnp.clip(s_dir[..., 2], -1.0, 1.0)))
    lon = jnp.degrees(jnp.arctan2(s_dir[..., 1], s_dir[..., 0]))
    gx, gy = raster_from_geo(mosaic, lon, lat)
    h = sample_height(mosaic, gx, gy)  # [W, N]; INVALID -> giant negative

    y = h * cs - a0 - 2.0 * R0 * shalf2
    x = (R0 + h) * sn
    e = jnp.arctan2(y, x)
    return e, x, y, h


@partial(jax.jit, static_argnames=("spec", "quantize_rt", "apply_postprocess", "fog"))
def render_panorama(
    mosaic,
    eye,
    spec: PanoramaSpec,
    sun_direction,
    view_mode=0,
    pixelize_n=100.0,
    quantize_rt: bool = True,
    apply_postprocess: bool = True,
    fog: str | None = None,
    fog_density: float = 1.0 / 80_000.0,
):
    """Render a cylindrical panorama around ``eye``.

    Returns the same output dict as `ops.raycast.render_perspective` (color,
    depth in the reference 0..1 convention, distance, hit mask).
    ``fog``: None | "distance" | "atmosphere".
    """
    eye = jnp.asarray(eye, jnp.float32)
    W, H, N = spec.width, spec.height, spec.n_steps

    e_norm = jnp.linalg.norm(eye)
    up = eye / e_norm
    a0 = e_norm - R0
    lon0 = jnp.arctan2(eye[1], eye[0])
    lat0 = jnp.arcsin(jnp.clip(eye[2] / e_norm, -1.0, 1.0))
    east = jnp.stack([-jnp.sin(lon0), jnp.cos(lon0), jnp.zeros_like(lon0)])
    north = jnp.stack(
        [-jnp.sin(lat0) * jnp.cos(lon0), -jnp.sin(lat0) * jnp.sin(lon0), jnp.cos(lat0)]
    )

    phi = spec.azimuth_start + spec.azimuth_span * (
        (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    )
    h_az = north[None, :] * jnp.cos(phi)[:, None] + east[None, :] * jnp.sin(phi)[:, None]

    # Log-spaced ground distances -> angular distances.
    k = jnp.arange(N, dtype=jnp.float32)
    s = spec.s_near * (spec.s_far / spec.s_near) ** (k / (N - 1))
    sigma = s / R0

    e_prof, _, _, _ = _profile_angles(mosaic, up, h_az, a0, sigma)
    m_prof = jax.lax.cummax(e_prof, axis=1)  # [W, N] non-decreasing

    # Pixel elevation angles, row 0 at the top.
    e_lo, e_hi = spec.elevation_range()
    rows = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    e_pix = jnp.float32(e_hi) - rows * jnp.float32(e_hi - e_lo)  # [H]

    # First profile index whose running max exceeds the pixel angle.
    kstar = jax.vmap(lambda m: jnp.searchsorted(m, e_pix, side="right"))(m_prof)
    kstar = kstar.T  # [H, W]
    hit = kstar < N

    k_hi = jnp.clip(kstar, 0, N - 1)
    k_lo = jnp.clip(kstar - 1, 0, N - 1)
    col = jnp.arange(W)[None, :]
    theta_hi = e_prof[col, k_hi]
    m_lo = m_prof[col, k_lo]
    sig_hi = sigma[k_hi]
    sig_lo = jnp.where(kstar > 0, sigma[k_lo], sigma[0])

    denom = theta_hi - m_lo
    tfrac = jnp.clip((e_pix[:, None] - m_lo) / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom), 0.0, 1.0)
    tfrac = jnp.where(kstar > 0, tfrac, 0.0)
    sig_star = sig_lo + tfrac * (sig_hi - sig_lo)

    # Optional bisection refinement against the true surface between samples.
    h_cols = h_az  # [W, 3]

    def surf_angle(sig):
        cs = jnp.cos(sig)
        sn = jnp.sin(sig)
        sd = up[None, None, :] * cs[..., None] + h_cols[None, :, :] * sn[..., None]
        lat = jnp.degrees(jnp.arcsin(jnp.clip(sd[..., 2], -1.0, 1.0)))
        lon = jnp.degrees(jnp.arctan2(sd[..., 1], sd[..., 0]))
        gx, gy = raster_from_geo(mosaic, lon, lat)
        h = sample_height(mosaic, gx, gy)
        y = h * cs - a0 - 2.0 * R0 * jnp.sin(0.5 * sig) ** 2
        x = (R0 + h) * sn
        return jnp.arctan2(y, x)

    def refine(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        below = surf_angle(mid) < e_pix[:, None]  # surface still below the ray
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    if spec.n_refine > 0:
        lo0 = sig_lo
        hi0 = sig_hi
        lo, hi = jax.lax.fori_loop(0, spec.n_refine, refine, (lo0, hi0))
        sig_star = jnp.where(kstar > 0, hi, sig_star)

    # Attributes at the crossing.
    cs = jnp.cos(sig_star)
    sn = jnp.sin(sig_star)
    sd = up[None, None, :] * cs[..., None] + h_cols[None, :, :] * sn[..., None]
    lat = jnp.degrees(jnp.arcsin(jnp.clip(sd[..., 2], -1.0, 1.0)))
    lon = jnp.degrees(jnp.arctan2(sd[..., 1], sd[..., 0]))
    gx, gy = raster_from_geo(mosaic, lon, lat)
    h_star, n_world, _ = sample_attributes(mosaic, gx, gy)
    h_star = jnp.maximum(h_star, -1e4)  # keep sky distances sane

    y_ip = h_star * cs - a0 - 2.0 * R0 * jnp.sin(0.5 * sig_star) ** 2
    x_ip = (R0 + h_star) * sn
    dist = jnp.sqrt(x_ip * x_ip + y_ip * y_ip)
    pos = (R0 + h_star)[..., None] * sd

    depth = jnp.where(hit, depth_from_dist(jnp.clip(dist, NEAR, FAR)), 1.0)

    px = jnp.arange(W, dtype=jnp.float32) + 0.5
    py = jnp.arange(H, dtype=jnp.float32) + 0.5
    seed = jnp.stack(
        [
            px[None, :] + eye[0] - pos[..., 0],
            py[:, None] + eye[1] - pos[..., 1],
        ],
        axis=-1,
    )
    color = shd.shade(n_world, jnp.asarray(sun_direction, jnp.float32), view_mode, seed)
    sky = jnp.asarray(shd.SKY_COLOR, jnp.float32)
    color = jnp.where(hit[..., None], color, sky)

    if fog == "distance":
        color = distance_fog(color, dist, sky, density=fog_density, sky_mask=~hit)
    elif fog == "atmosphere":
        color = atmospheric_shading(color, dist, sky, sky_mask=~hit)

    if quantize_rt:
        color = shd.quantize_srgb8(color)
    if apply_postprocess:
        color = postprocess(color, depth, pixelize_n=pixelize_n)

    return {
        "color": color,
        "depth": depth,
        "distance": jnp.where(hit, dist, FAR),
        "hit": hit,
    }
