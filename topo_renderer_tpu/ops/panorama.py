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
from topo_renderer_tpu.ops.surface import (
    INVALID_HEIGHT,
    raster_from_ecef,
    raster_from_geo,
    sample_attributes_nearest,
    sample_attributes_soa,
    sample_height_level,
)


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
    # --- LOD / throughput knobs (gather count is the TPU cost driver) ----
    lod: bool = False  # sample distance-matched height mips for the profile
    lod_texel_m: float | None = None  # texel-size override (m); None =
    # the mosaic's own static texel_m hint (COP-90: ~92.6 m)
    profile_stride: int = 1  # compute the profile on every k-th column
    profile_nearest: bool = False  # nearest- instead of triangle-sampling
    attrs_nearest: bool = False  # nearest-texel shading attributes
    attrs_from_profile: bool = False  # shade from per-sample attrs (needs lod)
    clipmap: bool = False  # gather from eye-centered windows, not full tables
    # Tables above this size are windowed; smaller ones are gathered in
    # full. Two pressures set the value: XLA cross-program-prefetches
    # *whole* used tables into scratch each execution (so big tables left in
    # the render program cost their full size in per-frame HBM traffic), but
    # each extracted window also carries a fixed per-frame copy cost —
    # windowing tiny tables measures strictly slower.
    clipmap_threshold: int = 2_000_000
    near_bilinear_m: float = 0.0  # bilinear-sample profile steps closer than
    # this ground distance (kills nearest-texel blockiness in close-ups)
    # Double the azimuth stride for profile steps beyond this ground
    # distance (0 = off). Far terrain varies slowly with azimuth, so the
    # far segments sample half the columns and repeat — both visibility
    # AND the profile-carried shading attributes of distant terrain
    # quantize to 2-column (~2 px) azimuth blocks, in exchange for fewer
    # profile gathers (~5% off config 4 at 8 km; an opt-in serving knob).
    #
    # Quality bound (why stride is distance-INDEPENDENT-safe under the log
    # schedule): at ground distance d the lateral spacing of stride-k
    # samples is k*d*dphi metres while the LOD level sampled there has
    # texels of ~ds = 0.0112*d metres, so the lateral quantization is
    # k*dphi/0.0112 LOD texels — e.g. 0.27 texel at k=2 and 0.55 texel at
    # k=4 for a 4096-wide 360 degree panorama. The stride never outruns
    # the resolution the LOD schedule is already sampling at.
    profile_far_stride_m: float = 0.0
    # Second tier: QUADRUPLE the azimuth stride beyond this distance
    # (0 = off; use together with profile_far_stride_m < this). Same
    # quality bound with k=4.
    profile_far_stride4_m: float = 0.0
    # Banded Pallas crossing kernel (ops/pallas_crossing.py): bit-identical
    # output; exploits the running-max/threshold monotonicity to update only
    # the contiguous crossing band per step (O(H+N) row-updates instead of
    # O(N*H)) — measured 10.7 -> 8.9 ms end-to-end at 4096x1024/512 steps.
    use_pallas: bool = True

    def elevation_range(self) -> tuple[float, float]:
        if self.elev_min is not None and self.elev_max is not None:
            return (self.elev_min, self.elev_max)
        half = 0.5 * self.azimuth_span * self.height / self.width
        return (-half, half)

    @staticmethod
    def fast(width=2048, height=512, n_steps=512, **kw) -> "PanoramaSpec":
        """Throughput preset: clipmapped mip LOD, nearest profile sampling,
        attributes carried by the profile samples, no per-pixel refinement
        (BASELINE configs 4/5). All gathers touch eye-centered windows whose
        size is independent of the scene, so cost does not grow with the
        loaded tile count."""
        kw.setdefault("lod", True)
        kw.setdefault("profile_stride", 2)
        kw.setdefault("profile_nearest", True)
        kw.setdefault("attrs_from_profile", True)
        kw.setdefault("clipmap", True)
        kw.setdefault("near_bilinear_m", 3000.0)
        kw.setdefault("n_refine", 0)
        return PanoramaSpec(width=width, height=height, n_steps=n_steps, **kw)


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
    return a0, (ux, uy, uz), (ex, ey), (nx, ny, nz), (lon0, lat0)


def _surface_elevation(mosaic, a0, up, h_col, sig, level: int = 0, nearest: bool = False):
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
    gx, gy = raster_from_ecef(mosaic, sdx, sdy, sdz, 1.0)
    h = sample_height_level(mosaic, level, gx, gy, nearest=nearest)
    y = h * cs - a0 - 2.0 * R0 * jnp.sin(0.5 * sig) ** 2
    x = (R0 + h) * sn
    return jnp.arctan2(y, x)


def _texel_m(spec: PanoramaSpec, mosaic) -> float:
    """Effective base texel size: the spec override, else the mosaic's static
    hint. The LOD schedule and the clipmap coverage guarantee must both use
    the *actual* texel size or fine-grained scenes sample level 0 far beyond
    the window radius."""
    if spec.lod_texel_m is not None:
        return float(spec.lod_texel_m)
    return float(getattr(mosaic, "texel_m", 92.6))


def _lod_segments(spec: PanoramaSpec, n_levels: int, texel_m: float):
    """Static per-step mip level from the log step schedule: level L once the
    step length reaches ~2^L base texels. Returns [(level, k0, k1), ...]."""
    import numpy as _np

    k = _np.arange(spec.n_steps)
    s = spec.s_near * (spec.s_far / spec.s_near) ** (k / (spec.n_steps - 1))
    ds = s * (_np.log(spec.s_far / spec.s_near) / (spec.n_steps - 1))
    level = _np.clip(
        _np.floor(_np.log2(_np.maximum(ds / texel_m, 1e-6))) + 1, 0, n_levels
    ).astype(int)
    segments = []
    k0 = 0
    for i in range(1, spec.n_steps + 1):
        if i == spec.n_steps or level[i] != level[k0]:
            segments.append((int(level[k0]), k0, i))
            k0 = i
    return segments


def _clipmap_window_plan(spec: PanoramaSpec, mosaic):
    """Static clipmap plan: [(level, use_window, wsy, wsx, table_shape)].

    With a log step schedule each mip level is only ever sampled within a
    *constant* texel radius (~2.5/dlog) of the eye, so window sizes depend on
    the spec alone, never on the scene.
    """
    import numpy as _np

    n_levels = len(mosaic.mip_shapes)
    dlog = _np.log(spec.s_far / spec.s_near) / (spec.n_steps - 1)
    # A coarser-than-actual texel override stretches each level's sampling
    # radius (in real texels) by the ratio; grow the windows to keep coverage.
    ratio = max(1.0, _texel_m(spec, mosaic) / float(getattr(mosaic, "texel_m", 92.6)))
    need = int(_np.ceil(2.5 * ratio / dlog)) + 16
    # Window origins are aligned DOWN to the (8, 128) HBM tiling so the
    # Pallas DMA extraction can slice the tables in place. Down-alignment
    # shifts the window up to 7 rows / 127 lanes off center, and the far
    # (east/south) edge loses exactly that shift — so the slack must cover
    # TWICE the worst shift to preserve the +/-need coverage radius on both
    # sides (+16 rows, +256 lanes; +8/+128 left the east edge up to 63
    # lanes short, surfacing as sky holes in the easternmost azimuths of a
    # level for unlucky eye positions).
    wsy_req = -(-(2 * need + 16) // 8) * 8
    wsx_req = -(-(2 * need + 256) // 128) * 128
    plan = []
    for level in range(n_levels + 1):
        shape_l = mosaic.shape if level == 0 else mosaic.mip_shapes[level - 1]
        h_t, w_t = shape_l
        use_window = (
            spec.clipmap
            and (h_t * w_t > spec.clipmap_threshold)
            and h_t >= wsy_req
            and w_t >= wsx_req
        )
        plan.append((level, use_window, wsy_req, wsx_req, shape_l))
    return plan


def _bilinear_levels(spec: PanoramaSpec, n_levels: int, texel_m: float) -> set:
    """Levels whose schedule segment overlaps the bilinear near field
    (static; mirrors the segment split in `_build_lod_profile`)."""
    if spec.near_bilinear_m <= 0.0:
        return set()
    import numpy as _np

    s = spec.s_near * (spec.s_far / spec.s_near) ** (
        _np.arange(spec.n_steps) / (spec.n_steps - 1)
    )
    k_cut = int(_np.searchsorted(s, spec.near_bilinear_m))
    return {
        level
        for level, k0, k1 in _lod_segments(spec, n_levels, texel_m)
        if k0 < k_cut
    }


def _window_origin(gx_e, gy_e, level: int, wsy: int, wsx: int, h_t: int, w_t: int):
    """Aligned eye-centered window origin for one clipmap level.

    Shared by the replicated, batched and row-sharded extractors — the
    clip + (8, 128) down-alignment semantics must stay identical in all
    three or their bit-parity guarantees break. Works elementwise for
    batched ``gx_e``/``gy_e``.
    """
    s = float(2**level)
    off = (s - 1.0) / 2.0
    sx = jnp.clip(
        jnp.round((gx_e - off) / s).astype(jnp.int32) - wsx // 2, 0, w_t - wsx
    )
    sx = (sx // 128) * 128
    sy = jnp.clip(
        jnp.round((gy_e - off) / s).astype(jnp.int32) - wsy // 2, 0, h_t - wsy
    )
    sy = (sy // 8) * 8
    return sx, sy


def _slice_level_xla(mosaic, level, use_attr, quad_levels, sy, sx, wsy, wsx, w_t):
    """XLA window slicing for one level (no Pallas DMA): returns
    ``(tbl_h, tbl_a, tbl_q)``. Shared by the replicated extractor's fallback
    branches and the sharded extractor's replicated levels."""
    win2d = (
        mosaic.win_attr_2d[level]
        if level < len(getattr(mosaic, "win_attr_2d", ()))
        else None
    )
    if level == 0:
        hf, af = mosaic.heights_flat, mosaic.attr_packed_flat
    else:
        hf = mosaic.mip_heights_flat[level - 1]
        af = mosaic.mip_attr_flat[level - 1]
    tbl_h = tbl_a = tbl_q = None
    if use_attr and win2d is not None:
        sl = jax.lax.dynamic_slice(win2d, (jnp.int32(0), sy, sx), (2, wsy, wsx))
        tbl_a = sl.reshape(2, -1).T
        if level in quad_levels:
            tbl_q = _quad_rows(sl)
    elif use_attr:
        rows_a = jax.lax.dynamic_slice(
            af, (sy * w_t, 0), (wsy * w_t, 2)
        ).reshape(wsy, w_t, 2)
        sl = jax.lax.dynamic_slice(
            rows_a, (jnp.int32(0), sx, jnp.int32(0)), (wsy, wsx, 2)
        )
        tbl_a = sl.reshape(-1, 2)
        if level in quad_levels:
            tbl_q = _quad_rows(jnp.moveaxis(sl, -1, 0))
    else:
        rows_h = jax.lax.dynamic_slice(hf, (sy * w_t,), (wsy * w_t,)).reshape(
            wsy, w_t
        )
        tbl_h = jax.lax.dynamic_slice(
            rows_h, (jnp.int32(0), sx), (wsy, wsx)
        ).reshape(-1)
    return tbl_h, tbl_a, tbl_q


def _quad_rows(win):
    """Pack each texel's 2x2 bilinear neighborhood into one gather row.

    ``win f32[2, wsy, wsx]`` (height + bitcast-normal planes) ->
    ``f32[wsy*wsx, 8]`` rows (h00, b00, h01, b01, h10, b10, h11, b11) where
    01 = east, 10 = south, 11 = southeast neighbor (edge-clamped; the
    sampler clamps x0/y0 to size-2 so clamped texels are never blended in).
    Built from flat planes: stacking [wsy, wsx] planes on a trailing axis
    would pad that axis to 128 lanes (NOTES.md layout rules).
    """
    e = jnp.concatenate([win[:, :, 1:], win[:, :, -1:]], axis=2)
    s_ = jnp.concatenate([win[:, 1:, :], win[:, -1:, :]], axis=1)
    se = jnp.concatenate([s_[:, :, 1:], s_[:, :, -1:]], axis=2)
    planes = [win[0], win[1], e[0], e[1], s_[0], s_[1], se[0], se[1]]
    return jnp.stack([p.reshape(-1) for p in planes], axis=-1)


@partial(jax.jit, static_argnames=("spec", "force_xla"))
def extract_clipmap_windows(mosaic, eye, spec: PanoramaSpec, *, force_xla: bool = False):
    """Slice the eye-centered clipmap windows out of the mosaic tables.

    Runs as its own (tiny) XLA program so the multi-GB mosaic tables are
    parameters of *this* program only: XLA cross-program-prefetches large
    parameters of a program into scratch memory on every execution, which for
    the 15 ms render program meant re-streaming entire attribute tables each
    frame (~1.5 GB/frame at 100-tile scale). On TPU the slice itself is a
    bounded Pallas DMA (`ops/pallas_dma.py`) reading exactly the window
    texels, so extraction cost is independent of table size.

    Returns a tuple over levels of ``(tbl_h, tbl_a, tbl_q, ox, oy)`` —
    entries are ``None`` where the level is served from the full table.
    ``tbl_q f32[wsy*wsx, 8]`` packs each texel's 2x2 neighborhood
    (h00, b00, h01, b01, h10, b10, h11, b11) so the near-field bilinear
    sampling costs ONE row gather instead of four (row gathers of 8-32 B
    cost the same as scalar gathers on this TPU); built only for levels
    with a bilinear segment in the spec's schedule.
    """
    from topo_renderer_tpu.ops.pallas_dma import dma_available, window_slice_multi

    eye = jnp.asarray(eye, jnp.float32)
    n_levels = len(mosaic.mip_shapes)
    use_attr = bool(spec.attrs_from_profile and spec.lod and n_levels)
    e_norm = jnp.linalg.norm(eye)
    lon0 = jnp.degrees(jnp.arctan2(eye[1], eye[0]))
    lat0 = jnp.degrees(jnp.arcsin(jnp.clip(eye[2] / e_norm, -1.0, 1.0)))
    gx_e, gy_e = raster_from_geo(mosaic, lon0, lat0)

    quad_levels = (
        _bilinear_levels(spec, n_levels, _texel_m(spec, mosaic))
        if use_attr
        else set()
    )
    slots = {}  # level -> (sy, sx) of levels served by the batched DMA kernel
    dma_tables, dma_origins = [], []
    out = []
    for level, use_window, wsy, wsx, (h_t, w_t) in _clipmap_window_plan(spec, mosaic):
        if not use_window:
            out.append((None, None, None, None, None))
            continue
        sx, sy = _window_origin(gx_e, gy_e, level, wsy, wsx, h_t, w_t)
        win2d = (
            mosaic.win_attr_2d[level]
            if level < len(getattr(mosaic, "win_attr_2d", ()))
            else None
        )
        tbl_h = tbl_a = tbl_q = None
        if use_attr and win2d is not None and dma_available() and not force_xla:
            # One bounded DMA per level, batched below into a single
            # kernel: reads exactly the window texels; extraction cost is
            # independent of table size (XLA slicing re-streams whole
            # used tables via cross-program prefetch, ~9 ms/frame at
            # 100-tile scale).
            slots[level] = len(dma_tables)
            dma_tables.append(win2d)
            dma_origins.append(jnp.stack([sy, sx]))
        else:
            tbl_h, tbl_a, tbl_q = _slice_level_xla(
                mosaic, level, use_attr, quad_levels, sy, sx, wsy, wsx, w_t
            )
        out.append((tbl_h, tbl_a, tbl_q, sx, sy))

    if dma_tables:
        _, _, wsy, wsx, _ = _clipmap_window_plan(spec, mosaic)[0]
        wins = window_slice_multi(
            tuple(dma_tables), jnp.stack(dma_origins), wsy=wsy, wsx=wsx
        )
        for level, slot in slots.items():
            tbl_h, _, _, sx, sy = out[level]
            tbl_q = _quad_rows(wins[slot]) if level in quad_levels else None
            out[level] = (tbl_h, wins[slot].reshape(2, -1).T, tbl_q, sx, sy)
    return tuple(out)


@partial(
    jax.jit,
    static_argnames=(
        "spec", "quantize_rt", "apply_postprocess", "fog", "pixelize_n", "soa",
    ),
)
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
    elev_offset=0.0,
    pixel_offset_x=0.0,
    windows=None,
    soa: bool = False,
):
    """Render a cylindrical panorama around ``eye``.

    ``soa=True`` returns the color as a ``"chans"`` (r, g, b) plane tuple
    instead of a stacked ``"color"`` [H, W, 3]: a trailing-3 axis uses 3 of
    the VPU's 128 lanes wherever it materializes, and consumers that go on
    computing (the fast-path warp, the wire encode) immediately re-slice it
    anyway.

    Returns the same output dict as `ops.raycast.render_perspective` (color,
    depth in the reference 0..1 convention, distance, hit mask).
    ``fog``: None | "distance" | "atmosphere". ``azimuth_offset`` is a traced
    extra rotation — azimuth-sharded rendering passes each shard's slice
    offset here (`parallel/sharded.py`). ``windows`` — pre-extracted clipmap
    windows from :func:`extract_clipmap_windows`; passing them keeps the
    multi-GB mosaic tables out of this program's *used* parameter set, which
    stops XLA from cross-program-prefetching (re-streaming) whole tables
    every frame. `render/engine.py` does this automatically.
    """
    eye = jnp.asarray(eye, jnp.float32)
    W, H, N = spec.width, spec.height, spec.n_steps

    a0, up, (ex, ey), (nx0, ny0, nz0), (lon0, lat0) = _eye_frame(eye)

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

    # Profile columns (possibly strided: visibility varies smoothly with
    # azimuth, so the fast preset computes the profile on every st-th column
    # and reuses it for the group; shading attributes stay full resolution).
    st = max(1, int(spec.profile_stride))
    if st > 1:
        if W % st:
            raise ValueError("width must be divisible by profile_stride")
        ws = W // st
        phi_sub = spec.azimuth_start + jnp.float32(azimuth_offset) + spec.azimuth_span * (
            (jnp.arange(ws, dtype=jnp.float32) + 0.5) / ws
        )
        cps, sps = jnp.cos(phi_sub), jnp.sin(phi_sub)
        h_prof = (nx0 * cps + ex * sps, ny0 * cps + ey * sps, nz0 * cps)
    else:
        ws = W
        h_prof = h_col
    h_prof_b = tuple(c[None, :] for c in h_prof)

    n_levels = len(mosaic.mip_shapes) if hasattr(mosaic, "mip_shapes") else 0
    use_attr_prof = bool(spec.attrs_from_profile and spec.lod and n_levels)
    attr_prof = None
    if spec.lod and n_levels:
        if windows is None:
            windows = extract_clipmap_windows(mosaic, eye, spec)
        e_prof, attr_prof = _build_lod_profile(
            mosaic, spec, windows, a0, up, h_prof_b, sigma
        )
    else:
        e_prof = _surface_elevation(
            mosaic, a0, up, h_prof_b, sigma, nearest=spec.profile_nearest
        )
    m_prof = jax.lax.cummax(e_prof, axis=0)

    # Pixel elevation angles, row 0 at the top. The LOD profile stores
    # tan(e) ratios, so its per-row thresholds are tan(e_pix).
    ratio_space = bool(spec.lod and n_levels)
    e_lo, e_hi = spec.elevation_range()
    rows = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    e_pix = (
        jnp.float32(elev_offset) + jnp.float32(e_hi) - rows * jnp.float32(e_hi - e_lo)
    )[:, None]  # [H, 1]
    t_pix = jnp.tan(e_pix)
    thresh = t_pix if ratio_space else e_pix

    # First-crossing search as three *fused global reductions*. Because the
    # running max M is non-decreasing in k, the first k with M_k > e
    # satisfies:   theta_hi = M_{k*} = min{M_k : M_k > e}
    #              m_lo    = M_{k*-1} = max{M_k : M_k <= e}
    #              k*      = #{k : M_k <= e}
    # XLA fuses the [N, H, W] broadcast compare directly into the reductions
    # (nothing is materialized). This replaces both a binary search (log N
    # random gathers, ~85 ms each on TPU) and a sequential carry scan.
    n_payload = None
    use_pallas_kernel = False
    if use_attr_prof and spec.use_pallas:
        from topo_renderer_tpu.ops.pallas_crossing import (
            LANES,
            crossing_search_pallas,
            pallas_available,
        )

        # The banded kernel additionally needs H % 8 (sublane tiling); the
        # row thresholds here are structurally lane-constant and
        # non-increasing (tan of the top-down pixel elevation), as required.
        use_pallas_kernel = (
            (ws % LANES == 0) and (H % 8 == 0) and pallas_available()
        )

    if use_pallas_kernel:
        kstar, theta_hi, m_lo, p0, p1, p2 = crossing_search_pallas(
            e_prof, attr_prof[0], attr_prof[1], attr_prof[2],
            jnp.broadcast_to(thresh, (H, ws)), height=H,
        )
        n_payload = (p0, p1, p2)
    else:
        BIG = jnp.float32(3.0e38)
        m3 = m_prof[:, None, :]  # [N, 1, ws]
        e3 = thresh[None, :, :]  # [1, H, 1]
        le = m3 <= e3
        theta_hi = jnp.min(jnp.where(le, BIG, m3), axis=0)
        m_lo = jnp.max(jnp.where(le, m3, -BIG), axis=0)

        # Per-pixel shading normals straight from the hit profile sample via
        # packed-key reductions: key = k * 2^10 + payload10 over the tail
        # {k : M_k > e}. k* is unique, so the min lands exactly on the first
        # occluding sample and its payload rides along exactly (keys stay
        # below 2^24, f32-exact; k* itself falls out of the key). This
        # replaces two take_along_axis ops (~21 ms each on TPU).
        if use_attr_prof:
            if N > 16384:
                raise ValueError("attrs_from_profile supports n_steps <= 16384")
            BIGKEY = jnp.float32(16777216.0)  # 2^24 -> k = 16384 (sky)
            kk = (jnp.arange(N, dtype=jnp.float32) * 1024.0)[:, None, None]
            picks = [
                jnp.min(jnp.where(le, BIGKEY, kk + comp[:, None, :]), axis=0)
                for comp in attr_prof
            ]
            kstar = jnp.floor(picks[0] / 1024.0)  # exact; 16384 where sky
            n_payload = tuple(p - jnp.floor(p / 1024.0) * 1024.0 for p in picks)
        else:
            kstar = jnp.sum(le, axis=0).astype(jnp.float32)  # [H, ws]

    if st > 1:
        kstar = jnp.repeat(kstar, st, axis=1)
        theta_hi = jnp.repeat(theta_hi, st, axis=1)
        m_lo = jnp.repeat(m_lo, st, axis=1)
        if use_attr_prof:
            n_payload = tuple(jnp.repeat(p, st, axis=1) for p in n_payload)

    hit = kstar < jnp.float32(N)
    kstar = jnp.clip(kstar, 0.0, jnp.float32(N - 1))

    sig_hi = sigma_of(kstar)
    sig_lo = jnp.where(kstar > 0, sigma_of(jnp.maximum(kstar - 1.0, 0.0)), sigma_of(0.0))

    denom = theta_hi - m_lo
    tfrac = jnp.clip(
        (thresh - m_lo) / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom), 0.0, 1.0
    )
    tfrac = jnp.where(kstar > 0, tfrac, 0.0)
    sig_star = sig_lo + tfrac * (sig_hi - sig_lo)

    # Optional bisection against the true surface between bracketing samples.
    if spec.n_refine > 0:
        h_col_p = tuple(c[None, :] for c in h_col)  # [1, W] vs [H, W] planes

        def refine(_, state):
            slo, shi = state
            mid = 0.5 * (slo + shi)
            e_mid = _surface_elevation(mosaic, a0, up, h_col_p, mid)
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
    if use_attr_prof:
        # Analytic hit height: the crossing lies on the pixel ray at ground
        # angle sig*, so h satisfies  h cos - a0 - 2 R0 sin^2(s/2) = tan(e) x.
        tanp = t_pix
        sh2s = jnp.sin(0.5 * sig_star) ** 2
        h_star = (a0 + 2.0 * R0 * sh2s + tanp * R0 * sn) / (cs - tanp * sn)
        n_x = 2.0 * (n_payload[0] / 1023.0) - 1.0
        n_y = 2.0 * (n_payload[1] / 1023.0) - 1.0
        n_z = 2.0 * (n_payload[2] / 1023.0) - 1.0
    else:
        gx, gy = raster_from_ecef(mosaic, sdx, sdy, sdz, 1.0)
        if spec.attrs_nearest:
            h_star, n_x, n_y, n_z, _ = sample_attributes_nearest(mosaic, gx, gy)
        else:
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

    out = {
        "depth": depth,
        "distance": jnp.where(hit, dist, FAR),
        "hit": hit,
    }
    if soa:
        out["chans"] = channels
    else:
        out["color"] = jnp.stack(channels, axis=-1)
    return out


@partial(jax.jit, static_argnames=("spec",))
def extract_clipmap_windows_batched(mosaic, eyes, spec: PanoramaSpec):
    """B viewpoints' clipmap windows in ONE program (BASELINE config 5).

    Round 1 pipelined per-eye extraction+render programs because naively
    vmapping the extraction turns the small per-eye windows into batched
    gathers that forfeit locality (~3x slower). The batched DMA kernel
    (`ops/pallas_dma.py::window_slice_multi_batched`) keeps each window a
    bounded contiguous copy — one grid program per viewpoint, L overlapped
    DMAs each — so a whole batch extracts in one dispatch and the batched
    render can be a single program too. Falls back to the vmapped slicing
    on backends without Mosaic (CPU tests).

    Returns the same per-level tuple structure as
    `extract_clipmap_windows`, with a leading batch axis on every array.
    """
    from topo_renderer_tpu.ops.pallas_dma import (
        dma_available,
        window_slice_multi_batched,
    )

    eyes = jnp.asarray(eyes, jnp.float32)
    B = eyes.shape[0]
    n_levels = len(mosaic.mip_shapes)
    use_attr = bool(spec.attrs_from_profile and spec.lod and n_levels)

    plan = _clipmap_window_plan(spec, mosaic)
    windowed = [p for p in plan if p[1]]
    have_2d = {
        lv
        for lv, use, _, _, _ in plan
        if use
        and lv < len(getattr(mosaic, "win_attr_2d", ()))
        and mosaic.win_attr_2d[lv] is not None
    }
    # The batched DMA path needs every windowed level to carry a 2-D table;
    # otherwise (or without Mosaic) vmap the single-eye extraction.
    if not (
        use_attr
        and dma_available()
        and windowed
        and all(lv in have_2d for lv, *_ in windowed)
    ):
        # The manual-DMA (ANY-memspace) pallas_call is not batchable; when
        # only the fallback works for this spec, force the XLA slicing path
        # inside the vmapped extractor even where dma_available() is true.
        return jax.vmap(
            lambda e: extract_clipmap_windows(mosaic, e, spec, force_xla=True)
        )(eyes)

    e_norm = jnp.linalg.norm(eyes, axis=-1)
    lon0 = jnp.degrees(jnp.arctan2(eyes[:, 1], eyes[:, 0]))
    lat0 = jnp.degrees(jnp.arcsin(jnp.clip(eyes[:, 2] / e_norm, -1.0, 1.0)))
    gx_e, gy_e = raster_from_geo(mosaic, lon0, lat0)  # [B]

    quad_levels = _bilinear_levels(spec, n_levels, _texel_m(spec, mosaic))

    tables, origins, order = [], [], []
    sxy = {}
    for level, use_window, wsy, wsx, (h_t, w_t) in plan:
        if not use_window:
            continue
        sx, sy = _window_origin(gx_e, gy_e, level, wsy, wsx, h_t, w_t)
        sxy[level] = (sx, sy)
        tables.append(mosaic.win_attr_2d[level])
        origins.append(jnp.stack([sy, sx], axis=-1))  # [B, 2]
        order.append(level)

    _, _, wsy0, wsx0, _ = windowed[0]
    wins = window_slice_multi_batched(
        tuple(tables), jnp.stack(origins, axis=1), wsy=wsy0, wsx=wsx0
    )  # tuple over levels of [B, 2, wsy, wsx]

    out = []
    for level, use_window, wsy, wsx, _ in plan:
        if not use_window:
            out.append((None, None, None, None, None))
            continue
        sl = wins[order.index(level)]
        tbl_a = jnp.swapaxes(sl.reshape(B, 2, -1), 1, 2)  # [B, rows, 2]
        tbl_q = jax.vmap(_quad_rows)(sl) if level in quad_levels else None
        sx, sy = sxy[level]
        out.append((None, tbl_a, tbl_q, sx, sy))
    return tuple(out)


@partial(jax.jit, static_argnames=("spec", "fog"))
def render_batch_scan(mosaic, eyes, suns, spec: PanoramaSpec, view_mode=0,
                      fog: str | None = None):
    """Batched panoramas as ONE program: `lax.scan` over viewpoints.

    The three candidate shapes for BASELINE config 5, measured at 4801^2
    scale in the same session (a degraded host link, which is exactly when
    the choice matters):

      * python-pipelined per-eye dispatches: 541/s healthy link, 67/s
        degraded — every frame pays a dispatch round-trip;
      * batched-DMA extraction + vmapped render: ~200/s — vmapping the
        render turns the per-eye window gathers into batched gathers and
        forfeits their locality (the round-1 finding, now isolated to the
        render stage);
      * this scan: **579/s degraded** — per-eye programs executed
        sequentially *on device*, keeping single-eye gather locality, with
        exactly one dispatch per batch.

    Returns ``f32[B, H, W, 3]`` colors.
    """
    eyes = jnp.asarray(eyes, jnp.float32)
    suns = jnp.asarray(suns, jnp.float32)

    def one(carry, es):
        e, s = es
        windows = None
        if spec.lod and spec.clipmap and mosaic.mip_shapes:
            windows = extract_clipmap_windows(mosaic, e, spec)
        c = render_panorama(
            mosaic, e, spec, s, view_mode=view_mode, fog=fog, windows=windows
        )["color"]
        return carry, c

    _, colors = jax.lax.scan(one, 0, (eyes, suns))
    return colors


@partial(jax.jit, static_argnames=(
    "spec", "seg", "conservative", "col_shuffle", "k_back", "bound_stride"))
def panorama_crossing_prepass(
    mosaic, eye, spec: PanoramaSpec, azimuth_offset=0.0, elev_offset=0.0,
    *, seg: int = 64, conservative: bool = True, col_shuffle: bool = True,
    k_back: int = 1 << 20, bound_stride: int = 1,
):
    """Exact-profile crossing distances only — the guided perspective
    march's prepass (`ops/raycast.py::march_guided_panorama`).

    Renders no pixels: samples the triangle-exact surface along each
    azimuth column's ground trace (``n_steps`` gathers per *column*, shared
    by every pixel row — O(N + H) versus the dense ray prepass's O(N * H))
    and finds each (row, column)'s first profile crossing by the banded
    crossing search. Hit height and metric distance come from the crossing
    geometry analytically, so the whole prepass costs ``N * W`` table
    gathers and zero per-pixel ones.

    Two round-3 redesigns (stage probe: per-sample transcendentals, not
    gathers, dominated the round-2 prepass):

      * **piecewise-quadratic trace fit**: the expensive lat/lon -> raster
        transcendentals run only at 2 endpoints + midpoint of every ``seg``
        step span; samples in between evaluate two mul-adds. Fit error over
        a 64-step span (step ratio 1.43x) is ~1e-4 texels — below the
        ~2e-3-texel f32 noise floor of the exact evaluation itself
        (see `surface.raster_from_ecef`);
      * **ratio-space profile**: visibility ordering uses y/x == tan(e)
        directly against tan-space pixel thresholds (x > 0 along the
        march), dropping the per-sample arctan.

    ``conservative=True`` additionally samples the DILATED max-height
    pyramid at the schedule-matched level along the same traces (nearest
    gathers into the small mip tables, reusing the fitted coordinates) and
    takes ``d_lo`` from the BOUND profile's first crossing: the bound
    dominates every height within a sample's step footprint, so the
    returned bracket PROVABLY contains the true first crossing — terrain
    narrower than the step spacing can no longer hide between prepass
    samples (the round-2 silhouette-tail mechanism).

    Returns ``{"d_lo", "d_me", "d_hi", "hit", "hit_exact"}`` — per-pixel
    metric distance bounds of the crossing, FAR where sky. ``d_me`` splits
    the bracket into its two qualitatively different parts (round-4 guided
    march, `ops/raycast.py::march_guided_panorama` guard/exact legs):

      * ``[d_me, d_hi]`` is the SURE interval: where the exact profile
        crossed (``hit_exact``), the texel ray's first sampled-profile
        crossing provably lies between samples kstar-1 and kstar — ONE
        log step wide;
      * ``[d_lo, d_me]`` is the GUARD interval: the conservative bound's
        backward drag, where terrain could hide between profile samples.
        On steep look-downs the dilated bound inflates this by ~1.5 km
        (measured, scripts/probe_steep_diag.py) while the sure interval
        stays ~2 steps — marching them with one uniform budget starved
        the sure crossing, which was the whole round-3 steep-pitch tail.

    Bound-only texels (``hit & ~hit_exact``) have no sure interval:
    ``d_me == d_hi`` there, so their whole bracket is guard.
    """
    import numpy as _np

    from topo_renderer_tpu.ops.surface import INVALID_HEIGHT

    eye = jnp.asarray(eye, jnp.float32)
    W, H, N = spec.width, spec.height, spec.n_steps
    a0, up, (ex, ey), (nx0, ny0, nz0), _ = _eye_frame(eye)
    ux, uy, uz = up

    # Lane decorrelation: process columns in an 8-way interleave so adjacent
    # VREG lanes trace azimuths ~W/8 columns apart (neighboring columns
    # gather neighboring cells — the slow pattern; see
    # `ops/raycast._lane_shuffle`). The azimuths are generated directly in
    # shuffled order (free) and the output planes un-shuffled by one
    # reshape-transpose relayout.
    col_shuffle = col_shuffle and (W % 8 == 0)
    if col_shuffle:
        kk = jnp.arange(W, dtype=jnp.int32)
        col = ((kk % 8) * (W // 8) + kk // 8).astype(jnp.float32)
    else:
        col = jnp.arange(W, dtype=jnp.float32)
    phi = spec.azimuth_start + jnp.float32(azimuth_offset) + spec.azimuth_span * (
        (col + 0.5) / W
    )
    cphi, sphi = jnp.cos(phi), jnp.sin(phi)
    hx = nx0 * cphi + ex * sphi
    hy = ny0 * cphi + ey * sphi
    hz = nz0 * cphi

    log_near = jnp.float32(jnp.log(spec.s_near))
    log_ratio = jnp.float32(jnp.log(spec.s_far / spec.s_near))

    def sigma_of(kf):
        return jnp.exp(log_near + log_ratio * (kf / (N - 1))) / R0

    def raster_at(kf):
        """Exact raster coords of every column's trace at step kf: [W]."""
        sig = sigma_of(jnp.float32(kf))
        cs = jnp.cos(sig)
        sn = jnp.sin(sig)
        sdx = ux * cs + hx * sn
        sdy = uy * cs + hy * sn
        sdz = uz * cs + hz * sn
        return raster_from_ecef(mosaic, sdx, sdy, sdz, 1.0)

    # Static conservative bound levels per step (dilation at level L covers
    # +-2^L base texels >= the step spacing, so the bound dominates any
    # terrain between consecutive samples).
    n_levels = len(mosaic.mip_shapes)
    texel = _texel_m(spec, mosaic)
    k_np = _np.arange(N)
    s_np = spec.s_near * (spec.s_far / spec.s_near) ** (k_np / (N - 1))
    ds_np = s_np * (_np.log(spec.s_far / spec.s_near) / (N - 1))
    lvl_np = _np.clip(
        _np.ceil(_np.log2(_np.maximum(ds_np / texel, 1.0))), 1, max(n_levels, 1)
    ).astype(int)

    parts, parts_b = [], []
    NEG = jnp.float32(-1.0e30)
    for k0 in range(0, N, seg):
        k1 = min(k0 + seg, N)
        gx_a, gy_a = raster_at(k0)
        gx_m, gy_m = raster_at(0.5 * (k0 + k1 - 1))
        gx_b, gy_b = raster_at(k1 - 1)

        tau = ((jnp.arange(k0, k1, dtype=jnp.float32) - k0)
               / jnp.float32(max(k1 - 1 - k0, 1)))[:, None]  # [seg, 1]

        def fit(a, m, b_):
            cq = 2.0 * a - 4.0 * m + 2.0 * b_
            bq = -3.0 * a + 4.0 * m - b_
            return a[None, :] + tau * (bq[None, :] + tau * cq[None, :])

        gx = fit(gx_a, gx_m, gx_b)  # [seg, W]
        gy = fit(gy_a, gy_m, gy_b)

        from topo_renderer_tpu.ops.raycast import _cell_h, _sample_hmax

        h = _cell_h(mosaic, gx, gy)
        sig = sigma_of(jnp.arange(k0, k1, dtype=jnp.float32))[:, None]
        cs = jnp.cos(sig)
        sn = jnp.sin(sig)
        sh2 = 2.0 * R0 * jnp.sin(0.5 * sig) ** 2
        ok = h > 0.5 * INVALID_HEIGHT
        y = h * cs - a0 - sh2
        x = (R0 + h) * sn
        parts.append(jnp.where(ok, y / x, NEG))

        if conservative and n_levels and s_np[k1 - 1] >= 32.0 * texel:
            # Bound profile, sampled every ``bound_stride`` steps from the
            # dilated max pyramid at the level whose dilation covers the
            # sample gap: level L's 1-texel dilation ring bounds terrain
            # within +-2^L base texels of the sampled texel, and the
            # per-step ground travel is <= 2^lvl texels by construction, so
            # level lvl + log2(stride) dominates everything a stride-group
            # traverses. Strided groups evaluate the ratio at the group's
            # FIRST sigma — the elevation ratio of a fixed height is
            # monotone decreasing in sigma, so the repeated value
            # upper-bounds every step in the group. stride=1 (the default
            # since round 4) samples at full rate and level lvl: 4x
            # narrower lateral max-pooling than the old stride-4/lvl+2
            # bound, which on steep look-downs at small patches was the
            # ~1.5 km conservative drag behind the guided parity tail
            # (scripts/probe_steep_pitch.py: the bound's backward drag set
            # the march leg width, starving window resolution).
            # Near segments (step spacing < ~1/3 texel) skip the bound: the
            # exact profile samples every triangle piece there, and the
            # coarse dilated bound would otherwise drag d_lo to ~0 for every
            # ray passing near terrain, blowing the march brackets wide.
            bs = bound_stride
            lv = min(
                int(lvl_np[k0:k1].max()) + (bs - 1).bit_length(), n_levels
            )
            hb = _sample_hmax(mosaic, lv, gx[::bs], gy[::bs])
            okb = hb > 0.5 * INVALID_HEIGHT
            yb = hb * cs[::bs] - a0 - sh2[::bs]
            xb = (R0 + hb) * sn[::bs]
            rb = jnp.where(okb, yb / xb, NEG)
            if bs > 1:
                rb = jnp.repeat(rb, bs, axis=0)[: k1 - k0]
            parts_b.append(rb)
        elif conservative and n_levels:
            parts_b.append(jnp.full((k1 - k0, W), NEG))

    e_prof = jnp.concatenate(parts, axis=0)  # [N, W] tan-space
    e_bound = jnp.concatenate(parts_b, axis=0) if parts_b else None

    e_lo, e_hi = spec.elevation_range()
    rows = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    e_pix = (
        jnp.float32(elev_offset) + jnp.float32(e_hi) - rows * jnp.float32(e_hi - e_lo)
    )[:, None]
    t_pix = jnp.tan(e_pix)

    # The banded Pallas kernel is the fast crossing path (the thresholds are
    # lane-constant and row-decreasing by construction); the XLA reduction
    # fallback covers CPU and odd shapes.
    from topo_renderer_tpu.ops.pallas_crossing import (
        LANES,
        crossing_search_pallas,
        pallas_available,
    )

    def first_crossing(prof):
        if (W % LANES == 0) and (H % 8 == 0) and pallas_available():
            z = jnp.zeros_like(prof)
            ks, _, _, _, _, _ = crossing_search_pallas(
                prof, z, z, z, jnp.broadcast_to(t_pix, (H, W)), height=H
            )
            return ks
        m_prof = jax.lax.cummax(prof, axis=0)
        le = m_prof[:, None, :] <= t_pix[None, :, :]
        return jnp.sum(le, axis=0).astype(jnp.float32)

    kstar = first_crossing(e_prof)
    hit_exact = kstar < jnp.float32(N)
    kstar = jnp.clip(kstar, 0.0, jnp.float32(N - 1))
    if e_bound is not None:
        kb = first_crossing(e_bound)
        # The BOUND extends possibility: rays that skim above every exact
        # profile SAMPLE but under the dilated max bound get a bracket
        # [bound crossing, ray exit] instead of being declared sky — the
        # windowed march then decides. This was the round-2 guided path's
        # dominant miss mechanism on grazing ridgeline pixels. (The bound
        # skips sub-texel-step near segments, so exact-only hits must stay.)
        hit = hit_exact | (kb < jnp.float32(N))
        kstar_b = jnp.minimum(jnp.clip(kb, 0.0, jnp.float32(N - 1)), kstar)
    else:
        hit = hit_exact
        kstar_b = kstar

    # d_lo: the exact profile's bracket extended BACKWARD to the
    # conservative bound's crossing (so the bracket provably contains the
    # first crossing), optionally limited to ``k_back`` log steps. A/B on
    # v5e measured the bracket width PERF-NEUTRAL for the windowed march
    # (109.3 vs 109.5 ms full frame at k_back 0 vs unbounded), so the
    # default keeps the fully conservative bracket; the knob remains for
    # experiments.
    k_lo = jnp.where(
        hit_exact, jnp.maximum(kstar_b, kstar - jnp.float32(k_back)), kstar_b
    )
    sig_hi = sigma_of(kstar)
    sig_lo = jnp.where(k_lo > 0, sigma_of(jnp.maximum(k_lo - 1.0, 0.0)), 0.0)

    def ray_dist(sig):
        # Crossing point on the pixel ray at ground angle sig: analytic
        # height from the ray/surface-trace geometry (no gathers).
        cs = jnp.cos(sig)
        sn = jnp.sin(sig)
        tanp = t_pix
        sh2s = jnp.sin(0.5 * sig) ** 2
        denom = cs - tanp * sn
        denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        h = (a0 + 2.0 * R0 * sh2s + tanp * R0 * sn) / denom
        y = h * cs - a0 - 2.0 * R0 * sh2s
        x = (R0 + h) * sn
        return jnp.sqrt(x * x + y * y)

    d_lo = jnp.where(hit, ray_dist(sig_lo), FAR)
    # Upper bracket from the exact profile where it crossed. BOUND-ONLY
    # texels (the dilated max bound crossed but the exact profile never
    # did — grazing rays) used to march to FAR, which both starved their
    # own window resolution and blew up every 3x3 neighbor's pooled
    # bracket (round-3 steep-pitch tail, PARITY.md "Known scoped
    # weakness"). Two zero-gather facts bound their crossing finitely:
    #
    #   * the ray leaves the terrain shell: any crossing needs ray
    #     altitude <= hmax, so t <= the far root of the shell quadratic
    #     (per texel row — elevation is the row coordinate);
    #   * the ray leaves the mosaic: the profile's validity masks give
    #     each column's LAST in-mosaic sample (exact OR dilated-bound —
    #     the bound dilates a little past the raw edge); no renderable
    #     terrain exists beyond sigma(k_last + 1). This is what collapses
    #     the steep-pitch patch-edge scene: rays grazing off the patch's
    #     far edge get bracketed to the edge instead of to 500 km.
    if e_bound is not None:
        hm = mosaic.hmax + 1.0
        e_norm = a0 + R0
        b_row = e_norm * jnp.sin(e_pix)  # [H, 1]; sin(el) = ray . radial
        c_shell = (a0 - hm) * (e_norm + R0 + hm)
        disc = b_row * b_row - c_shell
        shell_exit = jnp.where(
            disc > 0.0, -b_row + jnp.sqrt(jnp.maximum(disc, 0.0)), FAR
        )
        NEGTHR = jnp.float32(-0.9e30)
        valid_any = (e_prof > NEGTHR) | (e_bound > NEGTHR)  # [N, W]
        kf = jnp.arange(N, dtype=jnp.float32)[:, None]
        k_last = jnp.max(jnp.where(valid_any, kf, -1.0), axis=0)  # [W]
        col_exit = jnp.where(
            ((k_last >= 0.0) & (k_last < N - 1))[None, :],
            ray_dist(sigma_of(jnp.minimum(k_last + 1.0, N - 1.0))[None, :]),
            FAR,
        )
        d_hi_bound = jnp.minimum(jnp.minimum(shell_exit, col_exit), FAR)
        d_hi = jnp.where(
            hit_exact,
            jnp.maximum(ray_dist(sig_hi), d_lo),
            jnp.maximum(d_hi_bound, d_lo),
        )
    else:
        d_hi = jnp.where(hit_exact, jnp.maximum(ray_dist(sig_hi), d_lo), FAR)
    # Sure-interval start: the texel ray is above the exact profile at
    # sample kstar-1 and at/below it at kstar, so its sampled-profile
    # crossing lies in [sig(kstar-1), sig(kstar)]. Clamped into [d_lo,
    # d_hi]; bound-only texels carry d_me = d_hi (all guard, no sure part).
    sig_me = jnp.where(kstar > 0, sigma_of(jnp.maximum(kstar - 1.0, 0.0)), 0.0)
    d_me = jnp.where(
        hit_exact,
        jnp.clip(ray_dist(sig_me), d_lo, d_hi),
        d_hi,
    )
    if col_shuffle:
        def ush(a):
            return a.reshape(H, W // 8, 8).transpose(0, 2, 1).reshape(H, W)

        d_lo, d_me, d_hi = ush(d_lo), ush(d_me), ush(d_hi)
        hit, hit_exact = ush(hit), ush(hit_exact)
    return {
        "d_lo": d_lo, "d_me": d_me, "d_hi": d_hi,
        "hit": hit, "hit_exact": hit_exact,
    }


def _build_lod_profile(mosaic, spec: PanoramaSpec, windows, a0, up, h_prof_b, sigma):
    """Sample the terrain visibility profile along the panorama ground traces.

    Returns ``(e_prof, attr_prof)``: ``e_prof f32[N, ws]`` holds tan(elevation)
    ratios per profile sample (``-1e30`` outside the mosaic), ``attr_prof`` is
    a 3-tuple of ``f32[N, ws]`` 10-bit normal payload planes (or ``None`` when
    the spec does not carry attributes with the profile). Each log-schedule
    segment samples the mip level matching its step length, through the
    eye-centered clipmap windows where the level's table is large
    (`extract_clipmap_windows`).
    """
    import numpy as _np

    N = spec.n_steps
    n_levels = len(mosaic.mip_shapes)
    use_attr_prof = bool(spec.attrs_from_profile and spec.lod and n_levels)
    plan = _clipmap_window_plan(spec, mosaic)
    parts_e, parts_attr = [], []
    segments = _lod_segments(spec, n_levels, _texel_m(spec, mosaic))
    attr_prof = None
    s_np = spec.s_near * (spec.s_far / spec.s_near) ** (_np.arange(N) / (N - 1))
    cuts = []
    if spec.near_bilinear_m > 0.0:
        cuts.append(spec.near_bilinear_m)
    if spec.profile_far_stride_m > 0.0:
        cuts.append(spec.profile_far_stride_m)
    if spec.profile_far_stride4_m > 0.0:
        cuts.append(spec.profile_far_stride4_m)
    for cut in cuts:
        # Statically split segments at the bilinear / far-stride boundaries.
        k_cut = int(_np.searchsorted(s_np, cut))
        split = []
        for level, k0, k1 in segments:
            if k0 < k_cut < k1:
                split += [(level, k0, k_cut), (level, k_cut, k1)]
            else:
                split.append((level, k0, k1))
        segments = split
    for level, k0, k1 in segments:
        seg_bilinear = (
            spec.near_bilinear_m > 0.0
            and use_attr_prof
            and s_np[k1 - 1] <= spec.near_bilinear_m
        )
        # Far segments sample 1/2 (or 1/4) of the azimuth columns and
        # repeat (profile_far_stride_m / profile_far_stride4_m); both
        # visibility and the profile-carried attributes quantize to
        # 2-/4-column blocks there (see the spec fields' quality bound).
        far4 = (
            spec.profile_far_stride4_m > 0.0
            and not seg_bilinear
            and s_np[k0] >= spec.profile_far_stride4_m
            and h_prof_b[0].shape[1] % 4 == 0
        )
        far2 = (
            not far4
            and spec.profile_far_stride_m > 0.0
            and not seg_bilinear
            and s_np[k0] >= spec.profile_far_stride_m
            and h_prof_b[0].shape[1] % 2 == 0
        )
        stride = 4 if far4 else (2 if far2 else 1)
        hp_seg = tuple(c[:, ::stride] for c in h_prof_b) if stride > 1 else h_prof_b
        _, use_window, wsy, wsx, (h_t, w_t) = plan[level]
        if level == 0:
            hf, af = mosaic.heights_flat, mosaic.attr_packed_flat
        else:
            hf = mosaic.mip_heights_flat[level - 1]
            af = mosaic.mip_attr_flat[level - 1]
        s = float(2**level)
        off = (s - 1.0) / 2.0
        if use_window:
            tbl_h, tbl_a, tbl_q, sx, sy = windows[level]
            tw, th_, ox, oy = wsx, wsy, sx, sy
        else:
            tbl_h = hf
            tbl_a = af if use_attr_prof else None
            tbl_q = None
            tw, th_, ox, oy = w_t, h_t, jnp.int32(0), jnp.int32(0)

        sig_seg = sigma[k0:k1]
        cs = jnp.cos(sig_seg)
        sn = jnp.sin(sig_seg)
        sh2 = jnp.sin(0.5 * sig_seg) ** 2
        sdx = up[0] * cs + hp_seg[0] * sn
        sdy = up[1] * cs + hp_seg[1] * sn
        sdz = up[2] * cs + hp_seg[2] * sn
        gx0, gy0 = raster_from_ecef(mosaic, sdx, sdy, sdz, 1.0)
        lx = (gx0 - off) / s - ox
        ly = (gy0 - off) / s - oy
        if seg_bilinear:
            # Near field: bilinear height + normal so close-up texels don't
            # render as flat blocks. With a quad-row window table the whole
            # 2x2 neighborhood arrives in ONE row gather; otherwise 4.
            x0f = jnp.floor(lx)
            y0f = jnp.floor(ly)
            ok = (lx >= 0) & (lx <= tw - 1) & (ly >= 0) & (ly <= th_ - 1)
            x0 = jnp.clip(x0f.astype(jnp.int32), 0, tw - 2)
            y0 = jnp.clip(y0f.astype(jnp.int32), 0, th_ - 2)
            fxs = jnp.clip(lx - x0, 0.0, 1.0)
            fys = jnp.clip(ly - y0, 0.0, 1.0)
            i00 = y0 * tw + x0
            if tbl_q is not None:
                q = tbl_q[i00]
                r00, r01, r10, r11 = q[..., 0:2], q[..., 2:4], q[..., 4:6], q[..., 6:8]
            else:
                r00 = tbl_a[i00]
                r01 = tbl_a[i00 + 1]
                r10 = tbl_a[i00 + tw]
                r11 = tbl_a[i00 + tw + 1]

            def blend(v00, v01, v10, v11):
                return (v00 * (1 - fxs) + v01 * fxs) * (1 - fys) + (
                    v10 * (1 - fxs) + v11 * fxs
                ) * fys

            h = blend(r00[..., 0], r01[..., 0], r10[..., 0], r11[..., 0])
            bbits = [
                jax.lax.bitcast_convert_type(r[..., 1], jnp.uint32)
                for r in (r00, r01, r10, r11)
            ]
            comps = []
            for sh in (0, 10, 20):
                c = blend(
                    *(((b >> sh) & 0x3FF).astype(jnp.float32) for b in bbits)
                )
                comps.append(jnp.where(ok, jnp.round(c), 0.0))
            parts_attr.append(tuple(comps))
        else:
            ix = jnp.round(lx).astype(jnp.int32)
            iy = jnp.round(ly).astype(jnp.int32)
            ok = (ix >= 0) & (ix <= tw - 1) & (iy >= 0) & (iy <= th_ - 1)
            idx = jnp.clip(iy, 0, th_ - 1) * tw + jnp.clip(ix, 0, tw - 1)
            if use_attr_prof:
                # One row gather serves both the height (visibility
                # ratio) and the packed normal payloads.
                rows = tbl_a[idx]
                h = rows[..., 0]
                bits = jax.lax.bitcast_convert_type(rows[..., 1], jnp.uint32)
                comps_part = tuple(
                    jnp.where(
                        ok, ((bits >> sh) & 0x3FF).astype(jnp.float32), 0.0
                    )
                    for sh in (0, 10, 20)
                )
                if stride > 1:
                    comps_part = tuple(
                        jnp.repeat(c, stride, axis=1) for c in comps_part
                    )
                parts_attr.append(comps_part)
            else:
                h = jnp.take(tbl_h, idx)
        ok = ok & (h > 0.5 * INVALID_HEIGHT)
        y = h * cs - a0 - 2.0 * R0 * sh2
        x = (R0 + h) * sn
        # Work in ratio space: visibility ordering only needs a monotone
        # function of elevation, and y/x == tan(e) (x > 0 along the
        # march) — this removes one transcendental per profile sample.
        e_part = jnp.where(ok, y / x, jnp.float32(-1.0e30))
        if stride > 1:
            e_part = jnp.repeat(e_part, stride, axis=1)
        parts_e.append(e_part)
    e_prof = jnp.concatenate(parts_e, axis=0)  # [N, ws]
    if use_attr_prof:
        attr_prof = tuple(
            jnp.concatenate([p[c] for p in parts_attr], axis=0)
            for c in range(3)
        )
    return e_prof, attr_prof
