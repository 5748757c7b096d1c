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
  * all state is scalar ``[H, W]`` float32 planes (structure-of-arrays — a
    trailing ``[..., 3]`` axis would waste 125 of the VPU's 128 lanes);
  * the march is a `lax.fori_loop` of fused VPU ops + 4-texel height gathers
    from the one poisoned-height table;
  * the ray interval is clipped analytically to the terrain shell
    ``|x| <= R0 + hmax`` and the mosaic bounding sphere (stabilized
    quadratics), plus the near (50 m) / far (500 km) planes (`camera.rs:7-8`),
    so the step budget is spent only where terrain can exist;
  * no data-dependent shapes; ``n_steps``/``n_refine`` are static.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from topo_renderer_tpu.models.camera import Camera, FAR, NEAR
from topo_renderer_tpu.ops import mathx
from topo_renderer_tpu.ops import shading as shd
from topo_renderer_tpu.ops.geometry import R0
from topo_renderer_tpu.ops.postprocess import postprocess_soa
from topo_renderer_tpu.ops.surface import (
    raster_from_coeffs,
    raster_from_ecef,
    track_coeffs,
    raster_from_geo,
    sample_attributes_soa,
    sample_height,
)


def camera_rays(camera: Camera, width: int, height: int):
    """World-space unit ray direction planes (dx, dy, dz) for pixel centers,
    plus the forward axis.

    Reproduces the wgpu viewport mapping: ndc_x = 2(px+0.5)/W - 1,
    ndc_y = 1 - 2(py+0.5)/H, camera axes from `look_to_rh` (s, u, -f).
    """
    f = camera.direction()
    up = camera.up()
    s = mathx.normalize(jnp.cross(f, up))
    u = jnp.cross(s, f)
    tan_v = jnp.tan(0.5 * jnp.float32(camera.fov_y))
    tan_h = tan_v * (jnp.float32(width) / jnp.float32(height))

    ndc_x = (2.0 * (jnp.arange(width, dtype=jnp.float32) + 0.5) / width - 1.0)[None, :]
    ndc_y = (1.0 - 2.0 * (jnp.arange(height, dtype=jnp.float32) + 0.5) / height)[:, None]
    dx = f[0] + ndc_x * tan_h * s[0] + ndc_y * tan_v * u[0]
    dy = f[1] + ndc_x * tan_h * s[1] + ndc_y * tan_v * u[1]
    dz = f[2] + ndc_x * tan_h * s[2] + ndc_y * tan_v * u[2]
    inv = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    return (dx * inv, dy * inv, dz * inv), f


def _surface_f(mosaic, eye, dirs, c0, b, t):
    """Signed clearance above the terrain surface at ray parameter t.

    Altitude is derived from the stabilized quadratic
    q(t) = |eye + t d|^2 - R0^2 = c0 + 2 t b + t^2  (|d| = 1), which avoids
    the catastrophic cancellation of ``|p| - R0`` at ECEF magnitudes.
    """
    dx, dy, dz = dirs
    px = eye[0] + t * dx
    py = eye[1] + t * dy
    pz = eye[2] + t * dz
    q = c0 + 2.0 * t * b + t * t
    r = jnp.sqrt(jnp.maximum(R0 * R0 + q, 0.0))
    alt = q / (r + R0)
    gx, gy = raster_from_ecef(mosaic, px, py, pz, r)
    h = sample_height(mosaic, gx, gy)
    return alt - h


def _sample_hmax(mosaic, level: int, gx, gy):
    """Nearest fetch from the dilated max-height bound pyramid; hugely
    negative outside the mosaic (never a candidate)."""
    flat = mosaic.mip_hmax_flat[level - 1]
    h_l, w_l = mosaic.mip_shapes[level - 1]
    s = float(2**level)
    off = (s - 1.0) / 2.0
    gxl = (gx - off) / s
    gyl = (gy - off) / s
    in_b = (gxl >= -1.0) & (gyl >= -1.0) & (gxl <= w_l) & (gyl <= h_l)
    ix = jnp.clip(jnp.round(gxl).astype(jnp.int32), 0, w_l - 1)
    iy = jnp.clip(jnp.round(gyl).astype(jnp.int32), 0, h_l - 1)
    b = jnp.take(flat, iy * w_l + ix)
    return jnp.where(in_b, b, jnp.float32(-1.0e12))


def march(
    mosaic,
    eye,
    dirs,
    *,
    n_steps: int,
    n_refine: int,
    two_level: bool | None = None,
    n_coarse: int = 96,
    n_fine: int = 24,
):
    """Find the first ray/surface crossing for dense ray planes.

    Args:
      mosaic: TerrainMosaic.
      eye: ``f32[3]`` ECEF camera position.
      dirs: tuple of unit-direction planes ``(dx, dy, dz)`` (any shape) or an
        array ``[..., 3]`` (converted).
      n_steps / n_refine: static step budgets (uniform mode).
      two_level: accelerate with the dilated max-height pyramid — coarse
        conservative interval rejection, then fine marching only inside
        candidate intervals (~10x fewer surface samples at equal accuracy).
        Defaults on when the mosaic has max mips and ``n_steps`` is large.

    Returns ``(hit, t_hit)``; hit positions are ``eye + t_hit * d``.
    """
    eye = jnp.asarray(eye, jnp.float32)
    if not isinstance(dirs, tuple):
        d = jnp.asarray(dirs, jnp.float32)
        dirs = (d[..., 0], d[..., 1], d[..., 2])
    dx, dy, dz = dirs

    e_norm = jnp.linalg.norm(eye)
    a0 = e_norm - R0
    hmax = mosaic.hmax + 1.0
    r_shell = R0 + hmax

    b = dx * eye[0] + dy * eye[1] + dz * eye[2]
    # c = |E|^2 - r_shell^2 via the altitude difference (stable).
    c = (a0 - hmax) * (e_norm + r_shell)
    c0 = a0 * (e_norm + R0)  # |E|^2 - R0^2
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inside = c <= 0.0
    t_enter = jnp.where(inside, 0.0, -b - sq)
    t_exit = -b + sq
    feasible = (disc > 0.0) & (t_exit > 0.0)

    # Clip to the mosaic bounding sphere.
    rx = eye[0] - mosaic.bound_center[0]
    ry = eye[1] - mosaic.bound_center[1]
    rz = eye[2] - mosaic.bound_center[2]
    bb = dx * rx + dy * ry + dz * rz
    cb = rx * rx + ry * ry + rz * rz - mosaic.bound_radius * mosaic.bound_radius
    disc_b = bb * bb - cb
    sqb = jnp.sqrt(jnp.maximum(disc_b, 0.0))
    tb0 = -bb - sqb
    tb1 = -bb + sqb
    feasible = feasible & (disc_b > 0.0) & (tb1 > 0.0)

    t0 = jnp.maximum(jnp.maximum(t_enter, tb0), 0.0)
    t1 = jnp.where(feasible, jnp.minimum(jnp.minimum(t_exit, tb1), FAR), 0.0)
    t1 = jnp.maximum(t1, t0)

    if two_level is None:
        two_level = bool(getattr(mosaic, "mip_hmax_flat", ())) and n_steps >= 384
    if two_level:
        return _march_two_level(
            mosaic, eye, dirs, c0, b, t0, t1,
            n_coarse=n_coarse, n_fine=n_fine,
            n_refine=n_refine,
        )

    dt = (t1 - t0) / n_steps

    f0 = _surface_f(mosaic, eye, dirs, c0, b, t0)
    hit0 = f0 <= 0.0  # started at/below the surface

    def body(k, state):
        found, t_lo, t_hi, f_prev = state
        t_k = t0 + dt * k
        f_k = _surface_f(mosaic, eye, dirs, c0, b, t_k)
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
        lo, hi = state
        tm = 0.5 * (lo + hi)
        fm = _surface_f(mosaic, eye, dirs, c0, b, tm)
        below = fm <= 0.0
        return jnp.where(below, lo, tm), jnp.where(below, tm, hi)

    t_lo, t_hi = jax.lax.fori_loop(0, n_refine, refine, (t_lo, t_hi))
    return found, t_hi


def _march_two_level(
    mosaic, eye, dirs, c0, b, t0, t1, *, n_coarse, n_fine, n_refine
):
    """Max-mip accelerated exact march.

    Phase A: split [t0, t1] into ``n_coarse`` intervals; an interval is a
    *candidate* iff its minimum ray altitude (analytic — the altitude
    quadratic's min over the interval) can reach the dilated max-height
    bound sampled at the interval midpoint. Candidate flags pack into u32
    bitmask words carried per pixel.

    Phase B: iterate to completion; each round extracts the next candidate
    interval (find-first-set over the masked words) and fine-marches it
    with ``n_fine`` uniform steps. The dilated bound makes
    rejection conservative: a crossing can only live in a candidate
    interval, so accuracy equals uniform marching at the fine step size
    while sampling the exact surface ~10x less.
    """
    dx, dy, dz = dirs
    dt_c = (t1 - t0) / n_coarse

    # Static bound levels; per pixel the *tightest* level whose dilated
    # footprint covers the interval's ground travel is selected (a loose
    # bound makes descending/grazing rays flag every interval).
    n_levels = len(mosaic.mip_shapes)
    levels = sorted({min(1, n_levels), min(3, n_levels), min(6, n_levels)})
    texel0 = jnp.radians(mosaic.pixel_scale[1]) * R0

    def alt_at(t):
        q = c0 + 2.0 * t * b + t * t
        r = jnp.sqrt(jnp.maximum(R0 * R0 + q, 0.0))
        return q / (r + R0)

    def coarse_body(k, words):
        ta = t0 + dt_c * k
        tb = ta + dt_c
        tm = 0.5 * (ta + tb)
        px = eye[0] + tm * dx
        py = eye[1] + tm * dy
        pz = eye[2] + tm * dz
        r = jnp.sqrt(px * px + py * py + pz * pz)
        gx, gy = raster_from_ecef(mosaic, px, py, pz, r)

        bound = jnp.full_like(dt_c, jnp.float32(3.0e38))  # no valid level
        for lv in reversed(levels):  # coarsest first; finest overwrites
            cover = texel0 * (2.0**lv)
            valid = dt_c * 0.5 <= cover
            bound = jnp.where(valid, _sample_hmax(mosaic, lv, gx, gy), bound)

        # Min ray altitude over [ta, tb]: endpoints + interior vertex (-b).
        alt_min = jnp.minimum(alt_at(ta), alt_at(tb))
        tv = jnp.clip(-b, ta, tb)
        alt_min = jnp.minimum(alt_min, alt_at(tv))
        cand = (alt_min <= bound + 2.0) & (dt_c > 0.0)

        word = k // 32
        bit = jnp.uint32(1) << jnp.uint32(k % 32)
        new = []
        for w, arr in enumerate(words):
            new.append(jnp.where(cand & (word == w), arr | bit, arr))
        return tuple(new)

    n_words = (n_coarse + 31) // 32
    shape = dx.shape
    words0 = tuple(jnp.zeros(shape, jnp.uint32) for _ in range(n_words))
    words = jax.lax.fori_loop(0, n_coarse, coarse_body, words0)

    # Phase B: rounds of find-first-candidate + fine march.
    found = jnp.zeros(shape, bool)
    t_lo = jnp.broadcast_to(t0, shape)
    t_hi = jnp.broadcast_to(t1, shape)
    cursor = jnp.full(shape, -1, jnp.int32)
    BIGI = jnp.int32(n_coarse + 1)

    # Immediate hit at t0 (camera at/below the surface).
    f_start = _surface_f(mosaic, eye, dirs, c0, b, t0)
    hit0 = f_start <= 0.0
    found = found | hit0
    t_lo = jnp.where(hit0, t0, t_lo)
    t_hi = jnp.where(hit0, t0, t_hi)

    dt_f = dt_c / n_fine

    def next_candidate(cursor):
        nxt = jnp.full(shape, BIGI, jnp.int32)
        for w in range(n_words):
            low = jnp.clip(cursor + 1 - 32 * w, 0, 32).astype(jnp.uint32)
            masked = jnp.where(
                low >= 32,
                jnp.uint32(0),
                (words[w] >> low) << low,
            )
            lsb = masked & (~masked + jnp.uint32(1))
            idx = 32 * w + jax.lax.population_count(lsb - jnp.uint32(1)).astype(
                jnp.int32
            )
            nxt = jnp.where((masked != 0) & (idx < nxt), idx, nxt)
        return nxt

    # Resolve every pixel: iterate until each ray either hit or exhausted its
    # candidate intervals (the cursor strictly advances, so the loop is
    # bounded by n_coarse iterations; typical scenes settle within a few).
    def cond(state):
        found, _, _, cursor, it = state
        return jnp.logical_and(
            it < n_coarse,
            jnp.any((~found) & (cursor < n_coarse)),
        )

    def body(state):
        found, t_lo, t_hi, cursor, it = state
        nxt = next_candidate(cursor)
        active = (~found) & (nxt < BIGI)
        ta = t0 + dt_c * nxt.astype(jnp.float32)

        f_prev = _surface_f(mosaic, eye, dirs, c0, b, ta)
        seg_hit = f_prev <= 0.0
        s_lo = jnp.where(seg_hit, ta - dt_f, ta)
        s_hi = jnp.where(seg_hit, ta, ta + dt_c)

        def fine_body(j, fstate):
            seg_hit, s_lo, s_hi, f_prev = fstate
            t_j = ta + dt_f * j
            f_j = _surface_f(mosaic, eye, dirs, c0, b, t_j)
            crossing = (~seg_hit) & (f_prev > 0.0) & (f_j <= 0.0)
            s_lo = jnp.where(crossing, t_j - dt_f, s_lo)
            s_hi = jnp.where(crossing, t_j, s_hi)
            return seg_hit | crossing, s_lo, s_hi, f_j

        seg_hit, s_lo, s_hi, _ = jax.lax.fori_loop(
            1, n_fine + 1, fine_body, (seg_hit, s_lo, s_hi, f_prev)
        )

        newly = active & seg_hit
        found = found | newly
        t_lo = jnp.where(newly, s_lo, t_lo)
        t_hi = jnp.where(newly, s_hi, t_hi)
        # advance: miss -> cursor = nxt; no candidates left -> exhausted.
        cursor = jnp.where(active & (~seg_hit), nxt, cursor)
        cursor = jnp.where((~found) & (nxt >= BIGI), jnp.int32(n_coarse), cursor)
        return found, t_lo, t_hi, cursor, it + 1

    found, t_lo, t_hi, cursor, _ = jax.lax.while_loop(
        cond, body, (found, t_lo, t_hi, cursor, jnp.int32(0))
    )

    def refine(_, state):
        lo, hi = state
        tm = 0.5 * (lo + hi)
        fm = _surface_f(mosaic, eye, dirs, c0, b, tm)
        below = fm <= 0.0
        return jnp.where(below, lo, tm), jnp.where(below, tm, hi)

    t_lo, t_hi = jax.lax.fori_loop(0, n_refine, refine, (t_lo, t_hi))
    return found, t_hi


def _pool3(a, op):
    """3x3 neighborhood reduce with edge replication, via shifted slices
    (`jnp.pad`-based stencils force layout copies on TPU — NOTES.md)."""
    up = jnp.concatenate([a[:1], a[:-1]], axis=0)
    dn = jnp.concatenate([a[1:], a[-1:]], axis=0)
    a = op(op(up, a), dn)
    lf = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
    rt = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    return op(op(lf, a), rt)


def _cell_h(mosaic, gx, gy):
    """Triangle-exact surface height from the packed per-cell corner table
    (one 16 B row gather; INVALID outside the mosaic). Equals
    `surface.sample_height` for mosaics with a cell table, restated here so
    the march loops share cell/parity math with the analytic walk."""
    from topo_renderer_tpu.ops.surface import INVALID_HEIGHT, tri_interp

    if not getattr(mosaic, "has_cell_table", False):
        return sample_height(mosaic, gx, gy)
    h_m, w_m = mosaic.shape
    cx = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, w_m - 2)
    cy = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, h_m - 2)
    in_b = (gx >= 0.0) & (gy >= 0.0) & (gx <= w_m - 1.0) & (gy <= h_m - 1.0)
    fx = gx - cx
    fy = gy - cy
    parity = (cx + cy) % 2
    from topo_renderer_tpu.ops.surface import cell_rows as _crows

    rows = _crows(mosaic, cy * w_m + cx)
    h = tri_interp(rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3], fx, fy, parity)
    return jnp.where(in_b, h, jnp.float32(INVALID_HEIGHT))


def _cell_walk_core(mosaic, ends, f_lo, f_hi, active, *, n_cells: int):
    """First crossing of a LINEAR track against the piecewise-linear surface.

    ``ends = (gx0, gy0, alt0, gx1, gy1, alt1)`` are the raster-space track
    endpoints of a bracketing interval with ``f_lo > 0 >= f_hi`` (clearance
    at the ends). Two structural facts make the crossing closed-form:

      * over a bracket (<= a few hundred metres) the ray's raster-space
        track and altitude are linear in t to ~1e-5 texels / millimetres —
        the curvature scale is the Earth radius (sagitta L^2/8R ~ 0.2 mm
        over a 92.6 m cell);
      * the rendered surface is piecewise-LINEAR over raster cells with the
        alternating-diagonal split (`ops/surface.py`, matching
        `render_buffer.rs:191-219`).

    Within one (cell, triangle) piece the clearance is linear in u and the
    crossing is one division. The walk visits at most ``n_cells`` cells
    front-to-back (ONE 16 B corner-row gather each — vs one gather per
    bisection step). Pixels unresolved after the walk (bracket wider than
    the cell budget) fall back to the secant estimate of the last known
    sign change — the same class of approximation a fixed bisection budget
    leaves.

    Returns ``u* in [0, 1]`` along the track (1 where inactive/unresolved
    beyond the fallback).
    """
    from topo_renderer_tpu.ops.surface import tri_interp

    gx0, gy0, alt0, gx1, gy1, alt1 = ends
    h_m, w_m = mosaic.shape
    dgx = gx1 - gx0
    dgy = gy1 - gy0
    dalt = alt1 - alt0

    EPS = jnp.float32(1e-4)
    BIGU = jnp.float32(3.0e38)

    def body(_, state):
        u_cur, found, u_star, f_cur = state
        live = active & (~found) & (u_cur < 1.0)
        # Current cell at a nudged position (just past the entry boundary).
        un = jnp.clip(u_cur + EPS, 0.0, 1.0)
        gxc = gx0 + un * dgx
        gyc = gy0 + un * dgy
        cx = jnp.clip(jnp.floor(gxc).astype(jnp.int32), 0, w_m - 2)
        cy = jnp.clip(jnp.floor(gyc).astype(jnp.int32), 0, h_m - 2)
        in_b = (gxc >= 0.0) & (gyc >= 0.0) & (gxc <= w_m - 1.0) & (gyc <= h_m - 1.0)
        parity = (cx + cy) % 2
        from topo_renderer_tpu.ops.surface import cell_rows as _crows

        rows = _crows(mosaic, cy * w_m + cx)

        # Cell exit: first u where the linear track leaves [cx, cx+1] x
        # [cy, cy+1] (exact for the linearized track).
        def axis_exit(g0, dg, c):
            hi_b = (c + 1.0 - g0) / jnp.where(jnp.abs(dg) < 1e-12, 1e-12, dg)
            lo_b = (jnp.float32(c) - g0) / jnp.where(jnp.abs(dg) < 1e-12, 1e-12, dg)
            ex = jnp.where(dg > 0, hi_b, jnp.where(dg < 0, lo_b, BIGU))
            return jnp.where(jnp.abs(dg) < 1e-12, BIGU, ex)

        u_exit = jnp.minimum(
            jnp.minimum(axis_exit(gx0, dgx, cx), axis_exit(gy0, dgy, cy)),
            1.0,
        )
        u_exit = jnp.maximum(u_exit, jnp.minimum(u_cur + EPS, 1.0))

        # Triangle-boundary u within the cell: fx == fy (parity 0) or
        # fx + fy == 1 (parity 1); fx(u) = gx(u) - cx, fy(u) = gy(u) - cy.
        fx0 = gx0 - cx
        fy0 = gy0 - cy
        den0 = dgx - dgy
        u_d0 = (fy0 - fx0) / jnp.where(jnp.abs(den0) < 1e-12, 1e-12, den0)
        den1 = dgx + dgy
        u_d1 = (1.0 - fx0 - fy0) / jnp.where(jnp.abs(den1) < 1e-12, 1e-12, den1)
        u_diag = jnp.where(parity == 0, u_d0, u_d1)
        u_diag = jnp.where((u_diag > u_cur) & (u_diag < u_exit), u_diag, u_exit)

        def clearance(u):
            fx = jnp.clip(gx0 + u * dgx - cx, 0.0, 1.0)
            fy = jnp.clip(gy0 + u * dgy - cy, 0.0, 1.0)
            h = tri_interp(
                rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3],
                fx, fy, parity,
            )
            return (alt0 + u * dalt) - h

        # Two linear sub-intervals: [u_cur, u_diag], [u_diag, u_exit].
        f_a = clearance(u_cur)
        f_d = clearance(u_diag)
        f_e = clearance(u_exit)

        def seg_cross(fa, fb, ua, ub):
            cross = (fa > 0.0) & (fb <= 0.0) & (ub > ua)
            u = ua + (ub - ua) * fa / jnp.where(
                jnp.abs(fa - fb) < 1e-12, 1e-12, fa - fb
            )
            return cross, jnp.clip(u, ua, ub)

        c1, u1 = seg_cross(f_a, f_d, u_cur, u_diag)
        c2, u2 = seg_cross(f_d, f_e, u_diag, u_exit)
        hit_here = live & in_b & (c1 | c2)
        u_hit = jnp.where(c1, u1, u2)

        found = found | hit_here
        u_star = jnp.where(hit_here, u_hit, u_star)
        u_cur = jnp.where(live & (~hit_here), u_exit, u_cur)
        f_cur = jnp.where(live & (~hit_here), f_e, f_cur)
        return u_cur, found, u_star, f_cur

    u0 = jnp.zeros_like(gx0)
    found0 = jnp.zeros_like(active)
    u_cur, found, u_star, f_cur = jax.lax.fori_loop(
        0, n_cells, body, (u0, found0, jnp.ones_like(gx0), f_lo)
    )

    # Fallback for brackets wider than the cell budget: secant between the
    # walk frontier (f > 0) and the bracket end (f <= 0).
    denom = f_cur - f_hi
    u_fb = u_cur + (1.0 - u_cur) * f_cur / jnp.where(
        jnp.abs(denom) < 1e-12, 1e-12, denom
    )
    u_star = jnp.where(found, u_star, jnp.clip(u_fb, 0.0, 1.0))
    return jnp.where(active, u_star, jnp.ones_like(gx0))


def _track_raster(mosaic, eye, dirs, c0, b, t):
    """Exact raster-space track point of the ray at parameter t:
    ``(gx, gy, alt)``. The transcendental evaluation the quad-fitted march
    amortizes (3 calls per pixel instead of one per step).

    Round 5: evaluated through the per-ray coefficient expansion
    (`surface.track_coeffs`) instead of materialized ``eye + t*dir`` points
    — the materialized components quantize at the ECEF magnitude (~0.5 m
    PER SAMPLE), a track-fit jitter of ~2.6e-3/4.9e-3 texels (gx/gy) that
    the expansion cuts to ~6e-5/8e-5 (scripts/probe_track_precision.py).
    The three calls per leg share one coefficient set via XLA CSE."""
    q = c0 + 2.0 * t * b + t * t
    r = jnp.sqrt(jnp.maximum(R0 * R0 + q, 0.0))
    alt = q / (r + R0)
    k = track_coeffs(mosaic, eye, dirs)
    gx, gy = raster_from_coeffs(mosaic, k, t, r)
    return gx, gy, alt


def _lane_shuffle(planes, fy: int = 8, fx: int = 8):
    """Interleave rows/columns so adjacent VREG sublanes/lanes process
    pixels ~H/fy rows and ~W/fx columns apart.

    Measured NEUTRAL for the windowed march on v5e (the gather bottleneck
    tracks whole-VREG address duplication, which a pixel interleave cannot
    remove — scripts/probe_gather_pattern.py / probe_quad3.py), so the
    march defaults it off; kept because it is bit-identical (both
    directions are reshape+transpose relayouts, and everything between
    shuffle and unshuffle is elementwise) and other backends may differ.

    Returns (shuffled_planes, meta) — invert with `_lane_unshuffle`.
    """
    H, W = planes[0].shape
    Hp = -(-H // fy) * fy
    Wp = -(-W // fx) * fx
    gy, gx = Hp // fy, Wp // fx

    def sh(a):
        if Hp != H:
            a = jnp.concatenate([a, jnp.repeat(a[-1:], Hp - H, 0)], 0)
        if Wp != W:
            a = jnp.concatenate([a, jnp.repeat(a[:, -1:], Wp - W, 1)], 1)
        a = a.reshape(fy, gy, Wp).transpose(1, 0, 2).reshape(Hp, Wp)
        a = a.reshape(Hp, fx, gx).transpose(0, 2, 1).reshape(Hp, Wp)
        return a

    return [sh(p) for p in planes], (H, W, Hp, Wp, fy, fx)


def _lane_unshuffle(planes, meta):
    H, W, Hp, Wp, fy, fx = meta
    gy, gx = Hp // fy, Wp // fx

    def ush(a):
        a = a.reshape(Hp, gx, fx).transpose(0, 2, 1).reshape(Hp, Wp)
        a = a.reshape(gy, fy, Wp).transpose(1, 0, 2).reshape(Hp, Wp)
        return a[:H, :W]

    return [ush(p) for p in planes]


def _window_march_quad(mosaic, eye, dirs, t_min, t_max, any_hit, *,
                       n_window: int, n_cells: int, margin_rel: float,
                       margin_abs: float, lane_shuffle: bool = False):
    """Bracketed exact march with a QUADRATIC raster-track fit.

    The stage probe showed the per-step cost of `_window_march` splits
    between the gathers and the per-step transcendentals
    (arcsin/arctan2/degrees in `_surface_f`). This variant evaluates the
    exact track at only THREE parameters (bracket ends + midpoint) and
    fits ``gx, gy, alt`` as quadratics in u — exact to ~1e-4 texels over a
    10 km window (the cubic remainder scales with 1/R0^2), which is BELOW
    the f32 noise floor of the exact evaluation itself (~2e-3 texels from
    input-coordinate quantization and rotation-product rounding; see
    `surface.raster_from_ecef`), so the fitted march is statistically
    indistinguishable from the exact one. Each of the ``n_window`` steps is then 6 mul-adds +
    ONE 16 B cell-row gather + a triangle interpolation. The found step
    bracket is refined by the analytic cell walk (`_cell_walk_core`) on the
    same fitted track — no further transcendentals anywhere.

    ``lane_shuffle`` routes the whole march through the lane-decorrelating
    pixel interleave (`_lane_shuffle`). Measured NEUTRAL on v5e for this
    march (the gather bottleneck tracks the total address-set density, not
    per-VREG lane adjacency — scripts/probe_quad3.py), so it defaults off;
    kept because it is bit-identical and other backends may differ.
    """
    if lane_shuffle:
        (dx_s, dy_s, dz_s, tmin_s, tmax_s, hit_s), meta = _lane_shuffle(
            [dirs[0], dirs[1], dirs[2], t_min, t_max, any_hit]
        )
        found, t_star = _window_march_quad(
            mosaic, eye, (dx_s, dy_s, dz_s), tmin_s, tmax_s, hit_s,
            n_window=n_window, n_cells=n_cells,
            margin_rel=margin_rel, margin_abs=margin_abs, lane_shuffle=False,
        )
        found, t_star = _lane_unshuffle([found, t_star], meta)
        return found, t_star
    dx, dy, dz = dirs
    e_norm = jnp.linalg.norm(eye)
    a0 = e_norm - R0
    hmax = mosaic.hmax + 1.0
    r_shell = R0 + hmax
    b = dx * eye[0] + dy * eye[1] + dz * eye[2]
    c = (a0 - hmax) * (e_norm + r_shell)
    c0 = a0 * (e_norm + R0)
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inside = c <= 0.0
    t_enter = jnp.where(inside, 0.0, -b - sq)
    t_exit = -b + sq
    feasible = (disc > 0.0) & (t_exit > 0.0)
    t0 = jnp.maximum(t_enter, 0.0)
    t1 = jnp.where(feasible, jnp.minimum(t_exit, FAR), 0.0)

    t_lo = jnp.clip(t_min * (1.0 - margin_rel) - margin_abs, t0, t1)
    t_hi = jnp.clip(t_max * (1.0 + margin_rel) + margin_abs, t_lo, t1)
    span = t_hi - t_lo

    # Quadratic track fit through u = 0, 0.5, 1.
    g0x, g0y, g0a = _track_raster(mosaic, eye, dirs, c0, b, t_lo)
    gmx, gmy, gma = _track_raster(mosaic, eye, dirs, c0, b, t_lo + 0.5 * span)
    g1x, g1y, g1a = _track_raster(mosaic, eye, dirs, c0, b, t_hi)

    def quad(g0, gm, g1):
        cq = 2.0 * g0 - 4.0 * gm + 2.0 * g1
        bq = -3.0 * g0 + 4.0 * gm - g1
        return g0, bq, cq

    qx = quad(g0x, gmx, g1x)
    qy = quad(g0y, gmy, g1y)
    qa = quad(g0a, gma, g1a)

    def at(q, u):
        return q[0] + u * (q[1] + u * q[2])

    def f_at(u):
        gx = at(qx, u)
        gy = at(qy, u)
        return at(qa, u) - _cell_h(mosaic, gx, gy)

    du = jnp.where(any_hit, 1.0 / n_window, 0.0)
    f0 = f_at(jnp.zeros_like(t_lo))
    hit0 = any_hit & (f0 <= 0.0)

    def body(k, state):
        found, u_a, u_b, f_prev, f_a, f_b = state
        u_k = du * k
        f_k = f_at(u_k)
        crossing = any_hit & (~found) & (f_prev > 0.0) & (f_k <= 0.0)
        u_a = jnp.where(crossing, u_k - du, u_a)
        u_b = jnp.where(crossing, u_k, u_b)
        # Carry the bracket's clearance values out of the loop: the walk
        # needs f(u_a) > 0 >= f(u_b) and re-evaluating them would cost two
        # more table gathers per pixel.
        f_a = jnp.where(crossing, f_prev, f_a)
        f_b = jnp.where(crossing, f_k, f_b)
        return found | crossing, u_a, u_b, f_k, f_a, f_b

    zero = jnp.zeros_like(t_lo)
    found, u_a, u_b, _, f_a, f_b = jax.lax.fori_loop(
        1, n_window + 1, body,
        (hit0, zero, jnp.where(hit0, zero, jnp.ones_like(t_lo)), f0, f0, f0),
    )

    # Analytic cell walk inside [u_a, u_b] on the fitted track (linearized
    # between the bracket's quad-evaluated endpoints; sagitta over one step
    # is sub-millimetre).
    ends = (
        at(qx, u_a), at(qy, u_a), at(qa, u_a),
        at(qx, u_b), at(qy, u_b), at(qa, u_b),
    )
    active = found & (~hit0) & (u_b > u_a)
    v = _cell_walk_core(mosaic, ends, f_a, f_b, active, n_cells=n_cells)
    u_star = jnp.where(active, u_a + v * (u_b - u_a), jnp.where(hit0, 0.0, u_b))
    return found, t_lo + u_star * span


def _grouped_bracket_pools(d_lo, d_hi_exact):
    """3x3 bracket pooling split into TWO distance clusters per texel.

    Single-interval pooling (`min d_lo` / `max d_hi` over the 3x3
    neighborhood) is pathological exactly at silhouettes: the neighborhood
    spans a depth discontinuity, so the union bracket runs from the near
    ridge to the far valley and the fixed-step window march undersamples
    it (measured at 800x450: 0.18% of pixels flip vs the rasterizer
    oracle, vs 0.036% for the dense march — scripts/probe_parity_scale2).
    Cluster the neighborhood's brackets by their START distance around the
    midpoint of the d_lo spread and pool each cluster separately; the
    march then spends its steps inside two NARROW intervals instead of
    one wide one. Coverage is the union of the neighbors' brackets —
    exactly the same conservativeness assumption as the single pool
    (the inter-cluster gap provably contains no neighbor bracket starts).

    ``d_lo``: crossing start per texel, BIG where the texel has no
    crossing. ``d_hi_exact``: exact crossing end, -BIG where none (miss or
    bound-only). Returns ``(m, m_hi, a_max, b_min, b_max)``: the pooled
    near start / max start, the near cluster's exact end, and the far
    cluster's start/end (sentinels where a cluster is empty).
    """
    BIG = jnp.float32(3.0e38)

    def shifts(a):
        up = jnp.concatenate([a[:1], a[:-1]], axis=0)
        dn = jnp.concatenate([a[1:], a[-1:]], axis=0)
        out = []
        for r in (up, a, dn):
            lf = jnp.concatenate([r[:, :1], r[:, :-1]], axis=1)
            rt = jnp.concatenate([r[:, 1:], r[:, -1:]], axis=1)
            out += [lf, r, rt]
        return out

    lo_n = shifts(d_lo)
    hi_n = shifts(d_hi_exact)

    m = lo_n[0]
    m_hi = jnp.where(lo_n[0] < BIG, lo_n[0], -BIG)
    for p in lo_n[1:]:
        m = jnp.minimum(m, p)
        m_hi = jnp.maximum(m_hi, jnp.where(p < BIG, p, -BIG))
    theta = 0.5 * (m + m_hi)

    a_max = jnp.full_like(m, -BIG)
    b_min = jnp.full_like(m, BIG)
    b_max = jnp.full_like(m, -BIG)
    for lo_p, hi_p in zip(lo_n, hi_n):
        near = lo_p <= theta  # non-hit texels carry BIG -> never near
        far = (~near) & (lo_p < BIG)
        a_max = jnp.maximum(a_max, jnp.where(near, hi_p, -BIG))
        b_min = jnp.minimum(b_min, jnp.where(far, lo_p, BIG))
        b_max = jnp.maximum(b_max, jnp.where(far, hi_p, -BIG))
    return m, m_hi, a_max, b_min, b_max


def _window_march_quad2(mosaic, eye, dirs, legs, any_hit, *,
                        n_window: int, n_cells: int, margin_rel: float,
                        margin_abs: float):
    """Two-interval variant of `_window_march_quad`.

    ``legs`` is ``((tA_lo, tA_hi), (tB_lo, tB_hi))`` — per-pixel interval
    pairs from `_grouped_bracket_pools` (B may equal a phase-shifted A
    where the neighborhood has a single distance cluster). Each leg gets
    its own quadratic track fit and ``n_window // 2`` uniform steps; leg B
    only resolves pixels leg A left unfound, and ONE analytic cell walk
    refines whichever leg's bracket won (the walk runs on linearized
    bracket endpoints, so legs can share it elementwise). Total table
    gathers: ``n_window + 2`` window evals + ``n_cells`` walk rows — one
    row more than the single-interval march at equal ``n_window``.
    """
    dx, dy, dz = dirs
    e_norm = jnp.linalg.norm(eye)
    a0 = e_norm - R0
    hmax = mosaic.hmax + 1.0
    r_shell = R0 + hmax
    b = dx * eye[0] + dy * eye[1] + dz * eye[2]
    c = (a0 - hmax) * (e_norm + r_shell)
    c0 = a0 * (e_norm + R0)
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inside = c <= 0.0
    t_enter = jnp.where(inside, 0.0, -b - sq)
    t_exit = -b + sq
    feasible = (disc > 0.0) & (t_exit > 0.0)
    t0 = jnp.maximum(t_enter, 0.0)
    t1 = jnp.where(feasible, jnp.minimum(t_exit, FAR), 0.0)

    nw = max(n_window // 2, 2)

    def quad(g0, gm, g1):
        cq = 2.0 * g0 - 4.0 * gm + 2.0 * g1
        bq = -3.0 * g0 + 4.0 * gm - g1
        return g0, bq, cq

    def at(q, u):
        return q[0] + u * (q[1] + u * q[2])

    def leg(t_min, t_max, active):
        t_lo = jnp.clip(t_min * (1.0 - margin_rel) - margin_abs, t0, t1)
        t_hi = jnp.clip(t_max * (1.0 + margin_rel) + margin_abs, t_lo, t1)
        span = t_hi - t_lo
        g0x, g0y, g0a = _track_raster(mosaic, eye, dirs, c0, b, t_lo)
        gmx, gmy, gma = _track_raster(mosaic, eye, dirs, c0, b,
                                      t_lo + 0.5 * span)
        g1x, g1y, g1a = _track_raster(mosaic, eye, dirs, c0, b, t_hi)
        qx = quad(g0x, gmx, g1x)
        qy = quad(g0y, gmy, g1y)
        qa = quad(g0a, gma, g1a)

        def f_at(u):
            return at(qa, u) - _cell_h(mosaic, at(qx, u), at(qy, u))

        du = jnp.where(active, 1.0 / nw, 0.0)
        f0 = f_at(jnp.zeros_like(t_lo))
        hit0 = active & (f0 <= 0.0)

        def body(k, state):
            found, u_a, u_b, f_prev, f_a, f_b = state
            u_k = du * k
            f_k = f_at(u_k)
            crossing = active & (~found) & (f_prev > 0.0) & (f_k <= 0.0)
            u_a = jnp.where(crossing, u_k - du, u_a)
            u_b = jnp.where(crossing, u_k, u_b)
            f_a = jnp.where(crossing, f_prev, f_a)
            f_b = jnp.where(crossing, f_k, f_b)
            return found | crossing, u_a, u_b, f_k, f_a, f_b

        zero = jnp.zeros_like(t_lo)
        found, u_a, u_b, _, f_a, f_b = jax.lax.fori_loop(
            1, nw + 1, body,
            (hit0, zero, jnp.where(hit0, zero, jnp.ones_like(t_lo)),
             f0, f0, f0),
        )
        ends = (
            at(qx, u_a), at(qy, u_a), at(qa, u_a),
            at(qx, u_b), at(qy, u_b), at(qa, u_b),
        )
        return found, hit0, u_a, u_b, f_a, f_b, ends, t_lo, span

    (tA_lo, tA_hi), (tB_lo, tB_hi) = legs
    fA, h0A, uaA, ubA, faA, fbA, endsA, loA, spA = leg(tA_lo, tA_hi, any_hit)
    fB, h0B, uaB, ubB, faB, fbB, endsB, loB, spB = leg(tB_lo, tB_hi, any_hit)

    # Earliest-crossing selection: both legs march in lockstep anyway, so
    # running B unconditionally is free, and taking the earlier bracket
    # start makes the merged (phase-shifted) mode equivalent to ONE
    # uniform march over the union grid — strictly better ordering than
    # "B only where A missed".
    tA_start = loA + uaA * spA
    tB_start = loB + uaB * spB
    useA = fA & ((~fB) | (tA_start <= tB_start))
    found = fA | fB
    hit0 = jnp.where(useA, h0A, h0B)
    u_a = jnp.where(useA, uaA, uaB)
    u_b = jnp.where(useA, ubA, ubB)
    f_a = jnp.where(useA, faA, faB)
    f_b = jnp.where(useA, fbA, fbB)
    ends = tuple(jnp.where(useA, ea, eb) for ea, eb in zip(endsA, endsB))
    t_lo = jnp.where(useA, loA, loB)
    span = jnp.where(useA, spA, spB)

    active = found & (~hit0) & (u_b > u_a)
    v = _cell_walk_core(mosaic, ends, f_a, f_b, active, n_cells=n_cells)
    u_star = jnp.where(active, u_a + v * (u_b - u_a),
                       jnp.where(hit0, 0.0, u_b))
    return found, t_lo + u_star * span


def _window_march_quad3(mosaic, eye, dirs, legs, any_hit, *,
                        n_cells: int, margin_rel: float, margin_abs: float):
    """Guard + exact-cluster variant of `_window_march_quad2`.

    ``legs`` is ``((tG0, tG1, nw_g), (tA0, tA1, nw_a), (tB0, tB1, nw_b))``
    — per-pixel interval triples with STATIC per-leg step counts, from the
    guard/exact pooling in `march_guided_panorama`:

      * G is the best-effort GUARD: the conservative bound's backward
        drag (+ bound-only possibility spans), km-wide on steep
        look-downs, where hits are possible but rare (terrain hidden
        between profile samples);
      * A and B are the SURE exact-profile crossing clusters, ~one
        prepass step wide each, where ~all real crossings live.

    The round-3 two-cluster march spent one uniform budget across the
    union, so a 1.5 km guard drag starved the one-step sure interval to
    ~580 m effective steps (measured: 100% of the steep-pitch tail was
    in-leg resolution starvation, scripts/probe_steep_diag.py). Here the
    sure legs are narrow enough that ``nw + cell-walk`` resolves them
    EXACTLY, and the guard keeps the same best-effort density it always
    had. Earliest-crossing selection across the three legs preserves
    first-crossing semantics; one analytic cell walk refines the winner.
    """
    dx, dy, dz = dirs
    e_norm = jnp.linalg.norm(eye)
    a0 = e_norm - R0
    hmax = mosaic.hmax + 1.0
    r_shell = R0 + hmax
    b = dx * eye[0] + dy * eye[1] + dz * eye[2]
    c = (a0 - hmax) * (e_norm + r_shell)
    c0 = a0 * (e_norm + R0)
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inside = c <= 0.0
    t_enter = jnp.where(inside, 0.0, -b - sq)
    t_exit = -b + sq
    feasible = (disc > 0.0) & (t_exit > 0.0)
    t0 = jnp.maximum(t_enter, 0.0)
    t1 = jnp.where(feasible, jnp.minimum(t_exit, FAR), 0.0)

    def quad(g0, gm, g1):
        cq = 2.0 * g0 - 4.0 * gm + 2.0 * g1
        bq = -3.0 * g0 + 4.0 * gm - g1
        return g0, bq, cq

    def at(q, u):
        return q[0] + u * (q[1] + u * q[2])

    def leg(t_min, t_max, active, nw):
        t_lo = jnp.clip(t_min * (1.0 - margin_rel) - margin_abs, t0, t1)
        t_hi = jnp.clip(t_max * (1.0 + margin_rel) + margin_abs, t_lo, t1)
        span = t_hi - t_lo
        g0x, g0y, g0a = _track_raster(mosaic, eye, dirs, c0, b, t_lo)
        gmx, gmy, gma = _track_raster(mosaic, eye, dirs, c0, b,
                                      t_lo + 0.5 * span)
        g1x, g1y, g1a = _track_raster(mosaic, eye, dirs, c0, b, t_hi)
        qx = quad(g0x, gmx, g1x)
        qy = quad(g0y, gmy, g1y)
        qa = quad(g0a, gma, g1a)

        def f_at(u):
            return at(qa, u) - _cell_h(mosaic, at(qx, u), at(qy, u))

        du = jnp.where(active, 1.0 / nw, 0.0)
        f0 = f_at(jnp.zeros_like(t_lo))
        hit0 = active & (f0 <= 0.0)

        def body(k, state):
            found, u_a, u_b, f_prev, f_a, f_b = state
            u_k = du * k
            f_k = f_at(u_k)
            crossing = active & (~found) & (f_prev > 0.0) & (f_k <= 0.0)
            u_a = jnp.where(crossing, u_k - du, u_a)
            u_b = jnp.where(crossing, u_k, u_b)
            f_a = jnp.where(crossing, f_prev, f_a)
            f_b = jnp.where(crossing, f_k, f_b)
            return found | crossing, u_a, u_b, f_k, f_a, f_b

        zero = jnp.zeros_like(t_lo)
        found, u_a, u_b, _, f_a, f_b = jax.lax.fori_loop(
            1, nw + 1, body,
            (hit0, zero, jnp.where(hit0, zero, jnp.ones_like(t_lo)),
             f0, f0, f0),
        )
        # Flat tuple so the selection below can jnp.where elementwise.
        return (
            found, hit0, u_a, u_b, f_a, f_b,
            at(qx, u_a), at(qy, u_a), at(qa, u_a),
            at(qx, u_b), at(qy, u_b), at(qa, u_b),
            t_lo, span,
        )

    outs = [
        leg(lo_, hi_, any_hit, nw_) for (lo_, hi_, nw_) in legs
    ]

    # Earliest-crossing selection across the legs, keyed on the bracket
    # END (t_lo + u_b * span), not the start. For the SAME crossing seen
    # by a coarse pooled leg (bin width ~span/nw) and a narrow leg, the
    # narrow bracket's end is earlier -> the tighter bracket wins and the
    # cell walk gets a resolvable interval; for genuinely distinct
    # crossings the earlier one's end precedes the later one's start, so
    # first-crossing semantics hold. (Start-keyed selection handed
    # overlapping detections to the WIDE bracket — measured on the steep
    # patch-edge scene as the whole remaining tail: the own-texel sure
    # leg bracketed the crossing to ~40 m but the ~500 m pooled bin
    # started earlier and won, and the walk could not resolve it.)
    def bracket_end(o):
        return o[12] + o[3] * o[13]  # t_lo + u_b * span

    cur = outs[0]
    cur_end = bracket_end(cur)
    for o in outs[1:]:
        o_end = bracket_end(o)
        use_new = o[0] & ((~cur[0]) | (o_end < cur_end))
        cur = tuple(
            jnp.where(use_new, n, c_) for n, c_ in zip(o, cur)
        )
        cur_end = jnp.where(use_new, o_end, cur_end)

    found, hit0, u_a, u_b, f_a, f_b = cur[:6]
    ends = cur[6:12]
    t_lo, span = cur[12], cur[13]
    active = found & (~hit0) & (u_b > u_a)
    v = _cell_walk_core(mosaic, ends, f_a, f_b, active, n_cells=n_cells)
    u_star = jnp.where(active, u_a + v * (u_b - u_a),
                       jnp.where(hit0, 0.0, u_b))
    return found, t_lo + u_star * span


def _window_march(mosaic, eye, dirs, t_min, t_max, any_hit, *,
                  n_window: int, n_refine: int, margin_rel: float,
                  margin_abs: float):
    """Uniform march restricted to per-pixel brackets + bisection refine
    (the quad-track variant `_window_march_quad` is the production path;
    this serves mosaics without a cell table and the ray-prepass guided
    mode)."""
    dx, dy, dz = dirs
    e_norm = jnp.linalg.norm(eye)
    a0 = e_norm - R0
    hmax = mosaic.hmax + 1.0
    r_shell = R0 + hmax
    b = dx * eye[0] + dy * eye[1] + dz * eye[2]
    c = (a0 - hmax) * (e_norm + r_shell)
    c0 = a0 * (e_norm + R0)
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inside = c <= 0.0
    t_enter = jnp.where(inside, 0.0, -b - sq)
    t_exit = -b + sq
    feasible = (disc > 0.0) & (t_exit > 0.0)
    t0 = jnp.maximum(t_enter, 0.0)
    t1 = jnp.where(feasible, jnp.minimum(t_exit, FAR), 0.0)

    t_lo = jnp.clip(t_min * (1.0 - margin_rel) - margin_abs, t0, t1)
    t_hi = jnp.clip(t_max * (1.0 + margin_rel) + margin_abs, t_lo, t1)
    dt = jnp.where(any_hit, (t_hi - t_lo) / n_window, 0.0)

    f0 = _surface_f(mosaic, eye, dirs, c0, b, t_lo)
    hit0 = any_hit & (f0 <= 0.0)

    def body(k, state):
        found, lo, hi, f_prev = state
        t_k = t_lo + dt * k
        f_k = _surface_f(mosaic, eye, dirs, c0, b, t_k)
        crossing = any_hit & (~found) & (f_prev > 0.0) & (f_k <= 0.0)
        lo = jnp.where(crossing, t_k - dt, lo)
        hi = jnp.where(crossing, t_k, hi)
        return found | crossing, lo, hi, f_k

    found, lo, hi, _ = jax.lax.fori_loop(
        1,
        n_window + 1,
        body,
        (hit0, t_lo, jnp.where(hit0, t_lo, t_hi), f0),
    )

    def refine(_, state):
        lo, hi = state
        tm = 0.5 * (lo + hi)
        fm = _surface_f(mosaic, eye, dirs, c0, b, tm)
        below = fm <= 0.0
        return jnp.where(below, lo, tm), jnp.where(below, tm, hi)

    lo, hi = jax.lax.fori_loop(0, n_refine, refine, (lo, hi))
    return found, hi


def march_guided(
    mosaic,
    eye,
    dirs,
    *,
    n_steps: int,
    n_refine: int,
    pre_stride: tuple[int, int] = (2, 4),
    n_window: int = 96,
):
    """Exact march with t-ranges from a strided low-res ray prepass.

    The uniform march spends ``n_steps`` surface gathers per pixel across the
    whole feasible interval; the two-level max-mip variant pays the *worst*
    pixel's candidate count in while-loop lockstep, which goes pathological
    on wide-area scenes (grazing rays above ridgelines flag most intervals).

      1. **Prepass**: the full `march` on a ``(sy, sx)``-strided ray subgrid
         (1/8th the rays at the default stride) finds accurate crossings at
         low spatial resolution (uniform marching — see the lockstep note).
      2. **Windows**: per full-res pixel, the 3x3 prepass neighborhood's
         min/max hit distance (plus a 2% + 300 m margin) brackets where its
         own crossing can be; pixels whose whole neighborhood is sky render
         sky without marching.
      3. **Windowed march** (`_window_march`): ``n_window`` uniform steps
         inside the bracket + bisection. Interior windows are a few hundred
         metres wide, so the effective step size *drops* ~30x below the
         uniform path's while total gathers drop ~8x.

    `march_guided_panorama` is the faster production variant (its prepass
    shares profile samples across pixel rows); this ray-prepass form needs
    no field-of-view bound and serves arbitrary ray sets. Differences vs
    the uniform march are confined to sub-prepass-cell silhouette features —
    the class the oracle comparison already tolerates
    (`tests/test_render.py::test_march_guided_matches_uniform`).
    """
    eye = jnp.asarray(eye, jnp.float32)
    if not isinstance(dirs, tuple):
        d = jnp.asarray(dirs, jnp.float32)
        dirs = (d[..., 0], d[..., 1], d[..., 2])
    dx, dy, dz = dirs
    H, W = dx.shape
    sy, sx = pre_stride

    oy, ox = sy // 2, sx // 2
    pre = (dx[oy::sy, ox::sx], dy[oy::sy, ox::sx], dz[oy::sy, ox::sx])
    hit_p, t_p = march(
        mosaic, eye, pre, n_steps=n_steps, n_refine=10, two_level=False
    )

    BIG = jnp.float32(3.0e38)
    t_min = _pool3(jnp.where(hit_p, t_p, BIG), jnp.minimum)
    t_max = _pool3(jnp.where(hit_p, t_p, -BIG), jnp.maximum)

    def up(a):
        a = jnp.repeat(a, sy, axis=0)[:H]
        a = jnp.repeat(a, sx, axis=1)[:, :W]
        # The strided grid can undershoot the full grid by one row/column.
        if a.shape[0] < H:
            a = jnp.concatenate([a, jnp.repeat(a[-1:], H - a.shape[0], 0)], 0)
        if a.shape[1] < W:
            a = jnp.concatenate([a, jnp.repeat(a[:, -1:], W - a.shape[1], 1)], 1)
        return a

    t_min = up(t_min)
    t_max = up(t_max)
    return _window_march(
        mosaic, eye, dirs, t_min, t_max, t_min < BIG,
        n_window=n_window, n_refine=n_refine,
        margin_rel=0.02, margin_abs=300.0,
    )


def guided_march_defaults() -> dict:
    """The guided march's ACTUAL default knob values, read off
    `march_guided_panorama`'s signature (same export contract as
    `guided_prepass_spec`: the bench's stage instrumentation must never
    fork from the engine — a knob default change here propagates
    automatically)."""
    import inspect

    sig = inspect.signature(march_guided_panorama)
    return {
        k: v.default
        for k, v in sig.parameters.items()
        if v.default is not inspect.Parameter.empty
    }


def guided_march_rounds(
    *,
    n_window: int = 6,
    n_cells: int = 2,
    guard_legs: bool = True,
    nw_guard: int = 2,
    split_brackets: bool = True,
) -> int:
    """Per-pixel table-gather ROUND count of the guided march's window
    phase, exported for the bench's stage decomposition (round-3 verdict:
    derive stage math from the engine, never re-derive it bench-side).
    Each window f-eval and each analytic cell-walk step is one packed
    cell-row gather — the march's unit of cost on this TPU (march-pattern
    gathers run at the duplicated-lane rate regardless of table layout;
    NOTES.md "gather-rate ground truth")."""
    nw_leg = max(n_window // 2, 2)
    if guard_legs:
        if split_brackets:
            return 2 * (nw_leg + 1) + (nw_guard + 1) + n_cells
        return (n_window + 1) + (nw_guard + 1) + n_cells  # union + own
    if split_brackets:
        return 2 * (nw_leg + 1) + n_cells
    return n_window + 1 + n_cells


def guided_prepass_spec(
    *,
    height: int,
    fov_hint: float,
    aspect: float,
    n_steps: int = 1024,
    supersample: float = 1.0,
    elev_supersample: float = 1.0,
):
    """The guided march's ACTUAL prepass geometry, exported.

    Returns ``(spec_pre, half_win, az_span)`` — the `PanoramaSpec` that
    `march_guided_panorama` hands to `panorama_crossing_prepass`, plus the
    angular window it derives it from. `bench.py` uses this to time the
    prepass stage with the real spec instead of re-deriving the sizing math
    (round-3 verdict: a knob change silently skewed the stage attribution).
    """
    import math as _m

    from topo_renderer_tpu.ops.panorama import PanoramaSpec

    half_diag = min(
        _m.atan(_m.tan(0.5 * float(fov_hint)) * _m.sqrt(1.0 + aspect * aspect)),
        0.49 * _m.pi,
    )
    half_win = min(1.03 * half_diag + 0.01, 0.49 * _m.pi)
    az_span = min(2.0 * _m.pi, 2.0 * half_win / max(_m.cos(half_win), 0.3))
    px_per_rad = supersample * height / float(fov_hint)
    wp = max(256, min(int(_m.ceil(az_span * px_per_rad / 128.0)) * 128, 8192))
    # Elevation rows share each azimuth column's profile gathers
    # (`panorama_crossing_prepass` is O(N + H) per column), so elevation
    # supersampling tightens the 3x3 pooled brackets' angular footprint at
    # near-zero gather cost. MEASURED A QUALITY DEAD END as a round-count
    # lever (scripts/probe_elev.py, CPU WGSL oracle at 800x450): es=2.0
    # makes nw=6 WORSE (0.093% vs 0.082% — the shrunken 3x3 angular
    # footprint loses neighborhood coverage faster than the tighter
    # brackets gain), and nw=4+es2.0 (0.094%) never reaches the 13-round
    # default. Keep es=1.0; the knob stays for experiments.
    hp_per_rad = px_per_rad * elev_supersample
    hp = max(64, min(int(_m.ceil(2.0 * half_win * hp_per_rad / 8.0)) * 8, 4096))

    # 896 prepass steps measure quality-equal to 1024 on the gated scenes
    # (the conservative bound owns the hit flag; d_hi moves by <=14% of a
    # step) and shave ~12% of the prepass gathers.
    spec_pre = PanoramaSpec(
        width=wp, height=hp, n_steps=min(n_steps, 896), n_refine=0,
        azimuth_start=-0.5 * az_span, azimuth_span=az_span,
        elev_min=-half_win, elev_max=half_win,
    )
    return spec_pre, half_win, az_span


def march_guided_panorama(
    mosaic,
    eye,
    dirs,
    fwd,
    *,
    n_steps: int,
    n_refine: int,
    fov_hint: float,
    aspect: float,
    n_window: int = 6,
    supersample: float = 1.0,
    elev_supersample: float = 1.0,
    analytic_refine: bool = True,
    n_cells: int = 2,
    split_brackets: bool = True,
    guard_legs: bool = True,
    nw_guard: int = 2,
    nw_far: int | None = None,
    margin_rel: float = 0.01,
    margin_abs: float = 25.0,
    prepass_k_back: int = 1 << 20,
    bound_stride: int = 4,
    fusion_barrier: bool = False,
):
    """Exact march with t-ranges from an exact-panorama profile prepass.

    The decisive cost of any dense exact march is table gathers (~40 M/s
    into multi-100-MB tables on this TPU). A strided-ray prepass still pays
    O(N) gathers *per prepass ray*; a panorama profile pays O(N) gathers
    *per column* and shares them across every pixel row
    (`ops/panorama.py::panorama_crossing_prepass`), cutting prepass gathers
    ~25x (46 M -> ~2 M at 800x450/1024 steps). The prepass covers the
    frustum's azimuth/elevation window (sized statically from ``fov_hint``,
    an upper bound on the camera fov — quantize to buckets to limit
    recompiles) at ``supersample`` x the pixel density and returns analytic
    per-texel crossing-distance brackets; each perspective pixel takes the
    3x3 pooled bracket of its nearest prepass texel, then `_window_march`
    resolves the exact surface inside it with ``n_window`` + ``n_refine``
    samples (~34 gathers/pixel vs 1024 for the uniform march — sub-bracket
    window widths need few uniform steps).

    Default budget (round 4: ``guard_legs=True, n_window=6, nw_guard=2,
    n_cells=2, margin_abs=25, supersample=1.0`` — two split pooled legs
    of 3 steps + the 2-step own-texel sure leg = 13 gather rounds/pixel,
    `guided_march_rounds`), gated against the WGSL rasterizer oracle
    (scripts/probe_parity_scale2.py, probe_steep_pitch.py) and against
    the conservative nw=16/ss=1.5 march on production-scale TPU scenes
    (scripts/probe_quad6.py). Measured tails (pixels >2/255 vs oracle),
    all within 2x of the dense-march floors: 800x450 production scene
    0.082% (floor 0.044%; round-3 default was 0.12% and its best paid
    rung 0.083%); 400x225 suite scene 0.136% (floor 0.079%); steep
    patch-edge scene 0.30% (was 2.3%; floor 0.02%). supersample 1.1 ->
    1.0 measured quality-neutral on every gated scene with the own-leg
    design (-17% prepass cost). Cheaper rungs via ``guided_kw``:
    ``n_window=4`` 11 rounds (0.106/0.247/0.307);
    ``split_brackets=False, n_window=3`` = union+own, 9 rounds
    (0.128/0.159/0.281); saturation (nw=32) reaches the floors —
    coverage is complete, the residual is window resolution. The 25 m absolute margin suffices
    because the pooled brackets absorb inter-texel angular deviation and
    the prepass bracket ends are conservative per texel; 150 m was
    measured to be the binding resolution loss on narrow silhouette
    intervals. See PARITY.md "Round 4: the own-texel sure leg" for the
    diagnosis that shaped the leg structure and the END-keyed selection.
    """
    from topo_renderer_tpu.ops.panorama import panorama_crossing_prepass

    eye = jnp.asarray(eye, jnp.float32)
    if not isinstance(dirs, tuple):
        d = jnp.asarray(dirs, jnp.float32)
        dirs = (d[..., 0], d[..., 1], d[..., 2])
    dx, dy, dz = dirs
    H, W = dx.shape

    # Eye-local az/el of every pixel ray (same frame as the fast warp).
    e_norm = jnp.linalg.norm(eye)
    ux, uy, uz = eye[0] / e_norm, eye[1] / e_norm, eye[2] / e_norm
    lon0 = jnp.arctan2(eye[1], eye[0])
    lat0 = jnp.arcsin(jnp.clip(eye[2] / e_norm, -1.0, 1.0))
    ex_, ey_ = -jnp.sin(lon0), jnp.cos(lon0)
    nx0 = -jnp.sin(lat0) * jnp.cos(lon0)
    ny0 = -jnp.sin(lat0) * jnp.sin(lon0)
    nz0 = jnp.cos(lat0)
    d_e = dx * ex_ + dy * ey_
    d_n = dx * nx0 + dy * ny0 + dz * nz0
    d_u = dx * ux + dy * uy + dz * uz
    az = jnp.arctan2(d_e, d_n)
    el = jnp.arcsin(jnp.clip(d_u, -1.0, 1.0))

    az_c = jnp.arctan2(
        fwd[0] * ex_ + fwd[1] * ey_,
        fwd[0] * nx0 + fwd[1] * ny0 + fwd[2] * nz0,
    )
    el_c = jnp.arcsin(jnp.clip(fwd[0] * ux + fwd[1] * uy + fwd[2] * uz, -1.0, 1.0))

    # Static angular window from the fov bound (diagonal half-angle+margin);
    # shared with the bench's stage instrumentation (`guided_prepass_spec`).
    spec_pre, half_win, az_span = guided_prepass_spec(
        height=H, fov_hint=fov_hint, aspect=aspect,
        n_steps=n_steps, supersample=supersample,
        elev_supersample=elev_supersample,
    )
    wp, hp = spec_pre.width, spec_pre.height
    pre = panorama_crossing_prepass(
        mosaic, eye, spec_pre, azimuth_offset=az_c, elev_offset=el_c,
        k_back=prepass_k_back, bound_stride=bound_stride,
    )

    BIG = jnp.float32(3.0e38)
    d_lo = jnp.where(pre["hit"], pre["d_lo"], BIG)
    # Pool the bracket's far end over EXACT-profile hits only: bound-only
    # texels carry d_hi = FAR, and one of them in a 3x3 neighborhood would
    # blow every neighbor's bracket out to the far plane (a 63 km step
    # march finds nothing). A texel that is ITSELF bound-only keeps the FAR
    # end (its own crossing has no exact upper bound — truncating it to a
    # neighbor's foreground crossing would re-introduce the grazing miss),
    # as do neighborhoods with no exact end anywhere.
    bound_only = pre["hit"] & (pre["d_hi"] >= 0.98 * FAR)
    d_hi = jnp.where(pre["hit"] & (~bound_only), pre["d_hi"], -BIG)

    use_quad = analytic_refine and getattr(mosaic, "has_cell_table", False)

    # Nearest prepass texel per pixel; one packed row gather fetches the
    # bracket ends (row gathers cost the same as scalar gathers here).
    rel_az = (az - az_c + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
    gx = (rel_az + 0.5 * az_span) / az_span * wp - 0.5
    gy = (jnp.float32(half_win) - (el - el_c)) / jnp.float32(2.0 * half_win) * hp - 0.5
    ix = jnp.clip(jnp.round(gx).astype(jnp.int32), 0, wp - 1)
    iy = jnp.clip(jnp.round(gy).astype(jnp.int32), 0, hp - 1)

    if use_quad and guard_legs:
        # Split pooled legs + an UN-POOLED own-texel sure leg (round 4).
        # Diagnosis on the steep patch-edge scene with the tight
        # (full-rate, level-matched) conservative bound
        # (scripts/probe_steep_diag.py): 100% of oracle deviations were
        # in-leg resolution starvation — no bracket misses — and for
        # 99.4% of them the true crossing sat inside the pixel's OWN
        # prepass texel's bracket, essentially AT its exact-profile end
        # d_hi (offset p50 = leg width p50 ~1.4 km). The 3x3 pooling that
        # makes the march robust to the pixel/texel angular offset is
        # exactly what starves it: pooled leg widths are km-scale where
        # the own texel's sure interval [d_me, d_hi]
        # (`panorama_crossing_prepass`) is ONE log step (~1% of
        # distance). So march THREE legs:
        #   * the two split pooled cluster legs (unchanged coverage /
        #     conservativeness — every neighbor bracket is still fully
        #     contained in their union);
        #   * the own texel's [d_me, d_hi] with ``nw_guard`` steps —
        #     narrow enough that nw + the analytic cell walk resolves
        #     the common case exactly.
        # Earliest-crossing selection keeps first-crossing semantics; the
        # own leg is listed LAST so ties resolve to the pooled legs.
        m, m_hi, a_max, b_min, b_max = _grouped_bracket_pools(d_lo, d_hi)
        uni_hi = jnp.maximum(a_max, b_max)
        uni_hi = jnp.where(bound_only | (uni_hi <= 0.0), FAR, uni_hi)
        # Own-texel sure leg; where the own texel is sky, degenerate to
        # the pooled near start (duplicate coverage, never a new hit
        # class — margins treat it exactly like leg A's start).
        own_hit = pre["hit"]
        own0 = jnp.where(own_hit, pre["d_me"], m)
        own1 = jnp.where(own_hit, pre["d_hi"], m)
        if not split_brackets:
            # Cheapest structure: ONE union pooled leg + the own leg
            # (``n_window`` + ``nw_guard`` steps). The union pooling that
            # round 3 replaced (its silhouette-spanning interval was the
            # 0.22% tail) is tolerable again because the own leg resolves
            # the common crossing exactly; the union leg only needs to
            # CATCH neighbor-silhouette / hidden-terrain crossings.
            packed = jnp.stack([m, uni_hi, own0, own1], axis=-1).reshape(-1, 4)
            rows = packed[iy * wp + ix]
            if fusion_barrier:
                rows, dx, dy, dz = jax.lax.optimization_barrier(
                    (rows, dx, dy, dz)
                )
                dirs = (dx, dy, dz)
            legs = (
                (rows[..., 0], rows[..., 1], n_window),
                (rows[..., 2], rows[..., 3], nw_guard),
            )
            return _window_march_quad3(
                mosaic, eye, dirs, legs, rows[..., 0] < BIG,
                n_cells=n_cells, margin_rel=margin_rel,
                margin_abs=margin_abs,
            )
        b_max_eff = jnp.where(bound_only, FAR, b_max)
        split = (a_max > 0.0) & (b_min < BIG) & (b_max_eff > b_min)
        tA1 = jnp.where(split, a_max, uni_hi)
        nw_leg = max(n_window // 2, 2)
        tB0 = jnp.where(
            split,
            jnp.maximum(b_min, a_max),
            m + (uni_hi - m) * (0.5 / nw_leg),
        )
        tB1 = jnp.where(split, jnp.maximum(b_max_eff, tB0), uni_hi)
        packed = jnp.stack(
            [m, tA1, tB0, tB1, own0, own1], axis=-1
        ).reshape(-1, 6)
        rows = packed[iy * wp + ix]
        # Cut the prepass/pooling -> march fusion boundary (same measured
        # pathology class as the fast path's pano->warp cut; see
        # `render_perspective_fast` and scripts/probe_barrier_exact.py).
        if fusion_barrier:
            rows, dx, dy, dz = jax.lax.optimization_barrier((rows, dx, dy, dz))
            dirs = (dx, dy, dz)
        # ``nw_far`` lets the FAR cluster leg run leaner than the near one
        # (crossings concentrate in the near cluster; the far leg mostly
        # exists for silhouette-background coverage).
        legs = (
            (rows[..., 0], rows[..., 1], nw_leg),
            (rows[..., 2], rows[..., 3],
             nw_leg if nw_far is None else max(nw_far, 1)),
            (rows[..., 4], rows[..., 5], nw_guard),
        )
        return _window_march_quad3(
            mosaic, eye, dirs, legs, rows[..., 0] < BIG,
            n_cells=n_cells, margin_rel=margin_rel, margin_abs=margin_abs,
        )

    if use_quad and split_brackets:
        # Two-cluster pooling (see `_grouped_bracket_pools`): the march
        # spends its steps in two narrow intervals instead of one
        # silhouette-spanning union.
        m, m_hi, a_max, b_min, b_max = _grouped_bracket_pools(d_lo, d_hi)
        uni_hi = jnp.maximum(a_max, b_max)
        uni_hi = jnp.where(bound_only | (uni_hi <= 0.0), FAR, uni_hi)
        b_max_eff = jnp.where(bound_only, FAR, b_max)
        split = (a_max > 0.0) & (b_min < BIG) & (b_max_eff > b_min)
        tA1 = jnp.where(split, a_max, uni_hi)
        # Merged mode: leg B re-marches the union half a step out of phase
        # with leg A, recovering the single-interval effective resolution.
        nw_leg = max(n_window // 2, 2)
        tB0 = jnp.where(
            split,
            jnp.maximum(b_min, a_max),
            m + (uni_hi - m) * (0.5 / nw_leg),
        )
        tB1 = jnp.where(split, jnp.maximum(b_max_eff, tB0), uni_hi)
        packed = jnp.stack([m, tA1, tB0, tB1], axis=-1).reshape(-1, 4)
        rows = packed[iy * wp + ix]
        legs = ((rows[..., 0], rows[..., 1]), (rows[..., 2], rows[..., 3]))
        return _window_march_quad2(
            mosaic, eye, dirs, legs, rows[..., 0] < BIG,
            n_window=n_window, n_cells=n_cells,
            margin_rel=margin_rel, margin_abs=margin_abs,
        )

    t_min_img = _pool3(d_lo, jnp.minimum)
    t_max_img = _pool3(d_hi, jnp.maximum)
    t_max_img = jnp.where(bound_only | (t_max_img <= 0.0), FAR, t_max_img)
    packed = jnp.stack([t_min_img, t_max_img], axis=-1).reshape(-1, 2)
    rows = packed[iy * wp + ix]
    t_min = rows[..., 0]
    t_max = rows[..., 1]

    if use_quad:
        return _window_march_quad(
            mosaic, eye, dirs, t_min, t_max, t_min < BIG,
            n_window=n_window, n_cells=n_cells,
            margin_rel=margin_rel, margin_abs=margin_abs,
        )
    return _window_march(
        mosaic, eye, dirs, t_min, t_max, t_min < BIG,
        n_window=n_window, n_refine=n_refine,
        margin_rel=margin_rel, margin_abs=margin_abs,
    )


def fast_view_spec(
    *,
    width: int,
    height: int,
    fov_hint: float = 0.7853981633974483,
    supersample: float = 1.25,
    n_steps: int = 384,
    clipmap_threshold: int | None = None,
):
    """The fast perspective path's ACTUAL panorama spec, exported (same
    contract as `guided_prepass_spec`): `render_perspective_fast` renders
    this angular window and warps it; sharded-mosaic serving
    (`parallel/sharded_mosaic.py::render_perspective_fast_sharded`)
    extracts this spec's clipmap windows with the psum-assembling
    extractor and feeds them back in — derivations must never fork."""
    import math as _m

    from topo_renderer_tpu.ops.panorama import PanoramaSpec

    half_diag = min(
        _m.atan(_m.tan(0.5 * float(fov_hint)) * _m.sqrt(1.0 + (width / height) ** 2)),
        0.49 * _m.pi,
    )
    half_win = min(1.03 * half_diag + 0.01, 0.49 * _m.pi)
    az_span = min(2.0 * _m.pi, 2.0 * half_win / max(_m.cos(half_win), 0.3))
    px_per_rad = supersample * height / float(fov_hint)
    wp = max(256, min(int(_m.ceil(az_span * px_per_rad / 256.0)) * 256, 8192))
    hp = max(64, min(int(_m.ceil(2.0 * half_win * px_per_rad / 8.0)) * 8, 4096))
    kw = (
        {} if clipmap_threshold is None
        else {"clipmap_threshold": clipmap_threshold}
    )
    spec = PanoramaSpec.fast(
        width=wp, height=hp, n_steps=n_steps,
        azimuth_start=-0.5 * az_span, azimuth_span=az_span,
        elev_min=-half_win, elev_max=half_win, **kw,
    )
    return spec, half_win, az_span


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "supersample", "n_steps", "pixelize_n", "fov_hint",
        "clipmap_threshold",
    ),
)
def render_perspective_fast(
    mosaic,
    camera: Camera,
    *,
    width: int,
    height: int,
    supersample: float = 1.25,
    n_steps: int = 384,
    pixelize_n=None,
    fov_hint: float = 0.7853981633974483,  # 45 deg
    windows=None,
    clipmap_threshold: int | None = None,
):
    """Interactive-rate perspective rendering via the panorama engine.

    A perspective image is a field of rays from the eye; so is a cylindrical
    panorama section. This renders the frustum's azimuth/elevation window
    with the fast column-marcher (`ops/panorama.py` — LOD clipmap path, ~ms)
    and warps it onto the perspective pixel grid by per-pixel ray direction
    — geometrically exact up to the panorama's angular resolution
    (``supersample`` x the pixel density). This is the TPU answer to the
    reference's interactive render loop; `render_perspective` remains the
    triangle-exact parity renderer.

    The angular window is sized statically from ``fov_hint`` (an upper bound
    on the camera fov; quantize it to a few buckets to limit recompiles) and
    *centered* on the camera's traced view direction, so yaw/pitch motion
    never recompiles.
    """
    from topo_renderer_tpu.ops.panorama import PanoramaSpec, render_panorama

    (dx, dy, dz), fwd = camera_rays(camera, width, height)
    eye = jnp.asarray(camera.eye, jnp.float32)

    # Eye-local az/el of every pixel ray.
    e_norm = jnp.linalg.norm(eye)
    ux, uy, uz = eye[0] / e_norm, eye[1] / e_norm, eye[2] / e_norm
    lon0 = jnp.arctan2(eye[1], eye[0])
    lat0 = jnp.arcsin(jnp.clip(eye[2] / e_norm, -1.0, 1.0))
    ex_, ey_ = -jnp.sin(lon0), jnp.cos(lon0)
    nx0 = -jnp.sin(lat0) * jnp.cos(lon0)
    ny0 = -jnp.sin(lat0) * jnp.sin(lon0)
    nz0 = jnp.cos(lat0)
    d_e = dx * ex_ + dy * ey_
    d_n = dx * nx0 + dy * ny0 + dz * nz0
    d_u = dx * ux + dy * uy + dz * uz
    az = jnp.arctan2(d_e, d_n)  # [H, W], 0 = north
    el = jnp.arcsin(jnp.clip(d_u, -1.0, 1.0))

    # Static angular window from the fov bound (diagonal half-angle +
    # margin) — the shared derivation (`fast_view_spec`).
    spec, half_win, az_span = fast_view_spec(
        width=width, height=height, fov_hint=fov_hint,
        supersample=supersample, n_steps=n_steps,
        clipmap_threshold=clipmap_threshold,
    )
    wp, hp = spec.width, spec.height

    # Traced window center: the view direction's az/el.
    az_c = jnp.arctan2(
        fwd[0] * ex_ + fwd[1] * ey_,
        fwd[0] * nx0 + fwd[1] * ny0 + fwd[2] * nz0,
    )
    el_c = jnp.arcsin(
        jnp.clip(fwd[0] * ux + fwd[1] * uy + fwd[2] * uz, -1.0, 1.0)
    )
    sun = camera.sun_angle.to_vec3()
    view_mode = jnp.int32(int(camera.view_mode))
    pano = render_panorama(
        mosaic, eye, spec, sun, view_mode=view_mode,
        quantize_rt=False, apply_postprocess=False,
        azimuth_offset=az_c, elev_offset=el_c, windows=windows,
    )

    # Warp pano -> perspective grid by ray direction. Bilinear taps are the
    # cost driver (TPU gathers are per-element and fetch width is free up to
    # a cache line); pack (10-bit RGB, distance) for the WHOLE 2x2 bilinear
    # footprint — x-neighbors AND y-neighbors — into one 8-wide row so each
    # pixel needs exactly ONE row gather instead of two (or 16 scalar ones).
    color = pano["color"]
    enc = jnp.round(jnp.clip(color, 0.0, 1.0) * 1023.0).astype(jnp.uint32)
    packed_rgb = jax.lax.bitcast_convert_type(
        enc[..., 0] | (enc[..., 1] << 10) | (enc[..., 2] << 20), jnp.float32
    )
    dist_p = pano["distance"]
    cosf = dx * fwd[0] + dy * fwd[1] + dz * fwd[2]

    # Cut the pano->warp fusion boundary. Left fused, XLA's layout/fusion
    # choices across this boundary DOUBLE the whole frame (measured,
    # scripts/probe_warp4.py on TPU v5e at 800x450: one fused program
    # 18.7 ms; with this barrier 9.3 ms; two separate programs 9.0 ms —
    # outputs verified bit-identical: 0 f32 bit flips in color, depth
    # exact, u8 image exact). The barrier materializes the packed pano
    # planes and the per-pixel angle grids once, keeping ONE dispatch.
    packed_rgb, dist_p, az, el, az_c, el_c, cosf = jax.lax.optimization_barrier(
        (packed_rgb, dist_p, az, el, az_c, el_c, cosf)
    )

    rel_az = (az - az_c + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
    gx = (rel_az + 0.5 * az_span) / az_span * wp - 0.5
    gy = (jnp.float32(half_win) - (el - el_c)) / jnp.float32(2.0 * half_win) * hp - 0.5
    shift_x = lambda a: jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    shift_y = lambda a: jnp.concatenate([a[1:], a[-1:]], axis=0)
    p00, d00 = packed_rgb, dist_p
    p01, d01 = shift_x(packed_rgb), shift_x(dist_p)
    p10, d10 = shift_y(p00), shift_y(d00)
    p11, d11 = shift_y(p01), shift_y(d01)
    quad = jnp.stack(
        [p00, d00, p01, d01, p10, d10, p11, d11], axis=-1
    ).reshape(-1, 8)

    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, wp - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, hp - 2)
    fx = jnp.clip(gx - x0, 0.0, 1.0)
    fy = jnp.clip(gy - y0, 0.0, 1.0)
    rows8 = quad[y0 * wp + x0]
    top = rows8[..., 0:4]
    bot = rows8[..., 4:8]

    def unpack_rgb(v):
        bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
        return tuple(
            ((bits >> s) & 0x3FF).astype(jnp.float32) / 1023.0 for s in (0, 10, 20)
        )

    c00, c01 = unpack_rgb(top[..., 0]), unpack_rgb(top[..., 2])
    c10, c11 = unpack_rgb(bot[..., 0]), unpack_rgb(bot[..., 2])
    chans = tuple(
        (c00[i] * (1 - fx) + c01[i] * fx) * (1 - fy)
        + (c10[i] * (1 - fx) + c11[i] * fx) * fy
        for i in range(3)
    )
    dist = (top[..., 1] * (1 - fx) + top[..., 3] * fx) * (1 - fy) + (
        bot[..., 1] * (1 - fx) + bot[..., 3] * fx
    ) * fy
    hit = dist < 0.98 * FAR  # sky carries FAR distance

    # Reference-convention depth for the label pass: convert ray distance to
    # view-axis distance, then to ndc depth.
    from topo_renderer_tpu.models.camera import depth_from_dist

    depth = jnp.where(hit, depth_from_dist(jnp.clip(dist * cosf, NEAR, FAR)), 1.0)

    chans = tuple(shd.quantize_srgb8(c) for c in chans)
    chans = postprocess_soa(chans, depth, pixelize_n=pixelize_n)
    return {
        "color": jnp.stack(chans, axis=-1),
        "depth": depth,
        "distance": jnp.where(hit, dist, FAR),
        "hit": hit,
    }


@partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "n_steps",
        "n_refine",
        "quantize_rt",
        "apply_postprocess",
        "pixelize_n",
        "guided",
        "fov_hint",
        "guided_kw",
        "fusion_barrier",
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
    pixelize_n=None,
    quantize_rt: bool = True,
    apply_postprocess: bool = True,
    guided: bool = False,
    fov_hint: float | None = None,
    guided_kw: tuple = (),
    fusion_barrier: bool = False,
):
    """Render one perspective frame: the full terrain + postprocess pipeline.

    Mirrors the reference's two render passes
    (`terrain_renderer.rs:373-450`): terrain shading into an offscreen target
    (with the sky clear color and 0..1 depth), then contour/pixelize
    postprocessing. Returns a dict with linear-color image, depth, hit
    distance and mask — callers convert with `shading.to_srgb8_image`.
    """
    (dx, dy, dz), fwd = camera_rays(camera, width, height)
    eye = jnp.asarray(camera.eye, jnp.float32)

    if guided and fov_hint is not None:
        # Panorama-profile prepass: needs a static fov upper bound
        # (callers quantize the camera fov to buckets, like the fast path).
        hit, t_hit = march_guided_panorama(
            mosaic, eye, (dx, dy, dz), fwd,
            n_steps=n_steps, n_refine=min(n_refine, 18),
            fov_hint=fov_hint, aspect=width / height,
            **dict(guided_kw),
        )
    elif guided:
        hit, t_hit = march_guided(
            mosaic, eye, (dx, dy, dz), n_steps=n_steps, n_refine=n_refine
        )
    else:
        hit, t_hit = march(
            mosaic, eye, (dx, dy, dz), n_steps=n_steps, n_refine=n_refine
        )

    # Cut the march -> attrs/shade fusion boundary (same measured pathology
    # class as the fast path's pano->warp cut; A/B in
    # scripts/probe_barrier_exact.py).
    if fusion_barrier:
        hit, t_hit, dx, dy, dz = jax.lax.optimization_barrier(
            (hit, t_hit, dx, dy, dz)
        )

    # Near/far plane clipping along the view axis (matches rasterizer clip,
    # `camera.rs:7-8`).
    cosf = dx * fwd[0] + dy * fwd[1] + dz * fwd[2]
    z_view = t_hit * cosf
    hit = hit & (z_view >= NEAR) & (z_view <= FAR)

    pos_x = eye[0] + t_hit * dx
    pos_y = eye[1] + t_hit * dy
    pos_z = eye[2] + t_hit * dz

    # Depth in the reference's convention: ndc z from the view-projection.
    vp = camera.build_view_proj_matrix(jnp.float32(width), jnp.float32(height))
    clip_z = vp[2, 0] * pos_x + vp[2, 1] * pos_y + vp[2, 2] * pos_z + vp[2, 3]
    clip_w = vp[3, 0] * pos_x + vp[3, 1] * pos_y + vp[3, 2] * pos_z + vp[3, 3]
    depth = jnp.where(hit, clip_z / clip_w, 1.0)

    # Attributes + shading at the hit point.
    r = jnp.sqrt(pos_x * pos_x + pos_y * pos_y + pos_z * pos_z)
    gx, gy = raster_from_ecef(mosaic, pos_x, pos_y, pos_z, r)
    if (
        getattr(mosaic, "has_cell_table", False)
        and mosaic.cell_heights_flat.shape[-1] == 8
    ):
        # One 32 B cell-row gather (corners' heights + packed normals)
        # instead of four attr-row gathers; bit-identical interpolation.
        from topo_renderer_tpu.ops.surface import sample_attributes_cell

        _, n_x, n_y, n_z, _ = sample_attributes_cell(mosaic, gx, gy)
    else:
        _, n_x, n_y, n_z, _ = sample_attributes_soa(mosaic, gx, gy)

    px = jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(height, dtype=jnp.float32)[:, None] + 0.5
    seed_x = px + eye[0] - pos_x
    seed_y = py + eye[1] - pos_y

    sun = camera.sun_angle.to_vec3()
    view_mode = jnp.int32(int(camera.view_mode))
    cr, cg, cb = shd.shade_soa(n_x, n_y, n_z, sun, view_mode, seed_x, seed_y)
    sky = shd.SKY_COLOR
    cr = jnp.where(hit, cr, sky[0])
    cg = jnp.where(hit, cg, sky[1])
    cb = jnp.where(hit, cb, sky[2])
    channels = (cr, cg, cb)

    if quantize_rt:
        channels = tuple(shd.quantize_srgb8(c) for c in channels)
    if apply_postprocess:
        channels = postprocess_soa(channels, depth, pixelize_n=pixelize_n)

    return {
        "color": jnp.stack(channels, axis=-1),
        "depth": depth,
        "distance": jnp.where(hit, t_hit, FAR),
        "hit": hit,
    }
