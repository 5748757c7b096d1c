"""Triangle-exact heightfield surface sampling (TPU structure-of-arrays).

The reference renders each tile as a regular grid mesh whose cells are split
into two triangles along a diagonal that alternates with ``(i + j) % 2``
(`topo-renderer/src/render/render_buffer.rs:191-219`). The rendered surface is
therefore piecewise-linear over cells with a parity-dependent diagonal. The
TPU marchers reproduce **that exact surface** by interpolating heights and
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

Performance notes (these functions sit inside the innermost march loops):
  * all math is scalar-plane SoA — no ``[..., 3]`` trailing axes, which would
    map onto 3 of the VPU's 128 lanes;
  * validity is encoded in the height data itself (`scene.POISON_HEIGHT`),
    so the hot loop gathers from exactly one table;
  * normals come as one u32 gather per corner (world-space 10-bit packing,
    see `models/scene.pack_normals`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from topo_renderer_tpu.models.scene import POISON_HEIGHT, unpack_normals

INVALID_HEIGHT = POISON_HEIGHT


def cell_rows(mosaic, idx):
    """Fetch per-cell corner rows ``cell_heights_flat[idx]``.

    On a row-sharded mosaic being evaluated INSIDE a `shard_map` over the
    geo axis (``mosaic.cell_sharded`` — see
    `parallel/sharded_mosaic.render_perspective_sharded`), each device
    gathers its local row band and the single owner's contribution is
    `psum`-assembled: every cell row lives on exactly one device, so the
    masked sum IS the row. This is what lets the triangle-exact march run
    against tables larger than one chip's HBM.

    Note: this runs psum/axis_index inside `fori_loop` bodies under the
    shard_map — exercised green by tests on the CPU mesh backend (it was
    specifically `lax.scan` bodies where collectives mis-executed; see
    `parallel/sharded_mosaic._masked_rows_3d_local`).
    """
    if getattr(mosaic, "cell_sharded", False):
        from topo_renderer_tpu.parallel.sharded_mosaic import GEO_AXIS

        local = mosaic.cell_heights_flat
        n_loc = local.shape[0]
        lo = jax.lax.axis_index(GEO_AXIS) * n_loc
        k = idx - lo
        ok = (k >= 0) & (k < n_loc)
        rows = local[jnp.clip(k, 0, n_loc - 1)]
        rows = jnp.where(ok[..., None], rows, 0.0)
        return jax.lax.psum(rows, GEO_AXIS)
    return mosaic.cell_heights_flat[idx]


def raster_from_geo(mosaic, lon_deg, lat_deg):
    """Geographic degrees -> mosaic raster coordinates (gx, gy)."""
    gx = (lon_deg - mosaic.model_point[0]) / mosaic.pixel_scale[0]
    gy = (mosaic.model_point[1] - lat_deg) / mosaic.pixel_scale[1]
    return gx, gy


def raster_from_ecef(mosaic, px, py, pz, r):
    """ECEF position (+ its radius) -> raster coordinates, origin-relative.

    The naive chain ``degrees(atan2(py, px)) - model_point[0]`` quantizes
    the longitude at the magnitude of the ABSOLUTE coordinate (~20 deg:
    f32 ulp ~1.9e-6 deg ~ 2.4e-3 texels) — a staircase the subtraction
    cannot recover. Rotating into the mosaic origin's frame BEFORE the
    inverse trig makes both angles origin-relative:

      dlon = atan2(py cos m0 - px sin m0, px cos m0 + py sin m0)
      dlat = asin(sin(lat) cos m1 - cos(lat) sin m1)

    with sin(lat) = pz/r and cos(lat) = hypot(px, py)/r.

    Measured honestly against f64 ground truth on f32 inputs
    (COP-90 texel scale): gy error p50 2.8e-3 -> 1.8e-3 texels, max
    1.4e-2 -> 9.1e-3; gx ~neutral. The remaining floor is NOT the
    degree staircase: it is (a) the f32 quantization of the input ECEF
    coordinates themselves (~0.5 m ~ 2e-2 texel-equivalents before any
    trig) and (b) rounding of the large rotation products
    ``py*c0 - px*s0`` / ``pz*c1 - rho*s1`` (differences of ~6.4e6-scale
    terms). So this does NOT shrink march-bracket sizing — do not
    re-attempt "rotated frame => tighter brackets" without first fixing
    (a)/(b) via an eye + t*dir expansion of the rotated components.
    """
    m0 = jnp.radians(mosaic.model_point[0])
    m1 = jnp.radians(mosaic.model_point[1])
    c0, s0 = jnp.cos(m0), jnp.sin(m0)
    c1, s1 = jnp.cos(m1), jnp.sin(m1)
    dlon = jnp.arctan2(py * c0 - px * s0, px * c0 + py * s0)
    sl = pz / r
    cl = jnp.sqrt(jnp.maximum(px * px + py * py, 0.0)) / r
    dsin = sl * c1 - cl * s1
    dlat = jnp.arcsin(jnp.clip(dsin, -1.0, 1.0))
    gx = jnp.degrees(dlon) / mosaic.pixel_scale[0]
    gy = -jnp.degrees(dlat) / mosaic.pixel_scale[1]
    return gx, gy


# ---- error-free f32 scalar arithmetic (Dekker/Knuth) -----------------------
#
# The march's per-sample raster noise bottoms out at the f32 rounding of
# ~6.4e6-scale intermediate products (`raster_from_ecef` docstring items
# (a)/(b): ~0.5 m per materialized sample). The per-ray track expansion
# below needs a handful of per-FRAME scalar head terms computed to better
# than one f32 ulp of their own (small) magnitude; double-float pairs give
# exactly that without requiring f64 on the device. Only O(1) scalars per
# frame go through these — never per-pixel data.


def _two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _two_prod(a, b):
    """a*b as (head, tail) with head+tail == a*b exactly (Veltkamp split;
    an FMA-contracted backend produces the same pair by the FMA identity)."""
    p = a * b
    sp = jnp.float32(4097.0)  # 2^12 + 1 splits the 24-bit mantissa 12+12
    ca = a * sp
    ah = ca - (ca - a)
    al = a - ah
    cb = b * sp
    bh = cb - (cb - b)
    bl = b - bh
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _df_add(x, y):
    """(hi, lo) + (hi, lo) -> normalized pair (add22)."""
    s, e = _two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    hi, lo = _two_sum(s, e)
    return hi, lo


def _df_mul(x, y):
    """(hi, lo) * (hi, lo) -> normalized pair (mul22)."""
    p, e = _two_prod(x[0], y[0])
    e = e + x[0] * y[1] + x[1] * y[0]
    hi, lo = _two_sum(p, e)
    return hi, lo


def _df_neg(x):
    return -x[0], -x[1]


def track_coeffs(mosaic, eye, dirs):
    """Per-ray expansion of `raster_from_ecef` along ``p(t) = eye + t*dir``.

    Materializing ``p(t)`` quantizes each component at the ECEF magnitude
    (~0.5 m per sample at f32), and the rotated differences downstream
    cannot recover it — a per-sample staircase ~2e-2 texels wide that sets
    the exact march's track-fit noise floor. Expanding the rotated
    components in t instead makes every LARGE quantity a per-frame
    coefficient (scalar heads computed as error-free pairs above) and every
    per-SAMPLE operation a small, well-conditioned polynomial evaluation:

      east:   u(t) = u0 + t*du,  u0 = ey c0 - ex s0   (pair),
              v(t) = v0 + t*dv                         (relative-only)
      north:  n(t) = (c1 pz - s1 rho) = N(t) / D(t) by the conjugate trick,
              N(t) = c1^2 pz^2(t) - s1^2 rho^2(t) — a quadratic in t whose
              constant term A (the catastrophic cancellation) is a pair;
              D(t) = c1 pz + rho s1 needs only relative accuracy.

    The rotation constants are the f32 values of cos/sin(model_point): their
    own rounding is a sub-meter rigid shift of the raster grid shared by
    every sample, pixel, and leg — it cannot bend the quad-track fit. What
    this kills is the per-sample jitter: measured against f64 ground truth
    the evaluated track error drops ~20x (scripts/probe_track_precision.py).

    Returns a dict of per-ray coefficient planes (+ scalar pairs broadcast).
    """
    dx, dy, dz = dirs
    ex, ey, ez = eye[0], eye[1], eye[2]
    m0 = jnp.radians(mosaic.model_point[0])
    m1 = jnp.radians(mosaic.model_point[1])
    c0, s0 = jnp.cos(m0), jnp.sin(m0)
    c1, s1 = jnp.cos(m1), jnp.sin(m1)

    # Longitude plane: u0 as a pair (the small east offset emerges from a
    # ~6.4e6-scale cancellation); du/dv/v0 need only relative accuracy.
    u0 = _df_add(_two_prod(ey, c0), _df_neg(_two_prod(ex, s0)))
    du = dy * c0 - dx * s0
    v0 = ex * c0 + ey * s0
    dv = dx * c0 + dy * s0

    # Latitude conjugate-quadratic: N(t) = A + 2 B t + C t^2.
    c1sq = _df_mul((c1, jnp.float32(0.0)), (c1, jnp.float32(0.0)))
    s1sq = _df_mul((s1, jnp.float32(0.0)), (s1, jnp.float32(0.0)))
    rho0 = _df_add(_two_prod(ex, ex), _two_prod(ey, ey))
    A = _df_add(_df_mul(c1sq, _two_prod(ez, ez)), _df_neg(_df_mul(s1sq, rho0)))
    rho_b = ex * dx + ey * dy  # d(rho^2)/dt / 2, per ray
    rho_c = dx * dx + dy * dy
    B = c1sq[0] * (ez * dz) - s1sq[0] * rho_b
    C = c1sq[0] * (dz * dz) - s1sq[0] * rho_c

    return {
        "u0": u0, "du": du, "v0": v0, "dv": dv,
        "A": A, "B": B, "C": C,
        "rho0": rho0, "rho_b": rho_b, "rho_c": rho_c,
        "ez": ez, "dz": dz, "c1": c1, "s1": s1,
    }


def raster_from_coeffs(mosaic, k, t, r):
    """Evaluate the expanded track at parameter ``t`` -> ``(gx, gy)``.

    ``r`` is the (stable, q-derived) geocentric radius at t. Same contract
    as `raster_from_ecef`, ~20x less per-sample noise (see `track_coeffs`).
    """
    u = (k["u0"][0] + t * k["du"]) + k["u0"][1]
    v = k["v0"] + t * k["dv"]
    dlon = jnp.arctan2(u, v)

    N = (k["A"][0] + t * (2.0 * k["B"] + t * k["C"])) + k["A"][1]
    pz = k["ez"] + t * k["dz"]
    rho_sq = k["rho0"][0] + t * (2.0 * k["rho_b"] + t * k["rho_c"])
    rho = jnp.sqrt(jnp.maximum(rho_sq, 0.0))
    D = pz * k["c1"] + rho * k["s1"]
    # D -> 0 only toward the antipodal meridian plane (never inside a
    # mosaic window); keep the quotient finite there.
    dsin = N / jnp.maximum(r * jnp.abs(D), jnp.float32(1.0)) * jnp.sign(D)
    dlat = jnp.arcsin(jnp.clip(dsin, -1.0, 1.0))

    gx = jnp.degrees(dlon) / mosaic.pixel_scale[0]
    gy = -jnp.degrees(dlat) / mosaic.pixel_scale[1]
    return gx, gy


def geo_from_raster(mosaic, gx, gy):
    lon = gx * mosaic.pixel_scale[0] + mosaic.model_point[0]
    lat = mosaic.model_point[1] - gy * mosaic.pixel_scale[1]
    return lon, lat


def tri_interp(v_nw, v_ne, v_sw, v_se, fx, fy, parity):
    """Interpolate a per-vertex attribute triangle-exactly within a cell.

    All arguments broadcast elementwise; ``parity`` in {0, 1}.
    """
    # parity 0: diagonal NW-SE
    lower0 = v_nw + (v_se - v_sw) * fx + (v_sw - v_nw) * fy
    upper0 = v_nw + (v_ne - v_nw) * fx + (v_se - v_ne) * fy
    p0 = jnp.where(fx <= fy, lower0, upper0)
    # parity 1: diagonal SW-NE
    upper1 = v_nw + (v_ne - v_nw) * fx + (v_sw - v_nw) * fy
    lower1 = v_se + (v_ne - v_se) * (1.0 - fy) + (v_sw - v_se) * (1.0 - fx)
    p1 = jnp.where(fx + fy <= 1.0, upper1, lower1)
    return jnp.where(parity == 0, p0, p1)


def _cell_setup(mosaic, gx, gy):
    h, w = mosaic.shape
    cxf = jnp.floor(gx)
    cyf = jnp.floor(gy)
    in_bounds = (gx >= 0.0) & (gy >= 0.0) & (gx <= w - 1.0) & (gy <= h - 1.0)
    cx = jnp.clip(cxf.astype(jnp.int32), 0, w - 2)
    cy = jnp.clip(cyf.astype(jnp.int32), 0, h - 2)
    fx = gx - cx
    fy = gy - cy
    parity = (cx + cy) % 2
    idx = cy * w + cx
    return idx, w, fx, fy, parity, in_bounds


def sample_height(mosaic, gx, gy):
    """Triangle-exact surface height at raster coords; hugely negative
    (INVALID_HEIGHT / poisoned) outside the valid area, so ray tests can
    never report a hit there.

    Prefers the packed per-cell corner table (one row gather) — TPU gather
    cost is per-gather, not per-byte, so this is ~5x faster than four scalar
    corner gathers in march loops."""
    idx, w, fx, fy, parity, in_bounds = _cell_setup(mosaic, gx, gy)
    if getattr(mosaic, "has_cell_table", False):
        rows = cell_rows(mosaic, idx)
        h = tri_interp(
            rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3], fx, fy, parity
        )
    else:
        flat = mosaic.heights_flat
        h_nw = jnp.take(flat, idx)
        h_ne = jnp.take(flat, idx + 1)
        h_sw = jnp.take(flat, idx + w)
        h_se = jnp.take(flat, idx + w + 1)
        h = tri_interp(h_nw, h_ne, h_sw, h_se, fx, fy, parity)
    return jnp.where(in_bounds, h, INVALID_HEIGHT)


def sample_height_level(mosaic, level: int, gx, gy, nearest: bool = False):
    """Height at raster coords from mip ``level`` (0 = triangle-exact base).

    Level-L texel (i, j) averages base texels [2^L i, 2^L (i+1)); its center
    sits at base coords 2^L i + (2^L - 1)/2. Coarse levels sample bilinearly
    (the mip surface is an anti-aliased LOD, not the reference mesh) or by
    nearest texel for the cheapest profile mode.
    """
    if level == 0 and not nearest:
        return sample_height(mosaic, gx, gy)
    if level == 0:
        h0, w0 = mosaic.shape
        ix = jnp.clip(jnp.round(gx).astype(jnp.int32), 0, w0 - 1)
        iy = jnp.clip(jnp.round(gy).astype(jnp.int32), 0, h0 - 1)
        in_b = (gx >= 0.0) & (gy >= 0.0) & (gx <= w0 - 1.0) & (gy <= h0 - 1.0)
        h = jnp.take(mosaic.heights_flat, iy * w0 + ix)
        return jnp.where(in_b, h, INVALID_HEIGHT)

    flat = mosaic.mip_heights_flat[level - 1]
    h_l, w_l = mosaic.mip_shapes[level - 1]
    s = float(2**level)
    off = (s - 1.0) / 2.0
    gxl = (gx - off) / s
    gyl = (gy - off) / s
    in_b = (gxl >= -0.5) & (gyl >= -0.5) & (gxl <= w_l - 0.5) & (gyl <= h_l - 0.5)
    if nearest:
        ix = jnp.clip(jnp.round(gxl).astype(jnp.int32), 0, w_l - 1)
        iy = jnp.clip(jnp.round(gyl).astype(jnp.int32), 0, h_l - 1)
        h = jnp.take(flat, iy * w_l + ix)
    else:
        x0 = jnp.clip(jnp.floor(gxl).astype(jnp.int32), 0, w_l - 2)
        y0 = jnp.clip(jnp.floor(gyl).astype(jnp.int32), 0, h_l - 2)
        fx = jnp.clip(gxl - x0, 0.0, 1.0)
        fy = jnp.clip(gyl - y0, 0.0, 1.0)
        i = y0 * w_l + x0
        a = jnp.take(flat, i)
        b = jnp.take(flat, i + 1)
        c = jnp.take(flat, i + w_l)
        d = jnp.take(flat, i + w_l + 1)
        h = (a * (1 - fx) + b * fx) * (1 - fy) + (c * (1 - fx) + d * fx) * fy
    return jnp.where(in_b, h, INVALID_HEIGHT)


def sample_attributes_nearest(mosaic, gx, gy):
    """Cheapest attribute fetch: nearest texel height + normal via ONE
    row gather from the packed (height, normal-bits) table.

    Used by the LOD/fast panorama preset; the exact path interpolates
    triangle-exactly (`sample_attributes_soa`).
    """
    import jax

    h0, w0 = mosaic.shape
    ix = jnp.clip(jnp.round(gx).astype(jnp.int32), 0, w0 - 1)
    iy = jnp.clip(jnp.round(gy).astype(jnp.int32), 0, h0 - 1)
    in_b = (gx >= 0.0) & (gy >= 0.0) & (gx <= w0 - 1.0) & (gy <= h0 - 1.0)
    idx = iy * w0 + ix
    rows = mosaic.attr_packed_flat[idx]  # [..., 2]
    h = rows[..., 0]
    p = jax.lax.bitcast_convert_type(rows[..., 1], jnp.uint32)
    nx = 2.0 * ((p & 0x3FF).astype(jnp.float32) / 1023.0) - 1.0
    ny = 2.0 * (((p >> 10) & 0x3FF).astype(jnp.float32) / 1023.0) - 1.0
    nz = 2.0 * (((p >> 20) & 0x3FF).astype(jnp.float32) / 1023.0) - 1.0
    ok = in_b & (h > 0.5 * INVALID_HEIGHT)
    return jnp.where(ok, h, INVALID_HEIGHT), nx, ny, nz, ok


def sample_attributes_soa(mosaic, gx, gy):
    """Height + world-space normal planes at raster coords.

    Returns ``(h, nx, ny, nz, ok)`` — all arrays of the coordinate shape.
    The three vertex normals of the containing triangle are interpolated with
    the same triangle weights the rasterizer uses (perspective-correct
    interpolation is linear over the planar triangle), using the world-space
    packed normal texture (`models/scene.pack_normals`).
    """
    import jax

    idx, w, fx, fy, parity, in_bounds = _cell_setup(mosaic, gx, gy)
    attr = mosaic.attr_packed_flat
    r_nw = attr[idx]
    r_ne = attr[idx + 1]
    r_sw = attr[idx + w]
    r_se = attr[idx + w + 1]
    h = tri_interp(
        r_nw[..., 0], r_ne[..., 0], r_sw[..., 0], r_se[..., 0], fx, fy, parity
    )

    p_nw = jax.lax.bitcast_convert_type(r_nw[..., 1], jnp.uint32)
    p_ne = jax.lax.bitcast_convert_type(r_ne[..., 1], jnp.uint32)
    p_sw = jax.lax.bitcast_convert_type(r_sw[..., 1], jnp.uint32)
    p_se = jax.lax.bitcast_convert_type(r_se[..., 1], jnp.uint32)
    out = []
    for shift, scale in ((0, 1023.0), (10, 1023.0), (20, 1023.0)):
        c_nw = ((p_nw >> shift) & 0x3FF).astype(jnp.float32)
        c_ne = ((p_ne >> shift) & 0x3FF).astype(jnp.float32)
        c_sw = ((p_sw >> shift) & 0x3FF).astype(jnp.float32)
        c_se = ((p_se >> shift) & 0x3FF).astype(jnp.float32)
        comp = tri_interp(c_nw, c_ne, c_sw, c_se, fx, fy, parity)
        out.append(2.0 * (comp / scale) - 1.0)
    nx, ny, nz = out

    ok = in_bounds & (h > 0.5 * INVALID_HEIGHT)
    return jnp.where(ok, h, INVALID_HEIGHT), nx, ny, nz, ok


def sample_attributes_cell(mosaic, gx, gy):
    """Height + world-space normal planes from ONE 32 B cell-row gather.

    The widened cell rows carry the 4 corner heights AND the 4 corners'
    packed world normals, so the exact renderer's hit shading needs one
    gather where `sample_attributes_soa` needs four (TPU gather cost is
    per-row, not per-byte). Triangle-exact interpolation is identical.
    """
    import jax

    idx, w, fx, fy, parity, in_bounds = _cell_setup(mosaic, gx, gy)
    rows = cell_rows(mosaic, idx)
    h = tri_interp(
        rows[..., 0], rows[..., 1], rows[..., 2], rows[..., 3], fx, fy, parity
    )
    bits = [
        jax.lax.bitcast_convert_type(rows[..., 4 + i], jnp.uint32)
        for i in range(4)
    ]
    out = []
    for shift in (0, 10, 20):
        comps = [((b >> shift) & 0x3FF).astype(jnp.float32) for b in bits]
        comp = tri_interp(comps[0], comps[1], comps[2], comps[3], fx, fy, parity)
        out.append(2.0 * (comp / 1023.0) - 1.0)
    nx, ny, nz = out
    ok = in_bounds & (h > 0.5 * INVALID_HEIGHT)
    return jnp.where(ok, h, INVALID_HEIGHT), nx, ny, nz, ok


def sample_attributes(mosaic, gx, gy):
    """Compatibility wrapper: returns ``(h, n_world [..., 3], ok)``."""
    h, nx, ny, nz, ok = sample_attributes_soa(mosaic, gx, gy)
    return h, jnp.stack([nx, ny, nz], axis=-1), ok
