"""Incremental mosaic slot updates: O(one tile) add/unload.

The reference adds/removes ONE tile's GPU buffers per streaming event
(`topo-renderer/src/render/terrain_renderer.rs:173-350,361-363`); round 2's
engine instead rebuilt the whole device mosaic on any tile change — minutes
at 100-tile scale. This module is the TPU-native per-tile path: ONE donated
jitted program rewrites the tile's slot in every derived table (heights,
packed attributes, per-cell corner rows, the average-height mip chain with
per-level attributes, the dilated max pyramid, and the 2-D window tables),
recomputing only halo-padded slices around the slot.

Bit-identity contract: applying updates to a mosaic built on a pinned canvas
(`build_mosaic(..., canvas=...)`) produces tables bit-identical to a fresh
`build_mosaic` of the resulting tile set on the same canvas, provided

  * the canvas dimensions halve exactly through every mip level
    (``streaming_canvas_dim`` sizes them as b * 2^a with 4 <= b < 8), so
    pooling has no odd-remainder folding and a stable phase;
  * tiles share the seam row/column (the 1201-texel COP-90 layout) or abut
    without gaps, so per-texel tile ownership is location-determined rather
    than insertion-order-determined (see `scene.build_mosaic`).

Slice math notes: every recomputed slice is STATIC-size with a traced,
clamped start, so one compiled program serves every slot position. A
computed slice value is trusted only on an inner window at least `halo`
away from the slice border unless the border coincides with the table
border (where edge-replication semantics match the full build); the clamped
starts guarantee exactly that alignment.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from topo_renderer_tpu.models.scene import POISON_HEIGHT, TerrainMosaic
from topo_renderer_tpu.ops.normals import compute_normals_soa


def streaming_canvas_dim(n: int, multiple: int = 1) -> int:
    """Smallest dimension >= n of the form b * 2^a with 4 <= b < 8 (or n for
    tiny n), so that the mip chain halves exactly at every level.

    ``multiple`` additionally forces divisibility (row-sharded streaming:
    `shard_mosaic` must introduce NO padding rows or the padded mip chain
    stops halving and `apply_slot_update_sharded` refuses; the engine
    passes ``8 * n_dev * 4`` so the top sharded mip levels stay aligned
    too)."""
    if n < 8 and multiple <= 1:
        return n
    # Satisfiability: d = b * 2^a with b in 4..7, so multiple's ODD part
    # must divide some b (1, 3, 5, 7 do; 9, 11, ... cannot) — raise
    # instead of searching forever.
    p = multiple
    while p % 2 == 0:
        p //= 2
    if p > 1 and all(b % p for b in range(4, 8)):
        raise ValueError(
            f"canvas multiple {multiple} has odd factor {p}, incompatible "
            "with an exactly-halving (b * 2^a, 4 <= b < 8) canvas — use a "
            "power-of-two (or 3/5/7 x power-of-two) device count"
        )
    a = 0
    m = n
    while m >= 8:
        m = (m + 1) // 2
        a += 1
    while True:
        for b in range(max(m, 4), 8):
            d = b * (1 << a)
            if d >= n and d % multiple == 0:
                return d
        m = 4
        a += 1


def _enc10(c):
    return jnp.round(jnp.clip(0.5 * (c + 1.0), 0.0, 1.0) * 1023.0).astype(jnp.uint32)


def _packed_from_slice(
    h_slice, owner_slice, rot_flat, geo, level: int, y_abs, x_abs,
    quantize_normals: bool, correct_axes: bool,
):
    """World-space packed normals for a level slice at absolute level coords
    ``(y_abs, x_abs)`` — bit-identical to `scene._device_mosaic_tables`'s
    `world_packed` on the corresponding rows (the latitude term is computed
    from exact absolute row indices via the raster_point offset)."""
    lon_nw, lat_nw, ps_x, ps_y = geo[0], geo[1], geo[2], geo[3]
    s = float(2**level)
    off = (s - 1.0) / 2.0
    v = h_slice > 0.5 * POISON_HEIGHT
    nx, ny, nz = compute_normals_soa(
        jnp.where(v, h_slice, 0.0),
        (ps_x * s, ps_y * s),
        raster_point=(-x_abs.astype(jnp.float32), -y_abs.astype(jnp.float32)),
        model_point=(lon_nw + ps_x * off, lat_nw - ps_y * off),
        valid=v,
        quantize=quantize_normals,
        correct_axes=correct_axes,
    )
    base = owner_slice * 9

    def R(i, j):
        return jnp.take(rot_flat, base + (3 * i + j))

    wx = R(0, 0) * nx + R(0, 1) * ny + R(0, 2) * nz
    wy = R(1, 0) * nx + R(1, 1) * ny + R(1, 2) * nz
    wz = R(2, 0) * nx + R(2, 1) * ny + R(2, 2) * nz
    packed = _enc10(wx) | (_enc10(wy) << 10) | (_enc10(wz) << 20)
    return jnp.where(v, packed, jnp.uint32(0))


HALO = 2


def _win(start, inner, table, pad):
    """Clamped slice bounds: (slice_start, size) for a static ``inner`` +
    ``pad`` halo window into a table of length ``table``."""
    size = min(inner + 2 * pad, table)
    s = jnp.clip(start - pad, 0, table - size)
    return s, size


def _region_geom(o, t_inner, table: int, size: int):
    """Origin of the halo REGION a level's update math reads: a static
    ``size`` window clamped into ``[0, table]`` around the slot (covers
    every slice `compute_slot_blocks` cuts — slack 8 vs the widest use's
    4)."""
    return jnp.clip(o - 8, 0, table - size)


def region_sizes(th: int, tw: int, shape, mip_shapes):
    """Static (per level 0..L) region sizes `compute_slot_blocks` reads:
    [(gh, gw)] — the sharded path psum-assembles exactly these windows."""
    h_m, w_m = shape
    out = [(min(th + 16, h_m), min(tw + 16, w_m))]
    for lv, (h_l, w_l) in enumerate(mip_shapes, start=1):
        out.append((min((th >> lv) + 16, h_l), min((tw >> lv) + 16, w_l)))
    return out


def compute_slot_blocks(
    read,           # read(kind, level, gy, gx) -> region [gh, gw] (f32)
    shape, mip_shapes, win_levels,
    blk, oy, ox, owner_slices, rot_flat, geo,
    *,
    th: int,
    tw: int,
    quantize_normals: bool,
    correct_axes: bool,
    has_cell_table: bool,
):
    """The slot update's MATH, parameterized over how table regions are
    read — shared verbatim by the replicated path (`apply_slot_update`:
    regions are direct slices of the full tables) and the row-sharded path
    (`parallel/sharded_update.py`: regions are psum-assembled from the row
    bands), so the two are bit-identical by construction.

    ``read`` kinds: ``"h"`` (average heights; level 0 = base heights),
    ``"raw"`` (undilated max; level 0 = base heights), ``"attr1"``
    (bitcast packed-normal plane; level 0 only, for the cell corners).
    Regions are the static `region_sizes` windows at `_region_geom`
    origins and must reflect the PRE-update tables; the slot write and all
    intra-update dependencies are overlaid here.

    Returns ``blocks``: a list of ``(table, level, block, y, x)`` updates
    where ``table`` is one of ``heights/attr/win/cell/mip_avg/mip_attr/
    mip_raw/mip_dil`` — every derived-table rewrite of the slot update, in
    application order.
    """
    h_m, w_m = shape
    n_levels = len(mip_shapes)
    sizes = region_sizes(th, tw, shape, mip_shapes)

    oy = jnp.clip(jnp.asarray(oy, jnp.int32), 0, h_m - th)
    ox = jnp.clip(jnp.asarray(ox, jnp.int32), 0, w_m - tw)

    blocks = []

    # ---- level 0: slot write, packed attrs, window table, cell rows -------
    GH0, GW0 = sizes[0]
    gy0 = _region_geom(oy, th, h_m, GH0)
    gx0 = _region_geom(ox, tw, w_m, GW0)
    R0 = read("h", 0, gy0, gx0)
    R0 = jax.lax.dynamic_update_slice(R0, blk, (oy - gy0, ox - gx0))
    blocks.append(("heights", 0, blk, oy, ox))

    a_h = min(th + 4, h_m)             # attr inner: region +-1 (+2 slack)
    a_w = min(tw + 4, w_m)
    sy0, sh0 = _win(oy - 2, a_h, h_m, HALO)
    sx0, sw0 = _win(ox - 2, a_w, w_m, HALO)
    h_sl = jax.lax.dynamic_slice(R0, (sy0 - gy0, sx0 - gx0), (sh0, sw0))
    packed_sl = _packed_from_slice(
        h_sl, owner_slices[0], rot_flat, geo, 0, sy0, sx0,
        quantize_normals, correct_axes,
    )
    # Inner window inside the slice: trust values >= HALO from the slice
    # border unless the border is the table border.
    iy0 = jnp.clip(oy - 2, 0, h_m - a_h)
    ix0 = jnp.clip(ox - 2, 0, w_m - a_w)
    ry, rx = iy0 - sy0, ix0 - sx0
    h_in = jax.lax.dynamic_slice(h_sl, (ry, rx), (a_h, a_w))
    p_in = jax.lax.dynamic_slice(packed_sl, (ry, rx), (a_h, a_w))
    p_in_f = jax.lax.bitcast_convert_type(p_in, jnp.float32)
    blocks.append(("attr", 0, jnp.stack([h_in, p_in_f], axis=-1), iy0, ix0))
    if 0 in win_levels:
        blocks.append(("win", 0, jnp.stack([h_in, p_in_f], axis=0), iy0, ix0))

    if has_cell_table:
        # Cells whose corner NORMALS can change: validity flips at the
        # region edge move compute_normals output at region +-1, and cells
        # at row oy-2 reference those texels as their south corners — so
        # the window starts at oy-2 (a bare oy-1 left stale corner normals
        # for abutting tile layouts).
        c_h, c_w = min(th + 4, h_m), min(tw + 4, w_m)
        cy0 = jnp.clip(oy - 2, 0, h_m - c_h)
        cx0 = jnp.clip(ox - 2, 0, w_m - c_w)
        # Heights AND packed normals over the cell window +1 east/south,
        # clamped at the table edge exactly like the full build's
        # edge-clamped shifts (normals read from the updated attr values —
        # the old attr region overlaid with the inner block just computed —
        # so the cell rows stay bit-identical to a fresh build).
        RA = read("attr1", 0, gy0, gx0)
        RA = jax.lax.dynamic_update_slice(RA, p_in_f, (iy0 - gy0, ix0 - gx0))
        gy = jnp.minimum(cy0 + jnp.arange(c_h + 1, dtype=jnp.int32), h_m - 1)
        gx = jnp.minimum(cx0 + jnp.arange(c_w + 1, dtype=jnp.int32), w_m - 1)
        hc = R0[(gy - gy0)[:, None], (gx - gx0)[None, :]]
        pc = RA[(gy - gy0)[:, None], (gx - gx0)[None, :]]
        cell_blk = jnp.stack(
            [
                hc[:-1, :-1], hc[:-1, 1:], hc[1:, :-1], hc[1:, 1:],
                pc[:-1, :-1], pc[:-1, 1:], pc[1:, :-1], pc[1:, 1:],
            ],
            axis=-1,
        )
        blocks.append(("cell", 0, cell_blk, cy0, cx0))

    # ---- mip chains -------------------------------------------------------
    prev_avg, prev_raw = R0, R0     # level L-1 regions (2-D views)
    pg_y, pg_x = gy0, gx0           # their origins
    for lv in range(1, n_levels + 1):
        h_l, w_l = mip_shapes[lv - 1]
        th_l = (th >> lv) + 2
        tw_l = (tw >> lv) + 2
        oy_l = oy >> lv
        ox_l = ox >> lv
        GH, GW = sizes[lv]
        gy_l = _region_geom(oy_l, th_l, h_l, GH)
        gx_l = _region_geom(ox_l, tw_l, w_l, GW)

        # Average pool: inner (th_l + 2) window, sources from prev level.
        p_h = min(th_l + 2, h_l)
        p_w = min(tw_l + 2, w_l)
        py = jnp.clip(oy_l - 1, 0, h_l - p_h)
        px = jnp.clip(ox_l - 1, 0, w_l - p_w)
        src = jax.lax.dynamic_slice(
            prev_avg, (2 * py - pg_y, 2 * px - pg_x), (2 * p_h, 2 * p_w)
        )
        c = src
        pooled = 0.25 * (
            (c[0::2, 0::2] + c[0::2, 1::2]) + (c[1::2, 0::2] + c[1::2, 1::2])
        )
        pooled = jnp.maximum(pooled, jnp.float32(POISON_HEIGHT))
        pooled = jnp.where(
            pooled < 0.1 * POISON_HEIGHT, jnp.float32(POISON_HEIGHT), pooled
        )
        blocks.append(("mip_avg", lv, pooled, py, px))
        avg_rg = read("h", lv, gy_l, gx_l)
        avg_rg = jax.lax.dynamic_update_slice(
            avg_rg, pooled, (py - gy_l, px - gx_l)
        )

        # Max pool (undilated) on a wider inner (+2 ring for dilation).
        m_h = min(th_l + 4, h_l)
        m_w = min(tw_l + 4, w_l)
        my = jnp.clip(oy_l - 2, 0, h_l - m_h)
        mx = jnp.clip(ox_l - 2, 0, w_l - m_w)
        srcm = jax.lax.dynamic_slice(
            prev_raw, (2 * my - pg_y, 2 * mx - pg_x), (2 * m_h, 2 * m_w)
        )
        pooledm = jnp.maximum(
            jnp.maximum(srcm[0::2, 0::2], srcm[0::2, 1::2]),
            jnp.maximum(srcm[1::2, 0::2], srcm[1::2, 1::2]),
        )
        blocks.append(("mip_raw", lv, pooledm, my, mx))
        raw_rg = read("raw", lv, gy_l, gx_l)
        raw_rg = jax.lax.dynamic_update_slice(
            raw_rg, pooledm, (my - gy_l, mx - gx_l)
        )

        # Dilate 3x3 on the raw table: inner (th_l + 2), slice +-1.
        d_h = min(th_l + 2, h_l)
        d_w = min(tw_l + 2, w_l)
        dy = jnp.clip(oy_l - 1, 0, h_l - d_h)
        dx_ = jnp.clip(ox_l - 1, 0, w_l - d_w)
        gy = jnp.clip(dy + jnp.arange(-1, d_h + 1, dtype=jnp.int32), 0, h_l - 1)
        gx = jnp.clip(dx_ + jnp.arange(-1, d_w + 1, dtype=jnp.int32), 0, w_l - 1)
        rawp = raw_rg[(gy - gy_l)[:, None], (gx - gx_l)[None, :]]
        dil = rawp[1:-1, 1:-1]
        for ddy in (0, 1, 2):
            for ddx in (0, 1, 2):
                dil = jnp.maximum(dil, rawp[ddy : ddy + d_h, ddx : ddx + d_w])
        blocks.append(("mip_dil", lv, dil, dy, dx_))

        # Per-level packed attrs (+ window table) from the updated averages.
        aL_h = min(th_l + 4, h_l)
        aL_w = min(tw_l + 4, w_l)
        # (sizes mirrored host-side by `attr_slice_geometry`)
        syl, shl = _win(oy_l - 2, aL_h, h_l, HALO)
        sxl, swl = _win(ox_l - 2, aL_w, w_l, HALO)
        h_sll = jax.lax.dynamic_slice(
            avg_rg, (syl - gy_l, sxl - gx_l), (shl, swl)
        )
        packed_l = _packed_from_slice(
            h_sll, owner_slices[lv], rot_flat, geo, lv, syl, sxl,
            quantize_normals, correct_axes,
        )
        iyl = jnp.clip(oy_l - 2, 0, h_l - aL_h)
        ixl = jnp.clip(ox_l - 2, 0, w_l - aL_w)
        ryl, rxl = iyl - syl, ixl - sxl
        h_inl = jax.lax.dynamic_slice(h_sll, (ryl, rxl), (aL_h, aL_w))
        p_inl = jax.lax.bitcast_convert_type(
            jax.lax.dynamic_slice(packed_l, (ryl, rxl), (aL_h, aL_w)),
            jnp.float32,
        )
        blocks.append(
            ("mip_attr", lv, jnp.stack([h_inl, p_inl], axis=-1), iyl, ixl)
        )
        if lv in win_levels:
            blocks.append(
                ("win", lv, jnp.stack([h_inl, p_inl], axis=0), iyl, ixl)
            )

        prev_avg, prev_raw = avg_rg, raw_rg
        pg_y, pg_x = gy_l, gx_l

    return blocks


def check_halvable(shape, mip_shapes):
    h_m, w_m = shape
    for lv, (hl, wl) in enumerate([(h_m, w_m)] + list(mip_shapes)[:-1]):
        hn, wn = mip_shapes[lv]
        if hl != 2 * hn or wl != 2 * wn:
            raise ValueError(
                "apply_slot_update needs a canvas whose mip chain halves "
                "exactly (use streaming_canvas_dim)"
            )


def apply_slot_update(mosaic: TerrainMosaic, *args, **kw) -> TerrainMosaic:
    """Write one tile slot (add: real heights; unload: all-POISON block) and
    recompute every derived table on halo slices. Donates the mosaic, so the
    multi-GB tables update in place. The math lives in
    `compute_slot_blocks`; the jitted wrapper reads regions straight off
    the full tables and applies the blocks with `dynamic_update_slice`.

    Args after ``mosaic``: ``blk`` (f32[th, tw] poisoned-form heights of
    the slot region), ``oy, ox`` (absolute NW texel), ``owner_slices``
    (tuple over levels 0..L of int32 owner windows, static sizes —
    host-side geometry in `attr_slice_geometry`), ``rot_flat``
    (f32[cap*9] slot rotations), ``geo`` (f32[4] lon_nw/lat_nw/ps_x/ps_y);
    keywords ``th, tw`` (static block shape) + normal-build flags.

    The host reattach below is load-bearing: `MosaicHostData` hashes/eqs
    as a constant (so host bookkeeping can't fragment the jit cache), which
    ALSO means a jitted function RETURNING a TerrainMosaic rebuilds the
    output pytree from the first-traced treedef — i.e. the first caller's
    host object. Without the reattach, every engine in a process would get
    the FIRST engine's valid/cell_tile arrays back and cross-mutate them
    (measured: a second engine's owner windows carried another engine's
    tile pattern — one wrong packed normal at a halo texel)."""
    out = _apply_slot_update_jit(mosaic, *args, **kw)
    import dataclasses

    return dataclasses.replace(out, host=mosaic.host)


@partial(
    jax.jit,
    donate_argnums=(0,),
    static_argnames=("th", "tw", "quantize_normals", "correct_axes"),
)
def _apply_slot_update_jit(
    mosaic: TerrainMosaic,
    blk,
    oy, ox,
    owner_slices,
    rot_flat,
    geo,
    *,
    th: int,
    tw: int,
    quantize_normals: bool = True,
    correct_axes: bool = False,
) -> TerrainMosaic:
    h_m, w_m = mosaic.shape
    assert mosaic.has_cell_table or mosaic.cell_heights_flat.shape[0] == 1
    check_halvable(mosaic.shape, mosaic.mip_shapes)

    heights2d = mosaic.heights_flat.reshape(h_m, w_m)
    attr2 = mosaic.attr_packed_flat.reshape(h_m, w_m, 2)
    mips = [m for m in mosaic.mip_heights_flat]
    mip_attrs = [a for a in mosaic.mip_attr_flat]
    mip_hmax = [m for m in mosaic.mip_hmax_flat]
    mip_raw = [m for m in mosaic.mip_hmax_raw_flat]
    win_tables = list(mosaic.win_attr_2d)
    win_levels = {
        lv for lv, t in enumerate(win_tables) if t is not None
    }

    def read(kind, level, gy, gx):
        gh, gw = region_sizes(th, tw, mosaic.shape, mosaic.mip_shapes)[level]
        if level == 0:
            if kind == "attr1":
                return jax.lax.dynamic_slice(
                    attr2, (gy, gx, jnp.int32(1)), (gh, gw, 1)
                )[..., 0]
            src = heights2d
        elif kind == "raw":
            src = mip_raw[level - 1].reshape(mosaic.mip_shapes[level - 1])
        else:
            src = mips[level - 1].reshape(mosaic.mip_shapes[level - 1])
        return jax.lax.dynamic_slice(src, (gy, gx), (gh, gw))

    blocks = compute_slot_blocks(
        read, mosaic.shape, mosaic.mip_shapes, win_levels,
        blk, oy, ox, owner_slices, rot_flat, geo,
        th=th, tw=tw, quantize_normals=quantize_normals,
        correct_axes=correct_axes, has_cell_table=mosaic.has_cell_table,
    )

    cell3 = (
        mosaic.cell_heights_flat.reshape(h_m, w_m, 8)
        if mosaic.has_cell_table
        else None
    )
    for table, lv, block, y, x in blocks:
        if table == "heights":
            heights2d = jax.lax.dynamic_update_slice(heights2d, block, (y, x))
        elif table == "attr":
            attr2 = jax.lax.dynamic_update_slice(
                attr2, block, (y, x, jnp.int32(0))
            )
        elif table == "win":
            win_tables[lv] = jax.lax.dynamic_update_slice(
                win_tables[lv], block, (jnp.int32(0), y, x)
            )
        elif table == "cell":
            cell3 = jax.lax.dynamic_update_slice(
                cell3, block, (y, x, jnp.int32(0))
            )
        elif table == "mip_avg":
            h_l, w_l = mosaic.mip_shapes[lv - 1]
            mips[lv - 1] = jax.lax.dynamic_update_slice(
                mips[lv - 1].reshape(h_l, w_l), block, (y, x)
            ).reshape(-1)
        elif table == "mip_raw":
            h_l, w_l = mosaic.mip_shapes[lv - 1]
            mip_raw[lv - 1] = jax.lax.dynamic_update_slice(
                mip_raw[lv - 1].reshape(h_l, w_l), block, (y, x)
            ).reshape(-1)
        elif table == "mip_dil":
            h_l, w_l = mosaic.mip_shapes[lv - 1]
            mip_hmax[lv - 1] = jax.lax.dynamic_update_slice(
                mip_hmax[lv - 1].reshape(h_l, w_l), block, (y, x)
            ).reshape(-1)
        elif table == "mip_attr":
            h_l, w_l = mosaic.mip_shapes[lv - 1]
            mip_attrs[lv - 1] = jax.lax.dynamic_update_slice(
                mip_attrs[lv - 1].reshape(h_l, w_l, 2), block,
                (y, x, jnp.int32(0)),
            ).reshape(-1, 2)

    # Matches build_mosaic: max over valid heights (may be negative for
    # below-sea-level terrain), 0.0 when nothing is valid.
    hmax_raw = jnp.max(heights2d)
    hmax = jnp.where(hmax_raw < 0.5 * POISON_HEIGHT, jnp.float32(0.0), hmax_raw)

    import dataclasses

    return dataclasses.replace(
        mosaic,
        heights_flat=heights2d.reshape(-1),
        attr_packed_flat=attr2.reshape(-1, 2),
        cell_heights_flat=(
            cell3.reshape(-1, 8) if cell3 is not None
            else mosaic.cell_heights_flat
        ),
        mip_heights_flat=tuple(mips),
        mip_attr_flat=tuple(mip_attrs),
        mip_hmax_flat=tuple(mip_hmax),
        mip_hmax_raw_flat=tuple(mip_raw),
        win_attr_2d=tuple(win_tables),
        hmax=hmax,
    )


def attr_slice_geometry(oy: int, ox: int, th: int, tw: int, shape, mip_shapes):
    """Host-side mirror of `apply_slot_update`'s packed-attr slice geometry:
    [(level, sy, sx, sh, sw)] — the engine cuts per-level OWNER windows with
    exactly these bounds (sizes are static per (th, tw, canvas), starts are
    the same clamp the jitted program applies)."""
    h_m, w_m = shape

    def win(start, inner, table):
        size = min(inner + 2 * HALO, table)
        return int(np.clip(start - HALO, 0, table - size)), size

    out = []
    sy, sh = win(oy - 2, min(th + 4, h_m), h_m)
    sx, sw = win(ox - 2, min(tw + 4, w_m), w_m)
    out.append((0, sy, sx, sh, sw))
    for lv, (h_l, w_l) in enumerate(mip_shapes, start=1):
        oy_l, ox_l = oy >> lv, ox >> lv
        th_l = (th >> lv) + 2
        tw_l = (tw >> lv) + 2
        sy, sh = win(oy_l - 2, min(th_l + 4, h_l), h_l)
        sx, sw = win(ox_l - 2, min(tw_l + 4, w_l), w_l)
        out.append((lv, sy, sx, sh, sw))
    return out
