"""Row-sharded mosaic: scene capacity scales with the device count.

Round 1 replicated the mosaic tables on every device (`parallel/sharded.py`),
so scene size was capped by single-chip HBM (~5 GB of tables at 100-tile
scale). This module shards the *large* tables — base heights/attributes, the
2-D window-extraction copies, and any mip level above the clipmap threshold —
across a ``geo`` mesh axis by latitude rows (contiguous row bands), keeping
every small table replicated.

The render path stays scene-size independent through the same two-program
clipmap design as single-chip: only *window extraction* touches the big
tables. Sharded extraction runs under `shard_map`: each device
dynamic-slices the part of the eye-centered window that intersects its row
band (a clamped local slice + row-ownership mask) and a `psum` over the
``geo`` axis assembles the full window, replicated. The render program then
consumes windows identical to the replicated path's — outputs are
bit-identical (asserted in `tests/test_sharded_mosaic.py`).

This is the TPU-native analog of the reference's geographic streaming
(`ui_controller.rs:30` working-set semantics): the ICI ring carries
window-sized (MB) exchanges per frame, never table-sized ones.

Scope: serves the LOD/clipmap panorama path (BASELINE configs 2/4/5 and the
interactive fast mode). The triangle-exact parity march gathers full-res
texels at arbitrary coordinates and keeps using replicated mosaics; the
per-cell corner table is dropped here to save its ~45% share of table bytes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from topo_renderer_tpu.models.scene import POISON_HEIGHT, TerrainMosaic
from topo_renderer_tpu.ops.panorama import (
    PanoramaSpec,
    _bilinear_levels,
    _clipmap_window_plan,
    _quad_rows,
    _slice_level_xla,
    _texel_m,
    _window_origin,
)
from topo_renderer_tpu.ops.surface import raster_from_geo

GEO_AXIS = "geo"


def _pad_rows_2d(a, h, w, h_new, fill):
    a = a.reshape(h, w, *a.shape[1:]) if a.ndim == 1 or a.shape[0] == h * w else a
    pad = [(0, h_new - h)] + [(0, 0)] * (a.ndim - 1)
    return jnp.pad(a, pad, constant_values=fill)


def shard_mosaic(
    mosaic: TerrainMosaic,
    mesh: Mesh,
    *,
    axis: str = GEO_AXIS,
    size_threshold: int = 2_000_000,
) -> TerrainMosaic:
    """Return a copy of ``mosaic`` with its large tables sharded by rows.

    Row counts are padded (with poisoned texels — harmless, they can never
    be hit) to a multiple of ``8 * n_dev`` so bands split evenly and window
    origins stay (8, 128)-aligned. Small tables (below ``size_threshold``
    texels) replicate — the render program gathers from them directly.
    """
    n_dev = mesh.shape[axis]
    h, w = mosaic.shape

    def rows_padded(hh):
        m = 8 * n_dev
        return -(-hh // m) * m

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    h_new = rows_padded(h)
    heights2 = _pad_rows_2d(
        jnp.asarray(mosaic.heights_flat).reshape(h, w), h, w, h_new, POISON_HEIGHT
    )
    attr2 = _pad_rows_2d(
        jnp.asarray(mosaic.attr_packed_flat).reshape(h, w, 2), h, w, h_new, 0.0
    )
    # Poison the padded attr height plane too (attr rows carry height first).
    attr2 = attr2.at[h:, :, 0].set(POISON_HEIGHT)

    heights_flat = put(heights2.reshape(-1), P(axis))
    attr_flat = put(attr2.reshape(-1, 2), P(axis, None))

    sharded_levels = [0]
    mip_h, mip_a, mip_shapes = [], [], []
    for lv, (hl, wl) in enumerate(mosaic.mip_shapes):
        hf = jnp.asarray(mosaic.mip_heights_flat[lv])
        af = jnp.asarray(mosaic.mip_attr_flat[lv])
        if hl * wl > size_threshold:
            sharded_levels.append(lv + 1)
            hl_new = rows_padded(hl)
            h2 = _pad_rows_2d(hf.reshape(hl, wl), hl, wl, hl_new, POISON_HEIGHT)
            a2 = _pad_rows_2d(af.reshape(hl, wl, 2), hl, wl, hl_new, 0.0)
            a2 = a2.at[hl:, :, 0].set(POISON_HEIGHT)
            mip_h.append(put(h2.reshape(-1), P(axis)))
            mip_a.append(put(a2.reshape(-1, 2), P(axis, None)))
            mip_shapes.append((hl_new, wl))
        else:
            mip_h.append(put(hf, P()))
            mip_a.append(put(af, P()))
            mip_shapes.append((hl, wl))

    win2d = []
    for lv, t in enumerate(getattr(mosaic, "win_attr_2d", ())):
        if t is None:
            win2d.append(None)
            continue
        _, hl, wl = t.shape
        if lv not in sharded_levels:
            win2d.append(put(jnp.asarray(t), P()))
            continue
        hl_new = rows_padded(hl)
        t2 = jnp.pad(jnp.asarray(t), ((0, 0), (0, hl_new - hl), (0, 0)))
        t2 = t2.at[0, hl:, :].set(POISON_HEIGHT)
        win2d.append(put(t2, P(None, axis, None)))

    hmax = tuple(put(jnp.asarray(x), P()) for x in mosaic.mip_hmax_flat)

    return dataclasses.replace(
        mosaic,
        heights_flat=heights_flat,
        attr_packed_flat=attr_flat,
        cell_heights_flat=put(jnp.zeros((1, 4), jnp.float32), P()),
        has_cell_table=False,
        shape=(h_new, w),
        mip_heights_flat=tuple(mip_h),
        mip_attr_flat=tuple(mip_a),
        mip_hmax_flat=hmax,
        mip_shapes=tuple(mip_shapes),
        win_attr_2d=tuple(win2d),
        sharded_rows=tuple(sharded_levels),
        model_point=put(jnp.asarray(mosaic.model_point), P()),
        pixel_scale=put(jnp.asarray(mosaic.pixel_scale), P()),
        hmax=put(jnp.asarray(mosaic.hmax), P()),
        bound_center=put(jnp.asarray(mosaic.bound_center), P()),
        bound_radius=put(jnp.asarray(mosaic.bound_radius), P()),
    )


def _masked_rows_3d(local, lo, h_loc, sy, sx, wsy, wsx, axis):
    """Local contribution to a [C, wsy, wsx] window from a [C, h_loc, W]
    row band starting at global row ``lo``; zero outside owned rows."""
    c = local.shape[0]
    cs = jnp.clip(sy - lo, 0, h_loc - wsy)
    sl = jax.lax.dynamic_slice(local, (jnp.int32(0), cs, sx), (c, wsy, wsx))
    rows_g = sy + jnp.arange(wsy, dtype=jnp.int32)  # wanted global rows
    k = rows_g - (lo + cs)  # their index inside the clamped slice
    ok = (rows_g >= lo) & (rows_g < lo + h_loc) & (k >= 0) & (k < wsy)
    out = jnp.take(sl, jnp.clip(k, 0, wsy - 1), axis=1)
    out = jnp.where(ok[None, :, None], out, 0.0)
    return jax.lax.psum(out, axis)


@partial(jax.jit, static_argnames=("spec", "mesh", "axis"))
def extract_clipmap_windows_sharded(
    mosaic: TerrainMosaic, eye, spec: PanoramaSpec, mesh: Mesh, axis: str = GEO_AXIS
):
    """Sharded-table counterpart of `ops.panorama.extract_clipmap_windows`.

    Window origins are computed identically (replicated scalars); per level
    each device slices its row band's intersection and a ``psum`` over
    ``axis`` assembles the replicated window. Output windows feed
    `render_panorama` unchanged and match the replicated extraction texel
    for texel.
    """
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
        sharded = level in mosaic.sharded_rows
        if sharded:
            n_dev = mesh.shape[axis]
            if h_t % n_dev:
                raise ValueError(
                    f"level {level} rows {h_t} not divisible by "
                    f"{axis}={n_dev}; shard with shard_mosaic() first"
                )
            h_loc = h_t // n_dev
            if wsy > h_loc:
                raise ValueError(
                    f"window rows {wsy} exceed one shard's band {h_loc}; "
                    f"use fewer {axis} devices or a larger scene"
                )

        tbl_h = tbl_a = tbl_q = None
        if not sharded:
            # Replicated level: plain local slicing, the same helper the
            # replicated extractor's non-DMA branches use.
            tbl_h, tbl_a, tbl_q = _slice_level_xla(
                mosaic, level, use_attr, quad_levels, sy, sx, wsy, wsx, w_t
            )
        elif use_attr and win2d is not None:

            def slicer(local, sy, sx):
                lo = jax.lax.axis_index(axis) * h_loc
                return _masked_rows_3d(local, lo, h_loc, sy, sx, wsy, wsx, axis)

            sl = shard_map(
                slicer,
                mesh=mesh,
                in_specs=(P(None, axis, None), P(), P()),
                out_specs=P(),
                check_rep=False,
            )(win2d, sy, sx)
            tbl_a = sl.reshape(2, -1).T
            if level in quad_levels:
                tbl_q = _quad_rows(sl)
        else:
            if level == 0:
                hf, af = mosaic.heights_flat, mosaic.attr_packed_flat
            else:
                hf = mosaic.mip_heights_flat[level - 1]
                af = mosaic.mip_attr_flat[level - 1]
            if use_attr:

                def slicer_a(local, sy, sx):
                    lo = jax.lax.axis_index(axis) * h_loc
                    loc3 = jnp.moveaxis(local.reshape(h_loc, w_t, 2), -1, 0)
                    return _masked_rows_3d(
                        loc3, lo, h_loc, sy, sx, wsy, wsx, axis
                    )

                sl = shard_map(
                    slicer_a,
                    mesh=mesh,
                    in_specs=(P(axis, None), P(), P()),
                    out_specs=P(),
                    check_rep=False,
                )(af, sy, sx)
                tbl_a = jnp.moveaxis(sl, 0, -1).reshape(-1, 2)
                if level in quad_levels:
                    tbl_q = _quad_rows(sl)
            else:

                def slicer_h(local, sy, sx):
                    lo = jax.lax.axis_index(axis) * h_loc
                    return _masked_rows_3d(
                        local.reshape(h_loc, w_t)[None], lo, h_loc, sy, sx,
                        wsy, wsx, axis,
                    )

                sl = shard_map(
                    slicer_h,
                    mesh=mesh,
                    in_specs=(P(axis), P(), P()),
                    out_specs=P(),
                    check_rep=False,
                )(hf, sy, sx)
                tbl_h = sl[0].reshape(-1)
        out.append((tbl_h, tbl_a, tbl_q, sx, sy))
    return tuple(out)
