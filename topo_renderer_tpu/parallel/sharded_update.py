"""Incremental slot updates AGAINST a row-sharded mosaic.

Round 3 left the two flagship scale features mutually exclusive: streaming
(O(tile) incremental add/unload, `models/mosaic_update.py`) required a
replicated pinned canvas, while sharded capacity
(`parallel/sharded_mosaic.py`) was a one-shot transform — at 100+-tile
multi-chip scale a tile change meant re-sharding from scratch. The
reference streams per-tile buffers at any scene scale
(`topo-renderer/src/render/terrain_renderer.rs:173-350`); this module is
the sharded half of that capability.

Design: ONE `shard_map` program per update.

  1. every device patches its row band's intersection of the slot write
     (masked merge, O(tile/n_dev));
  2. the update math needs tile-sized halo REGIONS of a few tables
     (`models/mosaic_update.region_sizes`); sharded tables assemble them
     by masked local slice + `psum` — O(tile) ICI bytes, never tables;
  3. `models/mosaic_update.compute_slot_blocks` — the SAME function the
     replicated path runs — computes every derived-table block from those
     regions on all devices (replicated compute, tile-sized);
  4. each block lands via a masked row-band write on sharded leaves and a
     plain `dynamic_update_slice` on replicated ones.

Because step 3 is shared code operating on identical region values, the
result is bit-identical to `shard_mosaic(apply_slot_update(replicated))`
(asserted in `tests/test_sharded_mosaic.py::test_sharded_slot_update_*`).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from topo_renderer_tpu.models.mosaic_update import (
    check_halvable,
    compute_slot_blocks,
    region_sizes,
)
from topo_renderer_tpu.models.scene import POISON_HEIGHT, TerrainMosaic
from topo_renderer_tpu.parallel.sharded_mosaic import (
    GEO_AXIS,
    _masked_rows_3d_local,
    _mosaic_shard_specs,
)

_FN_CACHE: dict = {}


def _band_write(local, lo, block, y, x):
    """Merge ``block`` (global origin ``(y, x)``, static size) into a row
    band ``local`` starting at global row ``lo``; rows outside the band
    keep their values. Shapes: ``local [h_loc, W, *C]``, ``block
    [bh, bw, *C]``."""
    h_loc = local.shape[0]
    bh, bw = block.shape[0], block.shape[1]
    rows_g = lo + jnp.arange(h_loc, dtype=jnp.int32)
    k = jnp.clip(rows_g - y, 0, bh - 1)
    cand = jnp.take(block, k, axis=0)
    mask = (rows_g >= y) & (rows_g < y + bh)
    idx = (jnp.int32(0), x) + (jnp.int32(0),) * (local.ndim - 2)
    cur = jax.lax.dynamic_slice(local, idx, (h_loc, bw) + local.shape[2:])
    merged = jnp.where(mask.reshape((h_loc,) + (1,) * (local.ndim - 1)),
                       cand, cur)
    return jax.lax.dynamic_update_slice(local, merged, idx)


def _band_write_axis1(local, lo, block, y, x):
    """`_band_write` with rows on axis 1 (the ``[C, H, W]`` window
    tables)."""
    c, h_loc = local.shape[0], local.shape[1]
    bh, bw = block.shape[1], block.shape[2]
    rows_g = lo + jnp.arange(h_loc, dtype=jnp.int32)
    k = jnp.clip(rows_g - y, 0, bh - 1)
    cand = jnp.take(block, k, axis=1)
    mask = (rows_g >= y) & (rows_g < y + bh)
    idx = (jnp.int32(0), jnp.int32(0), x)
    cur = jax.lax.dynamic_slice(local, idx, (c, h_loc, bw))
    merged = jnp.where(mask[None, :, None], cand, cur)
    return jax.lax.dynamic_update_slice(local, merged, idx)


def apply_slot_update_sharded(
    mosaic: TerrainMosaic,
    blk,
    oy, ox,
    owner_slices,
    rot_flat,
    geo,
    mesh: Mesh,
    *,
    th: int,
    tw: int,
    quantize_normals: bool = True,
    correct_axes: bool = False,
    axis: str = GEO_AXIS,
) -> TerrainMosaic:
    """Sharded-table counterpart of `models.mosaic_update.apply_slot_update`
    (same argument convention; see that docstring). Requires a mosaic from
    `shard_mosaic` over a streaming canvas (`streaming_canvas_dim` rows are
    already ``8 * n_dev``-aligned for practical meshes, so no padding rows
    exist and the mip chain still halves exactly) built with
    ``keep_hmax_raw=True``."""
    n_dev = mesh.shape[axis]
    h_m, w_m = mosaic.shape
    check_halvable(mosaic.shape, mosaic.mip_shapes)
    if not mosaic.mip_hmax_raw_flat:
        raise ValueError(
            "apply_slot_update_sharded needs build_mosaic(keep_hmax_raw=True)"
        )
    if h_m % n_dev:
        raise ValueError(f"canvas rows {h_m} not divisible by {axis}={n_dev}")
    for lv in mosaic.sharded_rows:
        h_l = h_m if lv == 0 else mosaic.mip_shapes[lv - 1][0]
        if h_l % n_dev:
            raise ValueError(
                f"sharded level {lv} rows {h_l} not divisible by {n_dev}"
            )

    m_specs = _mosaic_shard_specs(mosaic)
    win_levels = frozenset(
        lv for lv, t in enumerate(mosaic.win_attr_2d) if t is not None
    )
    key = (
        "slot", mesh, axis, th, tw, quantize_normals, correct_axes,
        mosaic.shape, mosaic.mip_shapes, mosaic.sharded_rows, win_levels,
        mosaic.has_cell_table, jax.tree_util.tree_structure(mosaic),
        tuple(jax.tree_util.tree_leaves(m_specs)),
    )
    fn = _FN_CACHE.get(key)
    if fn is None:
        mip_shapes = mosaic.mip_shapes
        sharded_rows = frozenset(mosaic.sharded_rows)
        has_cell = mosaic.has_cell_table
        sizes = region_sizes(th, tw, (h_m, w_m), mip_shapes)

        def body(m, blk, oy, ox, owner_slices, rot_flat, geo):
            dev = jax.lax.axis_index(axis)
            h_loc0 = h_m // n_dev
            lo0 = dev * h_loc0
            h2 = m.heights_flat.reshape(h_loc0, w_m)
            at = m.attr_packed_flat.reshape(h_loc0, w_m, 2)

            def assemble(local3, lo, h_loc, gy, gx, gh, gw):
                return jax.lax.psum(
                    _masked_rows_3d_local(local3, lo, h_loc, gy, gx, gh, gw),
                    axis,
                )

            def read(kind, level, gy, gx):
                gh, gw = sizes[level]
                if level == 0:
                    if kind == "attr1":
                        pl = jax.lax.dynamic_slice(
                            at, (jnp.int32(0), jnp.int32(0), jnp.int32(1)),
                            (h_loc0, w_m, 1),
                        )[..., 0]
                        return assemble(
                            pl[None], lo0, h_loc0, gy, gx, gh, gw
                        )[0]
                    return assemble(h2[None], lo0, h_loc0, gy, gx, gh, gw)[0]
                if kind == "raw":
                    src = m.mip_hmax_raw_flat[level - 1].reshape(
                        mip_shapes[level - 1]
                    )
                    return jax.lax.dynamic_slice(src, (gy, gx), (gh, gw))
                h_l, w_l = mip_shapes[level - 1]
                if level in sharded_rows:
                    h_loc = h_l // n_dev
                    loc = m.mip_heights_flat[level - 1].reshape(h_loc, w_l)
                    return assemble(
                        loc[None], dev * h_loc, h_loc, gy, gx, gh, gw
                    )[0]
                src = m.mip_heights_flat[level - 1].reshape(h_l, w_l)
                return jax.lax.dynamic_slice(src, (gy, gx), (gh, gw))

            blocks = compute_slot_blocks(
                read, (h_m, w_m), mip_shapes, win_levels,
                blk, oy, ox, owner_slices, rot_flat, geo,
                th=th, tw=tw, quantize_normals=quantize_normals,
                correct_axes=correct_axes, has_cell_table=has_cell,
            )

            cell = (
                m.cell_heights_flat.reshape(h_loc0, w_m, 8)
                if has_cell
                else None
            )
            mips = list(m.mip_heights_flat)
            mip_attrs = list(m.mip_attr_flat)
            mip_hmax = list(m.mip_hmax_flat)
            mip_raw = list(m.mip_hmax_raw_flat)
            wins = list(m.win_attr_2d)

            for table, lv, block, y, x in blocks:
                if table == "heights":
                    h2 = _band_write(h2, lo0, block, y, x)
                elif table == "attr":
                    at = _band_write(at, lo0, block, y, x)
                elif table == "cell":
                    cell = _band_write(cell, lo0, block, y, x)
                elif table == "win":
                    if lv in sharded_rows:
                        h_l = h_m if lv == 0 else mip_shapes[lv - 1][0]
                        h_loc = h_l // n_dev
                        wins[lv] = _band_write_axis1(
                            wins[lv], dev * h_loc, block, y, x
                        )
                    else:
                        wins[lv] = jax.lax.dynamic_update_slice(
                            wins[lv], block, (jnp.int32(0), y, x)
                        )
                elif table in ("mip_avg", "mip_attr"):
                    h_l, w_l = mip_shapes[lv - 1]
                    tables = mips if table == "mip_avg" else mip_attrs
                    trail = () if table == "mip_avg" else (2,)
                    if lv in sharded_rows:
                        h_loc = h_l // n_dev
                        loc = tables[lv - 1].reshape((h_loc, w_l) + trail)
                        tables[lv - 1] = _band_write(
                            loc, dev * h_loc, block, y, x
                        ).reshape(tables[lv - 1].shape)
                    else:
                        full = tables[lv - 1].reshape((h_l, w_l) + trail)
                        idx = (y, x) + (jnp.int32(0),) * len(trail)
                        tables[lv - 1] = jax.lax.dynamic_update_slice(
                            full, block, idx
                        ).reshape(tables[lv - 1].shape)
                elif table in ("mip_raw", "mip_dil"):
                    h_l, w_l = mip_shapes[lv - 1]
                    tables = mip_raw if table == "mip_raw" else mip_hmax
                    full = tables[lv - 1].reshape(h_l, w_l)
                    tables[lv - 1] = jax.lax.dynamic_update_slice(
                        full, block, (y, x)
                    ).reshape(tables[lv - 1].shape)

            hmax_raw = jax.lax.pmax(jnp.max(h2), axis)
            hmax = jnp.where(
                hmax_raw < 0.5 * POISON_HEIGHT, jnp.float32(0.0), hmax_raw
            )
            return dataclasses.replace(
                m,
                heights_flat=h2.reshape(m.heights_flat.shape),
                attr_packed_flat=at.reshape(m.attr_packed_flat.shape),
                cell_heights_flat=(
                    cell.reshape(m.cell_heights_flat.shape)
                    if cell is not None
                    else m.cell_heights_flat
                ),
                mip_heights_flat=tuple(mips),
                mip_attr_flat=tuple(mip_attrs),
                mip_hmax_flat=tuple(mip_hmax),
                mip_hmax_raw_flat=tuple(mip_raw),
                win_attr_2d=tuple(wins),
                hmax=hmax,
            )

        scalar_specs = (P(), P(), P(), tuple(P() for _ in owner_slices),
                        P(), P())
        fn = jax.jit(
            shard_map(
                body, mesh=mesh,
                in_specs=(m_specs,) + scalar_specs,
                out_specs=m_specs,
                check_vma=False,
            ),
            donate_argnums=(0,),
        )
        _FN_CACHE[key] = fn
    out = fn(mosaic, blk, oy, ox, owner_slices, rot_flat, geo)
    # Reattach the CALLER's host bookkeeping: MosaicHostData eq/hash is
    # constant, so the cached output treedef would otherwise hand back the
    # first-traced caller's host object (see
    # `models/mosaic_update.apply_slot_update` for the measured failure).
    return dataclasses.replace(out, host=mosaic.host)
