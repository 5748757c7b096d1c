"""Pallas DMA kernels: read *only* the requested bytes from HBM.

Motivation (measured on v5e, 100-tile scene, `scripts/stage_probe.py`): the
XLA implementation of clipmap window extraction costs ~9 ms/frame even though
a window is ~0.5 MB, because XLA cross-program-prefetches every *used* input
table of a program into scratch memory on each execution — for a mosaic with
multi-GB attribute tables that re-streams the whole mosaic every frame. A
Pallas kernel whose table input lives in `pl.ANY` (i.e. stays in HBM) and
whose body issues one bounded `make_async_copy` reads exactly the window
texels, making extraction cost independent of table size.

This also removes the need for the 2-D `win_attr_2d` duplicate tables that
round 1 kept purely to make XLA's slice cheap (~2x mosaic memory back).

Used by `ops/panorama.py::extract_clipmap_windows`; falls back to XLA slicing
on backends where Mosaic is unavailable (CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=("wsy", "wsx"))
def window_slice(table, sy, sx, *, wsy: int, wsx: int):
    """Copy ``table[..., sy:sy+wsy, sx:sx+wsx]`` reading only those texels.

    ``table``: ``f32[H, W]`` or ``f32[C, H, W]`` (HBM-resident; never staged
    in full). ``sy``/``sx``: traced int32 window origin — **must** be aligned
    to the (8, 128) HBM tiling (Mosaic cannot slice HBM at unaligned offsets)
    and in-range; ``wsy``/``wsx`` must be multiples of (8, 128) too.
    Returns ``f32[(C,) wsy, wsx]``.
    """
    if wsy % 8 or wsx % 128:
        raise ValueError(f"window ({wsy}, {wsx}) must be (8, 128)-aligned")
    lead = table.shape[:-2]

    def kernel(idx_ref, src_ref, out_ref, sem):
        y0 = pl.multiple_of(idx_ref[0], 8)
        x0 = pl.multiple_of(idx_ref[1], 128)
        src = src_ref.at[..., pl.ds(y0, wsy), pl.ds(x0, wsx)]
        dma = pltpu.make_async_copy(src, out_ref, sem)
        dma.start()
        dma.wait()

    idx = jnp.stack([sy, sx]).astype(jnp.int32)
    # Index operand rides in SMEM directly — the PrefetchScalarGridSpec form
    # costs ~0.7 ms more per dispatch (measured; the prefetch machinery is
    # overhead here since there is no grid to prefetch ahead of).
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        out_shape=jax.ShapeDtypeStruct(lead + (wsy, wsx), table.dtype),
    )(idx, table)


@functools.partial(jax.jit, static_argnames=("wsy", "wsx"))
def window_slice_multi(tables, origins, *, wsy: int, wsx: int):
    """Slice the same-size window out of several tables in one kernel.

    ``tables``: sequence of ``f32[C, H_l, W_l]`` (or ``[H_l, W_l]``) arrays,
    one per clipmap level; ``origins``: ``i32[L, 2]`` aligned (sy, sx) rows.
    All L DMAs are issued before any is waited on, so the copies overlap.
    Returns a tuple of ``f32[..., wsy, wsx]`` windows.
    """
    if wsy % 8 or wsx % 128:
        raise ValueError(f"window ({wsy}, {wsx}) must be (8, 128)-aligned")
    n = len(tables)

    def kernel(idx_ref, *refs):
        srcs, outs, sem = refs[:n], refs[n : 2 * n], refs[2 * n]
        dmas = []
        for i in range(n):
            y0 = pl.multiple_of(idx_ref[i, 0], 8)
            x0 = pl.multiple_of(idx_ref[i, 1], 128)
            dmas.append(
                pltpu.make_async_copy(
                    srcs[i].at[..., pl.ds(y0, wsy), pl.ds(x0, wsx)],
                    outs[i],
                    sem.at[i],
                )
            )
        for dma in dmas:
            dma.start()
        for dma in dmas:
            dma.wait()

    # SMEM index operand (see window_slice): ~0.7 ms cheaper per dispatch
    # than the scalar-prefetch grid spec.
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * n,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n,
        scratch_shapes=[pltpu.SemaphoreType.DMA((n,))],
        out_shape=[
            jax.ShapeDtypeStruct(t.shape[:-2] + (wsy, wsx), t.dtype) for t in tables
        ],
    )(jnp.asarray(origins, jnp.int32), *tables)


@functools.partial(jax.jit, static_argnames=("wsy", "wsx"))
def window_slice_multi_batched(tables, origins, *, wsy: int, wsx: int):
    """Slice B eye-centered windows out of each table in one kernel.

    Batched form of `window_slice_multi` for single-program batched
    rendering (BASELINE config 5): ``origins i32[B, L, 2]`` holds aligned
    (sy, sx) per viewpoint per level; the grid runs one program per
    viewpoint, each issuing its L bounded DMAs back-to-back so copies
    overlap. Returns a tuple over levels of ``f32[B, ..., wsy, wsx]``.
    """
    if wsy % 8 or wsx % 128:
        raise ValueError(f"window ({wsy}, {wsx}) must be (8, 128)-aligned")
    n = len(tables)
    B = origins.shape[0]

    def kernel(idx_ref, *refs):
        srcs, outs, sem = refs[:n], refs[n : 2 * n], refs[2 * n]
        b = pl.program_id(0)
        dmas = []
        for i in range(n):
            y0 = pl.multiple_of(idx_ref[b, i, 0], 8)
            x0 = pl.multiple_of(idx_ref[b, i, 1], 128)
            dmas.append(
                pltpu.make_async_copy(
                    srcs[i].at[..., pl.ds(y0, wsy), pl.ds(x0, wsx)],
                    outs[i].at[b],
                    sem.at[i],
                )
            )
        for dma in dmas:
            dma.start()
        for dma in dmas:
            dma.wait()

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n,
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n,
            scratch_shapes=[pltpu.SemaphoreType.DMA((n,))],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B,) + t.shape[:-2] + (wsy, wsx), t.dtype)
            for t in tables
        ],
    )(jnp.asarray(origins, jnp.int32), *tables)


def dma_available() -> bool:
    """Probe once whether the DMA slice kernel compiles/runs on this backend."""
    global _AVAILABLE
    try:
        return _AVAILABLE
    except NameError:
        pass
    try:
        t = jnp.arange(2.0 * 64.0 * 256.0, dtype=jnp.float32).reshape(2, 64, 256)
        out = window_slice(t, jnp.int32(8), jnp.int32(128), wsy=16, wsx=128)
        _AVAILABLE = bool(jnp.all(out == t[:, 8:24, 128:256]))
    except Exception:
        _AVAILABLE = False
    return _AVAILABLE
