"""Pallas TPU kernel: fused first-crossing search over terrain profiles.

This fuses what the XLA path expresses as five separate global reductions
(`ops/panorama.py`): given the per-column terrain elevation profile
``e_prof [N, W]`` and three per-sample 10-bit attribute payloads, it computes
for every pixel row the first profile step whose *running max* exceeds the
pixel's elevation angle, together with that step's profile value (theta), the
previous running max (m_lo) and the attribute payloads — in ONE sweep over
the profile with all state resident in VMEM.

Grid: one program per 128-lane column block. Per block the sweep is a
`fori_loop` over N steps; each step is a handful of fused VPU ops on the
[H, 128] state planes. The crossing condition needs no "found" flag: the
running max is non-decreasing, so ``m_prev <= e_pix < m_new`` holds for
exactly one k per pixel.

Falls back transparently to the XLA reductions when Pallas/Mosaic is
unavailable (`crossing_search` chooses).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(thresh_ref, e_prof_ref, a0_ref, a1_ref, a2_ref,
            kstar_ref, theta_ref, mlo_ref, n0_ref, n1_ref, n2_ref):
    n_steps = e_prof_ref.shape[0]
    h = kstar_ref.shape[0]

    e_pix = thresh_ref[:]  # [H, 128] per-row visibility thresholds

    # Initialize state: "sky" defaults.
    kstar_ref[:] = jnp.full((h, LANES), jnp.float32(n_steps))
    theta_ref[:] = jnp.zeros((h, LANES), jnp.float32)
    mlo_ref[:] = jnp.zeros((h, LANES), jnp.float32)
    n0_ref[:] = jnp.zeros((h, LANES), jnp.float32)
    n1_ref[:] = jnp.zeros((h, LANES), jnp.float32)
    n2_ref[:] = jnp.zeros((h, LANES), jnp.float32)

    def body(k, m_prev):
        e_k = e_prof_ref[k, :][None, :]  # [1, 128]
        m_new = jnp.maximum(m_prev, e_k)
        cross = (e_pix < m_new) & (e_pix >= m_prev)  # [H, 128]
        kf = jnp.float32(0.0) + k.astype(jnp.float32)
        kstar_ref[:] = jnp.where(cross, kf, kstar_ref[:])
        theta_ref[:] = jnp.where(cross, e_k, theta_ref[:])
        mlo_ref[:] = jnp.where(cross, m_prev, mlo_ref[:])
        n0_ref[:] = jnp.where(cross, a0_ref[k, :][None, :], n0_ref[:])
        n1_ref[:] = jnp.where(cross, a1_ref[k, :][None, :], n1_ref[:])
        n2_ref[:] = jnp.where(cross, a2_ref[k, :][None, :], n2_ref[:])
        return m_new

    init = jnp.full((1, LANES), -3.0e38, jnp.float32)
    jax.lax.fori_loop(0, n_steps, body, init)


@functools.partial(jax.jit, static_argnames=("height",))
def crossing_search_pallas(e_prof, a0, a1, a2, thresh, *, height: int):
    """Run the fused crossing kernel.

    Args:
      e_prof: ``f32[N, W]`` visibility profile — any monotone function of
        elevation (angle or tan ratio; NOT cummaxed, the kernel carries the
        running max itself). W must be a multiple of 128.
      a0/a1/a2: ``f32[N, W]`` attribute payload planes.
      thresh: ``f32[H, W]`` per-pixel visibility thresholds in the same
        monotone scale as ``e_prof`` (usually a broadcast [H, 1] column).
      height: number of pixel rows.

    Returns (kstar, theta_hi, m_lo, n0, n1, n2), each ``f32[H, W]``.
    """
    n, w = e_prof.shape
    if w % LANES:
        raise ValueError(f"profile width {w} not a multiple of {LANES}")
    grid = (w // LANES,)

    def col_spec():
        return pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)

    def out_spec():
        return pl.BlockSpec((height, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((height, w), jnp.float32)] * 6
    outs = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[out_spec(), col_spec(), col_spec(), col_spec(), col_spec()],
        out_specs=[out_spec()] * 6,
        out_shape=out_shape,
    )(thresh, e_prof, a0, a1, a2)
    return tuple(outs)


def pallas_available() -> bool:
    """Probe once whether the kernel compiles on this backend."""
    global _AVAILABLE
    try:
        return _AVAILABLE
    except NameError:
        pass
    try:
        e = jnp.zeros((8, LANES), jnp.float32)
        a = jnp.zeros((8, LANES), jnp.float32)
        th = jnp.zeros((8, LANES), jnp.float32)
        out = crossing_search_pallas(e, a, a, a, th, height=8)
        jax.block_until_ready(out)
        _AVAILABLE = True
    except Exception:
        _AVAILABLE = False
    return _AVAILABLE
