"""Pallas TPU kernel: banded first-crossing search over terrain profiles.

Given per-column terrain visibility profiles ``e_prof [N, W]`` (any monotone
function of elevation) and three per-sample attribute payload planes, find
for every pixel row the first profile step whose *running max* exceeds the
row's threshold, together with that step's profile value (theta_hi), the
previous running max (m_lo) and the payloads.

The XLA formulation is five fused global reductions over the [N, H, W]
broadcast — O(N*H) work per column (~3.4 ms at 4096x1024/512 steps on v5e).
This kernel exploits two monotonicities the reductions cannot:

  * the running max M_k is non-decreasing in k,
  * row thresholds t_r are sorted decreasing in r (rows look downward).

So the rows that cross at step k form a contiguous *band*
``{r : m_prev <= t_r < m_new}``, and both band edges only ever move upward
(toward row 0) as k advances. Per step the kernel:

  1. advances the upper cursor ``r_lo`` (first row that any lane could cross,
     from the block-max of m_new) by walking the threshold column in SMEM,
  2. masked-updates the output planes only on the RC-row chunks inside
     ``[r_lo, r_hi)``,
  3. advances the lower cursor ``r_hi`` (rows below it have crossed in every
     lane, from the block-min of m_new).

Amortized work is O(H + N + total band overlap) row-updates instead of
O(N*H) — the crossing stage drops from ~3.4 ms to well under 1 ms.

Requirements: thresholds must be constant across lanes (true for panorama
rendering — the threshold is tan(elevation) per pixel row) and sorted
decreasing along rows. Falls back transparently to the XLA reductions when
Pallas/Mosaic is unavailable (`ops/panorama.py` chooses).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_RC = 32  # rows per masked-update chunk (multiple of the 8-sublane tiling)


def _make_kernel(n_steps: int, height: int, rc: int):
    def kernel(thresh1d_ref, thresh_ref, e_ref, a0_ref, a1_ref, a2_ref,
               kstar_ref, theta_ref, mlo_ref, n0_ref, n1_ref, n2_ref):
        # Sky defaults: kstar = N marks "no crossing".
        kstar_ref[:] = jnp.full((height, LANES), jnp.float32(n_steps))
        theta_ref[:] = jnp.zeros((height, LANES), jnp.float32)
        mlo_ref[:] = jnp.zeros((height, LANES), jnp.float32)
        n0_ref[:] = jnp.zeros((height, LANES), jnp.float32)
        n1_ref[:] = jnp.zeros((height, LANES), jnp.float32)
        n2_ref[:] = jnp.zeros((height, LANES), jnp.float32)

        def step(k, carry):
            m_prev, r_lo, r_hi = carry
            e_k = e_ref[k, :][None, :]  # [1, 128]
            m_new = jnp.maximum(m_prev, e_k)
            mx = jnp.max(m_new)
            mn = jnp.min(m_new)

            # Upper band edge: first row any lane could cross (t_r < mx).
            r_lo = jax.lax.while_loop(
                lambda r: (r > 0) & (thresh1d_ref[r - 1] < mx),
                lambda r: r - 1,
                r_lo,
            )

            @pl.when(r_lo < r_hi)
            def _update_band():
                kf = jnp.full((1, LANES), 0.0, jnp.float32) + k.astype(jnp.float32)
                a0k = a0_ref[k, :][None, :]
                a1k = a1_ref[k, :][None, :]
                a2k = a2_ref[k, :][None, :]

                def chunk(c):
                    # Clamp so the RC-row window stays in bounds; rows
                    # revisited by the clamp fail the cross test (already
                    # crossed or above the band), making the re-update a
                    # no-op.
                    cw = jnp.minimum(c, height - rc)
                    rows = thresh_ref[pl.ds(cw, rc), :]
                    cross = (rows < m_new) & (rows >= m_prev)

                    def rmw(ref, val):
                        ref[pl.ds(cw, rc), :] = jnp.where(
                            cross, val, ref[pl.ds(cw, rc), :]
                        )

                    rmw(kstar_ref, kf)
                    rmw(theta_ref, e_k)
                    rmw(mlo_ref, m_prev)
                    rmw(n0_ref, a0k)
                    rmw(n1_ref, a1k)
                    rmw(n2_ref, a2k)
                    return c + rc

                jax.lax.while_loop(lambda c: c < r_hi, chunk, (r_lo // rc) * rc)

            # Lower band edge: rows below r_hi have crossed in every lane.
            r_hi = jax.lax.while_loop(
                lambda r: (r > 0) & (thresh1d_ref[r - 1] < mn),
                lambda r: r - 1,
                r_hi,
            )
            return m_new, r_lo, r_hi

        init = (
            jnp.full((1, LANES), -3.0e38, jnp.float32),
            jnp.int32(height),
            jnp.int32(height),
        )
        jax.lax.fori_loop(0, n_steps, step, init)

    return kernel


@functools.partial(jax.jit, static_argnames=("height", "interpret"))
def crossing_search_pallas(e_prof, a0, a1, a2, thresh, *, height: int,
                           interpret: bool = False):
    """Run the banded crossing kernel.

    Args:
      e_prof: ``f32[N, W]`` visibility profile — any monotone function of
        elevation (angle or tan ratio; NOT cummaxed, the kernel carries the
        running max itself). W must be a multiple of 128.
      a0/a1/a2: ``f32[N, W]`` attribute payload planes.
      thresh: ``f32[H, W]`` per-pixel visibility thresholds in the same
        monotone scale as ``e_prof``. Must be constant across W (lanes) and
        non-increasing along H — the panorama's per-row tan(elevation).
      height: number of pixel rows (H). Must be a multiple of 8.
      interpret: run in the Pallas interpreter (hermetic CPU tests).

    Returns (kstar, theta_hi, m_lo, n0, n1, n2), each ``f32[H, W]``.
    """
    n, w = e_prof.shape
    if w % LANES:
        raise ValueError(f"profile width {w} not a multiple of {LANES}")
    if height % 8:
        raise ValueError(f"height {height} not a multiple of 8")
    rc = min(_RC, height)
    grid = (w // LANES,)

    def col_spec():
        # index_map gets (grid idx, scalar-prefetch ref) under
        # PrefetchScalarGridSpec; the scalar ref is unused here.
        return pl.BlockSpec((n, LANES), lambda i, s: (0, i), memory_space=pltpu.VMEM)

    def out_spec():
        return pl.BlockSpec((height, LANES), lambda i, s: (0, i), memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((height, w), jnp.float32)] * 6
    outs = pl.pallas_call(
        _make_kernel(n, height, rc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[out_spec(), col_spec(), col_spec(), col_spec(), col_spec()],
            out_specs=[out_spec()] * 6,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(thresh[:, 0], thresh, e_prof, a0, a1, a2)
    return tuple(outs)


def pallas_available() -> bool:
    """Probe once whether the kernel compiles on this backend."""
    global _AVAILABLE
    try:
        return _AVAILABLE
    except NameError:
        pass
    try:
        # Probe via explicit lower+compile: the probe is often reached while
        # tracing an outer jit (render_panorama), where a plain call would be
        # inlined without ever compiling — masking backends (CPU) that reject
        # the kernel at lowering time.
        s = jax.ShapeDtypeStruct((8, LANES), jnp.float32)
        crossing_search_pallas.lower(s, s, s, s, s, height=8).compile()
        _AVAILABLE = True
    except Exception:
        _AVAILABLE = False
    return _AVAILABLE
