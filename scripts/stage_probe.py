"""Stage-level cost breakdown of the fast panorama path on real TPU.

Measures, at BASELINE config-4 scale (4096x1024, ~100-tile mosaic):
  1. clipmap window extraction
  2. profile sampling only (e_prof + attr planes) -- the gather stage
  3. sampling + cummax + crossing reductions       -- adds the search stage
  4. full render                                   -- adds shading/postprocess

Stage deltas tell where the next kernel effort should go (NOTES.md item 1).
Not a test; run directly on the TPU host.
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import sys

# NB: the repo root must come from cwd/sys.path, NOT from PYTHONPATH — setting
# PYTHONPATH breaks the axon PJRT plugin discovery (registers a bare 'tpu'
# backend and the 'axon' platform fails to initialize).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_probe import eye_at, synthetic_mosaic_device

from topo_renderer_tpu.ops import panorama as pano
from topo_renderer_tpu.ops.panorama import (
    PanoramaSpec,
    extract_clipmap_windows,
    render_panorama,
)


def bench(label, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:<42s} {ms:8.2f} ms", flush=True)
    return ms


def setup_ctx(mosaic, eye, spec):
    W, H, N = spec.width, spec.height, spec.n_steps
    a0, up, (ex, ey), (nx0, ny0, nz0), _ = pano._eye_frame(eye)
    st = max(1, int(spec.profile_stride))
    ws = W // st
    phi_sub = spec.azimuth_start + spec.azimuth_span * (
        (jnp.arange(ws, dtype=jnp.float32) + 0.5) / ws
    )
    cps, sps = jnp.cos(phi_sub), jnp.sin(phi_sub)
    h_prof = (nx0 * cps + ex * sps, ny0 * cps + ey * sps, nz0 * cps)
    h_prof_b = tuple(c[None, :] for c in h_prof)
    log_near = jnp.float32(jnp.log(spec.s_near))
    log_ratio = jnp.float32(jnp.log(spec.s_far / spec.s_near))
    k = jnp.arange(N, dtype=jnp.float32)[:, None]
    sigma = jnp.exp(log_near + log_ratio * (k / (N - 1))) / 6371000.0
    return a0, up, h_prof_b, sigma, ws


def main():
    print("devices:", jax.devices(), flush=True)
    n = int(os.environ.get("PROBE_N", "12001"))
    mosaic = synthetic_mosaic_device(n=n)
    jax.block_until_ready(mosaic.heights_flat)
    eye = eye_at(47.0, 23.0, 2800.0)
    sun = jnp.array([0.3, 0.5, 0.8], jnp.float32)
    spec = PanoramaSpec.fast(width=4096, height=1024, n_steps=512)
    H = spec.height

    win = extract_clipmap_windows(mosaic, eye, spec)
    jax.block_until_ready(win)
    bench("1. extract_clipmap_windows", extract_clipmap_windows, mosaic, eye, spec)

    from functools import partial

    @partial(jax.jit, static_argnames=("spec",))
    def profile_only(mosaic, eye, spec, windows):
        a0, up, h_prof_b, sigma, ws = setup_ctx(mosaic, eye, spec)
        e_prof, attr_prof = pano._build_lod_profile(
            mosaic, spec, windows, a0, up, h_prof_b, sigma
        )
        return (e_prof,) + tuple(attr_prof)

    t_prof = bench(
        "2. profile sampling (e_prof + attrs)",
        lambda: profile_only(mosaic, eye, spec, win),
    )

    @partial(jax.jit, static_argnames=("spec",))
    def through_crossing(mosaic, eye, spec, windows):
        a0, up, h_prof_b, sigma, ws = setup_ctx(mosaic, eye, spec)
        e_prof, attr_prof = pano._build_lod_profile(
            mosaic, spec, windows, a0, up, h_prof_b, sigma
        )
        m_prof = jax.lax.cummax(e_prof, axis=0)
        e_lo, e_hi = spec.elevation_range()
        rows = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
        e_pix = (jnp.float32(e_hi) - rows * jnp.float32(e_hi - e_lo))[:, None]
        thresh = jnp.tan(e_pix)
        BIG = jnp.float32(3.0e38)
        m3 = m_prof[:, None, :]
        e3 = thresh[None, :, :]
        le = m3 <= e3
        theta_hi = jnp.min(jnp.where(le, BIG, m3), axis=0)
        m_lo = jnp.max(jnp.where(le, m3, -BIG), axis=0)
        N = spec.n_steps
        BIGKEY = jnp.float32(16777216.0)
        kk = (jnp.arange(N, dtype=jnp.float32) * 1024.0)[:, None, None]
        picks = [
            jnp.min(jnp.where(le, BIGKEY, kk + comp[:, None, :]), axis=0)
            for comp in attr_prof
        ]
        kstar = jnp.floor(picks[0] / 1024.0)
        return (kstar, theta_hi, m_lo) + tuple(picks)

    t_cross = bench(
        "3. sampling + cummax + crossing reductions",
        lambda: through_crossing(mosaic, eye, spec, win),
    )

    def full():
        w = extract_clipmap_windows(mosaic, eye, spec)
        return render_panorama(mosaic, eye, spec, sun, fog="atmosphere", windows=w)[
            "color"
        ]

    t_full = bench("4. full render (incl. extraction)", full)
    print(f"\n   crossing stage delta: {t_cross - t_prof:.2f} ms")
    print(f"   tail (shade/post/etc): {t_full - t_cross:.2f} ms")


if __name__ == "__main__":
    main()
