"""Exact-path (BASELINE config 1) design probe — run on real TPU.

Two questions this answers (NOTES.md round-3 items):
  A. What sets the gather rate into big tables — table SIZE or access
     WORKING SET?  Measures row-gather rate into f32[N,4] tables of
     4 MB .. 2.3 GB with (i) uniform-random indices over the whole table,
     (ii) random indices restricted to a 64 MB contiguous band (the hit
     shell working set), (iii) spatially coherent indices (what the
     windowed march actually issues).
  B. Where do config 1's 271 ms go?  Stage deltas: prepass profile
     gathers, crossing reductions, window march, refine, shading.

Not a test; run directly on the TPU host (one process at a time).
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_probe import eye_at, synthetic_mosaic_device


def bench(label, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:<58s} {ms:9.2f} ms", flush=True)
    return ms


def gather_curve():
    """Chained dependent row-gathers from REAL mosaic cell tables.

    Mirrors the window march exactly: [450, 800] pixel planes, 35 sequential
    rounds where each round's gather index depends on the previous round's
    result (so the tunnel's async acks can't hide execution), fetching 16 B
    rows from `cell_heights_flat`. The per-pixel base index is random over a
    chosen WORKING SET band; each round perturbs it locally (march steps move
    a few cells). Varying mosaic n varies table size; varying the band varies
    working set.
    """
    from functools import partial

    H, W, ROUNDS = 456, 800, 35
    G = H * W * ROUNDS

    @partial(jax.jit, static_argnames=("n_rows", "band"))
    def run(cell, base, n_rows, band):
        def body(k, acc):
            idx = (base + (jnp.abs(acc) % 97.0).astype(jnp.int32) * 13) % band
            rows = cell[idx]
            return acc + rows[..., 0] + rows[..., 3] + jnp.float32(k)

        acc = jax.lax.fori_loop(0, ROUNDS, body, jnp.zeros((H, W), jnp.float32))
        return acc.sum()

    key = jax.random.PRNGKey(0)
    print("--- A. chained row-gather rate vs table size / working set ---", flush=True)
    for n in (2001, 4001, 8001, 12001):
        mosaic = synthetic_mosaic_device(n=n)
        cell = mosaic.cell_heights_flat
        jax.block_until_ready(cell)
        n_rows = cell.shape[0]
        mb = n_rows * 16 // (1024 * 1024)
        bands = {"full": n_rows, "64MB": min(n_rows, 4_194_304)}
        for name, band in bands.items():
            if name != "full" and band == n_rows:
                continue
            base = jax.random.randint(key, (H, W), 0, band, jnp.int32)
            ms = bench(f"cell[{mb:5d} MB] band={name}", run, cell, base, n_rows, band, reps=8)
            print(f"    -> {G / ms / 1e3:8.1f} M gathers/s", flush=True)
        del mosaic, cell


def config1_stages():
    import math
    from functools import partial

    from topo_renderer_tpu.models.camera import Camera
    from topo_renderer_tpu.ops import raycast as rc
    from topo_renderer_tpu.ops.panorama import (
        PanoramaSpec,
        panorama_crossing_prepass,
    )
    from topo_renderer_tpu.ops.raycast import render_perspective

    print("--- B. config 1 stage breakdown (800x450, guided) ---", flush=True)
    mosaic = synthetic_mosaic_device(n=12001)
    jax.block_until_ready(mosaic.heights_flat)
    eye = eye_at(47.0, 23.0, 2800.0)
    cam = Camera(eye=eye, pitch=-0.05, yaw=0.8)
    W, H = 800, 450
    fov = math.radians(45.0)

    bench(
        "full render_perspective guided",
        lambda: render_perspective(
            mosaic, cam, width=W, height=H, n_steps=1024, n_refine=24,
            guided=True, fov_hint=fov,
        )["color"],
        reps=6,
    )

    # Prepass alone at the guided path's spec (mirror march_guided_panorama).
    aspect = W / H
    half_diag = min(math.atan(math.tan(0.5 * fov) * math.sqrt(1 + aspect * aspect)), 0.49 * math.pi)
    half_win = min(1.03 * half_diag + 0.01, 0.49 * math.pi)
    az_span = min(2 * math.pi, 2 * half_win / max(math.cos(half_win), 0.3))
    px_per_rad = 1.5 * H / fov
    wp = max(256, min(int(math.ceil(az_span * px_per_rad / 128.0)) * 128, 8192))
    hp = max(64, min(int(math.ceil(2.0 * half_win * px_per_rad / 8.0)) * 8, 4096))
    print(f"prepass {wp}x{hp} n=1024; pixels {W}x{H}", flush=True)
    spec_pre = PanoramaSpec(
        width=wp, height=hp, n_steps=1024, n_refine=0,
        azimuth_start=-0.5 * az_span, azimuth_span=az_span,
        elev_min=-half_win, elev_max=half_win,
    )
    bench(
        "  prepass (profile gathers + crossing)",
        lambda: panorama_crossing_prepass(mosaic, eye, spec_pre)["d_lo"],
        reps=6,
    )

    # Profile gathers only (no crossing search): time N*W sample_height.
    from topo_renderer_tpu.ops.panorama import _eye_frame, _surface_elevation

    @jax.jit
    def profile_only(mosaic, eye):
        a0, up, (ex, ey), (nx0, ny0, nz0), _ = _eye_frame(eye)
        phi = -0.5 * az_span + az_span * ((jnp.arange(wp, dtype=jnp.float32) + 0.5) / wp)
        h_col = (
            nx0 * jnp.cos(phi) + ex * jnp.sin(phi),
            ny0 * jnp.cos(phi) + ey * jnp.sin(phi),
            nz0 * jnp.cos(phi),
        )
        h_b = tuple(c[None, :] for c in h_col)
        k = jnp.arange(1024, dtype=jnp.float32)[:, None]
        sig = jnp.exp(jnp.log(5.0) + jnp.log(5e5 / 5.0) * (k / 1023.0)) / 6371000.0
        return _surface_elevation(mosaic, a0, up, h_b, sig).sum()

    bench("  profile gathers only (1024 x wp)", profile_only, mosaic, eye, reps=6)

    # Window march alone: reuse the real prepass output then time _window_march.
    @partial(jax.jit, static_argnames=("n_window", "n_refine"))
    def window_only(mosaic, eye, t_min, t_max, any_hit, n_window=16, n_refine=18):
        (dx, dy, dz), fwd = rc.camera_rays(cam, W, H)
        return rc._window_march(
            mosaic, jnp.asarray(eye, jnp.float32), (dx, dy, dz),
            t_min, t_max, any_hit,
            n_window=n_window, n_refine=n_refine,
            margin_rel=0.01, margin_abs=150.0,
        )[1].sum()

    # Build per-pixel brackets once (device) exactly like march_guided_panorama.
    @jax.jit
    def brackets(mosaic, eye):
        (dx, dy, dz), fwd = rc.camera_rays(cam, W, H)
        e = jnp.asarray(eye, jnp.float32)
        e_norm = jnp.linalg.norm(e)
        ux, uy, uz = e[0] / e_norm, e[1] / e_norm, e[2] / e_norm
        lon0 = jnp.arctan2(e[1], e[0])
        lat0 = jnp.arcsin(jnp.clip(e[2] / e_norm, -1.0, 1.0))
        ex_, ey_ = -jnp.sin(lon0), jnp.cos(lon0)
        nx0 = -jnp.sin(lat0) * jnp.cos(lon0)
        ny0 = -jnp.sin(lat0) * jnp.sin(lon0)
        nz0 = jnp.cos(lat0)
        az = jnp.arctan2(dx * ex_ + dy * ey_, dx * nx0 + dy * ny0 + dz * nz0)
        el = jnp.arcsin(jnp.clip(dx * ux + dy * uy + dz * uz, -1.0, 1.0))
        az_c = jnp.arctan2(fwd[0] * ex_ + fwd[1] * ey_, fwd[0] * nx0 + fwd[1] * ny0 + fwd[2] * nz0)
        el_c = jnp.arcsin(jnp.clip(fwd[0] * ux + fwd[1] * uy + fwd[2] * uz, -1.0, 1.0))
        pre = panorama_crossing_prepass(mosaic, eye, spec_pre, azimuth_offset=az_c, elev_offset=el_c)
        BIG = jnp.float32(3.0e38)
        d_lo = jnp.where(pre["hit"], pre["d_lo"], BIG)
        d_hi = jnp.where(pre["hit"], pre["d_hi"], -BIG)
        t_min_img = rc._pool3(d_lo, jnp.minimum)
        t_max_img = rc._pool3(d_hi, jnp.maximum)
        rel_az = (az - az_c + jnp.pi) % (2 * jnp.pi) - jnp.pi
        gx = (rel_az + 0.5 * az_span) / az_span * wp - 0.5
        gy = (jnp.float32(half_win) - (el - el_c)) / jnp.float32(2 * half_win) * hp - 0.5
        ix = jnp.clip(jnp.round(gx).astype(jnp.int32), 0, wp - 1)
        iy = jnp.clip(jnp.round(gy).astype(jnp.int32), 0, hp - 1)
        packed = jnp.stack([t_min_img, t_max_img], axis=-1).reshape(-1, 2)
        rows = packed[iy * wp + ix]
        return rows[..., 0], rows[..., 1]

    t_min, t_max = brackets(mosaic, eye)
    jax.block_until_ready((t_min, t_max))
    any_hit = t_min < jnp.float32(3.0e38)
    bench("  window march 16+18 (current)", window_only, mosaic, eye, t_min, t_max, any_hit, reps=6)
    bench(
        "  window march 16+0 (no bisection)",
        lambda: window_only(mosaic, eye, t_min, t_max, any_hit, n_window=16, n_refine=0),
        reps=6,
    )
    bench(
        "  window march 8+0",
        lambda: window_only(mosaic, eye, t_min, t_max, any_hit, n_window=8, n_refine=0),
        reps=6,
    )

    # Bracket width stats -> how many cells would an analytic DDA need?
    texel = 92.6 * 12001 / 12001  # ~mosaic texel meters (synthetic ps=1/1200 deg)
    w_m = np.asarray(jnp.where(any_hit, t_max * 1.01 + 150.0 - (t_min * 0.99 - 150.0), 0.0))
    hits = np.asarray(any_hit)
    if hits.any():
        cells = w_m[hits] / texel
        print(
            f"bracket widths (cells): p50={np.percentile(cells,50):.1f} "
            f"p90={np.percentile(cells,90):.1f} p99={np.percentile(cells,99):.1f} "
            f"max={cells.max():.1f}  hit_frac={hits.mean():.3f}",
            flush=True,
        )
        d = np.asarray(jnp.where(any_hit, 0.5 * (t_min + t_max), 0.0))[hits]
        print(
            f"hit distance (km): p50={np.percentile(d,50)/1e3:.1f} "
            f"p90={np.percentile(d,90)/1e3:.1f} p99={np.percentile(d,99)/1e3:.1f} "
            f"max={d.max()/1e3:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    which = os.environ.get("PROBE", "both")
    if which in ("both", "gather"):
        gather_curve()
    if which in ("both", "stages"):
        config1_stages()
    print("done", flush=True)
