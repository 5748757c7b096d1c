"""Measure the exact-march track evaluation error against f64 ground truth:
the materialized-point path (`surface.raster_from_ecef` on eye + t*dir,
what `_track_raster` shipped through round 4) vs the per-ray coefficient
expansion (`surface.track_coeffs` / `raster_from_coeffs`, round 5).

Three numbers matter per method, all in texels:
  * raw per-sample error vs f64 (includes common-mode constant offsets);
  * per-ray DE-MEANED error (the per-sample jitter — what wobbles the
    3-point quadratic fit);
  * the FIT BEND: fit the quad track through (t_lo, mid, t_hi) per method
    and compare its u=0.25 / 0.75 predictions against f64 truth evaluated
    the same way — this is the error the window march actually consumes.

CPU-only; pure math, no tables.
"""

import math
import os
import sys
from types import SimpleNamespace

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from topo_renderer_tpu.ops.geometry import R0
from topo_renderer_tpu.ops.surface import (
    raster_from_coeffs,
    raster_from_ecef,
    track_coeffs,
)

PS = 0.000833333333  # COP-90 3 arcsec, degrees/texel
LON0, LAT0 = 20.0, 49.0


def f64_truth(eye32, d32, t32, m0, m1):
    """Ground truth: same formulas, f64 end to end, f64 rotation constants
    (their f32 rounding is a rigid common-mode shift; de-meaning and the
    fit-bend metric are insensitive to it)."""
    eye = eye32.astype(np.float64)
    d = d32.astype(np.float64)
    t = t32.astype(np.float64)
    p = eye[None, :] + t[:, None] * d
    c0, s0 = math.cos(m0), math.sin(m0)
    c1, s1 = math.cos(m1), math.sin(m1)
    dlon = np.arctan2(p[:, 1] * c0 - p[:, 0] * s0, p[:, 0] * c0 + p[:, 1] * s0)
    r = np.sqrt((p * p).sum(-1))
    sl = p[:, 2] / r
    cl = np.hypot(p[:, 0], p[:, 1]) / r
    dlat = np.arcsin(np.clip(sl * c1 - cl * s1, -1.0, 1.0))
    gx = np.degrees(dlon) / PS
    gy = -np.degrees(dlat) / PS
    return gx, gy


def main():
    rng = np.random.default_rng(11)
    mosaic = SimpleNamespace(
        model_point=(jnp.float32(LON0), jnp.float32(LAT0)),
        pixel_scale=(jnp.float32(PS), jnp.float32(PS)),
    )
    lam, phi = math.radians(LON0 + 0.4), math.radians(LAT0 + 0.3)
    r_eye = R0 + 2500.0
    eye = np.array(
        [r_eye * math.cos(phi) * math.cos(lam),
         r_eye * math.cos(phi) * math.sin(lam),
         r_eye * math.sin(phi)], np.float32,
    )
    n_rays, n_t = 256, 64
    # Random forward-ish rays (downish pitch, any azimuth).
    az = rng.uniform(-math.pi, math.pi, n_rays)
    el = rng.uniform(-0.3, 0.05, n_rays)
    up = eye / np.linalg.norm(eye)
    east = np.array([-math.sin(lam), math.cos(lam), 0.0])
    north = np.cross(up, east)
    d = (
        np.cos(el)[:, None] * (np.cos(az)[:, None] * north + np.sin(az)[:, None] * east)
        + np.sin(el)[:, None] * up
    ).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    m0 = math.radians(np.float32(LON0))
    m1 = math.radians(np.float32(LAT0))

    e32 = jnp.asarray(eye)
    errs = {"ecef": {"gx": [], "gy": []}, "coeff": {"gx": [], "gy": []}}
    jit_raw = {"ecef": {"gx": [], "gy": []}, "coeff": {"gx": [], "gy": []}}
    bend = {"ecef": [], "coeff": []}

    e_norm = float(np.linalg.norm(eye.astype(np.float64)))
    c0q = np.float32((e_norm - R0) * (e_norm + R0))

    for i in range(n_rays):
        di = d[i]
        t_lo = np.float32(rng.uniform(500.0, 3_000.0))
        t_hi = np.float32(t_lo + rng.uniform(2_000.0, 12_000.0))
        ts = np.linspace(t_lo, t_hi, n_t, dtype=np.float32)
        d3 = (jnp.float32(di[0]), jnp.float32(di[1]), jnp.float32(di[2]))

        # f32 r from the stabilized quadratic (as the march computes it).
        b = np.float32(di.astype(np.float64) @ eye.astype(np.float64))
        q = c0q + 2.0 * ts * b + ts * ts
        r32 = jnp.sqrt(jnp.float32(R0 * R0) + jnp.asarray(q))

        # Method 1: materialized points.
        px = e32[0] + jnp.asarray(ts) * d3[0]
        py = e32[1] + jnp.asarray(ts) * d3[1]
        pz = e32[2] + jnp.asarray(ts) * d3[2]
        gx_e, gy_e = raster_from_ecef(mosaic, px, py, pz, r32)

        # Method 2: coefficient expansion.
        k = track_coeffs(mosaic, e32, d3)
        gx_c, gy_c = raster_from_coeffs(mosaic, k, jnp.asarray(ts), r32)

        gx_t, gy_t = f64_truth(eye, np.broadcast_to(di, (n_t, 3)), ts, m0, m1)

        for name, (gx, gy) in (("ecef", (gx_e, gy_e)), ("coeff", (gx_c, gy_c))):
            dgx = np.asarray(gx, np.float64) - gx_t
            dgy = np.asarray(gy, np.float64) - gy_t
            jit_raw[name]["gx"].append(np.abs(dgx).max())
            jit_raw[name]["gy"].append(np.abs(dgy).max())
            errs[name]["gx"].append(np.abs(dgx - dgx.mean()).max())
            errs[name]["gy"].append(np.abs(dgy - dgy.mean()).max())

            # Fit bend: quadratic through u=0,0.5,1 -> predict u=0.25,0.75.
            def at3(v):
                g0, gm, g1 = v[0], v[n_t // 2], v[-1]
                cq = 2.0 * g0 - 4.0 * gm + 2.0 * g1
                bq = -3.0 * g0 + 4.0 * gm - g1
                return np.array(
                    [g0 + 0.25 * (bq + 0.25 * cq), g0 + 0.75 * (bq + 0.75 * cq)]
                )

            # n_t=64 means u=0.25/0.75 are not sample points; use exact
            # quarter t's for truth and method alike.
            tq = np.array(
                [t_lo + 0.25 * (t_hi - t_lo), t_lo + 0.75 * (t_hi - t_lo)],
                np.float32,
            )
            qq = c0q + 2.0 * tq * b + tq * tq
            rq = jnp.sqrt(jnp.float32(R0 * R0) + jnp.asarray(qq))
            if name == "ecef":
                pqx = e32[0] + jnp.asarray(tq) * d3[0]
                pqy = e32[1] + jnp.asarray(tq) * d3[1]
                pqz = e32[2] + jnp.asarray(tq) * d3[2]
                gxq, gyq = raster_from_ecef(mosaic, pqx, pqy, pqz, rq)
            else:
                gxq, gyq = raster_from_coeffs(mosaic, k, jnp.asarray(tq), rq)
            gxq_t, gyq_t = f64_truth(eye, np.broadcast_to(di, (2, 3)), tq, m0, m1)
            # Fit the METHOD's 3 points, compare its prediction to the
            # method's own exact quarter values AND to f64 truth; the fit
            # consumes the method's noise, truth-vs-fit is the real bend.
            fit_gx = at3(np.asarray(gx, np.float64))
            fit_gy = at3(np.asarray(gy, np.float64))
            bend[name].append(
                max(np.abs(fit_gx - gxq_t).max(), np.abs(fit_gy - gyq_t).max())
            )

    for name in ("ecef", "coeff"):
        print(
            f"{name:6s} raw-max   gx={np.max(jit_raw[name]['gx']):.2e} "
            f"gy={np.max(jit_raw[name]['gy']):.2e} texels"
        )
        print(
            f"{name:6s} jitter    gx p50={np.median(errs[name]['gx']):.2e} "
            f"max={np.max(errs[name]['gx']):.2e}  "
            f"gy p50={np.median(errs[name]['gy']):.2e} "
            f"max={np.max(errs[name]['gy']):.2e} texels"
        )
        print(
            f"{name:6s} fit-bend  p50={np.median(bend[name]):.2e} "
            f"p95={np.percentile(bend[name], 95):.2e} "
            f"max={np.max(bend[name]):.2e} texels"
        )


if __name__ == "__main__":
    main()
