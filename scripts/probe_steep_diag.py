"""Diagnose the steep-pitch guided tail: bracket miss vs resolution starvation.

For each pixel that deviates >2/255 from the rasterizer oracle on the
steep-pitch patch-edge scene, reconstruct the march's own pooled bracket
legs (the exact code path: prepass -> grouped pools -> per-pixel gather)
and classify:

  * sky_flip: guided says hit, oracle says sky (or vice versa);
  * oracle crossing OUTSIDE both legs (+margins) -> bracket miss
    (conservativeness defect — pooling or prepass);
  * oracle crossing INSIDE a leg -> resolution starvation (window/walk
    budget too coarse for the leg width); report the leg width
    distribution for these.

Run: JAX_PLATFORMS=cpu python scripts/probe_steep_diag.py
"""

import dataclasses
import math
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tests.helpers import east_at, small_scene, yaw_towards  # noqa: E402
from tests.raster_oracle2 import rasterize2  # noqa: E402
from topo_renderer_tpu.models.camera import FAR, ViewMode  # noqa: E402
from topo_renderer_tpu.ops.raycast import (  # noqa: E402
    _grouped_bracket_pools,
    camera_rays,
    guided_prepass_spec,
    render_perspective,
)
from topo_renderer_tpu.ops.panorama import panorama_crossing_prepass  # noqa: E402

W, H = 400, 225
BIG = 3.0e38


def main():
    mosaic, cam, _tile = small_scene(n=73, span_deg=0.06, height_above=1200.0)
    cam = dataclasses.replace(
        cam, yaw=yaw_towards(cam, east_at(cam)) + 0.9, pitch=-0.22,
        view_mode=ViewMode.NORMALS,
    )
    vp = np.asarray(cam.build_view_proj_matrix(float(W), float(H)), np.float64)
    c2, d2 = rasterize2(
        np.asarray(mosaic.heights), np.asarray(mosaic.normals), (0.0, 0.0),
        np.asarray(mosaic.model_point), np.asarray(mosaic.pixel_scale), vp,
        np.asarray(cam.eye, np.float64),
        np.asarray(cam.sun_angle.to_vec3(), np.float64), W, H, view_mode=1,
    )

    fov = math.radians(45.0)
    out = render_perspective(
        mosaic, cam, width=W, height=H, n_steps=1024, n_refine=26,
        quantize_rt=False, apply_postprocess=False,
        guided=True, fov_hint=fov,
        # The leg reconstruction below mirrors the split (non-guard) march;
        # keep the render on the same mode so the classification matches.
        guided_kw=(("guard_legs", False),),
    )
    err = np.abs(np.asarray(out["color"]) - c2).max(axis=-1)
    bad = err > 2.0 / 255.0
    print(f"bad pixels: {bad.sum()} ({bad.mean():.3%})", flush=True)

    g_hit = np.asarray(out["hit"])
    o_hit = d2 < 1.0
    print(f"  guided hit but oracle sky: {(bad & g_hit & ~o_hit).sum()}")
    print(f"  guided sky but oracle hit: {(bad & ~g_hit & o_hit).sum()}")
    print(f"  both hit (wrong surface):  {(bad & g_hit & o_hit).sum()}")

    # Oracle hit DISTANCE along each pixel ray: invert the reference depth
    # convention via the marcher's own distance where both agree; for bad
    # pixels use the oracle depth -> view-axis dist -> ray dist.
    from topo_renderer_tpu.models.camera import NEAR

    a = FAR / (FAR - NEAR)
    bsub = FAR * NEAR / (FAR - NEAR)
    z_view = np.where(o_hit, bsub / np.maximum(a - d2, 1e-12), np.inf)
    (dx, dy, dz), fwd = camera_rays(cam, W, H)
    cosf = np.asarray(dx * fwd[0] + dy * fwd[1] + dz * fwd[2])
    o_dist = z_view / np.maximum(cosf, 1e-6)

    # Reconstruct the march's legs exactly as march_guided_panorama does.
    eye = jnp.asarray(cam.eye, jnp.float32)
    spec_pre, half_win, az_span = guided_prepass_spec(
        height=H, fov_hint=fov, aspect=W / H, n_steps=1024
    )
    wp, hp = spec_pre.width, spec_pre.height

    e_norm = np.linalg.norm(np.asarray(eye, np.float64))
    ux, uy, uz = np.asarray(eye) / e_norm
    lon0 = math.atan2(float(eye[1]), float(eye[0]))
    lat0 = math.asin(max(-1.0, min(1.0, float(eye[2]) / e_norm)))
    ex_, ey_ = -math.sin(lon0), math.cos(lon0)
    nx0 = -math.sin(lat0) * math.cos(lon0)
    ny0 = -math.sin(lat0) * math.sin(lon0)
    nz0 = math.cos(lat0)
    dxn, dyn, dzn = np.asarray(dx), np.asarray(dy), np.asarray(dz)
    d_e = dxn * ex_ + dyn * ey_
    d_n = dxn * nx0 + dyn * ny0 + dzn * nz0
    d_u = dxn * ux + dyn * uy + dzn * uz
    az = np.arctan2(d_e, d_n)
    el = np.arcsin(np.clip(d_u, -1, 1))
    fwdn = np.asarray(fwd)
    az_c = math.atan2(
        fwdn[0] * ex_ + fwdn[1] * ey_,
        fwdn[0] * nx0 + fwdn[1] * ny0 + fwdn[2] * nz0,
    )
    el_c = math.asin(max(-1.0, min(1.0, float(fwdn[0] * ux + fwdn[1] * uy + fwdn[2] * uz))))

    pre = panorama_crossing_prepass(
        mosaic, eye, spec_pre, azimuth_offset=az_c, elev_offset=el_c
    )
    d_lo = jnp.where(pre["hit"], pre["d_lo"], BIG)
    bound_only = pre["hit"] & (pre["d_hi"] >= 0.98 * FAR)
    d_hi = jnp.where(pre["hit"] & (~bound_only), pre["d_hi"], -BIG)
    m, m_hi, a_max, b_min, b_max = _grouped_bracket_pools(d_lo, d_hi)
    uni_hi = jnp.maximum(a_max, b_max)
    uni_hi = jnp.where(bound_only | (uni_hi <= 0.0), FAR, uni_hi)
    b_max_eff = jnp.where(bound_only, FAR, b_max)
    split = (a_max > 0.0) & (b_min < BIG) & (b_max_eff > b_min)
    tA1 = jnp.where(split, a_max, uni_hi)
    nw_leg = 3
    tB0 = jnp.where(split, jnp.maximum(b_min, a_max), m + (uni_hi - m) * (0.5 / nw_leg))
    tB1 = jnp.where(split, jnp.maximum(b_max_eff, tB0), uni_hi)

    rel_az = (az - az_c + np.pi) % (2 * np.pi) - np.pi
    gx = (rel_az + 0.5 * az_span) / az_span * wp - 0.5
    gy = (half_win - (el - el_c)) / (2 * half_win) * hp - 0.5
    ix = np.clip(np.round(gx).astype(np.int32), 0, wp - 1)
    iy = np.clip(np.round(gy).astype(np.int32), 0, hp - 1)

    mN = np.asarray(m)[iy, ix]
    tA1N = np.asarray(tA1)[iy, ix]
    tB0N = np.asarray(tB0)[iy, ix]
    tB1N = np.asarray(tB1)[iy, ix]
    any_hit = mN < BIG
    bo = np.asarray(bound_only)[iy, ix]

    mrel, mabs = 0.01, 25.0
    inA = (o_dist >= mN * (1 - mrel) - mabs) & (o_dist <= tA1N * (1 + mrel) + mabs)
    inB = (o_dist >= tB0N * (1 - mrel) - mabs) & (o_dist <= tB1N * (1 + mrel) + mabs)

    cls_missbr = bad & o_hit & any_hit & ~(inA | inB)
    cls_nobr = bad & o_hit & ~any_hit
    cls_inleg = bad & o_hit & (inA | inB)
    cls_sky = bad & ~o_hit
    print(f"  oracle-hit, no bracket at all:    {cls_nobr.sum()}")
    print(f"  oracle-hit, outside both legs:    {cls_missbr.sum()}")
    print(f"  oracle-hit, inside a leg:         {cls_inleg.sum()}")
    print(f"  oracle-sky (spurious hit):        {cls_sky.sum()}")
    print(f"  (of bad: mapped to bound-only texel: {(bad & bo).sum()})")

    for name, mask in (("in-leg", cls_inleg), ("miss", cls_missbr)):
        if mask.sum() == 0:
            continue
        both = np.maximum(tA1N - mN, tB1N - tB0N)[mask]
        print(f"  {name}: leg-width p50={np.median(both):.0f} m "
              f"p90={np.percentile(both, 90):.0f} m "
              f"max={both.max():.0f} m; o_dist p50={np.median(o_dist[mask]):.0f} m")

    # Deeper anatomy of the in-leg failures.
    if cls_inleg.sum():
        sp = np.asarray(split)[iy, ix]
        mk = cls_inleg
        wA = (tA1N - mN)[mk]
        wB = (tB1N - tB0N)[mk]
        in_A = inA[mk]
        print(f"  split active for {sp[mk].mean():.1%} of in-leg bad "
              f"(scene-wide split rate {sp[bad | ~bad].mean():.1%})")
        print(f"  legA width p50={np.median(wA):.0f} p90={np.percentile(wA, 90):.0f}; "
              f"legB width p50={np.median(wB):.0f} p90={np.percentile(wB, 90):.0f}")
        print(f"  crossing in legA: {in_A.mean():.1%}")
        offA = (o_dist - mN)[mk]
        offB = (o_dist - tB0N)[mk]
        off = np.where(in_A, offA, offB)
        print(f"  offset into its leg: p50={np.median(off):.0f} "
              f"p90={np.percentile(off, 90):.0f}")
        # The per-TEXEL (unpooled) bracket width at the bad pixels' own
        # texels — how much of the leg width is pooling spread vs the
        # texel's own bracket.
        own_lo = np.asarray(jnp.where(pre["hit"], pre["d_lo"], BIG))[iy, ix][mk]
        own_hi = np.asarray(
            jnp.where(pre["hit"], pre["d_hi"], -BIG)
        )[iy, ix][mk]
        own_w = np.where(own_hi > own_lo, own_hi - own_lo, -1.0)
        has = own_w >= 0
        print(f"  own-texel bracket width: p50={np.median(own_w[has]):.0f} "
              f"p90={np.percentile(own_w[has], 90):.0f} (no own bracket: "
              f"{(~has).mean():.1%})")
        ins = (o_dist[mk] >= own_lo * (1 - mrel) - mabs) & (
            o_dist[mk] <= own_hi * (1 + mrel) + mabs
        )
        print(f"  crossing inside OWN texel bracket: {ins.mean():.1%}")


if __name__ == "__main__":
    main()
