"""Where the fast frame's missing ~7 ms lives: pano alone is 6.9 ms and the
isolated warp (fused build+gather+blend 3.7 + post 1.6) ~5.3 ms, but the one
fused program runs 19-22 ms (probe_warp / probe_warp2). Hypothesis: XLA's
fusion/layout choices across the pano->warp boundary are the cost — the quad
table build fuses into its gather consumer or the pano color relayouts.

Variants, interleaved A/B in one process:
  A. library render_perspective_fast (one program, current behavior);
  B. one program, `lax.optimization_barrier` between the pano outputs and
     the warp (forces materialization at the boundary, keeps ONE dispatch);
  C. two programs: pano -> (packed_rgb, dist) planes, then warp(table rows).

Run: timeout 2400 python scripts/probe_warp4.py
"""

import math
import os
import sys
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_probe import eye_at, synthetic_mosaic_device

from topo_renderer_tpu.models.camera import Camera, depth_from_dist
from topo_renderer_tpu.ops import shading as shd
from topo_renderer_tpu.ops.panorama import render_panorama
from topo_renderer_tpu.ops.postprocess import postprocess_soa
from topo_renderer_tpu.ops.raycast import (
    FAR,
    NEAR,
    camera_rays,
    fast_view_spec,
    render_perspective_fast,
)

W, H = 800, 450
FOV = math.radians(45.0)


def bench(label, fn, reps=30):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:<46s} {ms:8.2f} ms", flush=True)
    return ms


def _ray_grids(camera):
    (dx, dy, dz), fwd = camera_rays(camera, W, H)
    eye = jnp.asarray(camera.eye, jnp.float32)
    e_norm = jnp.linalg.norm(eye)
    ux, uy, uz = eye[0] / e_norm, eye[1] / e_norm, eye[2] / e_norm
    lon0 = jnp.arctan2(eye[1], eye[0])
    lat0 = jnp.arcsin(jnp.clip(eye[2] / e_norm, -1.0, 1.0))
    ex_, ey_ = -jnp.sin(lon0), jnp.cos(lon0)
    nx0 = -jnp.sin(lat0) * jnp.cos(lon0)
    ny0 = -jnp.sin(lat0) * jnp.sin(lon0)
    nz0 = jnp.cos(lat0)
    az = jnp.arctan2(dx * ex_ + dy * ey_, dx * nx0 + dy * ny0 + dz * nz0)
    el = jnp.arcsin(jnp.clip(dx * ux + dy * uy + dz * uz, -1.0, 1.0))
    az_c = jnp.arctan2(
        fwd[0] * ex_ + fwd[1] * ey_, fwd[0] * nx0 + fwd[1] * ny0 + fwd[2] * nz0
    )
    el_c = jnp.arcsin(jnp.clip(fwd[0] * ux + fwd[1] * uy + fwd[2] * uz, -1.0, 1.0))
    cosf = dx * fwd[0] + dy * fwd[1] + dz * fwd[2]
    return eye, az, el, az_c, el_c, cosf


def _pack_pano(pano):
    color = pano["color"]
    enc = jnp.round(jnp.clip(color, 0.0, 1.0) * 1023.0).astype(jnp.uint32)
    packed_rgb = jax.lax.bitcast_convert_type(
        enc[..., 0] | (enc[..., 1] << 10) | (enc[..., 2] << 20), jnp.float32
    )
    return packed_rgb, pano["distance"]


def _warp(packed_rgb, dist_p, az, el, az_c, el_c, cosf, spec, half_win, az_span):
    wp, hp = spec.width, spec.height
    rel_az = (az - az_c + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
    gx = (rel_az + 0.5 * az_span) / az_span * wp - 0.5
    gy = (jnp.float32(half_win) - (el - el_c)) / jnp.float32(2.0 * half_win) * hp - 0.5
    shift_x = lambda a: jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
    shift_y = lambda a: jnp.concatenate([a[1:], a[-1:]], axis=0)
    p00, d00 = packed_rgb, dist_p
    p01, d01 = shift_x(packed_rgb), shift_x(dist_p)
    p10, d10 = shift_y(p00), shift_y(d00)
    p11, d11 = shift_y(p01), shift_y(d01)
    quad = jnp.stack([p00, d00, p01, d01, p10, d10, p11, d11], axis=-1).reshape(-1, 8)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, wp - 2)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, hp - 2)
    fx = jnp.clip(gx - x0, 0.0, 1.0)
    fy = jnp.clip(gy - y0, 0.0, 1.0)
    rows8 = quad[y0 * wp + x0]
    top, bot = rows8[..., 0:4], rows8[..., 4:8]

    def unpack_rgb(v):
        bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
        return tuple(
            ((bits >> s) & 0x3FF).astype(jnp.float32) / 1023.0 for s in (0, 10, 20)
        )

    c00, c01 = unpack_rgb(top[..., 0]), unpack_rgb(top[..., 2])
    c10, c11 = unpack_rgb(bot[..., 0]), unpack_rgb(bot[..., 2])
    chans = tuple(
        (c00[i] * (1 - fx) + c01[i] * fx) * (1 - fy)
        + (c10[i] * (1 - fx) + c11[i] * fx) * fy
        for i in range(3)
    )
    dist = (top[..., 1] * (1 - fx) + top[..., 3] * fx) * (1 - fy) + (
        bot[..., 1] * (1 - fx) + bot[..., 3] * fx
    ) * fy
    hit = dist < 0.98 * FAR
    depth = jnp.where(hit, depth_from_dist(jnp.clip(dist * cosf, NEAR, FAR)), 1.0)
    chans = tuple(shd.quantize_srgb8(c) for c in chans)
    chans = postprocess_soa(chans, depth, pixelize_n=None)
    return jnp.stack(chans, axis=-1), depth


@partial(jax.jit, static_argnames=("barrier",))
def one_program(mosaic, camera, *, barrier: bool):
    eye, az, el, az_c, el_c, cosf = _ray_grids(camera)
    spec, half_win, az_span = fast_view_spec(
        width=W, height=H, fov_hint=FOV, n_steps=512
    )
    sun = camera.sun_angle.to_vec3()
    pano = render_panorama(
        mosaic, eye, spec, sun, quantize_rt=False, apply_postprocess=False,
        azimuth_offset=az_c, elev_offset=el_c,
    )
    packed_rgb, dist_p = _pack_pano(pano)
    if barrier:
        packed_rgb, dist_p, az, el, az_c, el_c, cosf = jax.lax.optimization_barrier(
            (packed_rgb, dist_p, az, el, az_c, el_c, cosf)
        )
    return _warp(packed_rgb, dist_p, az, el, az_c, el_c, cosf, spec, half_win, az_span)


@jax.jit
def pano_program(mosaic, camera):
    eye, az, el, az_c, el_c, cosf = _ray_grids(camera)
    spec, half_win, az_span = fast_view_spec(
        width=W, height=H, fov_hint=FOV, n_steps=512
    )
    sun = camera.sun_angle.to_vec3()
    pano = render_panorama(
        mosaic, eye, spec, sun, quantize_rt=False, apply_postprocess=False,
        azimuth_offset=az_c, elev_offset=el_c,
    )
    packed_rgb, dist_p = _pack_pano(pano)
    return packed_rgb, dist_p, az, el, az_c, el_c, cosf


@jax.jit
def warp_program(packed_rgb, dist_p, az, el, az_c, el_c, cosf):
    spec, half_win, az_span = fast_view_spec(
        width=W, height=H, fov_hint=FOV, n_steps=512
    )
    return _warp(packed_rgb, dist_p, az, el, az_c, el_c, cosf, spec, half_win, az_span)


def two_programs(mosaic, camera):
    return warp_program(*pano_program(mosaic, camera))


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    mosaic = synthetic_mosaic_device(n=12001)
    jax.block_until_ready(mosaic.heights_flat)
    print(f"mosaic {time.perf_counter() - t0:.1f}s", flush=True)
    cam = Camera(eye=eye_at(47.0, 23.0, 2800.0), pitch=-0.05, yaw=0.8)

    import numpy as np

    # Color is quantize_srgb8'd LINEAR f32 in [0,1] (an int cast would
    # truncate everything to 0 and compare nothing): check exact f32 bit
    # equality AND the user-visible u8 delta.
    from topo_renderer_tpu.ops.shading import linear_to_srgb

    def u8(c):
        return np.round(np.asarray(linear_to_srgb(jnp.asarray(c))) * 255.0)

    refc, refd = (np.asarray(x) for x in one_program(mosaic, cam, barrier=False))
    for name, fn in (
        ("barrier", lambda: one_program(mosaic, cam, barrier=True)),
        ("two-prog", two_programs := (lambda: warp_program(*pano_program(mosaic, cam)))),
    ):
        gc, gd = (np.asarray(x) for x in fn())
        bits_neq = (gc.view(np.uint32) != refc.view(np.uint32)).mean()
        du8 = np.abs(u8(gc) - u8(refc)).max()
        dd = np.abs(gd - refd).max()
        print(
            f"{name} vs baseline: f32-bits-neq={bits_neq:.2%} "
            f"max|u8 d|={du8:.0f} max|depth d|={dd:.3e}",
            flush=True,
        )

    variants = [
        ("A one program (library)",
         lambda: render_perspective_fast(
             mosaic, cam, width=W, height=H, n_steps=512, fov_hint=FOV
         )["depth"].sum()),
        ("A' one program (inline copy)",
         lambda: one_program(mosaic, cam, barrier=False)[1].sum()),
        ("B one program + barrier",
         lambda: one_program(mosaic, cam, barrier=True)[1].sum()),
        ("C two programs",
         lambda: two_programs()[1].sum()),
    ]
    for _round in range(2):
        for label, fn in variants:
            bench(label, fn)
    print("done", flush=True)


if __name__ == "__main__":
    main()
