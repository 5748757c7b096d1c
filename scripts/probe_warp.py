"""Decompose the fast frame's warp+postprocess tail (B - A = ~15 ms in
probe_fast_stages, the config-6 device-cost driver).

Candidate stages: the 8-wide quad-table BUILD (a [hp, wp, 8] stack +
reshape — possible T(8,128) relayout trap), the per-pixel row GATHER, the
unpack/bilinear BLEND, and postprocess_soa. Each timed back-to-back in one
process on a production-scale mosaic with the production fast spec.

Run: timeout 2400 python scripts/probe_warp.py
"""

import math
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_probe import eye_at, synthetic_mosaic_device

from topo_renderer_tpu.models.camera import Camera
from topo_renderer_tpu.ops.panorama import render_panorama
from topo_renderer_tpu.ops.raycast import camera_rays, fast_view_spec
from topo_renderer_tpu.ops import shading as shd
from topo_renderer_tpu.ops.postprocess import postprocess_soa

W, H = 800, 450
FOV = math.radians(45.0)


def bench(label, fn, reps=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:<46s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    mosaic = synthetic_mosaic_device(n=12001)
    jax.block_until_ready(mosaic.heights_flat)
    print(f"mosaic {time.perf_counter() - t0:.1f}s", flush=True)
    eye = eye_at(47.0, 23.0, 2800.0)
    cam = Camera(eye=eye, pitch=-0.05, yaw=0.8)
    sun = jnp.array([0.3, 0.5, 0.8], jnp.float32)

    spec, half_win, az_span = fast_view_spec(
        width=W, height=H, fov_hint=FOV, n_steps=512
    )
    wp, hp = spec.width, spec.height
    print(f"fast spec: {wp}x{hp}", flush=True)

    @jax.jit
    def pano_once(mosaic, eye, sun):
        out = render_panorama(
            mosaic, eye, spec, sun, quantize_rt=False,
            apply_postprocess=False,
        )
        return out["color"], out["distance"]

    color, dist_p = jax.block_until_ready(pano_once(mosaic, eye, sun))

    # Per-pixel warp coordinates (traced from the camera; cheap, computed
    # once here so the stage timings isolate the table/gather/blend).
    (dx, dy, dz), fwd = camera_rays(cam, W, H)
    e = jnp.asarray(cam.eye, jnp.float32)
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
    az_c = jnp.arctan2(
        fwd[0] * ex_ + fwd[1] * ey_, fwd[0] * nx0 + fwd[1] * ny0 + fwd[2] * nz0
    )
    el_c = jnp.arcsin(jnp.clip(fwd[0] * ux + fwd[1] * uy + fwd[2] * uz, -1.0, 1.0))
    rel_az = (az - az_c + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
    gx = (rel_az + 0.5 * az_span) / az_span * wp - 0.5
    gy = (jnp.float32(half_win) - (el - el_c)) / jnp.float32(2.0 * half_win) * hp - 0.5
    gx, gy = jax.block_until_ready((gx, gy))

    @jax.jit
    def build_quad(color, dist_p):
        enc = jnp.round(jnp.clip(color, 0.0, 1.0) * 1023.0).astype(jnp.uint32)
        packed_rgb = jax.lax.bitcast_convert_type(
            enc[..., 0] | (enc[..., 1] << 10) | (enc[..., 2] << 20), jnp.float32
        )
        shift_x = lambda a: jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        shift_y = lambda a: jnp.concatenate([a[1:], a[-1:]], axis=0)
        p00, d00 = packed_rgb, dist_p
        p01, d01 = shift_x(packed_rgb), shift_x(dist_p)
        p10, d10 = shift_y(p00), shift_y(d00)
        p11, d11 = shift_y(p01), shift_y(d01)
        return jnp.stack(
            [p00, d00, p01, d01, p10, d10, p11, d11], axis=-1
        ).reshape(-1, 8)

    quad = jax.block_until_ready(build_quad(color, dist_p))
    print(f"quad table: {quad.shape} {quad.nbytes/1e6:.0f} MB", flush=True)

    @jax.jit
    def gather_rows(quad, gx, gy):
        x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, wp - 2)
        y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, hp - 2)
        return quad[y0 * wp + x0]

    rows8 = jax.block_until_ready(gather_rows(quad, gx, gy))

    @jax.jit
    def blend(rows8, gx, gy):
        x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, wp - 2)
        y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, hp - 2)
        fx = jnp.clip(gx - x0, 0.0, 1.0)
        fy = jnp.clip(gy - y0, 0.0, 1.0)
        top, bot = rows8[..., 0:4], rows8[..., 4:8]

        def unpack_rgb(v):
            bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
            return tuple(
                ((bits >> s) & 0x3FF).astype(jnp.float32) / 1023.0
                for s in (0, 10, 20)
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
        return chans[0] + chans[1] + chans[2] + dist

    @jax.jit
    def post_only(chans_r, depth):
        chans = (chans_r, chans_r, chans_r)
        chans = tuple(shd.quantize_srgb8(c) for c in chans)
        return jnp.stack(postprocess_soa(chans, depth, pixelize_n=None), -1)

    depth = jnp.clip(blend(rows8, gx, gy) * 0.0 + 0.5, 0.0, 1.0)
    chan_r = jnp.clip(blend(rows8, gx, gy), 0.0, 1.0)
    jax.block_until_ready((depth, chan_r))

    bench("quad table build", lambda: build_quad(color, dist_p))
    bench("row gather (prebuilt table)", lambda: gather_rows(quad, gx, gy))
    bench("unpack + bilinear blend", lambda: blend(rows8, gx, gy))
    bench("postprocess + srgb", lambda: post_only(chan_r, depth))
    bench(
        "build+gather+blend fused",
        lambda: blend(gather_rows(build_quad(color, dist_p), gx, gy), gx, gy),
    )
    print("done", flush=True)


if __name__ == "__main__":
    main()
