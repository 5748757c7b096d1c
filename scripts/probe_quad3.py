"""Lane-shuffled quad march + prepass timings (config 1 budget) on real TPU."""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_probe import eye_at, synthetic_mosaic_device

import math
from functools import partial

from topo_renderer_tpu.models.camera import Camera
from topo_renderer_tpu.ops import raycast as rc
from topo_renderer_tpu.ops.panorama import PanoramaSpec, panorama_crossing_prepass


def bench(label, fn, *args, reps=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:<58s} {ms:9.2f} ms", flush=True)
    return ms


W, H = 800, 450
FOV = math.radians(45.0)


@partial(jax.jit, static_argnames=("nw", "nc", "shuf"))
def wmq(mosaic, eyej, dx, dy, dz, t_min, t_max, any_hit, nw, nc, shuf):
    return rc._window_march_quad(
        mosaic, eyej, (dx, dy, dz), t_min, t_max, any_hit,
        n_window=nw, n_cells=nc, margin_rel=0.01, margin_abs=150.0,
        lane_shuffle=shuf,
    )[1].sum()


@partial(jax.jit, static_argnames=("n_steps", "n_refine", "nw", "supersample"))
def full(mosaic, cam, n_steps=1024, n_refine=24, nw=16, supersample=1.5):
    (dx, dy, dz), fwd = rc.camera_rays(cam, W, H)
    eye = jnp.asarray(cam.eye, jnp.float32)
    hit, t = rc.march_guided_panorama(
        mosaic, eye, (dx, dy, dz), fwd, n_steps=n_steps, n_refine=n_refine,
        fov_hint=FOV, aspect=W / H, n_window=nw, supersample=supersample,
    )
    return t.sum()


def main():
    print("devices:", jax.devices(), flush=True)
    mosaic = synthetic_mosaic_device(n=12001)
    jax.block_until_ready(mosaic.heights_flat)
    eye = eye_at(47.0, 23.0, 2800.0)
    cam = Camera(eye=eye, pitch=-0.05, yaw=0.8)
    eyej = jnp.asarray(cam.eye, jnp.float32)
    (dx, dy, dz), fwd = rc.camera_rays(cam, W, H)

    aspect = W / H
    half_diag = min(math.atan(math.tan(0.5 * FOV) * math.sqrt(1 + aspect**2)), 0.49 * math.pi)
    half_win = min(1.03 * half_diag + 0.01, 0.49 * math.pi)
    az_span = min(2 * math.pi, 2 * half_win / max(math.cos(half_win), 0.3))
    px_per_rad = 1.5 * H / FOV
    wp = max(256, min(int(math.ceil(az_span * px_per_rad / 128.0)) * 128, 8192))
    hp = max(64, min(int(math.ceil(2.0 * half_win * px_per_rad / 8.0)) * 8, 4096))
    spec_pre = PanoramaSpec(
        width=wp, height=hp, n_steps=1024, n_refine=0,
        azimuth_start=-0.5 * az_span, azimuth_span=az_span,
        elev_min=-half_win, elev_max=half_win,
    )
    for cons in (False, True):
        for shuf in (False, True):
            bench(
                f"prepass cons={cons} colshuf={shuf}",
                lambda c=cons, s=shuf: panorama_crossing_prepass(
                    mosaic, eye, spec_pre, conservative=c, col_shuffle=s
                )["d_lo"],
            )

    t_min = jnp.full((H, W), 8000.0, jnp.float32)
    t_max = jnp.full((H, W), 12000.0, jnp.float32)
    any_hit = jnp.ones((H, W), bool)
    for nw, nc, shuf in ((16, 4, False), (16, 4, True), (8, 4, True), (8, 2, True)):
        bench(
            f"window_march_quad nw={nw} nc={nc} shuf={shuf}",
            lambda a=nw, b=nc, s=shuf: wmq(
                mosaic, eyej, dx, dy, dz, t_min, t_max, any_hit, a, b, s
            ),
        )

    bench("FULL march_guided_panorama nw=16 ss=1.5", lambda: full(mosaic, cam))
    bench("FULL nw=12 ss=1.25",
          lambda: full(mosaic, cam, nw=12, supersample=1.25))
    bench("FULL nw=8 ss=1.25",
          lambda: full(mosaic, cam, nw=8, supersample=1.25))
    bench(
        "FULL render_perspective engine-default",
        lambda: rc.render_perspective(
            mosaic, cam, width=W, height=H, n_steps=1024, n_refine=24,
            guided=True, fov_hint=FOV,
        )["color"],
        reps=8,
    )
    print("done", flush=True)


if __name__ == "__main__":
    main()
