"""Time the quad-track guided exact render (config 1) on real TPU."""

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


def bench(label, fn, reps=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:<56s} {ms:9.2f} ms", flush=True)
    return ms


@partial(jax.jit, static_argnames=("width", "height", "n_steps", "n_window", "n_cells", "supersample"))
def render_quad(mosaic, cam, *, width, height, n_steps, n_window, n_cells, supersample):
    (dx, dy, dz), fwd = rc.camera_rays(cam, width, height)
    eye = jnp.asarray(cam.eye, jnp.float32)
    hit, t_hit = rc.march_guided_panorama(
        mosaic, eye, (dx, dy, dz), fwd, n_steps=n_steps, n_refine=18,
        fov_hint=math.radians(45.0), aspect=width / height,
        n_window=n_window, n_cells=n_cells, supersample=supersample,
    )
    return t_hit.sum()


def main():
    print("devices:", jax.devices(), flush=True)
    mosaic = synthetic_mosaic_device(n=12001)
    jax.block_until_ready(mosaic.heights_flat)
    eye = eye_at(47.0, 23.0, 2800.0)
    cam = Camera(eye=eye, pitch=-0.05, yaw=0.8)
    W, H = 800, 450

    bench(
        "full render guided (engine-default knobs)",
        lambda: rc.render_perspective(
            mosaic, cam, width=W, height=H, n_steps=1024, n_refine=24,
            guided=True, fov_hint=math.radians(45.0),
        )["color"],
    )
    for n_window, n_cells, ss in ((16, 4, 1.5), (12, 4, 1.5), (8, 4, 1.5), (16, 2, 1.5), (16, 4, 1.25)):
        bench(
            f"march only quad nw={n_window} nc={n_cells} ss={ss}",
            lambda nw=n_window, nc=n_cells, s=ss: render_quad(
                mosaic, cam, width=W, height=H, n_steps=1024,
                n_window=nw, n_cells=nc, supersample=s,
            ),
        )
    print("done", flush=True)


if __name__ == "__main__":
    main()
