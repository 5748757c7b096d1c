"""Config-1 budget after round-3 reductions (strided bound, nw=8, carried
f_a/f_b, single-gather shading) + nw=8-vs-16 output agreement at scale."""

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

import math
from functools import partial

from topo_renderer_tpu.models.camera import Camera
from topo_renderer_tpu.ops import raycast as rc
from topo_renderer_tpu.ops.panorama import PanoramaSpec, panorama_crossing_prepass


def bench(label, fn, reps=8):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:<58s} {ms:9.2f} ms", flush=True)
    return ms


W, H = 800, 450
FOV = math.radians(45.0)


@partial(jax.jit, static_argnames=("nw", "ss"))
def march_only(mosaic, cam, nw, ss):
    (dx, dy, dz), fwd = rc.camera_rays(cam, W, H)
    eye = jnp.asarray(cam.eye, jnp.float32)
    hit, t = rc.march_guided_panorama(
        mosaic, eye, (dx, dy, dz), fwd, n_steps=1024, n_refine=18,
        fov_hint=FOV, aspect=W / H, n_window=nw, supersample=ss,
    )
    return hit, t


def main():
    print("devices:", jax.devices(), flush=True)
    mosaic = synthetic_mosaic_device(n=12001)
    jax.block_until_ready(mosaic.heights_flat)
    eye = eye_at(47.0, 23.0, 2800.0)
    cam = Camera(eye=eye, pitch=-0.05, yaw=0.8)

    aspect = W / H
    half_diag = min(math.atan(math.tan(0.5 * FOV) * math.sqrt(1 + aspect**2)), 0.49 * math.pi)
    half_win = min(1.03 * half_diag + 0.01, 0.49 * math.pi)
    az_span = min(2 * math.pi, 2 * half_win / max(math.cos(half_win), 0.3))
    for ss in (1.25, 1.5):
        px_per_rad = ss * H / FOV
        wp = max(256, min(int(math.ceil(az_span * px_per_rad / 128.0)) * 128, 8192))
        hp = max(64, min(int(math.ceil(2.0 * half_win * px_per_rad / 8.0)) * 8, 4096))
        spec_pre = PanoramaSpec(
            width=wp, height=hp, n_steps=1024, n_refine=0,
            azimuth_start=-0.5 * az_span, azimuth_span=az_span,
            elev_min=-half_win, elev_max=half_win,
        )
        bench(
            f"prepass ss={ss} ({wp}x{hp}) conservative strided",
            lambda sp=spec_pre: panorama_crossing_prepass(mosaic, eye, sp)["d_lo"],
        )

    h8, t8 = march_only(mosaic, cam, 8, 1.25)
    h16, t16 = march_only(mosaic, cam, 16, 1.5)
    jax.block_until_ready((t8, t16))
    hu8, hu16 = np.asarray(h8), np.asarray(h16)
    tu8, tu16 = np.asarray(t8), np.asarray(t16)
    both = hu8 & hu16
    rel = np.abs(tu8 - tu16)[both] / np.maximum(tu16[both], 1.0)
    print(
        f"nw8/ss1.25 vs nw16/ss1.5 at scale: flips={(hu8 != hu16).mean():.5f} "
        f"relmed={np.median(rel):.2e} p99={np.percentile(rel, 99):.2e}",
        flush=True,
    )

    bench("march nw=8 ss=1.25 (new default)", lambda: march_only(mosaic, cam, 8, 1.25)[1].sum())
    bench("march nw=16 ss=1.5 (old default)", lambda: march_only(mosaic, cam, 16, 1.5)[1].sum())
    bench(
        "FULL render_perspective engine-default",
        lambda: rc.render_perspective(
            mosaic, cam, width=W, height=H, n_steps=1024, n_refine=24,
            guided=True, fov_hint=FOV,
        )["color"],
    )
    print("done", flush=True)


if __name__ == "__main__":
    main()
