"""Stage-split the interactive fast frame (config 6's device cost).

The 800x450 fast frame costs ~18-20 ms device-side while the 4096x1024
atmospheric panorama (10x the pixels) costs ~8.5 ms — so the overhead is
NOT the panorama marcher. Candidate stages: the frustum panorama at the
fast spec (smaller but taller-stepped than config 4's), the 2x2-packed
bilinear warp (one row gather per pixel), postprocess/sRGB, and the wire
encode. Back-to-back sustained timings in ONE process; run on TPU.

Run: timeout 2400 python scripts/probe_fast_stages.py
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
from topo_renderer_tpu.ops.panorama import (
    extract_clipmap_windows,
    render_panorama,
)
from topo_renderer_tpu.ops.raycast import (
    camera_rays,
    fast_view_spec,
    render_perspective_fast,
)
from topo_renderer_tpu.render.engine import _frame_wire
from topo_renderer_tpu.render import transport

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

    spec, _, _ = fast_view_spec(width=W, height=H, fov_hint=FOV, n_steps=512)
    print(f"fast spec: {spec.width}x{spec.height} steps={spec.n_steps}",
          flush=True)

    # Stage A: the frustum panorama alone (two-program, like production).
    @jax.jit
    def pano_only(mosaic, eye, sun):
        win = extract_clipmap_windows(mosaic, eye, spec)
        return render_panorama(
            mosaic, eye, spec, sun, quantize_rt=False,
            apply_postprocess=False, windows=win,
        )["color"]

    bench("A frustum panorama only", lambda: pano_only(mosaic, eye, sun))

    # Stage B: the full fast frame (pano + warp + postprocess).
    bench(
        "B render_perspective_fast",
        lambda: render_perspective_fast(
            mosaic, cam, width=W, height=H, n_steps=512, fov_hint=FOV
        )["color"],
    )

    # Stage C: + wire encode (the production serving program).
    bench(
        "C fast frame + yuv420 wire",
        lambda: _frame_wire(
            mosaic, cam, width=W, height=H, n_steps=512, n_refine=0,
            pixelize_n=None, fov_hint=FOV, fast=True, guided=False,
            wire_mode="yuv420",
        )[1],
    )

    # Warp-only estimate: a fixed pano input, jitted warp by re-running the
    # fast path on a tiny-step pano is entangled; instead report B - A as
    # warp + postprocess and C - B as the encode.
    print("done", flush=True)


if __name__ == "__main__":
    main()
