"""Fusion-boundary A/B on the frame -> wire-encode handoff. Config 6's
device_ms is 13.9 while the bare barrier-cut frame is 9.3 — a ~4.5 ms tail
for the yuv420 encode, which is ~1 MB of elementwise work (~0.1 ms at HBM
speed-of-light). The handoff is a stacked [H, W, 3] color that
`transport.encode_frame` immediately re-slices into planes — the same
boundary shape probe_warp4 measured doubling the fast frame (stacked
trailing-3 axes use 3/128 VPU lanes wherever XLA materializes them).

Variants in ONE process, identity-checked on the exact u8 wire bytes:
  A  fused frame+encode (current engine behavior)
  B  optimization_barrier on the color stack before the encode

Run: timeout 1800 python scripts/probe_wire_barrier.py
"""

import math
import os
import sys
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_probe import eye_at, synthetic_mosaic_device

from topo_renderer_tpu.models.camera import Camera
from topo_renderer_tpu.ops.raycast import render_perspective_fast
from topo_renderer_tpu.render import transport

W, H = 800, 450
FOV = math.radians(45.0)


def bench(label, fn, reps=30):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:<40s} {ms:8.2f} ms", flush=True)
    return ms


@partial(jax.jit, static_argnames=("mode", "barrier"))
def frame_wire(mosaic, cam, *, mode, barrier):
    color = render_perspective_fast(
        mosaic, cam, width=W, height=H, n_steps=512, fov_hint=FOV
    )["color"]
    if barrier:
        (color,) = jax.lax.optimization_barrier((color,))
    return transport.encode_frame(color, None, mode=mode)


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    mosaic = synthetic_mosaic_device(n=12001)
    jax.block_until_ready(mosaic.heights_flat)
    print(f"mosaic {time.perf_counter() - t0:.1f}s", flush=True)
    cam = Camera(eye=eye_at(47.0, 23.0, 2800.0), pitch=-0.05, yaw=0.8)

    for mode in ("yuv420", "rgb888"):
        ref = np.asarray(frame_wire(mosaic, cam, mode=mode, barrier=False))
        got = np.asarray(frame_wire(mosaic, cam, mode=mode, barrier=True))
        neq = (ref != got).mean()
        print(f"{mode}: wire bytes neq={neq:.4%} (n={ref.size})", flush=True)

    for _round in range(2):
        for mode in ("yuv420", "rgb888"):
            for barrier in (False, True):
                bench(
                    f"{mode} barrier={barrier}",
                    lambda m=mode, b=barrier: frame_wire(
                        mosaic, cam, mode=m, barrier=b
                    ),
                )
    print("done", flush=True)


if __name__ == "__main__":
    main()
