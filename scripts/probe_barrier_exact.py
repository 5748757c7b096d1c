"""Fusion-boundary A/B for the EXACT path, after probe_warp4 found the
fast frame's pano->warp boundary was doubling the whole program (18.7 ->
9.3 ms from ONE optimization_barrier, bit-identical). The exact frame has
the same two boundary shapes: prepass/pooling -> march (column marcher
feeding a gather loop, knob `march_guided_panorama(fusion_barrier=...)`)
and march -> attrs/shade/post (gather loop feeding elementwise+gather
tail, knob `render_perspective(fusion_barrier=...)`). Bench r5 stage
split says the shade/attrs tail above the 71.6 ms march is ~28 ms — the
same smell.

Variants interleaved in ONE process at engine-default knobs:
  base  no barriers            M  march->shade barrier only
  P     prepass->march only    MP both

Run: timeout 2400 python scripts/probe_barrier_exact.py
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
from topo_renderer_tpu.ops.raycast import render_perspective

W, H = 800, 450
FOV = math.radians(45.0)


def bench(label, fn, reps=12):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:<28s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    mosaic = synthetic_mosaic_device(n=12001)
    jax.block_until_ready(mosaic.heights_flat)
    print(f"mosaic {time.perf_counter() - t0:.1f}s", flush=True)
    cam = Camera(eye=eye_at(47.0, 23.0, 2800.0), pitch=-0.05, yaw=0.8)

    def frame(shade_barrier, march_barrier):
        gk = (("fusion_barrier", True),) if march_barrier else ()
        return render_perspective(
            mosaic, cam, width=W, height=H, n_steps=1024, n_refine=18,
            guided=True, fov_hint=FOV, guided_kw=gk,
            fusion_barrier=shade_barrier,
        )

    variants = [
        ("base (no barriers)", False, False),
        ("M march->shade", True, False),
        ("P prepass->march", False, True),
        ("MP both", True, True),
    ]
    # Color is quantize_srgb8'd LINEAR f32 in [0,1]: compare exact f32
    # bits AND the user-visible u8 delta (an int cast would compare
    # nothing — the original probe_warp4 made that mistake).
    import jax.numpy as jnp

    from topo_renderer_tpu.ops.shading import linear_to_srgb

    def u8(c):
        return np.round(np.asarray(linear_to_srgb(jnp.asarray(c))) * 255.0)

    ref = frame(False, False)
    refc, refd = np.asarray(ref["color"]), np.asarray(ref["depth"])
    for name, sb, mb in variants[1:]:
        got = frame(sb, mb)
        gc, gd = np.asarray(got["color"]), np.asarray(got["depth"])
        bits_neq = (gc.view(np.uint32) != refc.view(np.uint32)).mean()
        du8 = np.abs(u8(gc) - u8(refc))
        dd = np.abs(gd - refd).max()
        print(
            f"{name} vs base: f32-bits-neq={bits_neq:.3%} "
            f"max|u8 d|={du8.max():.0f} u8>0={(du8.max(-1) > 0).mean():.4%} "
            f"max|depth d|={dd:.3e}",
            flush=True,
        )

    for _round in range(2):
        for name, sb, mb in variants:
            bench(name, lambda sb=sb, mb=mb: frame(sb, mb)["depth"].sum())
    print("done", flush=True)


if __name__ == "__main__":
    main()
