"""Fast-frame supersample ladder: the frustum pano renders 4.5x the output
pixel count at the default supersample=1.25 (1536x1056 for 800x450) and the
pano is the largest stage of the fast frame (probe_fast_stages: 6.9 of
21.9 ms). Time render_perspective_fast across supersample rungs and measure
the image cost vs a 1.5x reference (mean |Δluma| and fraction of pixels
>2/255) — if 1.0 is visually negligible it becomes the serving default.

Run: timeout 2400 python scripts/probe_warp3.py
"""

import math
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_probe import eye_at, synthetic_mosaic_device

from topo_renderer_tpu.models.camera import Camera
from topo_renderer_tpu.ops.raycast import fast_view_spec, render_perspective_fast

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
    cams = [
        Camera(eye=eye_at(47.0, 23.0, 2800.0), pitch=-0.05, yaw=0.8),
        Camera(eye=eye_at(46.6, 22.5, 1400.0), pitch=-0.10, yaw=-0.6),
    ]

    def frame(cam, ss):
        return render_perspective_fast(
            mosaic, cam, width=W, height=H, n_steps=512, fov_hint=FOV,
            supersample=ss,
        )["color"]

    ref = {i: np.asarray(frame(c, 1.5)) for i, c in enumerate(cams)}
    for ss in (1.25, 1.0, 0.85):
        spec, _, _ = fast_view_spec(
            width=W, height=H, fov_hint=FOV, n_steps=512, supersample=ss
        )
        for i, cam in enumerate(cams):
            got = np.asarray(frame(cam, ss))
            d = np.abs(got.astype(np.int32) - ref[i].astype(np.int32))
            print(
                f"ss={ss} cam{i} pano={spec.width}x{spec.height} "
                f"mean|d|={d.mean():.3f}/255 "
                f">2/255={(d.max(-1) > 2).mean():.4%} "
                f">8/255={(d.max(-1) > 8).mean():.4%}",
                flush=True,
            )
    for ss in (1.5, 1.25, 1.0, 0.85):
        bench(f"fast frame ss={ss}", lambda ss=ss: frame(cams[0], ss))
    print("done", flush=True)


if __name__ == "__main__":
    main()
