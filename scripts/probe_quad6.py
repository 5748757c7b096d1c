"""Gate + time the split-bracket march candidates on the TPU at production
scale (follow-up to probe_quad5; see also probe_parity_scale2 for the
CPU-oracle numbers that motivated them: split nw=8 marg25 cuts the
silhouette parity tail 799 -> 300 bad pixels at 800x450).

Reference for the quality gate: nw=16 ss=1.5 nc=4 marg150 nosplit (the
conservative budget probe_quad4/5 gated against). Timings back-to-back in
ONE process.
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
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_probe import eye_at, synthetic_mosaic_device

from topo_renderer_tpu.models.camera import Camera
from topo_renderer_tpu.ops import raycast as rc

W, H = 800, 450
FOV = math.radians(45.0)


@partial(jax.jit, static_argnames=("nw", "ss", "nc", "split", "marg", "guard", "ng", "bs"))
def march_only(mosaic, cam, nw, ss, nc, split, marg, guard=True, ng=2, bs=4):
    (dx, dy, dz), fwd = rc.camera_rays(cam, W, H)
    eye = jnp.asarray(cam.eye, jnp.float32)
    return rc.march_guided_panorama(
        mosaic, eye, (dx, dy, dz), fwd, n_steps=1024, n_refine=18,
        fov_hint=FOV, aspect=W / H, n_window=nw, supersample=ss, n_cells=nc,
        split_brackets=split, margin_abs=marg,
        guard_legs=guard, nw_guard=ng, bound_stride=bs,
    )


def bench(label, fn, reps=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:<44s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    mosaic = synthetic_mosaic_device(n=12001)
    jax.block_until_ready(mosaic.heights_flat)
    print(f"mosaic {time.perf_counter() - t0:.1f}s", flush=True)
    eye = eye_at(47.0, 23.0, 2800.0)
    cams = [
        Camera(eye=eye, pitch=-0.05, yaw=0.8),
        Camera(eye=eye, pitch=-0.02, yaw=2.1),
        Camera(eye=eye_at(46.6, 22.5, 1400.0), pitch=-0.10, yaw=-0.6),
    ]

    # (label, nw, ss, nc, split, marg, guard, ng, bs) — round-4 guard-leg
    # candidates vs the round-3 shipped split march (CPU-oracle numbers in
    # probe_parity_scale2/probe_steep_pitch logs; this gates TPU flips +
    # back-to-back time).
    variants = [
        ("r3 shipped split nw=6 ss1.1", 6, 1.1, 2, True, 25.0, False, 2, 4),
        ("DEFAULT guard nw=6 ss1.0", 6, 1.0, 2, True, 25.0, True, 2, 4),
        ("rung nw=4 ss1.0", 4, 1.0, 2, True, 25.0, True, 2, 4),
        ("rung union nw=3 ss1.0", 3, 1.0, 2, False, 25.0, True, 2, 4),
    ]

    for ci, cam in enumerate(cams):
        hr, tr = march_only(mosaic, cam, 16, 1.5, 4, False, 150.0)
        hr, tr = np.asarray(hr), np.asarray(tr)
        for label, nw, ss, nc, sp, mg, gd, ng, bs in variants:
            h, t = march_only(mosaic, cam, nw, ss, nc, sp, mg, gd, ng, bs)
            h, t = np.asarray(h), np.asarray(t)
            both = h & hr
            rel = np.abs(t - tr)[both] / np.maximum(tr[both], 1.0)
            print(
                f"cam{ci} {label:<36s} flips={(h != hr).mean():.5f} "
                f"relmed={np.median(rel):.2e} p99={np.percentile(rel, 99):.2e} "
                f"pmax={rel.max():.2e}",
                flush=True,
            )

    cam = cams[0]
    for label, nw, ss, nc, sp, mg, gd, ng, bs in variants:
        bench(
            f"march {label}",
            lambda nw=nw, ss=ss, nc=nc, sp=sp, mg=mg, gd=gd, ng=ng, bs=bs:
                march_only(mosaic, cam, nw, ss, nc, sp, mg, gd, ng, bs)[1].sum(),
        )
    bench("march r3 shipped (re-run)",
          lambda: march_only(mosaic, cam, 6, 1.1, 2, True, 25.0, False)[1].sum())
    bench("march DEFAULT (re-run)",
          lambda: march_only(mosaic, cam, 6, 1.0, 2, True, 25.0)[1].sum())
    print("done", flush=True)


if __name__ == "__main__":
    main()
