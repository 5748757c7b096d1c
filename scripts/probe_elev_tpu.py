"""TPU cost of prepass ELEVATION supersampling (quality side: probe_elev's
CPU WGSL-oracle ladder). Elevation rows share each azimuth column's profile
gathers, so es should cost ~0 extra gathers — but the crossing kernel and
the prepass output arrays are O(hp), so measure, don't assume. If es=2.0
makes nw=4 (11 rounds) or union nw=3 (9 rounds) parity-eligible, the march
saves ~2-4 rounds x ~5.5 ms/round (probe_quad6).

Timings back-to-back in ONE process. Run: timeout 2400 python scripts/probe_elev_tpu.py
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
from topo_renderer_tpu.ops.panorama import panorama_crossing_prepass

W, H = 800, 450
FOV = math.radians(45.0)


@partial(jax.jit, static_argnames=("nw", "es", "split"))
def march_only(mosaic, cam, nw, es, split=True):
    (dx, dy, dz), fwd = rc.camera_rays(cam, W, H)
    eye = jnp.asarray(cam.eye, jnp.float32)
    return rc.march_guided_panorama(
        mosaic, eye, (dx, dy, dz), fwd, n_steps=1024, n_refine=18,
        fov_hint=FOV, aspect=W / H, n_window=nw, supersample=1.0,
        elev_supersample=es, n_cells=2, split_brackets=split,
        margin_abs=25.0, guard_legs=True, nw_guard=2, bound_stride=4,
    )


@partial(jax.jit, static_argnames=("es",))
def prepass_only(mosaic, cam, es):
    spec_pre, _, _ = rc.guided_prepass_spec(
        height=H, fov_hint=FOV, aspect=W / H, n_steps=1024,
        supersample=1.0, elev_supersample=es,
    )
    eye = jnp.asarray(cam.eye, jnp.float32)
    return panorama_crossing_prepass(mosaic, eye, spec_pre)


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
    cam = Camera(eye=eye_at(47.0, 23.0, 2800.0), pitch=-0.05, yaw=0.8)

    # Flips gate vs the conservative budget at es=1.0 is probe_quad6's job;
    # here gate es variants against their own es=1.0 knob-mates.
    for nw, split, name in ((6, True, "nw=6"), (4, True, "nw=4"), (3, False, "union3")):
        h1, t1 = march_only(mosaic, cam, nw, 1.0, split)
        h1, t1 = np.asarray(h1), np.asarray(t1)
        for es in (2.0, 3.0):
            h, t = march_only(mosaic, cam, nw, es, split)
            h, t = np.asarray(h), np.asarray(t)
            both = h & h1
            rel = np.abs(t - t1)[both] / np.maximum(t1[both], 1.0)
            print(
                f"{name} es{es}: flips-vs-es1={(h != h1).mean():.5f} "
                f"relmed={np.median(rel):.2e} p99={np.percentile(rel, 99):.2e}",
                flush=True,
            )

    for es in (1.0, 2.0, 3.0):
        spec, _, _ = rc.guided_prepass_spec(
            height=H, fov_hint=FOV, aspect=W / H, n_steps=1024,
            supersample=1.0, elev_supersample=es,
        )
        print(f"es={es}: prepass {spec.width}x{spec.height}", flush=True)
        bench(f"prepass es={es}", lambda es=es: prepass_only(mosaic, cam, es)[1].sum())

    for _round in range(2):
        bench("march DEFAULT nw=6 es1.0", lambda: march_only(mosaic, cam, 6, 1.0)[1].sum())
        bench("march nw=6 es2.0", lambda: march_only(mosaic, cam, 6, 2.0)[1].sum())
        bench("march nw=4 es2.0", lambda: march_only(mosaic, cam, 4, 2.0)[1].sum())
        bench("march union nw=3 es2.0", lambda: march_only(mosaic, cam, 3, 2.0, False)[1].sum())
    print("done", flush=True)


if __name__ == "__main__":
    main()
