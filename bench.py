"""Driver benchmark: one JSON line, all five BASELINE.md configs.

The headline metric (top-level keys) is BASELINE config 4 — wide-area
~100-tile terrain, 4096x1024 360-degree panorama with atmospheric shading on
one chip, target <= 16 ms. ``vs_baseline`` = target_ms / measured_ms (>= 1
means the target is met; higher is better).

The ``configs`` key carries all five BASELINE configs so the driver's
BENCH_r{N}.json can catch regressions outside the headline mode:

  1. exact-parity perspective frame, 800x450 (parity target — no perf number
     in BASELINE; tracked so the exact path can't silently regress)
  2. 2048x512 360-degree panorama with distance fog ("correct + fast")
  3. peak-label pass: on-device projection + depth-gather occlusion + host
     greedy row layout for 512 peaks
  4. the headline atmospheric panorama
  5. batched throughput: 256 viewpoints, 1024x256 panoramas (>= 256/s)

Terrain is generated on device (12001^2 texels — ~100 COP-90 tiles of
3-arcsec data, ~5 GB of tables) to keep the benchmark independent of
host->device tunnel bandwidth; the clipmap makes render cost independent of
the loaded-tile count.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_MS = 16.0  # config 4
TARGET_PANOS_PER_S = 256.0  # config 5


def _sustained_ms(run, reps=20):
    jax.block_until_ready(run())  # compile
    t0 = time.perf_counter()
    outs = [run() for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import sys

    sys.path.insert(0, "scripts")
    from perf_probe import eye_at, synthetic_mosaic_device

    from topo_renderer_tpu.models.camera import Camera
    from topo_renderer_tpu.ops.labels import peak_visibility_panorama
    from topo_renderer_tpu.ops.panorama import (
        PanoramaSpec,
        extract_clipmap_windows,
        render_panorama,
    )
    from topo_renderer_tpu.ops.raycast import render_perspective
    from topo_renderer_tpu.render import text as text_mod

    mosaic = synthetic_mosaic_device(n=12001)
    jax.block_until_ready(mosaic.heights_flat)

    eye = eye_at(47.0, 23.0, 2800.0)  # mosaic center
    sun = jnp.array([0.3, 0.5, 0.8], jnp.float32)
    configs = []

    # ---- config 4 (headline): 4096x1024 atmospheric panorama, LOD fast ----
    spec4 = PanoramaSpec.fast(width=4096, height=1024, n_steps=512)

    def run4():
        # Two-program path (like render/engine.py): window extraction keeps
        # the full tables out of the render program's parameter uses, so XLA
        # doesn't re-stream them cross-program-prefetching every frame.
        win = extract_clipmap_windows(mosaic, eye, spec4)
        return render_panorama(
            mosaic, eye, spec4, sun, fog="atmosphere", windows=win
        )

    ms4 = _sustained_ms(lambda: run4()["color"])
    configs.append(
        {
            "config": 4,
            "metric": "ms per 4096x1024 panorama (atmospheric shading, 1 chip)",
            "value": round(ms4, 2),
            "unit": "ms",
            "target": TARGET_MS,
            "vs_baseline": round(TARGET_MS / ms4, 4),
        }
    )

    # ---- config 2: 2048x512 panorama, distance fog ----
    spec2 = PanoramaSpec.fast(width=2048, height=512, n_steps=512)

    def run2():
        win = extract_clipmap_windows(mosaic, eye, spec2)
        return render_panorama(
            mosaic, eye, spec2, sun, fog="distance", windows=win
        )["color"]

    ms2 = _sustained_ms(run2)
    configs.append(
        {
            "config": 2,
            "metric": "ms per 2048x512 panorama (distance fog)",
            "value": round(ms2, 2),
            "unit": "ms",
            "target": None,
            "vs_baseline": None,
        }
    )

    # ---- config 3: peak-label pass on the config-4 depth buffer ----
    # 512 synthetic peaks scattered around the viewpoint; the pass is
    # projection + depth-gather occlusion on device, then the reference's
    # greedy multi-row layout on host (text_renderer.rs:300-372 semantics).
    rng = np.random.default_rng(7)
    P = 512
    lat = 47.0 + rng.uniform(-0.9, 0.9, P)
    lon = 23.0 + rng.uniform(-0.9, 0.9, P)
    alt = rng.uniform(800.0, 3200.0, P)
    peaks = np.stack(
        [np.asarray(eye_at(a, o, h)) for a, o, h in zip(lat, lon, alt)]
    ).astype(np.float32)
    pos = jnp.asarray(peaks)
    valid = jnp.ones((P,), bool)
    depth4 = run4()["depth"]
    jax.block_until_ready(depth4)
    names = [f"Peak {i}" for i in range(P)]

    def run3():
        vis = peak_visibility_panorama(
            pos, valid, eye, spec4, depth4, tolerance_rel=0.05
        )
        packed = np.asarray(
            jnp.stack([vis["visible"].astype(jnp.int32), vis["x"], vis["y"]])
        )
        visible, xs, ys = packed[0].astype(bool), packed[1], packed[2]
        from topo_renderer_tpu.geo import GeoLocation

        loc = GeoLocation.from_coord(47, 23)
        labels = {
            loc: [
                (i, (int(xs[i]), int(ys[i])))
                for i in range(P)
                if visible[i]
            ]
        }
        return text_mod.layout_labels(
            labels, lambda _loc, i: text_mod.measure_text(names[i])
        )

    run3()  # warm (jit + font load)
    t0 = time.perf_counter()
    reps3 = 20
    n_laid = 0
    for _ in range(reps3):
        n_laid = len(run3())
    ms3 = (time.perf_counter() - t0) / reps3 * 1e3
    configs.append(
        {
            "config": 3,
            "metric": f"ms per label pass (512 peaks -> {n_laid} laid out)",
            "value": round(ms3, 2),
            "unit": "ms",
            "target": None,
            "vs_baseline": None,
        }
    )

    # ---- config 5: batched throughput, 256 viewpoints at 1024x256 ----
    spec5 = PanoramaSpec.fast(width=1024, height=256, n_steps=512)
    B = 256
    eyes = [
        eye_at(47.0 + float(a), 23.0 + float(o), 2500.0)
        for a, o in zip(
            rng.uniform(-0.8, 0.8, B), rng.uniform(-0.8, 0.8, B)
        )
    ]

    from topo_renderer_tpu.ops.panorama import render_batch_scan

    eyes_arr = jnp.stack(eyes)
    suns5 = jnp.broadcast_to(sun, (B, 3))

    def run5():
        # One program for the whole batch: device-side scan over per-eye
        # extract+render (single dispatch, single-eye gather locality).
        return render_batch_scan(mosaic, eyes_arr, suns5, spec5, fog="atmosphere")

    jax.block_until_ready(run5())  # compile
    t0 = time.perf_counter()
    jax.block_until_ready(run5())
    panos_per_s = B / (time.perf_counter() - t0)
    configs.append(
        {
            "config": 5,
            "metric": "1024x256 panoramas/sec (256 viewpoints, 1 chip)",
            "value": round(panos_per_s, 1),
            "unit": "panoramas/s",
            "target": TARGET_PANOS_PER_S,
            "vs_baseline": round(panos_per_s / TARGET_PANOS_PER_S, 4),
        }
    )

    # ---- config 1: exact-parity perspective frame, 800x450 ----
    cam = Camera(eye=eye, pitch=-0.05, yaw=0.8)

    import math

    def run1():
        return render_perspective(
            mosaic, cam, width=800, height=450, n_steps=1024, n_refine=24,
            guided=True, fov_hint=math.radians(45.0),
        )["color"]

    ms1 = _sustained_ms(run1, reps=3)
    configs.append(
        {
            "config": 1,
            "metric": "ms per exact 800x450 perspective frame (guided march)",
            "value": round(ms1, 1),
            "unit": "ms",
            "target": None,
            "vs_baseline": None,
        }
    )

    configs.sort(key=lambda c: c["config"])
    print(
        json.dumps(
            {
                "metric": "ms per 4096x1024 panorama (atmospheric shading, 1 chip)",
                "value": round(ms4, 2),
                "unit": "ms",
                "vs_baseline": round(TARGET_MS / ms4, 4),
                "configs": configs,
            }
        )
    )


if __name__ == "__main__":
    main()
