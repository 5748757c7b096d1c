"""Back-to-back A/B: origin-relative raster mapping vs the old degrees chain.

Bench-to-bench TPU timings vary ~±50% with tunnel state (NOTES), so the only
trustworthy comparison of `surface.raster_from_ecef` (new) against the old
``degrees(atan2) - model_point`` chain is interleaved runs in ONE process.
Both variants are traced through FRESH jit wrappers around the unjitted
render entry points, with the mapping monkeypatched per trace (the callers
resolve ``raster_from_ecef`` from their module globals at trace time).
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

from perf_probe import eye_at, synthetic_mosaic_device


def old_raster_from_ecef(mosaic, px, py, pz, r):
    from topo_renderer_tpu.ops.surface import raster_from_geo

    lat = jnp.degrees(jnp.arcsin(jnp.clip(pz / r, -1.0, 1.0)))
    lon = jnp.degrees(jnp.arctan2(py, px))
    return raster_from_geo(mosaic, lon, lat)


def main():
    import math

    from topo_renderer_tpu.models.camera import Camera
    from topo_renderer_tpu.ops import panorama as pan_mod
    from topo_renderer_tpu.ops import raycast as ray_mod
    from topo_renderer_tpu.ops.panorama import PanoramaSpec
    from topo_renderer_tpu.ops.surface import raster_from_ecef as new_map

    print("building mosaic...", flush=True)
    t0 = time.perf_counter()
    mosaic = synthetic_mosaic_device(n=12001)
    jax.block_until_ready(mosaic.heights_flat)
    print(f"mosaic {time.perf_counter() - t0:.1f}s", flush=True)

    eye = eye_at(47.0, 23.0, 2800.0)
    sun = jnp.array([0.3, 0.5, 0.8], jnp.float32)
    cam = Camera(eye=eye, pitch=-0.05, yaw=0.8)
    fov = math.radians(45.0)
    spec4 = PanoramaSpec.fast(width=4096, height=1024, n_steps=512)

    raw_persp = ray_mod.render_perspective.__wrapped__
    raw_pano = pan_mod.render_panorama.__wrapped__
    raw_extract = pan_mod.extract_clipmap_windows.__wrapped__

    def make_variant(mapping):
        """Fresh jits of config-1 (exact guided) and config-4 (pano fast)
        with `mapping` patched into the hot modules during trace."""

        def patched(fn):
            def call(*a, **k):
                ray_mod.raster_from_ecef = mapping
                pan_mod.raster_from_ecef = mapping
                try:
                    return fn(*a, **k)
                finally:
                    ray_mod.raster_from_ecef = new_map
                    pan_mod.raster_from_ecef = new_map

            return call

        c1 = jax.jit(
            patched(
                lambda m, c: raw_persp(
                    m, c, width=800, height=450, n_steps=1024, n_refine=24,
                    guided=True, fov_hint=fov,
                )["color"]
            )
        )
        c4 = jax.jit(
            patched(
                lambda m, e, s: raw_pano(
                    m, e, spec4, s, fog="atmosphere",
                    windows=raw_extract(m, e, spec4),
                )["color"]
            )
        )
        return c1, c4

    new_c1, new_c4 = make_variant(new_map)
    old_c1, old_c4 = make_variant(old_raster_from_ecef)

    print("compiling 4 programs...", flush=True)
    for f, args in [
        (new_c1, (mosaic, cam)), (old_c1, (mosaic, cam)),
        (new_c4, (mosaic, eye, sun)), (old_c4, (mosaic, eye, sun)),
    ]:
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        print(f"  compile+run {time.perf_counter() - t0:.1f}s", flush=True)

    def sustained(f, args, reps):
        jax.block_until_ready(f(*args))
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(reps)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / reps * 1e3

    # Interleave rounds so tunnel drift cancels.
    for rnd in range(3):
        a1 = sustained(new_c1, (mosaic, cam), 8)
        b1 = sustained(old_c1, (mosaic, cam), 8)
        a4 = sustained(new_c4, (mosaic, eye, sun), 20)
        b4 = sustained(old_c4, (mosaic, eye, sun), 20)
        print(
            f"round {rnd}: c1 new {a1:.1f} old {b1:.1f} ms | "
            f"c4 new {a4:.2f} old {b4:.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
