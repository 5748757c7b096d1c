"""Measure O(one-tile) incremental mosaic updates at production scale.

Builds a ~100-tile-class streaming canvas (engine path) from synthetic
1201^2 tiles, then times add/unload slot updates (the donated
`apply_slot_update` program) — the number NOTES.md quotes against the
round-2 full-rebuild cost (40 s - 9 min at this scale).
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from topo_renderer_tpu.data.coordinate_transform import CoordinateTransform
from topo_renderer_tpu.geo import GeoLocation
from topo_renderer_tpu.render.engine import RenderEngine

N = 1201
PS = 1.0 / (N - 1)


def tile_at(row, col):
    gy = row * (N - 1) + np.arange(N)
    gx = col * (N - 1) + np.arange(N)
    h = (
        1500.0
        + 600.0 * np.sin(0.002 * gx[None, :]) * np.cos(0.0023 * gy[:, None])
        + 240.0 * np.sin(0.013 * gx[None, :] + 1.0) * np.sin(0.011 * gy[:, None])
    ).astype(np.float32)
    lon0 = 20.0 + PS * col * (N - 1)
    lat0 = 49.0 - PS * row * (N - 1)
    return (
        GeoLocation.from_coord(49 - row, 20 + col),
        h,
        CoordinateTransform((0.0, 0.0), (lon0, lat0), (PS, PS)),
    )


def main():
    print("devices:", jax.devices(), flush=True)
    eng = RenderEngine(streaming=True)
    # 3x3 initial neighborhood (the full build sizes the canvas + margin).
    t0 = time.perf_counter()
    for r in range(3):
        for c in range(3):
            loc, h, tr = tile_at(r, c)
            eng.add_terrain(loc, h, tr)
    m = eng.mosaic
    jax.block_until_ready(m.heights_flat)
    print(f"initial 3x3 full build: {time.perf_counter()-t0:.1f} s  canvas {m.shape}", flush=True)

    # Incremental add of a neighbor inside the margin.
    loc, h, tr = tile_at(1, 3)
    t0 = time.perf_counter()
    eng.add_terrain(loc, h, tr)
    m = eng.mosaic
    jax.block_until_ready(m.heights_flat)
    print(f"incremental add (cold compile): {time.perf_counter()-t0:.2f} s", flush=True)

    # Warm adds/unloads.
    for k in range(3):
        eng.unload_terrain(loc)
        t0 = time.perf_counter()
        m = eng.mosaic
        jax.block_until_ready(m.heights_flat)
        un = time.perf_counter() - t0
        eng.add_terrain(loc, h, tr)
        t0 = time.perf_counter()
        m = eng.mosaic
        jax.block_until_ready(m.heights_flat)
        ad = time.perf_counter() - t0
        print(f"warm unload {un*1e3:.0f} ms / add {ad*1e3:.0f} ms", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
