"""Prepass ELEVATION supersampling as a round-count lever: elevation rows
share each azimuth column's profile gathers (panorama_crossing_prepass is
O(N + H) per column), so raising the prepass elevation resolution tightens
the 3x3 pooled brackets' angular footprint at near-zero gather cost. If it
buys enough parity, nw=4 (11 rounds) or the union+own rung (9 rounds) can
replace the 13-round default — ~5.5 ms/round on TPU (probe_quad6).

CPU WGSL-oracle parity at 800x450 (same harness as probe_parity_scale2).
Run: timeout 4800 python scripts/probe_elev.py
"""

import dataclasses
import math
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"  # hard-set: the profile exports =axon
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from raster_oracle2 import rasterize2
from test_render import small_scene, yaw_towards, east_at
from topo_renderer_tpu.models.camera import ViewMode
from topo_renderer_tpu.ops.raycast import render_perspective

W, H = 800, 450

mosaic, cam, tile = small_scene(n=97, span_deg=0.08, height_above=500.0)
cam = dataclasses.replace(
    cam, yaw=yaw_towards(cam, east_at(cam)), pitch=-0.1,
    view_mode=ViewMode.NORMALS,
)
vp = np.asarray(cam.build_view_proj_matrix(float(W), float(H)), np.float64)

c2, d2 = rasterize2(
    np.asarray(mosaic.heights), np.asarray(mosaic.normals), (0.0, 0.0),
    np.asarray(mosaic.model_point), np.asarray(mosaic.pixel_scale), vp,
    np.asarray(cam.eye, np.float64),
    np.asarray(cam.sun_angle.to_vec3(), np.float64), W, H, view_mode=1,
)
oracle_hit = d2 < 1.0
print(f"oracle hits={oracle_hit.mean():.3f}", flush=True)

def run(label, guided=True, **kw):
    t0 = time.time()
    out = render_perspective(
        mosaic, cam, width=W, height=H, n_steps=1024, n_refine=26,
        quantize_rt=False, apply_postprocess=False,
        guided=guided, fov_hint=math.radians(45.0),
        guided_kw=tuple(sorted(kw.items())),
    )
    got = np.asarray(out["color"])
    our_hit = np.asarray(out["hit"])
    err = np.abs(got - c2).max(axis=-1)
    bad = err > 2.0 / 255.0
    flip = bad & (our_hit != oracle_hit)
    print(
        f"{label}: bad={bad.mean():.5%} ({bad.sum()}) "
        f"flips={flip.sum()} ({time.time()-t0:.1f}s)",
        flush=True,
    )
    return bad


run("floor (unguided)          ", guided=False)
run("DEFAULT nw=6 13r es1.0    ", guided=True)
run("nw=6 13r es2.0            ", guided=True, elev_supersample=2.0)
run("nw=4 11r es1.0            ", guided=True, n_window=4)
run("nw=4 11r es2.0            ", guided=True, n_window=4, elev_supersample=2.0)
run("nw=4 11r es3.0            ", guided=True, n_window=4, elev_supersample=3.0)
run("union nw=3 9r es1.0       ", guided=True, split_brackets=False, n_window=3)
run("union nw=3 9r es2.0       ", guided=True, split_brackets=False,
    n_window=3, elev_supersample=2.0)
