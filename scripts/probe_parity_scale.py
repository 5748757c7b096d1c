"""Parity-at-scale probe: renderer vs WGSL-only oracle at 800x450.

The suite's parity gate (tests/test_parity_independent.py) runs at
160x100 where the measured residual is a single fill-rule pixel. This
probe re-runs the same comparison at the production frame size and a
denser scene so PARITY.md can state the tail at scale, not just at test
scale. CPU-only (oracle is numpy; renderer forced to the CPU backend).
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

t0 = time.time()
c2, d2 = rasterize2(
    np.asarray(mosaic.heights), np.asarray(mosaic.normals), (0.0, 0.0),
    np.asarray(mosaic.model_point), np.asarray(mosaic.pixel_scale), vp,
    np.asarray(cam.eye, np.float64),
    np.asarray(cam.sun_angle.to_vec3(), np.float64), W, H, view_mode=1,
)
print(f"oracle2 {time.time()-t0:.1f}s hits={np.mean(d2 < 1.0):.3f}", flush=True)

for guided in (False, True):
    t0 = time.time()
    out = render_perspective(
        mosaic, cam, width=W, height=H, n_steps=1024, n_refine=26,
        quantize_rt=False, apply_postprocess=False,
        guided=guided, fov_hint=math.radians(45.0) if guided else None,
    )
    got = np.asarray(out["color"])
    err = np.abs(got - c2).max(axis=-1)
    frac_bad = (err > 2.0 / 255.0).mean()
    n_bad = int((err > 2.0 / 255.0).sum())
    print(
        f"guided={guided}: frac>2/255 = {frac_bad:.5%} ({n_bad}/{err.size}) "
        f"median={np.median(err):.2e} p99={np.percentile(err, 99):.2e} "
        f"({time.time()-t0:.1f}s)",
        flush=True,
    )
