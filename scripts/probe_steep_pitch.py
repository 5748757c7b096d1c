"""Measure the steep-pitch / patch-edge guided parity tail (CPU oracle).

The round-3 characterization (PARITY.md "Known scoped weakness"): a steep
look-down at a small patch turns ~10% of hit prepass texels bound-only
([d_lo, FAR] brackets) and the guided tail grows to ~2% of pixels outside
2/255 (union pooling 2.7%; dense-march floor 0.06%). Round 4's finite
bound-only d_hi (shell exit + mosaic column exit,
`ops/panorama.py::panorama_crossing_prepass`) collapses those brackets to
the patch edge; this probe reports the measured tail for the shipped knob
ladder so the regression gate (`tests/test_parity_scale.py`) can be pinned
near the new floor.

Run: JAX_PLATFORMS=cpu python scripts/probe_steep_pitch.py
"""

import dataclasses
import math
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from tests.helpers import east_at, small_scene, yaw_towards  # noqa: E402
from tests.raster_oracle2 import rasterize2  # noqa: E402
from topo_renderer_tpu.models.camera import ViewMode  # noqa: E402
from topo_renderer_tpu.ops.raycast import render_perspective  # noqa: E402

W, H = 400, 225


def main():
    mosaic, cam, _tile = small_scene(n=73, span_deg=0.06, height_above=1200.0)
    cam = dataclasses.replace(
        cam, yaw=yaw_towards(cam, east_at(cam)) + 0.9, pitch=-0.22,
        view_mode=ViewMode.NORMALS,
    )
    vp = np.asarray(cam.build_view_proj_matrix(float(W), float(H)), np.float64)
    c2, d2 = rasterize2(
        np.asarray(mosaic.heights), np.asarray(mosaic.normals), (0.0, 0.0),
        np.asarray(mosaic.model_point), np.asarray(mosaic.pixel_scale), vp,
        np.asarray(cam.eye, np.float64),
        np.asarray(cam.sun_angle.to_vec3(), np.float64), W, H, view_mode=1,
    )
    print(f"terrain coverage: {(d2 < 1.0).mean():.3f}", flush=True)

    ladder = [
        ("unguided", False, ()),
        ("DEFAULT nw=6 ss1.0", True, ()),
        ("nw=4 (11 rounds)", True, (("n_window", 4),)),
        ("union nw=3 (9 rnds)", True,
         (("split_brackets", False), ("n_window", 3))),
        ("r3 split (no own)", True,
         (("guard_legs", False), ("supersample", 1.1))),
        ("saturated nw=32", True, (("n_window", 32),)),
    ]
    for name, guided, kw in ladder:
        out = render_perspective(
            mosaic, cam, width=W, height=H, n_steps=1024, n_refine=26,
            quantize_rt=False, apply_postprocess=False,
            guided=guided, fov_hint=math.radians(45.0), guided_kw=kw,
        )
        err = np.abs(np.asarray(out["color"]) - c2).max(axis=-1)
        frac_bad = (err > 2.0 / 255.0).mean()
        print(f"{name:>22}: {frac_bad:.4%} pixels >2/255, "
              f"median {np.median(err):.2e}", flush=True)


if __name__ == "__main__":
    main()
