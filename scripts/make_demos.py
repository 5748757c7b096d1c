"""Render demo images into docs/ (synthetic alpine terrain, runs on TPU or CPU)."""

import os
import pathlib
import sys

# Repo root + scripts dir on sys.path regardless of cwd (PYTHONPATH would
# break the axon PJRT plugin discovery — see scripts/stage_probe.py).
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import jax
import jax.numpy as jnp
import numpy as np

DOCS = pathlib.Path(__file__).resolve().parent.parent / "docs"


def main():
    from perf_probe import eye_at, synthetic_mosaic_device

    from topo_renderer_tpu.geo import GeoLocation
    from topo_renderer_tpu.models.uniforms import PeakInstance
    from topo_renderer_tpu.ops.geometry import ecef_from_geo
    from topo_renderer_tpu.ops.labels import peak_visibility_panorama
    from topo_renderer_tpu.ops.panorama import PanoramaSpec, render_panorama
    from topo_renderer_tpu.ops.shading import to_srgb8_image
    from topo_renderer_tpu.render import text as text_mod
    from topo_renderer_tpu.render.overlay import composite_labels
    from topo_renderer_tpu.utils.imageio import save_image

    DOCS.mkdir(exist_ok=True)
    mosaic = synthetic_mosaic_device(n=2401, rugged=True)
    jax.block_until_ready(mosaic.heights_flat)
    eye = eye_at(51.0, 19.0, 3400.0)
    # Late-afternoon sun: low over the local horizon for relief contrast.
    from topo_renderer_tpu.ops.geometry import local_frame

    east, north, up = (np.asarray(v) for v in local_frame(19.0, 51.0))
    sun_v = 0.55 * east + 0.25 * north + 0.45 * up
    sun = jnp.asarray(sun_v / np.linalg.norm(sun_v), jnp.float32)

    # 1. Wide atmospheric panorama.
    spec = PanoramaSpec.fast(width=2048, height=512, n_steps=512)
    out = render_panorama(mosaic, eye, spec, sun, fog="atmosphere")
    img = np.asarray(to_srgb8_image(out["color"]))

    # Fabricated peak list on local maxima of the synthetic terrain.
    H = np.asarray(mosaic.heights)
    names = ["Grosse Sinuspitze", "Cos Horn", "Mittelgipfel", "Wellenkamm", "Sudkamm"]
    peaks = []
    hh, ww = H.shape
    step = hh // 6
    for i, name in enumerate(names):
        r0, c0 = step * (i + 1) - step // 2, (step * (2 * i + 3)) % (ww - step)
        win = H[r0 : r0 + step, c0 : c0 + step]
        r, c = np.unravel_index(np.argmax(win), win.shape)
        lat = 52.0 - (r0 + r) / 1200.0
        lon = 18.0 + (c0 + c) / 1200.0
        peaks.append(
            PeakInstance(
                position=np.asarray(ecef_from_geo(win[r, c] + 10.0, lon, lat)),
                name=name,
            )
        )
    pos = jnp.asarray(np.stack([p.position for p in peaks]))
    valid = jnp.ones((len(peaks),), bool)
    vis = peak_visibility_panorama(pos, valid, eye, spec, out["depth"], tolerance_rel=0.05)
    loc = GeoLocation.from_coord(51, 18)
    visible = {
        loc: [
            (i, (int(vis["x"][i]), int(vis["y"][i])))
            for i in range(len(peaks))
            if bool(vis["visible"][i])
        ]
    }
    layouts = text_mod.layout_labels(
        visible, lambda _l, i: text_mod.measure_text(peaks[i].name)
    )
    named = {(loc, i): peaks[i].name for i in range(len(peaks))}
    img = composite_labels(img, layouts, named)
    save_image(DOCS / "demo_panorama.png", img)
    print("wrote demo_panorama.png,", len(layouts), "labels")

    # 2. Distance-fog panorama at dusk-ish sun.
    sun2 = jnp.asarray(np.array([0.7, 0.1, 0.3]) / np.linalg.norm([0.7, 0.1, 0.3]), jnp.float32)
    out2 = render_panorama(
        mosaic, eye, PanoramaSpec.fast(width=2048, height=512, n_steps=512),
        sun2, fog="distance", fog_density=1.0 / 40_000.0,
    )
    save_image(DOCS / "demo_fog.png", np.asarray(to_srgb8_image(out2["color"])))
    print("wrote demo_fog.png")


if __name__ == "__main__":
    main()
