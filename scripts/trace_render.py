"""Capture and summarize a TPU op-level trace of the panorama render."""

import glob
import os
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, "scripts")

import jax
import jax.numpy as jnp


def summarize(trace_dir="/tmp/jxtrace", top=22):
    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    f = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)[0]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(f, "rb").read())
    for p in xs.planes:
        if not p.lines or "TPU" not in p.name:
            continue
        tot = defaultdict(float)
        for line in p.lines:
            for ev in line.events:
                tot[p.event_metadata[ev.metadata_id].name] += ev.duration_ps / 1e9
        print(f"== {p.name}")
        for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{ms:9.2f} ms  {name[:140]}", flush=True)


def main():
    from perf_probe import eye_at, synthetic_mosaic_device
    from topo_renderer_tpu.ops.panorama import PanoramaSpec, render_panorama

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1201
    mosaic = synthetic_mosaic_device(n=n)
    jax.block_until_ready(mosaic.heights_flat)
    print("mosaic ready", flush=True)
    eye = eye_at(52.0 - (n / 1200.0) / 2, 18.0 + (n / 1200.0) / 2, 2800.0)
    sun = jnp.array([0.3, 0.5, 0.8])
    spec = PanoramaSpec(width=4096, height=1024, n_steps=1024, n_refine=2)

    def run():
        return render_panorama(mosaic, eye, spec, sun, fog="atmosphere")["color"]

    jax.block_until_ready(run())
    import time

    t0 = time.perf_counter()
    jax.block_until_ready(run())
    print(f"render: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

    shutil.rmtree("/tmp/jxtrace", ignore_errors=True)
    with jax.profiler.trace("/tmp/jxtrace"):
        jax.block_until_ready(run())
    summarize()


if __name__ == "__main__":
    main()
