"""Fine-grained stages of the quad-track guided march — find the 8 ms/round."""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_probe import eye_at, synthetic_mosaic_device

import math
from functools import partial

from topo_renderer_tpu.models.camera import Camera
from topo_renderer_tpu.ops import raycast as rc
from topo_renderer_tpu.ops.panorama import PanoramaSpec, panorama_crossing_prepass


def bench(label, fn, reps=8):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:<56s} {ms:9.2f} ms", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    mosaic = synthetic_mosaic_device(n=12001)
    jax.block_until_ready(mosaic.heights_flat)
    eye = eye_at(47.0, 23.0, 2800.0)
    cam = Camera(eye=eye, pitch=-0.05, yaw=0.8)
    W, H = 800, 450
    fov = math.radians(45.0)
    aspect = W / H

    # Prepass spec exactly like march_guided_panorama's.
    half_diag = min(math.atan(math.tan(0.5 * fov) * math.sqrt(1 + aspect**2)), 0.49 * math.pi)
    half_win = min(1.03 * half_diag + 0.01, 0.49 * math.pi)
    az_span = min(2 * math.pi, 2 * half_win / max(math.cos(half_win), 0.3))
    px_per_rad = 1.5 * H / fov
    wp = max(256, min(int(math.ceil(az_span * px_per_rad / 128.0)) * 128, 8192))
    hp = max(64, min(int(math.ceil(2.0 * half_win * px_per_rad / 8.0)) * 8, 4096))
    spec_pre = PanoramaSpec(
        width=wp, height=hp, n_steps=1024, n_refine=0,
        azimuth_start=-0.5 * az_span, azimuth_span=az_span,
        elev_min=-half_win, elev_max=half_win,
    )
    print(f"prepass {wp}x{hp}", flush=True)
    bench("prepass NEW conservative=True",
          lambda: panorama_crossing_prepass(mosaic, eye, spec_pre)["d_lo"])
    bench("prepass NEW conservative=False",
          lambda: panorama_crossing_prepass(mosaic, eye, spec_pre, conservative=False)["d_lo"])

    # march alone on fixed brackets
    (dx, dy, dz), fwd = rc.camera_rays(cam, W, H)
    eyej = jnp.asarray(cam.eye, jnp.float32)

    t_min = jnp.full((H, W), 8000.0, jnp.float32)
    t_max = jnp.full((H, W), 12000.0, jnp.float32)
    any_hit = jnp.ones((H, W), bool)

    @partial(jax.jit, static_argnames=("nw", "nc"))
    def wmq(t_min, t_max, any_hit, nw, nc):
        return rc._window_march_quad(
            mosaic, eyej, (dx, dy, dz), t_min, t_max, any_hit,
            n_window=nw, n_cells=nc, margin_rel=0.01, margin_abs=150.0,
        )[1].sum()

    for nw, nc in ((16, 4), (8, 4), (8, 1), (1, 1)):
        bench(f"window_march_quad nw={nw} nc={nc}",
              lambda a=nw, b=nc: wmq(t_min, t_max, any_hit, a, b))

    # pure gather loop, march-shaped: float coords -> floor -> idx -> row
    h_m, w_m = mosaic.shape
    cell = mosaic.cell_heights_flat

    @partial(jax.jit, static_argnames=("rounds",))
    def pure(gx0, gy0, dgx, dgy, rounds):
        def body(k, acc):
            u = k / jnp.float32(rounds)
            gx = gx0 + u * dgx
            gy = gy0 + u * dgy
            cx = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, w_m - 2)
            cy = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, h_m - 2)
            rows = cell[cy * w_m + cx]
            return acc + rows[..., 0] + rows[..., 3]

        return jax.lax.fori_loop(0, rounds, body, jnp.zeros_like(gx0)).sum()

    key = jax.random.PRNGKey(0)
    gx0 = jax.random.uniform(key, (H, W), jnp.float32, 0, w_m - 100.0)
    gy0 = jax.random.uniform(key, (H, W), jnp.float32, 0, h_m - 100.0)
    dgx = jax.random.uniform(key, (H, W), jnp.float32, 0, 50.0)
    dgy = jax.random.uniform(key, (H, W), jnp.float32, 0, 50.0)
    for rounds in (16, 32):
        ms = bench(f"pure gather loop rounds={rounds}",
                   lambda r=rounds: pure(gx0, gy0, dgx, dgy, r))
        print(f"    -> {H*W*rounds/ms/1e3:.1f} M gathers/s", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
