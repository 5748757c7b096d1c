"""TPU performance probe for the panorama renderer (not a test).

Generates synthetic terrain ON DEVICE to avoid host->device transfers over
the axon tunnel (which are slow and variable); real scenes pay that cost only
once per tile load.
"""

import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from topo_renderer_tpu.models.scene import TerrainMosaic
from topo_renderer_tpu.models.uniforms import normal_to_world_rotation
from topo_renderer_tpu.ops.geometry import R0
from topo_renderer_tpu.ops.normals import compute_normals
from topo_renderer_tpu.ops.panorama import PanoramaSpec, render_panorama


def synthetic_mosaic_device(n=2401, lat_nw=52.0, lon_nw=18.0, ps=1.0 / 1200.0, rugged=False):
    rot3 = jnp.asarray(
        np.asarray(normal_to_world_rotation(lon_nw, lat_nw))[:3, :3], jnp.float32
    )

    def gen_heights():
        ys = jnp.arange(n, dtype=jnp.float32)[:, None] / n
        xs = jnp.arange(n, dtype=jnp.float32)[None, :] / n
        h = jnp.full((n, n), 1500.0, jnp.float32)
        if rugged:
            # Ridged multi-octave relief for demo imagery (alpine look).
            for k in range(6):
                f = 6.0 * (2.0**k)
                amp = 900.0 / (1.6**k)
                band = jnp.sin(f * xs * jnp.pi + 0.7 * k) * jnp.cos(
                    f * ys * jnp.pi + 1.3 * k + jnp.sin(3.0 * xs + k)
                )
                h += amp * (1.0 - jnp.abs(band)) - 0.5 * amp
        else:
            for k in range(1, 5):
                h += (600.0 / k) * jnp.sin(12 * k * xs * jnp.pi + 0.3 * k) * jnp.cos(
                    12 * k * ys * jnp.pi + 1.1 * k
                )
        return h

    def gen_normals(h, level=0):
        s = float(2**level)
        off = (s - 1.0) / 2.0
        normals = compute_normals(
            h, (ps * s, ps * s), (0, 0),
            (lon_nw + ps * off, lat_nw - ps * off), quantize=True,
        )
        world = jnp.einsum("ij,hwj->hwi", rot3, normals)
        enc = jnp.round(jnp.clip(0.5 * (world + 1.0), 0.0, 1.0) * 1023.0).astype(
            jnp.uint32
        )
        return enc[..., 0] | (enc[..., 1] << 10) | (enc[..., 2] << 20)

    # NB: pooling via reshape(hh, 2, ww, 2) materializes a 4-D intermediate
    # whose trailing dim 2 is padded to 128 lanes by the T(8,128) layout --
    # 64x the memory, OOM at ~100-tile scale. Strided slices keep it 2-D.
    def pool(cur):
        hh, ww = cur.shape[0] // 2, cur.shape[1] // 2
        c = cur[: 2 * hh, : 2 * ww]
        return 0.25 * (c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2])

    pack_attr = lambda hh, pp: jnp.stack(
        [hh.reshape(-1), jax.lax.bitcast_convert_type(pp.reshape(-1), jnp.float32)],
        axis=-1,
    )

    def pool_max_dilate(cur, out_shape):
        hh, ww = out_shape
        c = cur[: 2 * hh, : 2 * ww]
        p = jnp.maximum(
            jnp.maximum(c[0::2, 0::2], c[0::2, 1::2]),
            jnp.maximum(c[1::2, 0::2], c[1::2, 1::2]),
        )
        pp = jnp.pad(p, 1, mode="edge")
        d = p
        for dy in range(3):
            for dx in range(3):
                d = jnp.maximum(d, pp[dy : dy + hh, dx : dx + ww])
        return p, d

    # One jitted program for the whole build: eagerly dispatching ~100 large
    # ops over the axon tunnel costs minutes; fused + persistently cached it
    # is seconds.
    @jax.jit
    def build_all():
        h = gen_heights()
        packed = gen_normals(h)
        mips = []
        cur = h
        while min(cur.shape) >= 8:
            cur = pool(cur)
            mips.append(cur)
        attr_packed = pack_attr(h, packed)
        mip_packed = [gen_normals(m, level=lv) for lv, m in enumerate(mips, 1)]
        mip_attrs = [pack_attr(m, p) for m, p in zip(mips, mip_packed)]
        win2d = lambda hh, pp: jnp.stack(
            [hh, jax.lax.bitcast_convert_type(pp, jnp.float32)], axis=0
        )
        win_tables = [win2d(h, packed) if h.size > 262_144 else None] + [
            win2d(m, p) if m.size > 262_144 else None
            for m, p in zip(mips, mip_packed)
        ]
        mip_hmax = []
        cur = h
        for m in mips:
            cur, dil = pool_max_dilate(cur, m.shape)
            mip_hmax.append(dil)
        # Corner planes stacked as flat [M] vectors -> [M, 4]; stacking
        # [n, n] planes on a new trailing axis would pad that axis to 128
        # lanes.
        e = jnp.roll(h, -1, axis=1)
        s_ = jnp.roll(h, -1, axis=0)
        se = jnp.roll(s_, -1, axis=1)
        cell = jnp.stack(
            [h.reshape(-1), e.reshape(-1), s_.reshape(-1), se.reshape(-1)], axis=-1
        )
        return dict(
            heights=h.reshape(-1),
            attr=attr_packed,
            cell=cell,
            mips=tuple(m.reshape(-1) for m in mips),
            mip_attrs=tuple(mip_attrs),
            mip_hmax=tuple(m.reshape(-1) for m in mip_hmax),
            win_attr_2d=tuple(win_tables),
            hmax=h.max(),
        )

    arrs = build_all()
    mip_shapes = []
    hh, ww = n, n
    while min(hh, ww) >= 8:  # mirrors the build_all pooling loop
        hh, ww = hh // 2, ww // 2
        mip_shapes.append((hh, ww))
    rot = rot3[None]
    lat_c = lat_nw - ps * n / 2
    lon_c = lon_nw + ps * n / 2
    lam, phi = np.radians(lon_c), np.radians(lat_c)
    center = np.array(
        [R0 * np.cos(phi) * np.cos(lam), R0 * np.cos(phi) * np.sin(lam), R0 * np.sin(phi)],
        np.float32,
    )
    radius = np.float32(n * ps * 111_000.0)
    from topo_renderer_tpu.models.scene import MosaicHostData

    return TerrainMosaic(
        heights_flat=arrs["heights"],
        attr_packed_flat=arrs["attr"],
        cell_heights_flat=arrs["cell"],
        has_cell_table=True,
        shape=(n, n),
        mip_heights_flat=arrs["mips"],
        mip_attr_flat=arrs["mip_attrs"],
        mip_hmax_flat=arrs["mip_hmax"],
        mip_shapes=tuple(mip_shapes),
        win_attr_2d=arrs["win_attr_2d"],
        host=MosaicHostData(
            valid=np.ones((n, n), bool),
            cell_tile=np.zeros((n, n), np.int32),
            tile_rot=np.asarray(rot),
        ),
        model_point=jnp.array([lon_nw, lat_nw], jnp.float32),
        pixel_scale=jnp.array([ps, ps], jnp.float32),
        hmax=arrs["hmax"],
        bound_center=jnp.asarray(center),
        bound_radius=radius,
    )


def eye_at(lat_deg, lon_deg, alt):
    lam, phi = np.radians(lon_deg), np.radians(lat_deg)
    r = R0 + alt
    return jnp.array(
        [r * np.cos(phi) * np.cos(lam), r * np.cos(phi) * np.sin(lam), r * np.sin(phi)],
        jnp.float32,
    )


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times), out


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    mosaic = synthetic_mosaic_device(n=2401)
    jax.block_until_ready(mosaic.heights_flat)
    print(f"mosaic on device: {time.perf_counter() - t0:.1f}s", flush=True)
    eye = eye_at(50.5, 20.0, 2800.0)
    sun = jnp.array([0.3, 0.5, 0.8])

    for (w, h, n, nr) in [(1024, 256, 512, 4), (2048, 512, 768, 4), (4096, 1024, 1024, 4)]:
        spec = PanoramaSpec(width=w, height=h, n_steps=n, n_refine=nr)
        t0 = time.perf_counter()
        fn = lambda: render_panorama(mosaic, eye, spec, sun, fog="atmosphere")["color"]
        best, out = bench(fn)
        print(
            f"{w}x{h} N={n}: best {best*1e3:.2f} ms  ({w*h/best/1e6:.0f} Mpix/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
