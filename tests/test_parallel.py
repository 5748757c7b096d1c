"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_engine import build_engine
from topo_renderer_tpu.ops.panorama import PanoramaSpec, render_panorama
from topo_renderer_tpu.parallel.mesh import make_mesh
from topo_renderer_tpu.parallel.sharded import render_batch_sharded


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device():
    engine, cam, tile = build_engine(n=33, span=0.03)
    mosaic = engine.mosaic
    spec = PanoramaSpec(width=128, height=32, n_steps=128, n_refine=2)
    eye = np.asarray(cam.eye, np.float32)
    sun = np.asarray(cam.sun_angle.to_vec3(), np.float32)

    eyes = np.stack([eye] * 4)
    suns = np.stack([sun] * 4)

    mesh = make_mesh(8, dp=4, az=2)
    entries, pos, valid = engine._padded_peaks()
    color_sh, depth_sh, visible = render_batch_sharded(
        mosaic, eyes, suns, spec, mesh, peak_positions=pos, peak_valid=valid
    )
    assert color_sh.shape == (4, 32, 128, 3)
    assert depth_sh.shape == (4, 32, 128)
    assert np.isfinite(np.asarray(color_sh)).all()

    # Single-device reference (postprocess clamps at the image edge while the
    # sharded path wraps the azimuth ring, so exclude the two boundary
    # columns of each shard slice).
    ref = render_panorama(mosaic, jnp.asarray(eye), spec, jnp.asarray(sun))
    ref_c = np.asarray(ref["color"])
    got_c = np.asarray(color_sh[0])
    cols = np.ones(128, bool)
    for b in (0, 63, 64, 127):
        cols[b] = False
    np.testing.assert_allclose(got_c[:, cols], ref_c[:, cols], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(depth_sh[0]), np.asarray(ref["depth"]), atol=1e-6
    )

    # Label decisions merged across shards match the engine's own pass.
    res = engine.render_panorama(cam, spec)
    vis_np = np.asarray(visible[0])
    expect = np.zeros_like(vis_np)
    for j, (loc, i, inst) in enumerate(entries):
        expect[j] = inst.visible
    np.testing.assert_array_equal(vis_np, expect)


def test_sharded_fast_lod_spec():
    """Azimuth sharding composes with the clipmap/LOD fast preset."""
    engine, cam, tile = build_engine(n=33, span=0.03)
    spec = PanoramaSpec.fast(width=128, height=32, n_steps=128)
    mesh = make_mesh(8, dp=2, az=4)
    eyes = np.stack([np.asarray(cam.eye)] * 2)
    suns = np.stack([np.asarray(cam.sun_angle.to_vec3())] * 2)
    color, depth, _ = render_batch_sharded(engine.mosaic, eyes, suns, spec, mesh)
    assert color.shape == (2, 32, 128, 3)
    assert np.isfinite(np.asarray(color)).all()
    ref = render_panorama(engine.mosaic, jnp.asarray(cam.eye), spec,
                          jnp.asarray(suns[0]), apply_postprocess=False,
                          quantize_rt=False)
    # Hit structure should broadly match the single-device render.
    sh_hit = np.asarray(depth[0]) < 0.9999
    ref_hit = np.asarray(ref["hit"])
    assert (sh_hit == ref_hit).mean() > 0.95


def test_dp_only_mesh():
    engine, cam, tile = build_engine(n=33, span=0.03)
    spec = PanoramaSpec(width=64, height=16, n_steps=64, n_refine=0)
    mesh = make_mesh(8, dp=8, az=1)
    eyes = np.stack([np.asarray(cam.eye)] * 8)
    suns = np.stack([np.asarray(cam.sun_angle.to_vec3())] * 8)
    color, depth, _ = render_batch_sharded(engine.mosaic, eyes, suns, spec, mesh)
    assert color.shape == (8, 16, 64, 3)
    # All identical viewpoints -> identical outputs across the dp axis.
    np.testing.assert_allclose(np.asarray(color[0]), np.asarray(color[7]), atol=1e-6)
