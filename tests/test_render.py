"""Renderer validation: triangle-exact sampling + ray-march vs rasterizer oracle."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from tests.helpers import make_tile, small_scene
from tests.raster_oracle import rasterize
from topo_renderer_tpu.models.camera import Camera, ViewMode, dist_from_depth
from topo_renderer_tpu.models.scene import build_mosaic
from topo_renderer_tpu.ops import mathx
from topo_renderer_tpu.ops.raycast import camera_rays, march, render_perspective
from topo_renderer_tpu.ops.surface import (
    INVALID_HEIGHT,
    raster_from_geo,
    sample_height,
    tri_interp,
)


from tests.helpers import east_at, yaw_towards  # noqa: E402


def test_sample_height_at_vertices_and_planes():
    tile = make_tile(n=17, span_deg=0.016)
    mosaic = build_mosaic([tile])
    H = np.asarray(mosaic.heights)
    # Exact at texel coordinates.
    for gy, gx in [(0, 0), (3, 5), (8, 8), (15, 16)]:
        got = float(sample_height(mosaic, jnp.float32(gx), jnp.float32(gy)))
        np.testing.assert_allclose(got, H[gy, gx], rtol=1e-6)
    # Diagonal behavior: at the cell center the value is the mean of the
    # diagonal's endpoints.
    for cy, cx in [(2, 2), (2, 3)]:
        got = float(sample_height(mosaic, jnp.float32(cx + 0.5), jnp.float32(cy + 0.5)))
        if (cx + cy) % 2 == 0:
            want = 0.5 * (H[cy, cx] + H[cy + 1, cx + 1])
        else:
            want = 0.5 * (H[cy, cx + 1] + H[cy + 1, cx])
        np.testing.assert_allclose(got, want, rtol=1e-6)
    # Outside the mosaic -> INVALID
    assert float(sample_height(mosaic, jnp.float32(-5.0), jnp.float32(2.0))) == float(
        np.float32(INVALID_HEIGHT)
    )


def test_tri_interp_corners():
    fx = jnp.float32(0.0)
    fy = jnp.float32(0.0)
    for parity in (0, 1):
        assert float(tri_interp(1.0, 2.0, 3.0, 4.0, fx, fy, parity)) == 1.0
        assert float(tri_interp(1.0, 2.0, 3.0, 4.0, jnp.float32(1.0), jnp.float32(1.0), parity)) == 4.0
        assert float(tri_interp(1.0, 2.0, 3.0, 4.0, jnp.float32(1.0), jnp.float32(0.0), parity)) == 2.0
        assert float(tri_interp(1.0, 2.0, 3.0, 4.0, jnp.float32(0.0), jnp.float32(1.0), parity)) == 3.0


def test_march_hits_terrain_below():
    mosaic, cam, tile = small_scene()
    # Ray pointing straight down must hit at the camera's terrain height.
    eye = jnp.asarray(cam.eye)
    down = -eye / jnp.linalg.norm(eye)
    hit, t = march(mosaic, eye, down[None, :], n_steps=256, n_refine=24)
    pos = eye[None, :] + t[:, None] * down[None, :]
    assert bool(hit[0])
    # The hit distance equals camera altitude minus the interpolated surface
    # height directly below (the camera was placed 800 m above the *nearest
    # texel*, not the interpolated surface).
    eye_np = np.asarray(eye, np.float64)
    r_eye = np.linalg.norm(eye_np)
    lat0 = np.degrees(np.arcsin(eye_np[2] / r_eye))
    lon0 = np.degrees(np.arctan2(eye_np[1], eye_np[0]))
    gx0, gy0 = raster_from_geo(mosaic, jnp.float32(lon0), jnp.float32(lat0))
    h_below = float(sample_height(mosaic, gx0, gy0))
    np.testing.assert_allclose(float(t[0]), (r_eye - 6_371_000.0) - h_below, atol=2.0)
    # And the hit point lies on the surface: resample height there.
    r = np.linalg.norm(np.asarray(pos[0]))
    lat = np.degrees(np.arcsin(np.asarray(pos[0])[2] / r))
    lon = np.degrees(np.arctan2(np.asarray(pos[0])[1], np.asarray(pos[0])[0]))
    gx, gy = raster_from_geo(mosaic, jnp.float32(lon), jnp.float32(lat))
    h = float(sample_height(mosaic, gx, gy))
    np.testing.assert_allclose(r - 6_371_000.0, h, atol=1.0)


def test_sky_ray_misses():
    mosaic, cam, _ = small_scene()
    eye = jnp.asarray(cam.eye)
    up = eye / jnp.linalg.norm(eye)
    hit, _ = march(mosaic, eye, up[None, :], n_steps=64, n_refine=4)
    assert not bool(hit[0])


def test_render_matches_oracle():
    """End-to-end: ray-marched render vs the numpy rasterizer oracle."""
    mosaic, cam, tile = small_scene(n=65, span_deg=0.05, height_above=600.0)
    cam = dataclasses.replace(
        cam,
        yaw=yaw_towards(cam, east_at(cam)),
        pitch=-0.08,
        view_mode=ViewMode.NORMALS,  # undithered shading for exact compare
    )
    W, H = 192, 108

    out = render_perspective(
        mosaic,
        cam,
        width=W,
        height=H,
        n_steps=768,
        n_refine=26,
        quantize_rt=False,
        apply_postprocess=False,
    )
    got = np.asarray(out["color"])
    got_depth = np.asarray(out["depth"])

    vp = np.asarray(cam.build_view_proj_matrix(float(W), float(H)), np.float64)
    want, want_depth, want_dist = rasterize(
        np.asarray(mosaic.heights),
        np.asarray(mosaic.normals),
        np.asarray(mosaic.cell_tile),
        np.asarray(mosaic.model_point),
        np.asarray(mosaic.pixel_scale),
        vp,
        np.asarray(cam.eye, np.float64),
        np.asarray(cam.sun_angle.to_vec3(), np.float64),
        W,
        H,
    )

    # Both must actually see terrain (sanity of the scene setup).
    hit_frac = np.asarray(out["hit"]).mean()
    assert hit_frac > 0.2, f"scene sanity: only {hit_frac:.1%} terrain pixels"

    err = np.abs(got - want).max(axis=-1)
    frac_bad = (err > 2.0 / 255.0).mean()
    # Sub-pixel silhouette differences are expected; interior must match.
    assert frac_bad < 0.02, f"{frac_bad:.2%} pixels differ by >2/255"
    # Median error across the image is essentially zero.
    assert np.median(err) < 1.0 / 1020.0

    # Depth agreement where both hit terrain away from silhouettes.
    both = (np.asarray(out["hit"])) & (want_depth < 1.0)
    d_got = np.asarray(dist_from_depth(got_depth))
    d_want = np.asarray(dist_from_depth(want_depth))
    rel = np.abs(d_got - d_want) / np.maximum(d_want, 1.0)
    interior = both & (np.abs(np.gradient(d_want, axis=0)) < 50) & (
        np.abs(np.gradient(d_want, axis=1)) < 50
    )
    assert np.median(rel[both]) < 2e-3
    assert (rel[interior] < 0.02).mean() > 0.97


def test_render_dither_bounded():
    """Default view mode = NORMALS shading + hash dither; the dither must stay
    within +-1/255 of the undithered render."""
    mosaic, cam, _ = small_scene(n=33, span_deg=0.03)
    cam = dataclasses.replace(cam, yaw=yaw_towards(cam, east_at(cam)), pitch=-0.1)
    kw = dict(width=64, height=40, n_steps=256, n_refine=16, quantize_rt=False,
              apply_postprocess=False)
    out0 = render_perspective(mosaic, cam, **kw)
    out1 = render_perspective(
        mosaic, dataclasses.replace(cam, view_mode=ViewMode.NORMALS), **kw
    )
    hit = np.asarray(out0["hit"])
    diff = np.abs(np.asarray(out0["color"]) - np.asarray(out1["color"]))[hit]
    assert diff.max() <= 1.0 / 255.0 + 1e-6
    assert diff.max() > 0.0  # dither is actually applied


def test_render_view_mode_position():
    mosaic, cam, _ = small_scene(n=33, span_deg=0.03)
    cam = dataclasses.replace(
        cam, yaw=yaw_towards(cam, east_at(cam)), pitch=-0.2,
        view_mode=ViewMode.POSITION,
    )
    out = render_perspective(
        mosaic, cam, width=48, height=32, n_steps=256, n_refine=8,
        quantize_rt=False, apply_postprocess=False,
    )
    hit = np.asarray(out["hit"])
    color = np.asarray(out["color"])[hit]
    # Normal visualisation: 0.5*(n+1) with |n| ~ 1 -> values in [0, 1].
    assert color.min() >= -1e-5 and color.max() <= 1.0 + 1e-5


def test_march_guided_matches_uniform():
    """The prepass-guided march must agree with the uniform exact march away
    from silhouettes: identical hit decisions on all but a sub-percent
    silhouette band, and matching distances where both hit."""
    from topo_renderer_tpu.ops.raycast import camera_rays, march_guided

    mosaic, cam, _ = small_scene(n=65, span_deg=0.05, height_above=600.0)
    cam = dataclasses.replace(
        cam, yaw=yaw_towards(cam, east_at(cam)), pitch=-0.08
    )
    dirs, _ = camera_rays(cam, 160, 96)
    eye = jnp.asarray(cam.eye)

    hit_u, t_u = march(mosaic, eye, dirs, n_steps=768, n_refine=20)
    hit_g, t_g = march_guided(mosaic, eye, dirs, n_steps=768, n_refine=20)

    hu = np.asarray(hit_u)
    hg = np.asarray(hit_g)
    assert hu.mean() > 0.2  # scene sanity: terrain in view
    # Hit-mask agreement outside the silhouette class.
    assert (hu != hg).mean() < 0.01, f"{(hu != hg).mean():.2%} hit flips"
    both = hu & hg
    rel = np.abs(np.asarray(t_u) - np.asarray(t_g))[both] / np.maximum(
        np.asarray(t_u)[both], 1.0
    )
    assert np.median(rel) < 1e-4
    assert (rel < 0.02).mean() > 0.98


def test_render_perspective_guided_close():
    """End-to-end guided render stays within oracle-class tolerance of the
    unguided exact render (same scene as the oracle test)."""
    mosaic, cam, _ = small_scene(n=65, span_deg=0.05, height_above=600.0)
    cam = dataclasses.replace(
        cam,
        yaw=yaw_towards(cam, east_at(cam)),
        pitch=-0.08,
        view_mode=ViewMode.NORMALS,
    )
    kw = dict(width=192, height=108, n_steps=768, n_refine=26,
              quantize_rt=False, apply_postprocess=False)
    ref = render_perspective(mosaic, cam, **kw)
    got = render_perspective(mosaic, cam, guided=True, **kw)
    err = np.abs(np.asarray(got["color"]) - np.asarray(ref["color"])).max(axis=-1)
    assert (err > 2.0 / 255.0).mean() < 0.005  # round 3: tightened from 2%
    assert np.median(err) < 1.0 / 1020.0


def test_march_guided_panorama_matches_uniform():
    """The panorama-profile-prepass guided march agrees with the uniform
    exact march away from silhouettes (the production guided mode).

    Two refinement modes are pinned separately:
      * bisection (``analytic_refine=False``) bisects the SAME noisy
        clearance function the uniform march does, so surviving pixels
        agree essentially bit-for-bit (median rel < 1e-4);
      * the default quad-track + analytic cell walk resolves the crossing
        on the fitted track, which lands elsewhere within the clearance
        function's own f32 noise floor (degrees(arctan2) quantizes the
        raster x coordinate to ~2.4e-3 texels ~ 0.1-0.2 m of surface
        height), so agreement is gated at that floor in metres — oracle
        parity (`test_parity_independent.py`) shows the quad walk is at
        least as close to the true surface as bisection.
    """
    import math

    from topo_renderer_tpu.ops.raycast import camera_rays, march_guided_panorama

    mosaic, cam, _ = small_scene(n=65, span_deg=0.05, height_above=600.0)
    cam = dataclasses.replace(
        cam, yaw=yaw_towards(cam, east_at(cam)), pitch=-0.08
    )
    W, H = 160, 96
    dirs, fwd = camera_rays(cam, W, H)
    eye = jnp.asarray(cam.eye)

    hit_u, t_u = march(mosaic, eye, dirs, n_steps=768, n_refine=20)
    tu = np.asarray(t_u)
    hu = np.asarray(hit_u)
    assert hu.mean() > 0.2

    for analytic in (False, True):
        hit_g, t_g = march_guided_panorama(
            mosaic, eye, dirs, fwd, n_steps=768, n_refine=20,
            fov_hint=math.radians(45.0), aspect=W / H,
            analytic_refine=analytic,
        )
        hg = np.asarray(hit_g)
        assert (hu != hg).mean() < 0.01, f"{(hu != hg).mean():.2%} hit flips"
        both = hu & hg
        diff = np.abs(tu - np.asarray(t_g))[both]
        rel = diff / np.maximum(tu[both], 1.0)
        if analytic:
            assert np.median(diff) < 0.5  # metres: the f32 noise floor
            assert (rel < 0.02).mean() > 0.99
        else:
            assert np.median(rel) < 1e-4
            assert (rel < 0.02).mean() > 0.98


def test_fusion_barrier_knobs_are_bit_neutral():
    """`optimization_barrier` cuts are performance-only by contract: the
    fast path ships one at the pano->warp boundary (18.7 -> 9.3 ms on TPU,
    scripts/probe_warp4.py) and the exact path keeps default-off knobs at
    its prepass->march and march->shade boundaries (measured time-neutral,
    scripts/probe_barrier_exact.py). Pin BIT-identity here so a refactor
    can't quietly turn a barrier into a numeric fork (FMA contraction
    differences across a moved boundary would show up as f32 bit flips)."""
    import math

    mosaic, cam, _ = small_scene(n=65, span_deg=0.05, height_above=600.0)
    cam = dataclasses.replace(cam, yaw=yaw_towards(cam, east_at(cam)), pitch=-0.08)
    kw = dict(
        width=160, height=96, n_steps=512, n_refine=12,
        guided=True, fov_hint=math.radians(45.0),
    )
    base = render_perspective(mosaic, cam, **kw)
    for shade_b, march_b in ((True, False), (False, True), (True, True)):
        got = render_perspective(
            mosaic, cam, fusion_barrier=shade_b,
            guided_kw=(("fusion_barrier", True),) if march_b else (),
            **kw,
        )
        for key in ("color", "depth", "distance"):
            a = np.asarray(base[key], np.float32)
            b = np.asarray(got[key], np.float32)
            assert (a.view(np.uint32) == b.view(np.uint32)).all(), (
                f"{key} bits diverged with barriers ({shade_b}, {march_b})"
            )


def test_prepass_brackets_contain_uniform_crossings():
    """The conservative prepass (max-mip bound d_lo + exact-profile d_hi)
    must return brackets that CONTAIN the uniform exact march's crossing
    for rays cast exactly at the prepass texel centers — the guarantee that
    closes the round-2 silhouette-tail mechanism (terrain hiding between
    prepass samples)."""
    import math

    from topo_renderer_tpu.ops.panorama import (
        PanoramaSpec,
        panorama_crossing_prepass,
    )

    mosaic, cam, _ = small_scene(n=129, span_deg=0.1, height_above=500.0)
    eye = jnp.asarray(cam.eye)

    W, H = 256, 64
    half = 0.22
    spec = PanoramaSpec(
        width=W, height=H, n_steps=512, n_refine=0,
        azimuth_start=-half, azimuth_span=2 * half,
        elev_min=-half / 2, elev_max=half / 2,
    )
    pre = panorama_crossing_prepass(mosaic, eye, spec)

    # Rays at the prepass texel centers (same az/el mapping the prepass uses).
    e = np.asarray(eye, np.float64)
    en = np.linalg.norm(e)
    u = e / en
    lon0 = np.arctan2(e[1], e[0])
    lat0 = np.arcsin(np.clip(e[2] / en, -1, 1))
    ex = np.array([-np.sin(lon0), np.cos(lon0), 0.0])
    nx = np.array(
        [-np.sin(lat0) * np.cos(lon0), -np.sin(lat0) * np.sin(lon0), np.cos(lat0)]
    )
    az = spec.azimuth_start + spec.azimuth_span * ((np.arange(W) + 0.5) / W)
    el = spec.elev_max - (spec.elev_max - spec.elev_min) * ((np.arange(H) + 0.5) / H)
    azg, elg = np.meshgrid(az, el)
    horiz = (
        np.cos(azg)[..., None] * nx[None, None] + np.sin(azg)[..., None] * ex[None, None]
    )
    dirs = (
        np.cos(elg)[..., None] * horiz + np.sin(elg)[..., None] * u[None, None]
    ).astype(np.float32)

    hit_u, t_u = march(
        mosaic, eye,
        (jnp.asarray(dirs[..., 0]), jnp.asarray(dirs[..., 1]), jnp.asarray(dirs[..., 2])),
        n_steps=1024, n_refine=20,
    )
    hu = np.asarray(hit_u)
    tu = np.asarray(t_u)
    d_lo = np.asarray(pre["d_lo"])
    d_hi = np.asarray(pre["d_hi"])
    ph = np.asarray(pre["hit"])
    assert hu.mean() > 0.2

    # Every uniform-march hit must be flagged by the prepass (the bound
    # profile can't miss terrain the exact march finds) ...
    missed = hu & ~ph
    assert missed.mean() < 0.002, f"{missed.mean():.3%} hits invisible to prepass"
    # ... and fall inside the [d_lo, d_hi] bracket up to the profile's
    # sub-step interpolation slack (one step spacing ~ 1.2% of distance).
    both = hu & ph
    below = (tu < d_lo * 0.985 - 30.0) & both
    above = (tu > d_hi * 1.015 + 30.0) & both
    assert below.mean() < 0.002, f"{below.mean():.3%} crossings before d_lo"
    assert above.mean() < 0.01, f"{above.mean():.3%} crossings after d_hi"


def test_sample_attributes_cell_matches_soa():
    """The single-gather cell-row attribute fetch (32 B rows: corner
    heights + packed corner normals) is bit-identical to the four-gather
    attr-table path."""
    from topo_renderer_tpu.ops.surface import (
        sample_attributes_cell,
        sample_attributes_soa,
    )

    mosaic, cam, _ = small_scene(n=65, span_deg=0.05)
    rng = np.random.default_rng(3)
    gx = jnp.asarray(rng.uniform(-2, 66, (64, 64)).astype(np.float32))
    gy = jnp.asarray(rng.uniform(-2, 66, (64, 64)).astype(np.float32))
    a = sample_attributes_cell(mosaic, gx, gy)
    b = sample_attributes_soa(mosaic, gx, gy)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_lane_shuffle_roundtrip():
    """The lane-decorrelating pixel interleave inverts exactly (including
    non-multiple-of-8 shapes, which pad with edge rows)."""
    from topo_renderer_tpu.ops.raycast import _lane_shuffle, _lane_unshuffle

    rng = np.random.default_rng(5)
    for shape in ((450, 800), (96, 160), (64, 128)):
        a = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        b = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        (sa, sb), meta = _lane_shuffle([a, b])
        ra, rb = _lane_unshuffle([sa, sb], meta)
        np.testing.assert_array_equal(np.asarray(ra), np.asarray(a))
        np.testing.assert_array_equal(np.asarray(rb), np.asarray(b))
        # the shuffle actually moves pixels (not the identity)
        assert not np.array_equal(np.asarray(sa)[: shape[0], : shape[1]], np.asarray(a))
