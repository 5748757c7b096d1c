"""Panorama column-march renderer tests: analytic horizon + cross-validation
against the per-pixel ray marcher."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from tests.helpers import make_tile, small_scene
from topo_renderer_tpu.geo import GeoCoord
from topo_renderer_tpu.models.camera import Camera
from topo_renderer_tpu.models.scene import build_mosaic
from topo_renderer_tpu.ops.geometry import R0
from topo_renderer_tpu.ops.panorama import PanoramaSpec, render_panorama
from topo_renderer_tpu.ops.raycast import march


def flat_scene(height=1000.0, n=129, span_deg=0.5):
    tile = make_tile(49, 20, n=n, span_deg=span_deg)
    tile.heights[:] = height
    mosaic = build_mosaic([tile])
    lat, lon = 49.25, 20.25
    cam = Camera().reset(GeoCoord(lat, lon), height + 200.0)
    return mosaic, cam


def test_flat_terrain_horizon():
    mosaic, cam = flat_scene()
    spec = PanoramaSpec(
        width=128, height=256, n_steps=512, elev_min=-0.12, elev_max=0.02,
        n_refine=8,
    )
    out = render_panorama(
        mosaic, cam.eye, spec, sun_direction=np.asarray(cam.sun_angle.to_vec3()),
        quantize_rt=False, apply_postprocess=False,
    )
    hit = np.asarray(out["hit"])
    # Geometric dip of the horizon for eye 200 m above terrain of height h:
    # cos(dip) relation on the sphere of radius R0+h.
    a = 200.0
    rr = R0 + 1000.0
    dip = -np.arccos(rr / (rr + a))
    rows = np.linspace(0.02, -0.12, 256, endpoint=False) - 0.5 * 0.14 / 256
    # Rows looking well above the horizon are sky; well below are terrain.
    above = rows > dip + 0.01
    below = rows < dip - 0.01
    assert hit[below].mean() > 0.99
    assert hit[above].mean() < 0.01
    # Distance straight down rows: for steep depression angles, the slant
    # distance approaches a / sin(|angle|).
    steep = rows < -0.08
    d = np.asarray(out["distance"])[steep]
    expect = a / np.sin(np.abs(rows[steep]))
    rel = np.abs(d - expect[:, None]) / expect[:, None]
    assert np.median(rel) < 0.05


def test_panorama_matches_per_pixel_march():
    mosaic, cam, _ = small_scene(n=65, span_deg=0.05, height_above=500.0)
    spec = PanoramaSpec(
        width=192, height=96, n_steps=768, elev_min=-0.35, elev_max=0.15,
        s_near=5.0, s_far=40_000.0, n_refine=10,
    )
    eye = jnp.asarray(cam.eye)
    out = render_panorama(
        mosaic, eye, spec, sun_direction=np.asarray(cam.sun_angle.to_vec3()),
        quantize_rt=False, apply_postprocess=False,
    )

    # Build the equivalent per-pixel rays: dir = cos(e) h_az + sin(e) up.
    eye_np = np.asarray(eye, np.float64)
    e_norm = np.linalg.norm(eye_np)
    up = eye_np / e_norm
    lon0 = np.arctan2(eye_np[1], eye_np[0])
    lat0 = np.arcsin(up[2])
    east = np.array([-np.sin(lon0), np.cos(lon0), 0.0])
    north = np.array(
        [-np.sin(lat0) * np.cos(lon0), -np.sin(lat0) * np.sin(lon0), np.cos(lat0)]
    )
    W, H = spec.width, spec.height
    phi = spec.azimuth_start + spec.azimuth_span * ((np.arange(W) + 0.5) / W)
    h_az = north[None, :] * np.cos(phi)[:, None] + east[None, :] * np.sin(phi)[:, None]
    e_lo, e_hi = spec.elevation_range()
    e_pix = e_hi - (np.arange(H) + 0.5) / H * (e_hi - e_lo)
    dirs = (
        np.cos(e_pix)[:, None, None] * h_az[None, :, :]
        + np.sin(e_pix)[:, None, None] * up[None, None, :]
    )
    hit2, t2 = march(
        mosaic, eye, jnp.asarray(dirs, jnp.float32), n_steps=1024, n_refine=24
    )
    hit2 = np.asarray(hit2)
    t2 = np.asarray(t2)

    hit1 = np.asarray(out["hit"])
    d1 = np.asarray(out["distance"])

    agree = (hit1 == hit2).mean()
    assert agree > 0.99, f"hit masks agree only {agree:.1%}"

    both = hit1 & hit2
    rel = np.abs(d1[both] - t2[both]) / np.maximum(t2[both], 1.0)
    assert np.median(rel) < 5e-3
    assert (rel < 0.05).mean() > 0.95


def test_panorama_full_circle_wraps():
    mosaic, cam, _ = small_scene(n=33, span_deg=0.03, height_above=300.0)
    spec = PanoramaSpec(width=64, height=32, n_steps=256, n_refine=4)
    out = render_panorama(
        mosaic, cam.eye, spec, sun_direction=np.asarray(cam.sun_angle.to_vec3()),
        quantize_rt=False, apply_postprocess=False,
    )
    color = np.asarray(out["color"])
    assert color.shape == (32, 64, 3)
    assert np.isfinite(color).all()
    # Scene around the camera: some terrain in view.
    assert np.asarray(out["hit"]).mean() > 0.05


def test_fast_preset_close_to_exact():
    """The LOD/fast preset must stay visually close to the exact path on a
    smooth scene: hit masks nearly identical, distances within a few percent."""
    mosaic, cam, _ = small_scene(n=65, span_deg=0.05, height_above=500.0)
    kw = dict(
        width=128, height=64, elev_min=-0.3, elev_max=0.1,
        s_near=5.0, s_far=40_000.0,
    )
    exact = PanoramaSpec(n_steps=512, n_refine=6, **kw)
    fast = PanoramaSpec.fast(n_steps=256, **kw)
    sun = np.asarray(cam.sun_angle.to_vec3())
    a = render_panorama(mosaic, cam.eye, exact, sun, quantize_rt=False, apply_postprocess=False)
    b = render_panorama(mosaic, cam.eye, fast, sun, quantize_rt=False, apply_postprocess=False)
    ha, hb = np.asarray(a["hit"]), np.asarray(b["hit"])
    assert (ha == hb).mean() > 0.97
    both = ha & hb
    rel = np.abs(np.asarray(a["distance"]) - np.asarray(b["distance"]))[both] / np.maximum(
        np.asarray(a["distance"])[both], 1.0
    )
    # Nearest+strided profile trades ~texel-level accuracy for gather count.
    assert np.median(rel) < 0.04
    assert np.percentile(rel, 90) < 0.15
    # Shading should broadly agree as well (nearest attrs vs triangle interp).
    diff = np.abs(np.asarray(a["color"]) - np.asarray(b["color"]))[both]
    assert np.median(diff) < 0.05


def test_clipmap_windows_match_full_tables():
    """Forcing clipmap windows (threshold 0) must reproduce the unwindowed
    LOD render exactly — the windows provably cover every sampled texel."""
    import dataclasses as dc

    # n must exceed the aligned window size (512 lanes at n_steps=256 with
    # the doubled alignment slack) or no level gets windowed and the test
    # compares the full path against itself.
    mosaic, cam, _ = small_scene(n=560, span_deg=0.05, height_above=500.0)
    kw = dict(width=128, height=64, elev_min=-0.3, elev_max=0.1,
              s_near=5.0, s_far=40_000.0, n_steps=256)
    full = PanoramaSpec.fast(clipmap=False, **kw)
    windowed = dc.replace(PanoramaSpec.fast(**kw), clipmap_threshold=0)
    from topo_renderer_tpu.ops.panorama import _clipmap_window_plan
    assert any(u for _, u, _, _, _ in _clipmap_window_plan(windowed, mosaic))
    sun = np.asarray(cam.sun_angle.to_vec3())
    a = render_panorama(mosaic, cam.eye, full, sun, quantize_rt=False, apply_postprocess=False)
    b = render_panorama(mosaic, cam.eye, windowed, sun, quantize_rt=False, apply_postprocess=False)
    # The windowed path blends the near field from quad-row tables — same
    # math, different fusion graph, so XLA's FMA contraction may flip pixels
    # whose crossing sits exactly on a ulp boundary. A *coverage* bug (the
    # thing this test guards) wipes out whole image regions, not <0.1%.
    hit_a, hit_b = np.asarray(a["hit"]), np.asarray(b["hit"])
    assert (hit_a != hit_b).mean() < 1e-3
    cdiff = np.abs(np.asarray(a["color"]) - np.asarray(b["color"]))
    assert (cdiff > 1e-5).mean() < 1e-3, f"{(cdiff > 1e-5).mean():.2%} differ"
    both = hit_a & hit_b
    rdiff = np.abs(np.asarray(a["distance"]) - np.asarray(b["distance"]))[both]
    rel = rdiff / np.maximum(np.asarray(a["distance"])[both], 1.0)
    assert (rel > 1e-5).mean() < 1e-3


def test_pre_extracted_windows_equal():
    """The two-program path (extract_clipmap_windows + render) must reproduce
    the single-program path — the extraction program slices the very same
    windows the render would have sliced inline. Not bit-exact: the quad-row
    blend fuses differently in the two program contexts, so XLA's FMA
    contraction perturbs the near field by ~1 ulp."""
    import dataclasses as dc

    from topo_renderer_tpu.ops.panorama import extract_clipmap_windows

    mosaic, cam, _ = small_scene(n=560, span_deg=0.05, height_above=500.0)
    spec = dc.replace(
        PanoramaSpec.fast(width=128, height=64, elev_min=-0.3, elev_max=0.1,
                          s_near=5.0, s_far=40_000.0, n_steps=256),
        clipmap_threshold=0,
    )
    from topo_renderer_tpu.ops.panorama import _clipmap_window_plan
    assert any(u for _, u, _, _, _ in _clipmap_window_plan(spec, mosaic))
    sun = np.asarray(cam.sun_angle.to_vec3())
    a = render_panorama(mosaic, cam.eye, spec, sun)
    win = extract_clipmap_windows(mosaic, cam.eye, spec)
    b = render_panorama(mosaic, cam.eye, spec, sun, windows=win)
    # sRGB-quantized u8 output: allow 1/255 flips on a tiny fraction of
    # near-field texels (FMA contraction), nothing more.
    cdiff = np.abs(
        np.asarray(a["color"], np.float32) - np.asarray(b["color"], np.float32)
    )
    assert cdiff.max() <= (1.5 / 255.0), cdiff.max()
    assert (cdiff > 0).mean() < 0.03
    ddiff = np.abs(np.asarray(a["depth"]) - np.asarray(b["depth"]))
    assert ddiff.max() < 1e-5


def test_window_2d_tables_bitwise_equal_band_path():
    """Window extraction from the 2-D win_attr_2d copies must slice the very
    same texels the flat-table row-band path does."""
    import dataclasses as dc

    from tests.helpers import make_tile
    from topo_renderer_tpu.models.camera import Camera
    from topo_renderer_tpu.ops.panorama import extract_clipmap_windows

    tile = make_tile(49, 20, n=448, span_deg=0.05)
    with_2d = build_mosaic([tile], window_table_min=0)
    without = build_mosaic([tile], window_table_min=1 << 40)
    assert all(w is not None for w in with_2d.win_attr_2d)
    assert all(w is None for w in without.win_attr_2d)
    eye = jnp.asarray(with_2d.bound_center) * (
        1.0 + 500.0 / float(jnp.linalg.norm(with_2d.bound_center))
    )
    spec = dc.replace(
        PanoramaSpec.fast(width=64, height=32, elev_min=-0.3, elev_max=0.1,
                          s_near=5.0, s_far=40_000.0, n_steps=128),
        clipmap_threshold=0,
    )
    wa = extract_clipmap_windows(with_2d, eye, spec)
    wb = extract_clipmap_windows(without, eye, spec)
    assert any(aa is not None for (_, aa, _, _, _) in wa), "no level windowed"
    for (ha, aa, qa, xa, ya), (hb, ab, qb, xb, yb) in zip(wa, wb):
        np.testing.assert_array_equal(np.asarray(aa), np.asarray(ab))
        np.testing.assert_array_equal(np.asarray(qa), np.asarray(qb))
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
        np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))


def test_panorama_fog_modes():
    mosaic, cam, _ = small_scene(n=33, span_deg=0.03, height_above=300.0)
    spec = PanoramaSpec(width=32, height=16, n_steps=128, n_refine=2)
    sun = np.asarray(cam.sun_angle.to_vec3())
    base = render_panorama(
        mosaic, cam.eye, spec, sun, quantize_rt=False, apply_postprocess=False
    )
    foggy = render_panorama(
        mosaic, cam.eye, spec, sun, quantize_rt=False, apply_postprocess=False,
        fog="distance", fog_density=1.0 / 500.0,
    )
    hit = np.asarray(base["hit"])
    sky = np.array([0.0, 0.71, 0.885])
    # Fogged pixels follow the exponential mix exactly.
    f = 1.0 - np.exp(-np.asarray(base["distance"]) / 500.0)
    expect = np.asarray(base["color"]) + (sky - np.asarray(base["color"])) * f[..., None]
    np.testing.assert_allclose(
        np.asarray(foggy["color"])[hit], expect[hit], atol=1e-5
    )
    # Sky pixels stay untouched.
    np.testing.assert_allclose(
        np.asarray(foggy["color"])[~hit], np.asarray(base["color"])[~hit], atol=1e-6
    )


def test_batched_windows_match_per_eye():
    """Batched extraction + vmapped render (config-5 single-program path)
    reproduces the per-eye loop. On CPU this exercises the vmapped-slicing
    fallback; the DMA kernel path is asserted on TPU in scripts."""
    import dataclasses as dc

    import jax

    from topo_renderer_tpu.ops.panorama import (
        extract_clipmap_windows,
        extract_clipmap_windows_batched,
    )

    mosaic, cam, _ = small_scene(n=560, span_deg=0.05, height_above=500.0)
    spec = dc.replace(
        PanoramaSpec.fast(width=128, height=64, elev_min=-0.3, elev_max=0.1,
                          s_near=5.0, s_far=40_000.0, n_steps=256),
        clipmap_threshold=0,
    )
    sun = jnp.asarray(np.asarray(cam.sun_angle.to_vec3()), jnp.float32)
    eye = jnp.asarray(cam.eye, jnp.float32)
    up = eye / jnp.linalg.norm(eye)
    eyes = jnp.stack([eye, eye + 40.0 * up, eye + 90.0 * up])
    suns = jnp.stack([sun] * 3)

    win_b = extract_clipmap_windows_batched(mosaic, eyes, spec)
    colors_b = jax.vmap(
        lambda e, s, w: render_panorama(mosaic, e, spec, s, windows=w)["color"]
    )(eyes, suns, win_b)

    for i in range(3):
        win = extract_clipmap_windows(mosaic, eyes[i], spec)
        want = render_panorama(mosaic, eyes[i], spec, suns[i], windows=win)["color"]
        diff = np.abs(
            np.asarray(colors_b[i], np.float32) - np.asarray(want, np.float32)
        )
        # sRGB-quantized output; vmap may fuse differently (FMA contraction).
        assert diff.max() <= 1.5 / 255.0, (i, diff.max())
        assert (diff > 0).mean() < 0.03


def test_render_batch_scan_matches_per_eye():
    """The one-program scan batch (engine render_batch path) reproduces the
    per-eye two-program renders."""
    import dataclasses as dc

    from topo_renderer_tpu.ops.panorama import (
        extract_clipmap_windows,
        render_batch_scan,
    )

    mosaic, cam, _ = small_scene(n=560, span_deg=0.05, height_above=500.0)
    spec = dc.replace(
        PanoramaSpec.fast(width=128, height=64, elev_min=-0.3, elev_max=0.1,
                          s_near=5.0, s_far=40_000.0, n_steps=256),
        clipmap_threshold=0,
    )
    sun = jnp.asarray(np.asarray(cam.sun_angle.to_vec3()), jnp.float32)
    eye = jnp.asarray(cam.eye, jnp.float32)
    up = eye / jnp.linalg.norm(eye)
    eyes = jnp.stack([eye, eye + 50.0 * up, eye + 120.0 * up])
    suns = jnp.stack([sun] * 3)

    colors = render_batch_scan(mosaic, eyes, suns, spec, fog="atmosphere")
    assert colors.shape == (3, 64, 128, 3)
    for i in range(3):
        win = extract_clipmap_windows(mosaic, eyes[i], spec)
        want = render_panorama(
            mosaic, eyes[i], spec, suns[i], fog="atmosphere", windows=win
        )["color"]
        diff = np.abs(
            np.asarray(colors[i], np.float32) - np.asarray(want, np.float32)
        )
        assert diff.max() <= 1.5 / 255.0, (i, diff.max())
        assert (diff > 0).mean() < 0.03


def test_crossing_prepass_brackets_true_crossing():
    """`panorama_crossing_prepass` returns analytic [d_lo, d_hi] brackets
    that must contain the true crossing distance found by the dense exact
    march along matching rays (the guided perspective march relies on it)."""
    from topo_renderer_tpu.ops.panorama import panorama_crossing_prepass
    from topo_renderer_tpu.ops.raycast import march

    mosaic, cam, _ = small_scene(n=65, span_deg=0.05, height_above=700.0)
    eye = jnp.asarray(cam.eye, jnp.float32)
    spec = PanoramaSpec(
        width=128, height=64, n_steps=512, s_near=5.0, s_far=60_000.0,
        elev_min=-0.5, elev_max=0.1,
    )
    pre = panorama_crossing_prepass(mosaic, eye, spec)
    hit = np.asarray(pre["hit"])
    d_lo = np.asarray(pre["d_lo"])
    d_hi = np.asarray(pre["d_hi"])
    assert 0.05 < hit.mean() < 1.0

    # Rebuild the same ray directions the prepass implies and march them.
    e = np.asarray(eye, np.float64)
    up = e / np.linalg.norm(e)
    lon0 = np.arctan2(e[1], e[0])
    lat0 = np.arcsin(np.clip(e[2] / np.linalg.norm(e), -1, 1))
    east = np.array([-np.sin(lon0), np.cos(lon0), 0.0])
    north = np.array(
        [-np.sin(lat0) * np.cos(lon0), -np.sin(lat0) * np.sin(lon0), np.cos(lat0)]
    )
    W, H = spec.width, spec.height
    phi = spec.azimuth_start + spec.azimuth_span * (np.arange(W) + 0.5) / W
    e_hi_, e_lo_ = spec.elevation_range()[1], spec.elevation_range()[0]
    elev = e_hi_ - (np.arange(H) + 0.5) / H * (e_hi_ - e_lo_)
    h_dir = (
        north[None, :] * np.cos(phi)[:, None] + east[None, :] * np.sin(phi)[:, None]
    )
    dirs = (
        np.cos(elev)[:, None, None] * h_dir[None, :, :]
        + np.sin(elev)[:, None, None] * up[None, None, :]
    )  # [H, W, 3]
    hit_m, t_m = march(
        mosaic, eye, jnp.asarray(dirs, jnp.float32), n_steps=768, n_refine=20
    )
    hm = np.asarray(hit_m)
    tm = np.asarray(t_m)

    both = hit & hm
    assert both.mean() > 0.05
    # Bracket containment with a small slack for the profile's bracket ends
    # (sub-texel discretisation) — the guided march adds 1% + 150 m margins.
    lo_ok = tm[both] >= d_lo[both] * 0.99 - 150.0
    hi_ok = tm[both] <= d_hi[both] * 1.01 + 150.0
    assert lo_ok.mean() > 0.99, lo_ok.mean()
    assert hi_ok.mean() > 0.99, hi_ok.mean()


def test_profile_far_stride_close_to_full():
    """The far-stride knob halves far-segment profile columns; output must
    stay within the LOD-approximation class of the full-stride render
    (silhouette-band differences only)."""
    import dataclasses as dc

    mosaic, cam, _ = small_scene(n=560, span_deg=0.05, height_above=500.0)
    base = dc.replace(
        PanoramaSpec.fast(width=256, height=96, elev_min=-0.4, elev_max=0.1,
                          s_near=5.0, s_far=40_000.0, n_steps=256),
        clipmap_threshold=0,
    )
    far = dc.replace(base, profile_far_stride_m=3_000.0)
    sun = jnp.asarray(np.asarray(cam.sun_angle.to_vec3()), jnp.float32)
    a = render_panorama(mosaic, cam.eye, base, sun)
    b = render_panorama(mosaic, cam.eye, far, sun)
    ca = np.asarray(a["color"], np.float32)
    cb = np.asarray(b["color"], np.float32)
    diff = np.abs(ca - cb).max(axis=-1)
    # Interior identical; a small azimuth-quantized silhouette band differs.
    assert (diff > 2.0 / 255.0).mean() < 0.06, (diff > 2/255.).mean()
    assert np.median(diff) == 0.0
    ha = np.asarray(a["hit"]); hb = np.asarray(b["hit"])
    assert (ha != hb).mean() < 0.05


def test_far_stride_quality_bounded():
    """Distance-adaptive azimuth stride (2x then 4x tiers): far profile
    columns are shared, quantizing distant terrain to 2-/4-column blocks.
    The lateral quantization is k*dphi/0.0112 LOD texels (<= 0.55 at k=4),
    so the strided render must stay close to the unstrided one away from
    a small silhouette band."""
    from tests.helpers import make_tile
    from topo_renderer_tpu.models.scene import build_mosaic
    from topo_renderer_tpu.ops.geometry import R0

    tile = make_tile(49, 20, n=513, span_deg=0.5)
    mosaic = build_mosaic([tile])
    lat, lon = np.radians(49.25), np.radians(20.25)
    r = R0 + 2500.0
    eye = jnp.array(
        [r * np.cos(lat) * np.cos(lon), r * np.cos(lat) * np.sin(lon),
         r * np.sin(lat)], jnp.float32,
    )
    sun = jnp.array([0.3, 0.5, 0.8], jnp.float32)
    base = dict(width=512, height=128, n_steps=256, clipmap_threshold=10**9)
    s0 = PanoramaSpec.fast(**base)
    s2 = PanoramaSpec.fast(**base, profile_far_stride_m=8000.0,
                           profile_far_stride4_m=30000.0)
    a = np.asarray(render_panorama(mosaic, eye, s0, sun)["color"])
    b = np.asarray(render_panorama(mosaic, eye, s2, sun)["color"])
    err = np.abs(a - b).max(axis=-1)
    assert np.median(err) < 1.0 / 255.0
    assert (err > 8.0 / 255.0).mean() < 0.03, f"{(err > 8/255).mean():.2%}"
