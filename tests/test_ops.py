"""Compute-op tests: normals (incl. seam parity), shading/dither, postprocess."""

import numpy as np
import jax.numpy as jnp

from topo_renderer_tpu.ops.geometry import R0
from topo_renderer_tpu.ops.normals import compute_normals, quantize_unorm8
from topo_renderer_tpu.ops.postprocess import (
    atmospheric_shading,
    distance_fog,
    postprocess,
    smoothstep,
)
from topo_renderer_tpu.ops.sampling import bilinear_sample_hw, bilinear_sample_hwc
from topo_renderer_tpu.ops.shading import (
    dither_rgb,
    hash12n,
    linear_to_srgb,
    quantize_srgb8,
    shade,
    srgb_to_linear,
)

PS = (0.000833333, 0.000833333)  # 3 arcsec
RASTER = (0.0, 0.0)
MODEL = (20.0, 50.0)


def test_normals_flat_terrain():
    h = np.zeros((16, 16), np.float32)
    n = np.asarray(compute_normals(h, PS, RASTER, MODEL, quantize=False))
    # Interior: straight up in the local frame.
    np.testing.assert_allclose(
        n[1:-1, 1:-1], np.broadcast_to([0.0, 0.0, 1.0], n[1:-1, 1:-1].shape), atol=1e-6
    )
    # Border ring: zero-encoded -> decodes to (-1,-1,-1)
    # (`compute_normals_shader.wgsl:27-30` + wgpu zero-init).
    np.testing.assert_allclose(n[0, :], -1.0)
    np.testing.assert_allclose(n[:, -1], -1.0)


def test_normals_slope_analytic():
    # East-facing slope: h = g * column. The local normal of slope s (rise per
    # metric meter eastward) is normalize((-s, 0, 1)).
    g = 30.0  # meters per texel
    cols = np.arange(32, dtype=np.float32)
    h = np.tile(cols * g, (32, 1))
    n = np.asarray(compute_normals(h, PS, RASTER, MODEL, quantize=False))
    x_m = np.radians(PS[0]) * R0  # reference: no cos correction on x
    expected = np.array([-g / x_m, 0.0, 1.0])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(n[5, 5], expected, atol=1e-5)


def test_normals_latitude_correction_on_y():
    # North-facing slope: the reference scales the latitude spacing by
    # cos(lat) (`compute_normals_shader.wgsl:39-40`), so the normal flattens
    # with latitude relative to the geographically-correct value.
    g = 30.0
    rows = np.arange(32, dtype=np.float32)
    h = np.tile((rows * g)[:, None], (1, 32))  # height grows southward
    n_ref = np.asarray(compute_normals(h, PS, RASTER, MODEL, quantize=False))
    n_fix = np.asarray(
        compute_normals(h, PS, RASTER, MODEL, quantize=False, correct_axes=True)
    )
    lat = MODEL[1]
    y_ref = np.radians(PS[1]) * R0 * np.cos(np.radians(lat))
    expected = np.array([0.0, g / y_ref, 1.0])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(n_ref[5, 5], expected, atol=1e-4)
    # corrected version uses the raw latitude spacing
    y_fix = np.radians(PS[1]) * R0
    expected_fix = np.array([0.0, g / y_fix, 1.0])
    expected_fix /= np.linalg.norm(expected_fix)
    np.testing.assert_allclose(n_fix[5, 5], expected_fix, atol=1e-4)


def test_normals_seam_parity():
    """Two tiles sharing a seam column: normals computed on the stitched
    mosaic must equal the cross-tile central difference — the semantic of the
    reference's edge shader (`compute_normals_edge_shader.wgsl:25-69`) —
    while isolated tiles leave the seam zero-encoded."""
    rng = np.random.default_rng(7)
    w = 17
    left = rng.normal(1000, 100, size=(16, w)).astype(np.float32)
    right = rng.normal(1000, 100, size=(16, w)).astype(np.float32)
    right[:, 0] = left[:, -1]  # shared seam column
    mosaic = np.concatenate([left, right[:, 1:]], axis=1)

    n_mosaic = np.asarray(compute_normals(mosaic, PS, RASTER, MODEL, quantize=False))
    n_left = np.asarray(compute_normals(left, PS, RASTER, MODEL, quantize=False))

    # Seam column in mosaic coordinates is w-1.
    seam = n_mosaic[1:-1, w - 1]
    # isolated tile: seam is the tile border -> zero-encoded
    np.testing.assert_allclose(n_left[1:-1, -1], -1.0)
    # mosaic: seam equals a direct central difference across both tiles
    x_m = np.radians(PS[0]) * R0
    rows = np.arange(1, 15)
    lat = (rows - RASTER[1]) * -PS[1] + MODEL[1]
    y_m = np.radians(PS[1]) * R0 * np.cos(np.radians(lat))
    dhx = right[1:-1, 1] - left[1:-1, -2]
    dhy = mosaic[0:-2, w - 1] - mosaic[2:, w - 1]
    n_expect = np.stack(
        [-2 * y_m * dhx, -2 * x_m * dhy, 4 * x_m * y_m * np.ones_like(dhx)], axis=-1
    )
    n_expect /= np.linalg.norm(n_expect, axis=-1, keepdims=True)
    np.testing.assert_allclose(seam, n_expect, atol=1e-5)


def test_normals_quantization():
    h = np.random.default_rng(0).normal(1000, 50, (8, 8)).astype(np.float32)
    nq = np.asarray(compute_normals(h, PS, RASTER, MODEL, quantize=True))
    nf = np.asarray(compute_normals(h, PS, RASTER, MODEL, quantize=False))
    assert np.max(np.abs(nq - nf)) <= 1.0 / 255.0 + 1e-6
    # quantized values live on the 256-level grid
    enc = 0.5 * (nq + 1.0)
    np.testing.assert_allclose(enc, np.round(enc * 255) / 255, atol=1e-6)


def test_validity_mask():
    h = np.zeros((8, 8), np.float32)
    valid = np.ones((8, 8), bool)
    valid[:, 4:] = False
    n = np.asarray(compute_normals(h, PS, RASTER, MODEL, valid=valid, quantize=False))
    np.testing.assert_allclose(n[2, 2], [0, 0, 1], atol=1e-6)
    # texels adjacent to invalid region fall back to zero-encoded
    np.testing.assert_allclose(n[2, 3], -1.0)
    np.testing.assert_allclose(n[2, 5], -1.0)


def test_hash_dither_range_and_determinism():
    rng = np.random.default_rng(1)
    seeds = rng.uniform(-2000, 2000, size=(128, 2)).astype(np.float32)
    h1 = np.asarray(hash12n(seeds))
    h2 = np.asarray(hash12n(seeds))
    np.testing.assert_array_equal(h1, h2)
    assert np.all((h1 >= 0) & (h1 < 1))
    color = np.full((128, 3), 0.5, np.float32)
    dithered = np.asarray(dither_rgb(color, seeds))
    assert np.max(np.abs(dithered - 0.5)) <= 1.0 / 255.0 + 1e-6


def test_shade_modes():
    sun = jnp.array([0.0, 0.0, 1.0])
    n = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
    seed = jnp.zeros((2, 2))
    lin = np.asarray(shade(n, sun, 1, seed))
    np.testing.assert_allclose(lin[0], 0.71, atol=1e-6)  # ambient + diffuse
    np.testing.assert_allclose(lin[1], 0.01, atol=1e-6)  # ambient only
    vis = np.asarray(shade(n, sun, 2, seed))
    np.testing.assert_allclose(vis[0], [0.5, 0.5, 1.0], atol=1e-6)
    dithered = np.asarray(shade(n, sun, 0, seed))
    assert np.max(np.abs(dithered - lin)) <= 1.0 / 255.0 + 1e-6


def test_srgb_roundtrip():
    x = np.linspace(0, 1, 64, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(srgb_to_linear(linear_to_srgb(x))), x, atol=1e-5
    )
    q = np.asarray(quantize_srgb8(x))
    assert np.max(np.abs(q - x)) < 1.0 / 255.0  # sRGB 8-bit error bound


def test_postprocess_flat_depth_unchanged():
    color = np.random.default_rng(2).uniform(0, 1, (12, 16, 3)).astype(np.float32)
    depth = np.full((12, 16), 0.5, np.float32)
    out = np.asarray(postprocess(color, depth))
    np.testing.assert_allclose(out, color, atol=1e-6)


def test_postprocess_contour_on_edge():
    # Near silhouette: a block at depth-for-1km against sky (depth 1 -> FAR).
    from topo_renderer_tpu.models.camera import depth_from_dist

    color = np.full((16, 16, 3), 0.8, np.float32)
    depth = np.full((16, 16), 1.0, np.float32)
    depth[:, :8] = float(depth_from_dist(1000.0))
    out = np.asarray(postprocess(color, depth))
    # The contour lands on the *far* side of the discontinuity (the sky pixel
    # adjacent to terrain has contour = 8*FAR - (3*1km + 5*FAR) >> 0).
    assert np.all(out[:, 8] < 0.05)
    # Terrain side has negative contour, deep sky has zero: both unchanged.
    np.testing.assert_allclose(out[:, 7], 0.8, atol=1e-6)
    np.testing.assert_allclose(out[:, 12], 0.8, atol=1e-6)
    np.testing.assert_allclose(out[:, 2], 0.8, atol=1e-6)


def test_postprocess_pixelize():
    rng = np.random.default_rng(3)
    color = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    depth = np.full((32, 32), 0.5, np.float32)
    out = np.asarray(postprocess(color, depth, pixelize_n=8.0))
    # 8 blocks across a 32px image -> 4px blocks, constant within each block.
    block = out[0:4, 0:4]
    assert np.allclose(block, block[0, 0], atol=1e-6)
    out_off = np.asarray(postprocess(color, depth, pixelize_n=100.0))
    np.testing.assert_allclose(out_off, color, atol=1e-6)


def test_fog_and_atmosphere():
    color = np.full((4, 4, 3), 0.5, np.float32)
    dist = np.full((4, 4), 1e9, np.float32)
    fogged = np.asarray(distance_fog(color, dist, (0.0, 0.71, 0.885)))
    np.testing.assert_allclose(fogged, np.broadcast_to([0.0, 0.71, 0.885], fogged.shape), atol=1e-4)
    near = np.asarray(distance_fog(color, np.zeros((4, 4), np.float32), (0, 0, 0)))
    np.testing.assert_allclose(near, 0.5, atol=1e-6)
    atm = np.asarray(atmospheric_shading(color, dist, (0.0, 0.71, 0.885)))
    np.testing.assert_allclose(atm, np.broadcast_to([0.0, 0.71, 0.885], atm.shape), atol=1e-4)


def test_bilinear_sampler():
    img = np.array([[0.0, 1.0], [2.0, 3.0]], np.float32)
    # texel centers
    assert float(bilinear_sample_hw(img, jnp.float32(0), jnp.float32(0))) == 0.0
    assert float(bilinear_sample_hw(img, jnp.float32(1), jnp.float32(1))) == 3.0
    # midpoint
    np.testing.assert_allclose(
        float(bilinear_sample_hw(img, jnp.float32(0.5), jnp.float32(0.5))), 1.5
    )
    # clamp-to-edge
    np.testing.assert_allclose(
        float(bilinear_sample_hw(img, jnp.float32(-5.0), jnp.float32(0.0))), 0.0
    )
    imgc = np.stack([img, img * 10], axis=-1)
    out = np.asarray(bilinear_sample_hwc(imgc, jnp.float32(0.5), jnp.float32(0.5)))
    np.testing.assert_allclose(out, [1.5, 15.0])


def test_smoothstep():
    assert float(smoothstep(0.0, 1.0, -1.0)) == 0.0
    assert float(smoothstep(0.0, 1.0, 2.0)) == 1.0
    np.testing.assert_allclose(float(smoothstep(0.0, 1.0, 0.5)), 0.5)
