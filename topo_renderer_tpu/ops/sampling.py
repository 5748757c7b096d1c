"""Texture-style sampling helpers (clamp-to-edge bilinear / nearest).

wgpu samplers in the reference default to clamp-to-edge addressing
(`topo-renderer/src/render/bound_texture_view.rs:24-105` creates default
samplers); texel centers sit at (i + 0.5). These helpers reproduce that
convention for arrays, batched over leading axes and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img, x, y):
    """Sample ``img[..., H, W]`` or ``img[..., H, W, C]`` at texel-space
    coordinates (x, y) where (0, 0) is the *center* of texel (0, 0).

    ``x``/``y`` are arrays of identical shape; the result broadcasts the
    image's leading axes with the coordinate shape (coordinates index the
    trailing H/W axes).
    """
    has_channels = False
    if img.ndim >= 3 and img.shape[-1] <= 8 and img.shape[-3] > 8:
        # Heuristic only used for internal callers; prefer explicit wrappers.
        has_channels = True
    return _bilinear(img, x, y, has_channels)


def bilinear_sample_hw(img, x, y):
    """``img[..., H, W]`` single-channel variant."""
    return _bilinear(img, x, y, has_channels=False)


def bilinear_sample_hwc(img, x, y):
    """``img[..., H, W, C]`` multi-channel variant; returns ``[..., C]``."""
    return _bilinear(img, x, y, has_channels=True)


def _bilinear(img, x, y, has_channels):
    img = jnp.asarray(img)
    if has_channels:
        h, w = img.shape[-3], img.shape[-2]
    else:
        h, w = img.shape[-2], img.shape[-1]
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)

    if has_channels:
        v00 = img[..., y0, x0, :]
        v01 = img[..., y0, x1, :]
        v10 = img[..., y1, x0, :]
        v11 = img[..., y1, x1, :]
        fx = fx[..., None]
        fy = fy[..., None]
    else:
        v00 = img[..., y0, x0]
        v01 = img[..., y0, x1]
        v10 = img[..., y1, x0]
        v11 = img[..., y1, x1]
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def nearest_sample_hw(img, x, y):
    """Nearest (textureLoad-style) lookup with clamping, ``img[..., H, W]``."""
    img = jnp.asarray(img)
    h, w = img.shape[-2], img.shape[-1]
    xi = jnp.clip(jnp.asarray(x, jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.asarray(y, jnp.int32), 0, h - 1)
    return img[..., yi, xi]
