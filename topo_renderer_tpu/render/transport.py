"""One-transfer interactive frame encoding (device -> host).

The interactive loop's fixed costs on a tunneled TPU are per-TRANSFER round
trips plus per-BYTE link time (measured: ~13 ms for a 6 KB packed label
pull, ~25-66 ms for the 1.08 MB raw u8 frame, session-dependent — NOTES.md).
Two independent reductions, composable:

  * **labels ride the frame** (round-3 verdict item 4): the fused
    frame+label programs used to return the packed ``i32[3, P]``
    visibility as a SECOND device array — a second pull, a second round
    trip, ~15 ms for ~6 KB. Here the visibility is encoded into ~P*6
    bytes appended to the frame's u8 byte stream, so one pull carries
    both (`encode_labels_u8` / `decode_labels_u8`).
  * **reduced-byte pixel formats** (round-3 verdict item 5): the raw
    frame is 3 B/px. ``yuv420`` packs full-resolution luma + 2x2-mean
    chroma (1.5 B/px — the same subsampling the JPEG encoder applies
    afterwards anyway, so the served image is visually unchanged);
    ``yuv420_half`` additionally pulls at half resolution for motion
    frames (0.375 B/px) and upsamples on host.

The wire layout is a single flat u8 vector: pixel payload first, label
bytes appended (shape/offsets are static given (H, W, P, mode) — no
header). The reference has no transport layer at all (the frame never
leaves the GPU, `topo-renderer/src/render/render_engine.rs:219-249`); this
is the TPU-serving counterpart of its render-to-surface step.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from topo_renderer_tpu.ops.shading import linear_to_srgb

MODES = ("rgb888", "yuv420", "yuv420_half")


def _ceil2(n: int) -> int:
    return -(-n // 2)


def pixel_bytes(height: int, width: int, mode: str) -> int:
    if mode == "rgb888":
        return height * width * 3
    if mode == "yuv420":
        return height * width + 2 * _ceil2(height) * _ceil2(width)
    if mode == "yuv420_half":
        h, w = _ceil2(height), _ceil2(width)
        return h * w + 2 * _ceil2(h) * _ceil2(w)
    raise ValueError(f"unknown transport mode {mode!r}")


def label_bytes(n_peaks: int) -> int:
    return 6 * n_peaks


# ---- device side ----------------------------------------------------------


def _srgb_planes(color_linear):
    """Linear f32 [H, W, 3] -> three sRGB-encoded f32 planes in [0, 255]."""
    s = linear_to_srgb(jnp.clip(color_linear, 0.0, 1.0)) * 255.0
    return s[..., 0], s[..., 1], s[..., 2]


def _halve(p):
    """2x2 box mean of a plane; odd trailing row/column edge-replicates
    (output dims are ceil(h/2), ceil(w/2))."""
    a = p[0::2]
    b = p[1::2]
    if b.shape[0] < a.shape[0]:
        b = jnp.concatenate([b, a[-1:]], axis=0)
    rows = 0.5 * (a + b)
    a = rows[:, 0::2]
    b = rows[:, 1::2]
    if b.shape[1] < a.shape[1]:
        b = jnp.concatenate([b, a[:, -1:]], axis=1)
    return 0.5 * (a + b)


def encode_pixels_u8(color_linear, *, mode: str = "rgb888"):
    """Device-side frame payload: flat u8 [pixel_bytes].

    ``yuv420*`` uses full-range BT.601 — the exact inverse runs on host in
    `decode_pixels`, and the JPEG encoder re-derives the same subsampled
    chroma, so the served image quality is unchanged vs rgb888.
    """
    if mode == "rgb888":
        s = linear_to_srgb(jnp.clip(color_linear, 0.0, 1.0)) * 255.0
        return jnp.round(s).astype(jnp.uint8).reshape(-1)
    r, g, b = _srgb_planes(color_linear)
    if mode == "yuv420_half":
        r, g, b = _halve(r), _halve(g), _halve(b)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 + 0.564 * (_halve(b) - _halve(y))
    cr = 128.0 + 0.713 * (_halve(r) - _halve(y))
    q = lambda p: jnp.round(jnp.clip(p, 0.0, 255.0)).astype(jnp.uint8).reshape(-1)
    return jnp.concatenate([q(y), q(cb), q(cr)])


def encode_labels_u8(packed):
    """``i32[3, P]`` (visible, x, y) -> flat u8 [6 P].

    Per peak: x+32768 as u16 LE, y+32768 as u16 LE, visible u8, zero pad.
    Projected coordinates can sit off-screen (the layout clamps later), so
    the offset keeps negatives encodable; +-32 k covers any viewport.
    """
    vis, x, y = packed[0], packed[1], packed[2]
    xs = jnp.clip(x + 32768, 0, 65535).astype(jnp.uint32)
    ys = jnp.clip(y + 32768, 0, 65535).astype(jnp.uint32)
    cols = [
        xs & 0xFF, xs >> 8, ys & 0xFF, ys >> 8,
        jnp.clip(vis, 0, 1).astype(jnp.uint32), jnp.zeros_like(xs),
    ]
    return jnp.stack(cols, axis=-1).astype(jnp.uint8).reshape(-1)


def encode_frame(color_linear, packed=None, *, mode: str = "rgb888"):
    """One flat u8 wire vector: pixels then (optionally) labels."""
    parts = [encode_pixels_u8(color_linear, mode=mode)]
    if packed is not None:
        parts.append(encode_labels_u8(packed))
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


# ---- host side --------------------------------------------------------------


def decode_pixels(buf: np.ndarray, height: int, width: int, *, mode: str):
    """Flat u8 wire pixels -> u8 sRGB [height, width, 3] (numpy)."""
    buf = np.asarray(buf, np.uint8)
    if mode == "rgb888":
        return buf[: height * width * 3].reshape(height, width, 3)
    h, w = (
        (_ceil2(height), _ceil2(width)) if mode == "yuv420_half" else (height, width)
    )
    hc, wc = _ceil2(h), _ceil2(w)
    ny = h * w
    nc = hc * wc
    y = buf[:ny].reshape(h, w).astype(np.float32)
    cb = buf[ny : ny + nc].reshape(hc, wc).astype(np.float32) - 128.0
    cr = buf[ny + nc : ny + 2 * nc].reshape(hc, wc).astype(np.float32) - 128.0
    cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)[:h, :w]
    cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)[:h, :w]
    r = y + cr / 0.713
    b = y + cb / 0.564
    g = (y - 0.299 * r - 0.114 * b) / 0.587
    img = np.stack([r, g, b], axis=-1)
    if mode == "yuv420_half":
        img = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)[:height, :width]
    return np.clip(np.round(img), 0.0, 255.0).astype(np.uint8)


def decode_labels(buf: np.ndarray, n_peaks: int, *, offset: int):
    """Label tail at ``offset`` -> i32[3, P] (visible, x, y)."""
    raw = np.asarray(
        buf[offset : offset + 6 * n_peaks], np.uint8
    ).reshape(n_peaks, 6).astype(np.int32)
    x = raw[:, 0] | (raw[:, 1] << 8)
    y = raw[:, 2] | (raw[:, 3] << 8)
    return np.stack([raw[:, 4], x - 32768, y - 32768])


def decode_frame(buf: np.ndarray, height: int, width: int, n_peaks: int, *, mode: str):
    """Wire vector -> (u8 rgb [H, W, 3], i32[3, P] or None)."""
    img = decode_pixels(buf, height, width, mode=mode)
    if not n_peaks:
        return img, None
    return img, decode_labels(buf, n_peaks, offset=pixel_bytes(height, width, mode))
