"""Native C++ component tests: GeoTIFF decoder parity and overlay primitives."""

import ctypes

import numpy as np
import pytest

from topo_renderer_tpu import native
from topo_renderer_tpu.data.tiff import read_geotiff, write_geotiff
from tests.test_tiff import PIXEL_SCALE, TIEPOINT, _deflate_variant, synthetic_heights

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_decode_uncompressed():
    heights = synthetic_heights(41, 53)
    blob = write_geotiff(heights, PIXEL_SCALE, TIEPOINT)
    result = native.tiff_decode(blob)
    assert result is not None
    decoded, meta = result
    np.testing.assert_array_equal(decoded, heights)
    np.testing.assert_allclose(meta["pixel_scale"], PIXEL_SCALE)
    np.testing.assert_allclose(meta["tiepoint"], TIEPOINT)
    assert not meta["has_model_transform"]


def test_native_decode_deflate():
    heights = synthetic_heights(23, 31)
    deflated = _deflate_variant(write_geotiff(heights, PIXEL_SCALE, TIEPOINT))
    result = native.tiff_decode(deflated)
    assert result is not None
    np.testing.assert_array_equal(result[0], heights)


def test_native_is_default_path():
    """read_geotiff must produce identical results whether or not the native
    path is active."""
    import os

    heights = synthetic_heights(19, 27)
    blob = write_geotiff(heights, PIXEL_SCALE, TIEPOINT)
    via_default, info = read_geotiff(blob)
    os.environ["TOPO_DISABLE_NATIVE"] = "1"
    try:
        # Force a fresh pure-python decode (the loader caches, so just call
        # the python implementation path by disabling via env for new loads —
        # the already-loaded lib still decodes; compare against python parse
        # by calling the module internals).
        import topo_renderer_tpu.data.tiff as tiff_mod

        native_result = tiff_mod._try_native(blob)
        py = None
        # Re-run the python body by temporarily blinding _try_native.
        orig = tiff_mod._try_native
        tiff_mod._try_native = lambda data: None
        try:
            py, py_info = tiff_mod.read_geotiff(blob)
        finally:
            tiff_mod._try_native = orig
    finally:
        os.environ.pop("TOPO_DISABLE_NATIVE", None)
    np.testing.assert_array_equal(via_default, py)
    np.testing.assert_allclose(info.pixel_scale, py_info.pixel_scale)


def test_native_lzw_decode():
    """LZW-compressed strips decode identically in C++ and Python."""
    import io
    import struct

    from tests.test_tiff import synthetic_heights

    heights = synthetic_heights(17, 21)
    raw = heights.astype("<f4").tobytes()

    # Minimal TIFF-LZW encoder (MSB-first, early change), from test_tiff.
    def lzw_encode(data: bytes) -> bytes:
        CLEAR, EOI = 256, 257
        dict_ = {bytes([i]): i for i in range(256)}
        next_code, code_bits = 258, 9
        out_bits = [(CLEAR, 9)]
        prev = b""
        for byte in data:
            cur = prev + bytes([byte])
            if cur in dict_:
                prev = cur
            else:
                out_bits.append((dict_[prev], code_bits))
                dict_[cur] = next_code
                next_code += 1
                if next_code + 1 > (1 << code_bits) and code_bits < 12:
                    code_bits += 1
                prev = bytes([byte])
        if prev:
            out_bits.append((dict_[prev], code_bits))
        out_bits.append((EOI, code_bits))
        acc = nbits = 0
        out = bytearray()
        for code, bits in out_bits:
            acc = (acc << bits) | code
            nbits += bits
            while nbits >= 8:
                nbits -= 8
                out.append((acc >> nbits) & 0xFF)
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)

    comp = lzw_encode(raw)
    buf = io.BytesIO()
    buf.write(struct.pack("<2sHI", b"II", 42, 8))
    tags, deferred = [], []
    n_entries = 8
    data_start = 8 + 2 + 12 * n_entries + 4

    def add(tag, typ, count, packed):
        if len(packed) <= 4:
            tags.append(struct.pack("<HHI", tag, typ, count) + packed.ljust(4, b"\0"))
        else:
            off = data_start + sum(len(p) for p in deferred)
            deferred.append(packed)
            tags.append(struct.pack("<HHII", tag, typ, count, off))

    h, w = heights.shape
    add(256, 4, 1, struct.pack("<I", w))
    add(257, 4, 1, struct.pack("<I", h))
    add(258, 3, 1, struct.pack("<H", 32))
    add(259, 3, 1, struct.pack("<H", 5))  # LZW
    add(278, 4, 1, struct.pack("<I", h))
    add(339, 3, 1, struct.pack("<H", 3))
    pixel_off = data_start + sum(len(p) for p in deferred)
    add(273, 4, 1, struct.pack("<I", pixel_off))
    add(279, 4, 1, struct.pack("<I", len(comp)))
    buf.write(struct.pack("<H", n_entries))
    for t in sorted(tags, key=lambda b: struct.unpack_from("<H", b)[0]):
        buf.write(t)
    buf.write(struct.pack("<I", 0))
    for p in deferred:
        buf.write(p)
    buf.write(comp)
    blob = buf.getvalue()

    result = native.tiff_decode(blob)
    assert result is not None
    np.testing.assert_array_equal(result[0], heights)
    # Python fallback agrees.
    import topo_renderer_tpu.data.tiff as tiff_mod

    orig = tiff_mod._try_native
    tiff_mod._try_native = lambda data: None
    try:
        py, _ = tiff_mod.read_geotiff(blob)
    finally:
        tiff_mod._try_native = orig
    np.testing.assert_array_equal(py, heights)


def test_native_rejects_garbage():
    assert native.tiff_decode(b"not a tiff at all") is None


def test_overlay_primitives():
    lib = native.load()
    img = np.zeros((32, 48, 3), np.uint8)
    ptr = img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    lib.topo_fill_round_rect(ptr, 48, 32, 4.0, 4.0, 20.0, 10.0, 0.2, 255, 255, 255)
    assert img[8, 10].tolist() == [255, 255, 255]
    assert img[2, 2].tolist() == [0, 0, 0]
    lib.topo_draw_line(ptr, 48, 32, 0.0, 0.0, 47.0, 31.0, 10, 20, 30)
    assert img[0, 0].tolist() == [10, 20, 30]
    assert img[31, 47].tolist() == [10, 20, 30]
    glyph = np.full((5, 5), 255, np.uint8)
    lib.topo_blit_glyph(
        ptr, 48, 32, glyph.ctypes.data_as(ctypes.c_char_p), 5, 5, 40, 20, 0, 0, 0
    )
    assert img[22, 42].tolist() == [0, 0, 0]


def _minimal_tiff(tags, payload: bytes) -> bytes:
    """Build a little-endian classic TIFF with explicit IFD entries.

    ``tags`` is a list of (tag, type, count, packed_value_bytes); values longer
    than 4 bytes are placed after the IFD. ``payload`` (pixel data) follows.
    """
    import io
    import struct

    buf = io.BytesIO()
    buf.write(struct.pack("<2sHI", b"II", 42, 8))
    n = len(tags)
    ifd_size = 2 + 12 * n + 4
    data_start = 8 + ifd_size
    deferred: list[bytes] = []
    entries: list[bytes] = []
    for tag, typ, count, packed in tags:
        if len(packed) <= 4:
            entries.append(
                struct.pack("<HHI", tag, typ, count) + packed.ljust(4, b"\0")
            )
        else:
            off = data_start + sum(len(p) for p in deferred)
            deferred.append(packed)
            entries.append(struct.pack("<HHII", tag, typ, count, off))
    buf.write(struct.pack("<H", n))
    for e in sorted(entries, key=lambda b: int.from_bytes(b[:2], "little")):
        buf.write(e)
    buf.write(struct.pack("<I", 0))
    for p in deferred:
        buf.write(p)
    buf.write(payload)
    return buf.getvalue()


def test_native_excess_strips_do_not_overflow():
    """A TIFF declaring more strips than ceil(height/rows_per_strip) must not
    write past the width*height output buffer (ADVICE r1, high severity)."""
    import struct

    w = h = 4
    rps = 2
    rows = np.arange(w, dtype="<f4")
    strip = rows.tobytes()  # one 2-row strip worth of data reused 4x
    payload = (rows.tobytes() + rows.tobytes()) * 4
    # 4 strips: indices 2 and 3 start at y0 = 4, 6 >= height.
    n_strips = 4
    strip_len = 2 * w * 4
    # payload begins right after the IFD + deferred values; compute via builder
    # by using relative offsets: place strip offsets as a deferred array and
    # patch afterwards. Simpler: build once to find payload start.
    def build(payload_start):
        offs = struct.pack(
            "<4I", *[payload_start + i * strip_len for i in range(n_strips)]
        )
        cnts = struct.pack("<4I", *([strip_len] * n_strips))
        return _minimal_tiff(
            [
                (256, 4, 1, struct.pack("<I", w)),
                (257, 4, 1, struct.pack("<I", h)),
                (258, 3, 1, struct.pack("<H", 32)),
                (259, 3, 1, struct.pack("<H", 1)),
                (277, 3, 1, struct.pack("<H", 1)),
                (278, 4, 1, struct.pack("<I", rps)),
                (273, 4, n_strips, offs),
                (279, 4, n_strips, cnts),
                (339, 3, 1, struct.pack("<H", 3)),
            ],
            payload,
        )

    probe = build(0)
    payload_start = len(probe) - len(payload)
    blob = build(payload_start)

    lib = native.load()
    guard = 64
    out = np.full(w * h + guard, np.float32(-777.0), np.float32)
    rc = lib.topo_tiff_decode(
        blob, len(blob), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w * h
    )
    assert rc == 0
    np.testing.assert_array_equal(
        out[: w * h].reshape(h, w), np.tile(np.arange(w, dtype=np.float32), (h, 1))
    )
    # The guard region past width*height must be untouched.
    np.testing.assert_array_equal(out[w * h :], np.float32(-777.0))


def test_native_tiled_without_tile_dims_rejected():
    """TileOffsets without TileWidth/TileLength must be rejected, not divide
    by zero (ADVICE r1, medium severity)."""
    import struct

    w = h = 4
    payload = np.zeros((h, w), "<f4").tobytes()

    def build(payload_start):
        return _minimal_tiff(
            [
                (256, 4, 1, struct.pack("<I", w)),
                (257, 4, 1, struct.pack("<I", h)),
                (258, 3, 1, struct.pack("<H", 32)),
                (259, 3, 1, struct.pack("<H", 1)),
                (277, 3, 1, struct.pack("<H", 1)),
                (324, 4, 1, struct.pack("<I", payload_start)),  # TileOffsets
                (325, 4, 1, struct.pack("<I", len(payload))),  # TileByteCounts
                (339, 3, 1, struct.pack("<H", 3)),
            ],
            payload,
        )

    probe = build(0)
    blob = build(len(probe) - len(payload))
    assert native.tiff_decode(blob) is None


def test_native_bad_lzw_code_rejected():
    """An LZW code beyond the current dictionary size is malformed and must
    fail cleanly instead of walking out of the dictionary (ADVICE r1)."""
    import struct

    w = h = 4
    # 9-bit codes, MSB first: literal 65, then invalid code 300 (> dict size).
    #   65  = 0b001000001, 300 = 0b100101100 -> bytes 0x20 0xCB 0x00
    bad_stream = bytes([0x20, 0xCB, 0x00])

    def build(payload_start):
        return _minimal_tiff(
            [
                (256, 4, 1, struct.pack("<I", w)),
                (257, 4, 1, struct.pack("<I", h)),
                (258, 3, 1, struct.pack("<H", 32)),
                (259, 3, 1, struct.pack("<H", 5)),  # LZW
                (277, 3, 1, struct.pack("<H", 1)),
                (278, 4, 1, struct.pack("<I", h)),
                (273, 4, 1, struct.pack("<I", payload_start)),
                (279, 4, 1, struct.pack("<I", len(bad_stream))),
                (339, 3, 1, struct.pack("<H", 3)),
            ],
            bad_stream,
        )

    probe = build(0)
    blob = build(len(probe) - len(bad_stream))
    assert native.tiff_decode(blob) is None
