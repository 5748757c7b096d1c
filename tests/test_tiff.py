"""GeoTIFF reader/writer tests, exercising the same decode path the reference
uses for DEM tiles (`topo-renderer/src/control/background_runner.rs:111-136`)."""

import struct
import zlib

import numpy as np
import pytest

from topo_renderer_tpu.data.tiff import TiffError, read_geotiff, write_geotiff


def synthetic_heights(h=37, w=53, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(1500.0, 300.0, size=(h, w)).astype(np.float32)


PIXEL_SCALE = (0.000833333333333333, 0.000833333333333333, 0.0)
TIEPOINT = (0.0, 0.0, 0.0, 19.9995833, 50.0004166, 0.0)


def test_write_read_roundtrip():
    heights = synthetic_heights()
    blob = write_geotiff(heights, PIXEL_SCALE, TIEPOINT)
    decoded, info = read_geotiff(blob)
    np.testing.assert_array_equal(decoded, heights)
    assert info.width == heights.shape[1]
    assert info.height == heights.shape[0]
    np.testing.assert_allclose(info.pixel_scale, PIXEL_SCALE)
    np.testing.assert_allclose(info.tiepoint, TIEPOINT)
    assert info.model_transformation is None


def test_reject_garbage():
    with pytest.raises(TiffError):
        read_geotiff(b"definitely not a tiff")
    with pytest.raises(TiffError):
        read_geotiff(b"II\x2b\x00\x00\x00\x00\x00")  # BigTIFF magic


def _deflate_variant(blob: bytes) -> bytes:
    """Rewrite the uncompressed fixture into a deflate-compressed one by
    patching compression tag + strip payload."""
    heights, info = read_geotiff(blob)
    raw = heights.astype("<f4").tobytes()
    comp = zlib.compress(raw)

    # Re-emit manually: reuse writer then patch would be complicated; build a
    # minimal deflate TIFF here instead.
    import io

    buf = io.BytesIO()
    buf.write(struct.pack("<2sHI", b"II", 42, 8))
    tags = []

    deferred = []
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
    add(259, 3, 1, struct.pack("<H", 8))  # deflate
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
    return buf.getvalue()


def test_deflate_decode():
    heights = synthetic_heights(19, 23)
    blob = write_geotiff(heights, PIXEL_SCALE, TIEPOINT)
    deflated = _deflate_variant(blob)
    decoded, _ = read_geotiff(deflated)
    np.testing.assert_array_equal(decoded, heights)


def test_lzw_decode_known_vector():
    # LZW round-trip via a tiny hand-checkable stream: encode with a minimal
    # TIFF-LZW encoder implemented inline.
    from topo_renderer_tpu.data.tiff import _lzw_decode

    def lzw_encode(data: bytes) -> bytes:
        CLEAR, EOI = 256, 257
        dict_ = {bytes([i]): i for i in range(256)}
        next_code = 258
        code_bits = 9
        out_bits = []

        def emit(code, bits):
            out_bits.append((code, bits))

        emit(CLEAR, code_bits)
        prev = b""
        for byte in data:
            cur = prev + bytes([byte])
            if cur in dict_:
                prev = cur
            else:
                emit(dict_[prev], code_bits)
                dict_[cur] = next_code
                next_code += 1
                if next_code + 1 > (1 << code_bits) and code_bits < 12:
                    code_bits += 1
                prev = bytes([byte])
        if prev:
            emit(dict_[prev], code_bits)
        emit(EOI, code_bits)
        # pack MSB-first
        acc = 0
        nbits = 0
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

    payload = b"TOBEORNOTTOBEORTOBEORNOT" * 7 + bytes(range(256))
    encoded = lzw_encode(payload)
    assert _lzw_decode(encoded, len(payload)) == payload
