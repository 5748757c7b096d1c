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
