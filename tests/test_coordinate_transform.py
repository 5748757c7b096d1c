"""CoordinateTransform tests (`topo-renderer/src/common/coordinate_transform.rs`)."""

import numpy as np
import pytest

from topo_renderer_tpu.data.coordinate_transform import (
    CoordinateTransform,
    CoordinateTransformError,
    get_height_value_at,
)

# Typical COP-90 tile geometry: 3 arc-second pixels, tiepoint at the tile's
# top-left (north-west) corner.
SCALE = [0.000833333333333333, 0.000833333333333333, 0.0]
TIEPOINT = [0.0, 0.0, 0.0, 19.9995833, 50.0004166, 0.0]


def make_transform():
    return CoordinateTransform.from_geo_tag_data(SCALE, TIEPOINT, None)


def test_from_geo_tag_data_validation():
    with pytest.raises(CoordinateTransformError):
        CoordinateTransform.from_geo_tag_data(SCALE, TIEPOINT, [1.0] * 16)
    with pytest.raises(CoordinateTransformError):
        CoordinateTransform.from_geo_tag_data(None, TIEPOINT, None)
    with pytest.raises(CoordinateTransformError):
        CoordinateTransform.from_geo_tag_data(SCALE, None, None)
    with pytest.raises(CoordinateTransformError):
        CoordinateTransform.from_geo_tag_data([1.0, 2.0], TIEPOINT, None)
    with pytest.raises(CoordinateTransformError):
        CoordinateTransform.from_geo_tag_data(SCALE, [1.0] * 5, None)


def test_to_model_to_raster_roundtrip():
    t = make_transform()
    # raster (0, 0) maps to the tiepoint model position
    # (`coordinate_transform.rs:59-64`).
    mx, my = t.to_model((0.0, 0.0))
    np.testing.assert_allclose([mx, my], [TIEPOINT[3], TIEPOINT[4]], rtol=1e-6)
    # y grows southward: larger raster y means smaller latitude.
    _, my2 = t.to_model((0.0, 100.0))
    assert my2 < my
    # round trip
    rx, ry = t.to_raster((mx, my))
    np.testing.assert_allclose([rx, ry], [0.0, 0.0], atol=1e-3)
    rx, ry = t.to_raster(t.to_model((357.0, 123.0)))
    np.testing.assert_allclose([rx, ry], [357.0, 123.0], atol=1e-2)


def test_get_height_value_at():
    t = make_transform()
    w, h = 1201, 1201
    field = np.arange(h * w, dtype=np.float32).reshape(h, w)
    # Lookup at the model position of raster texel (3, 7) should hit
    # index 7*w+3 by truncation (`coordinate_transform.rs:78-87`).
    lon, lat = t.to_model((3.2, 7.8))
    val = get_height_value_at(field, t, (w, h), lon, lat)
    assert val == field[7, 3]
    # Out of bounds -> None
    assert get_height_value_at(field, t, (w, h), 500.0, 0.0) is None
    assert get_height_value_at(field, t, (w, h), TIEPOINT[3] - 1.0, TIEPOINT[4]) is None
