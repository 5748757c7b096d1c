"""Overlay compositor tests: geometry, draw order, unicode labels."""

import numpy as np

from topo_renderer_tpu.geo import GeoLocation
from topo_renderer_tpu.render.overlay import composite_labels
from topo_renderer_tpu.render.text import LINE_HEIGHT, LabelLayout


def make_layout(x, row, width=40.0, peak=(50.0, 80.0)):
    loc = GeoLocation.from_coord(0, 0)
    return LabelLayout(
        location=loc, id=0, label_x=x, label_y=20.0 * (0.5 + row),
        label_width=width, peak_x=peak[0], peak_y=peak[1],
    )


def test_composite_draws_background_line_text():
    img = np.zeros((120, 160, 3), np.uint8)
    lay = make_layout(30.0, 0)
    names = {(lay.location, 0): "Spitze"}
    out = composite_labels(img, [lay], names)
    assert out is not img
    # White label background inside the box.
    assert (out[int(lay.label_y) + 4, int(lay.label_x) + 5] == 255).all()
    # Black leader line near the peak end.
    y, x = 70, 46  # on the segment from (30,10) to (50,80)
    seg = out[60:80, 35:55]
    assert (seg == 0).all(axis=-1).any()
    # Text pixels (dark) inside the label box.
    box = out[int(lay.label_y) : int(lay.label_y + LINE_HEIGHT), 30:70]
    assert (box < 100).any()
    # Original image untouched outside overlay areas.
    assert (out[110:, :, :] == 0).all()


def test_composite_unicode_name():
    img = np.full((60, 200, 3), 30, np.uint8)
    lay = make_layout(10.0, 0, width=120.0, peak=(100.0, 50.0))
    names = {(lay.location, 0): "Кthroat Гора 山"}  # mixed scripts
    out = composite_labels(img, [lay], names)
    # Must not raise; background box present.
    assert (out[int(lay.label_y) + 3, 15] == 255).all()


def test_composite_empty_layouts_noop():
    img = np.zeros((10, 10, 3), np.uint8)
    assert composite_labels(img, [], {}) is img
