"""Label layout tests — direct port of the reference's 10 rstest cases
(`topo-renderer/src/render/text_renderer.rs:374-431`) plus script detection."""

import pytest

from topo_renderer_tpu.geo import GeoLocation
from topo_renderer_tpu.render.text import (
    MAX_ROWS,
    get_scripts,
    layout_labels,
    measure_text,
)


@pytest.mark.parametrize(
    "positions,widths,expected",
    [
        ([0, 5, 2], [1, 1, 5], [(0, 0), (5, 0), (2, 1)]),
        ([0, 6, 2], [1, 2, 5], [(0, 0), (6, 0), (2, 1)]),
        ([0, 8, 2], [1, 1, 5], [(0, 0), (8, 0), (2, 0)]),
        ([1, 5, 2], [2, 1, 5], [(1, 0), (5, 0), (2, 1)]),
        ([1, 6, 2], [2, 2, 5], [(1, 0), (6, 0), (2, 1)]),
        ([1, 8, 2], [2, 1, 5], [(1, 0), (8, 0), (2, 1)]),
        ([3, 5, 2], [1, 1, 5], [(3, 0), (5, 0), (2, 1)]),
        ([3, 6, 2], [1, 2, 5], [(3, 0), (6, 0), (2, 1)]),
        ([3, 8, 2], [1, 1, 5], [(3, 0), (8, 0), (2, 1)]),
        ([1, 9, 2], [7, 1, 5], [(1, 0), (9, 0), (2, 1)]),
    ],
)
def test_layout(positions, widths, expected):
    loc = GeoLocation.from_coord(0, 0)
    labels = {loc: [(i, (p, 0)) for i, p in enumerate(positions)]}
    width_map = {i: float(w) for i, w in enumerate(widths)}
    layout = layout_labels(labels, lambda _loc, i: width_map.get(i), line_height=1.0)
    got = [(lay.id, (int(lay.label_x), int(lay.label_y))) for lay in layout]
    want = [(i, pos) for i, pos in enumerate(expected)]
    assert got == want


def test_max_rows_drops_labels():
    loc = GeoLocation.from_coord(0, 0)
    # 10 labels all at x=0 width 5: rows 0..7 filled, labels 8/9 dropped.
    labels = {loc: [(i, (0, 0)) for i in range(10)]}
    layout = layout_labels(labels, lambda _l, _i: 5.0, line_height=1.0)
    assert len(layout) == MAX_ROWS
    assert [lay.id for lay in layout] == list(range(MAX_ROWS))


def test_location_order():
    # Tiles iterate in BTreeMap order; a smaller location gets first pick.
    a = GeoLocation.from_coord(10, 10)
    b = GeoLocation.from_coord(20, 10)
    labels = {b: [(0, (0, 0))], a: [(0, (0, 0))]}
    layout = layout_labels(labels, lambda _l, _i: 4.0, line_height=1.0)
    assert layout[0].location == a and int(layout[0].label_y) == 0
    assert layout[1].location == b and int(layout[1].label_y) == 1


def test_missing_width_skips():
    loc = GeoLocation.from_coord(0, 0)
    labels = {loc: [(0, (0, 0)), (1, (10, 0))]}
    layout = layout_labels(labels, lambda _l, i: 3.0 if i == 1 else None)
    assert [lay.id for lay in layout] == [1]


def test_scripts():
    assert get_scripts(["Matterhorn"]) == {"Latn"}
    assert get_scripts(["富士山"]) == {"Hani"}
    assert get_scripts(["Эльбрус", "Zugspitze"]) == {"Cyrl", "Latn"}


def test_measure_text_monotone():
    w1 = measure_text("A")
    w2 = measure_text("AAAA")
    assert 0 < w1 < w2
