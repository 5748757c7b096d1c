"""Runtime per-script font acquisition (`render/fonts.py`).

Mirrors `topo-renderer/src/render/text_renderer.rs:28-48,160-196` hermetically:
a local HTTP server stands in for fonts.gstatic.com, serving a real TTF
built on the fly with fontTools that covers three CJK codepoints with
non-empty outlines — so the end assertion can be the reference criterion
itself: a CJK peak name renders as glyphs, not tofu.
"""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from topo_renderer_tpu.render import fonts as fonts_mod
from topo_renderer_tpu.render.fonts import FontLibrary
from topo_renderer_tpu.render.overlay import composite_labels
from topo_renderer_tpu.render.text import LabelLayout, measure_text
from topo_renderer_tpu.geo import GeoLocation

CJK_NAME = "富士山"  # Mount Fuji


@pytest.fixture(scope="module")
def mini_cjk_ttf(tmp_path_factory):
    """Build a tiny real TTF covering 富/士/山 with solid-box glyphs."""
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.ttGlyphPen import TTGlyphPen

    fb = FontBuilder(1000, isTTF=True)
    cps = [ord(c) for c in CJK_NAME]
    glyph_order = [".notdef"] + [f"uni{cp:04X}" for cp in cps]
    fb.setupGlyphOrder(glyph_order)
    fb.setupCharacterMap({cp: f"uni{cp:04X}" for cp in cps})

    def box_glyph(inset):
        pen = TTGlyphPen(None)
        pen.moveTo((inset, 0))
        pen.lineTo((900 - inset, 0))
        pen.lineTo((900 - inset, 700))
        pen.lineTo((inset, 700))
        pen.closePath()
        return pen.glyph()

    glyphs = {".notdef": TTGlyphPen(None).glyph()}
    for k, name in enumerate(glyph_order[1:]):
        glyphs[name] = box_glyph(60 + 40 * k)
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics({g: (1000, 50) for g in glyph_order})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupNameTable({"familyName": "MiniCJK", "styleName": "Regular"})
    fb.setupOS2(sTypoAscender=800, sTypoDescender=-200)
    fb.setupPost()
    path = tmp_path_factory.mktemp("fonts") / "mini_cjk.ttf"
    fb.save(str(path))
    return path


@pytest.fixture()
def font_server(mini_cjk_ttf):
    data = mini_cjk_ttf.read_bytes()

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "font/ttf")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = HTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/notosans-mini.ttf"
    srv.shutdown()


def test_fetch_register_and_render_cjk(font_server, tmp_path):
    lib = FontLibrary(
        cache_dir=tmp_path / "cache",
        fetch_enabled=True,
        source_map={"Hani": [font_server]},
    )
    assert lib.load_additional_fonts({"Hani"}) == 1
    # Selection: the fetched face covers the CJK name; Latin stays default.
    assert lib.font_for_text(CJK_NAME) is not lib.font_for_text("Matterhorn")
    assert lib.measure(CJK_NAME) > 0.0

    # The reference criterion: the label draws glyphs, not tofu. Compare the
    # ink against the default-font (tofu) rendering of the same label.
    fonts_mod.set_default_library(lib)
    try:
        img = np.full((64, 160, 3), 200, np.uint8)
        layouts = [
            LabelLayout(
                location=GeoLocation.from_coord(35, 138), id=0,
                label_x=8.0, label_y=8.0,
                label_width=lib.measure(CJK_NAME), peak_x=100.0, peak_y=60.0,
            )
        ]
        names = {(layouts[0].location, 0): CJK_NAME}
        with_lib = composite_labels(img, layouts, names)
    finally:
        fonts_mod.set_default_library(None)
    tofu = composite_labels(img, layouts, names)  # default DejaVu: no CJK

    ink = (with_lib < 100).any(axis=-1)
    ink_tofu = (tofu < 100).any(axis=-1)
    # Solid-box glyphs ink far more pixels than tofu outlines/blanks.
    assert ink.sum() > ink_tofu.sum() + 50, (ink.sum(), ink_tofu.sum())


def test_cache_hit_without_fetch(font_server, tmp_path):
    cache = tmp_path / "cache"
    lib1 = FontLibrary(
        cache_dir=cache, fetch_enabled=True, source_map={"Hani": [font_server]}
    )
    assert lib1.load_additional_fonts({"Hani"}) == 1
    # A new library with fetching DISABLED still registers from the cache.
    lib2 = FontLibrary(
        cache_dir=cache, fetch_enabled=False, source_map={"Hani": [font_server]}
    )
    assert lib2.load_additional_fonts({"Hani"}) == 1
    assert lib2.measure(CJK_NAME) > 0.0


def test_disabled_fetch_falls_back(tmp_path):
    lib = FontLibrary(
        cache_dir=tmp_path / "c", fetch_enabled=False,
        source_map={"Hani": ["http://127.0.0.1:1/never"]},
    )
    assert lib.load_additional_fonts({"Hani"}) == 0
    # Falls back to the bundled default face.
    assert lib.measure("Matterhorn") > 0.0


def test_operator_font_dir(mini_cjk_ttf, tmp_path):
    d = tmp_path / "fonts"
    d.mkdir()
    (d / "mini.ttf").write_bytes(mini_cjk_ttf.read_bytes())
    lib = FontLibrary(cache_dir=tmp_path / "c", font_dir=d, fetch_enabled=False)
    assert lib.font_for_text(CJK_NAME) is not lib.font_for_text("Alps")
    assert lib.measure(CJK_NAME) > 0.0


def test_measure_text_uses_library(mini_cjk_ttf, tmp_path):
    d = tmp_path / "fonts"
    d.mkdir()
    (d / "mini.ttf").write_bytes(mini_cjk_ttf.read_bytes())
    fonts_mod.set_default_library(
        FontLibrary(cache_dir=tmp_path / "c", font_dir=d, fetch_enabled=False)
    )
    try:
        w = measure_text(CJK_NAME)
    finally:
        fonts_mod.set_default_library(None)
    # 3 glyphs at 1000 units on a 13px em ~= 39px; tofu/default would differ.
    assert w == pytest.approx(39.0, rel=0.2)
