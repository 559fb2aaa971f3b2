"""Execute the shipped frontend logic (applogic.js) without node.

The last untested frontend behaviors — auto-scale to the furthest
aircraft, sprite hit-testing, click-to-expand selection, range-ring
layout, the no-position table selection, airfield culling, sprite
freshness — are pure functions in applogic.js; this transpiles the real
shipped source (tests/js_subset.py) and runs it against golden inputs.
Reference behaviors: main.ts:234-277 (scale + selection), aircraft.ts:131-145
(hit radius), main.ts:64-137 (table)."""

from __future__ import annotations

import math
import pathlib

import pytest

from airjax.ui import projection
from tests.js_subset import load_js

STATIC = pathlib.Path(__file__).parent.parent / "airjax" / "ui" / "static"


@pytest.fixture(scope="module")
def js():
    return load_js(
        (STATIC / "projection.js").read_text(),
        (STATIC / "applogic.js").read_text(),
    )


WLG = (-41.3272, 174.8053)


def test_autoscale_matches_python_math(js):
    # Three aircraft around Wellington; the furthest sets the scale.
    pts = [(-41.29, 174.81), (-41.5, 175.2), (-40.9, 174.0)]
    lats = [p[0] for p in pts]
    lons = [p[1] for p in pts]
    w, h, dpr = 1280.0, 720.0, 2.0
    got = js["autoScale"](WLG[0], WLG[1], lats, lons, w, h, dpr)
    rmax = max(
        math.hypot(*projection.get_xy(WLG[0], WLG[1], 0, 0, 1, la, lo))
        for la, lo in pts
    )
    assert rmax > 1000
    assert got == pytest.approx(0.42 * min(w, h) / rmax, rel=1e-12)
    # The furthest aircraft must land at 42% of the smaller dimension.
    far = max(
        pts,
        key=lambda p: math.hypot(
            *projection.get_xy(WLG[0], WLG[1], 0, 0, 1, *p)
        ),
    )
    px, py = projection.get_xy(WLG[0], WLG[1], 0, 0, 1, *far)
    assert math.hypot(px * got, py * got) == pytest.approx(0.42 * min(w, h))


def test_autoscale_floor_and_fallback(js):
    # Single aircraft overhead: the 1000 m floor stops infinite zoom.
    got = js["autoScale"](WLG[0], WLG[1], [WLG[0]], [WLG[1]], 1000.0, 800.0, 1.0)
    assert got == pytest.approx(0.42 * 800.0 / 1000.0)
    # No aircraft: 0.002 px/m * dpr fallback.
    assert js["autoScale"](WLG[0], WLG[1], [], [], 1000.0, 800.0, 2.0) == 0.004


def test_to_screen(js):
    x, y = js["toScreen"](1000.0, -500.0, 0.01, 640.0, 480.0)
    assert x == 640 / 2 + 10 and y == 480 / 2 - 5


def test_hit_test(js):
    xs = [100.0, 300.0, 300.0]
    ys = [100.0, 300.0, 305.0]
    # 8 px radius at dpr 1: a point 7.9 px away hits, 8.1 px misses.
    assert js["hitTestArrays"](xs, ys, 107.9, 100.0, 1.0) == 0
    assert js["hitTestArrays"](xs, ys, 108.1, 100.0, 1.0) == -1
    # dpr 2 doubles the radius.
    assert js["hitTestArrays"](xs, ys, 115.0, 100.0, 2.0) == 0
    # First sprite in draw order wins when two overlap.
    assert js["hitTestArrays"](xs, ys, 300.0, 302.0, 1.0) == 1
    # Exact radius is a hit (<=).
    assert js["hitTestArrays"](xs, ys, 108.0, 100.0, 1.0) == 0
    assert js["hitTestArrays"]([], [], 0.0, 0.0, 1.0) == -1


def test_click_select_toggle(js):
    none = -1
    # Clicking an aircraft pins it; clicking it again unpins.
    assert js["clickSelect"](0xC80001, none) == 0xC80001
    assert js["clickSelect"](0xC80001, 0xC80001) == none
    # Clicking another aircraft moves the pin.
    assert js["clickSelect"](0xC80002, 0xC80001) == 0xC80002
    # Clicking empty space clears the pin (reference main.ts behavior).
    assert js["clickSelect"](none, 0xC80001) == none
    assert js["clickSelect"](none, none) == none


def test_visible_rings(js):
    # scale 0.01 px/m: rings at 100, 250, 500, 1000, 2000 px; canvas
    # diagonal 1000 px cuts after the 50 km ring... hypot(800,600)=1000,
    # ring r > 1000 stops: 100 km ring = 1000 px, NOT > 1000, so included.
    assert js["visibleRingsKm"](0.01, 800.0, 600.0) == [10, 25, 50, 100]
    assert js["visibleRingsKm"](0.001, 800.0, 600.0) == [10, 25, 50, 100, 200]
    assert js["visibleRingsKm"](10.0, 800.0, 600.0) == []


def test_no_position_indices(js):
    assert js["noPositionIndices"]([1, 0, 1, 0, 0]) == [1, 3, 4]
    assert js["noPositionIndices"]([]) == []
    assert js["noPositionIndices"]([1, 1]) == []


def test_on_screen(js):
    assert js["onScreen"](0.0, 0.0, 800.0, 600.0) == 1
    assert js["onScreen"](800.0, 600.0, 800.0, 600.0) == 1
    assert js["onScreen"](-0.1, 300.0, 800.0, 600.0) == 0
    assert js["onScreen"](300.0, 600.1, 800.0, 600.0) == 0


def test_is_fresh(js):
    assert js["isFresh"](1000.0, 990.0) == 1
    assert js["isFresh"](1000.0, 984.9) == 0
    assert js["isFresh"](1000.0, 1000.0) == 1


def test_app_js_uses_the_shared_logic():
    app = (STATIC / "app.js").read_text()
    for fn in (
        "autoScale(",
        "hitTestArrays(",
        "clickSelect(",
        "visibleRingsKm(",
        "noPositionIndices(",
        "toScreen(",
        "onScreen(",
        "isFresh(",
    ):
        assert fn in app, f"app.js no longer calls {fn}"
    index = (STATIC / "index.html").read_text()
    assert (
        index.index('src="projection.js"')
        < index.index('src="applogic.js"')
        < index.index('src="app.js"')
    )


def test_text_metrics_layout(js):
    # Measured path: ascent 9, descent 3 at pad 4 -> advance 16, and the
    # reference's panel formula 2*pad + advance*n (aircraft.ts:93).
    assert js["textHeight"](9.0, 3.0) == 12.0
    assert js["lineAdvance"](9.0, 3.0, 4.0, 2.0) == 16.0
    assert js["panelHeight"](9.0, 3.0, 4.0, 6.0, 2.0) == 8.0 + 16.0 * 6
    # Metrics unavailable (-1): the historical fixed 16 px * dpr rows.
    assert js["textHeight"](-1.0, 3.0) == -1.0
    assert js["lineAdvance"](-1.0, -1.0, 4.0, 2.0) == 32.0
    assert js["panelHeight"](-1.0, -1.0, 4.0, 3.0, 1.0) == 8.0 + 16.0 * 3
    # NaN metrics (canvas returns ascent but undefined descent -> NaN
    # text height) must ALSO fall back, not poison the panel geometry
    # (ADVICE r4): !(th > 0) catches NaN where th <= 0 does not.
    nan = float("nan")
    assert js["lineAdvance"](9.0, nan, 4.0, 2.0) == 32.0
    assert js["panelHeight"](nan, nan, 4.0, 3.0, 1.0) == 8.0 + 16.0 * 3
    # getTextMetrics itself now rejects half-defined metrics objects.
    app = (STATIC / "app.js").read_text()
    assert "m.actualBoundingBoxDescent == null" in app


def test_app_uses_measured_text_metrics():
    """app.js must derive line spacing from canvas text metrics (the
    reference's get_text_height, utils.ts:9-11) — no hardcoded 16 px
    row advances left in the panel/table drawing."""
    app = (STATIC / "app.js").read_text()
    assert "measureText" in app
    assert "actualBoundingBoxAscent" in app
    for fn in ("getTextMetrics(", "lineAdvance(", "panelHeight("):
        assert fn in app, f"app.js does not use {fn}"
    assert "16 * i2" not in app and "16 * lines.length" not in app
    assert "16 * aircraft.size" not in app
