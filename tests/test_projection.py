"""Frontend projection math parity (reference position.ts:14-49,72-83).

The reference frontend projects aircraft with haversine distance + initial
bearing + an azimuthal meters->pixels transform
(/root/reference/adsb_frontend/src/position.ts). We ship the same math in
``airjax/ui/static/projection.js`` and mirror it in
``airjax/ui/projection.py``.

There is no node in this image, so to *execute* the shipped JS we
mechanically transpile its disciplined subset (const/return statements,
Math.* only) to Python and run it against the mirror over a grid of inputs
to 1e-9. Structure tests pin that index.html loads projection.js before
app.js and that app.js actually projects through getXY.
"""

from __future__ import annotations

import math
import pathlib

import pytest

from airjax.ui import projection

STATIC = pathlib.Path(__file__).parent.parent / "airjax" / "ui" / "static"


from tests.js_subset import transpile_js  # shared JS-subset translator


@pytest.fixture(scope="module")
def js_funcs():
    src = (STATIC / "projection.js").read_text()
    namespace = {"math": math}
    exec(transpile_js(src), namespace)  # noqa: S102 - our own checked-in file
    return namespace


GRID = [
    # (lat1, lon1, lat2, lon2) — Wellington-area radar range, equator,
    # antimeridian straddle, high latitude, long range.
    (-41.3272, 174.8053, -41.3272, 174.8053),
    (-41.3272, 174.8053, -41.28965, 174.80927),
    (-41.3272, 174.8053, -37.0082, 174.7850),
    (-41.3272, 174.8053, -43.4876, 172.5374),
    (0.0, 0.0, 0.0, 1.0),
    (0.0, 0.0, 1.0, 0.0),
    (0.0, 179.9, 0.0, -179.9),
    (87.0, 10.0, 86.5, -170.0),
    (52.2572, 3.91937, -41.28965, 174.80927),
    (-41.0, 174.0, -41.0001, 174.0001),
]


def test_js_matches_python_mirror(js_funcs):
    for lat1, lon1, lat2, lon2 in GRID:
        d_js = js_funcs["geoDistance"](lat1, lon1, lat2, lon2)
        d_py = projection.geo_distance(lat1, lon1, lat2, lon2)
        assert d_js == pytest.approx(d_py, abs=1e-9, rel=1e-12)
        b_js = js_funcs["geoBearing"](lat1, lon1, lat2, lon2)
        b_py = projection.geo_bearing(lat1, lon1, lat2, lon2)
        assert b_js == pytest.approx(b_py, abs=1e-9, rel=1e-12)
        xy_js = js_funcs["getXY"](lat1, lon1, 640.0, 360.0, 0.003, lat2, lon2)
        xy_py = projection.get_xy(lat1, lon1, 640.0, 360.0, 0.003, lat2, lon2)
        assert xy_js[0] == pytest.approx(xy_py[0], abs=1e-9)
        assert xy_js[1] == pytest.approx(xy_py[1], abs=1e-9)
        vis_js = js_funcs["checkVisible"](lat1, lon1, 640.0, 360.0, 0.003, lat2, lon2)
        vis_py = projection.check_visible(lat1, lon1, 640.0, 360.0, 0.003, lat2, lon2)
        assert bool(vis_js) == vis_py


def test_check_visible_and_recenter():
    # A point at the center is visible; the antipode-ish far point is not
    # at radar scale.
    assert projection.check_visible(-41.3, 174.8, 640, 360, 0.003, -41.29, 174.81)
    assert not projection.check_visible(-41.3, 174.8, 640, 360, 0.003, 52.0, 4.0)
    assert projection.recenter(1281, 721) == (640, 360)


def test_known_answers():
    # One degree of longitude at the equator: R * pi/180.
    one_deg = 6371000.0 * math.pi / 180.0
    assert projection.geo_distance(0, 0, 0, 1) == pytest.approx(one_deg, rel=1e-12)
    assert projection.geo_distance(0, 0, 0, 0) == 0.0
    # Due east bearing = pi/2, due north = 0.
    assert projection.geo_bearing(0, 0, 0, 1) == pytest.approx(math.pi / 2, abs=1e-12)
    assert projection.geo_bearing(0, 0, 1, 0) == pytest.approx(0.0, abs=1e-12)
    # get_xy: due-east point lands east of center, same y; north is up (-y).
    x, y = projection.get_xy(0, 0, 400, 300, 0.001, 0, 1)
    assert x == pytest.approx(400 + one_deg * 0.001, rel=1e-9)
    assert y == pytest.approx(300.0, abs=1e-6)
    x, y = projection.get_xy(0, 0, 400, 300, 0.001, 1, 0)
    assert x == pytest.approx(400.0, abs=1e-6)
    assert y == pytest.approx(300 - one_deg * 0.001, rel=1e-9)


def test_divergence_from_flat_earth_is_material():
    """The old flat-earth approximation differs by >100 m at 200 km range —
    this is why the exact reference math matters (VERDICT r1 item 5)."""
    clat, clon = -41.3272, 174.8053
    lat, lon = -43.0, 177.0  # ~250 km SE of Wellington
    d = projection.geo_distance(clat, clon, lat, lon)
    b = projection.geo_bearing(clat, clon, lat, lon)
    exact = (d * math.sin(b), -d * math.cos(b))
    rad = math.pi / 180.0
    flat = (
        (lon - clon) * rad * math.cos(clat * rad) * 6371000.0,
        -(lat - clat) * rad * 6371000.0,
    )
    err = math.hypot(exact[0] - flat[0], exact[1] - flat[1])
    assert err > 100.0


def test_frontend_wiring():
    index = (STATIC / "index.html").read_text()
    assert index.index('src="projection.js"') < index.index('src="app.js"')
    app = (STATIC / "app.js").read_text()
    assert "getXY(center.lat, center.lon" in app
    # The flat-earth approximation is gone.
    assert "Local azimuthal approximation" not in app
    # The reference's 1 km scale bar is drawn (main.ts:279-284).
    assert "scale * 1000" in app and '"1 km"' in app
