"""Airfield overlay data parity: the reference's rows must appear
verbatim (coords to the digit, names included) — extras are fine
(reference: adsb_frontend/public/airfields.csv)."""

import pathlib

CSV = (
    pathlib.Path(__file__).parent.parent
    / "airjax" / "ui" / "static" / "airfields.csv"
)

REFERENCE_ROWS = {
    "NZWN,-41.3272,174.8052,Wellington International",
    "NZCH,-43.4894,172.5322,Christchurch Intl",
    "NZAA,-37.0081,174.7917,Auckland Intl",
}


def test_reference_airfields_verbatim():
    lines = set(CSV.read_text().strip().splitlines())
    assert REFERENCE_ROWS <= lines
    assert "icao,lat,lon,name" in lines
    # Well-formed: every row parses as icao,float,float,name.
    for line in lines - {"icao,lat,lon,name"}:
        icao, lat, lon, name = line.split(",", 3)
        assert len(icao) == 4 and name
        float(lat), float(lon)
