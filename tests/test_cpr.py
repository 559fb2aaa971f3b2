"""CPR decode parity (vectors from src/adsb/cpr.rs:149-207)."""

import pytest

from airjax.protocol.packet import CprFormat
from airjax.track import cpr


def test_zone_calculation():
    assert cpr.calc_num_zones(0.0) == 59
    assert cpr.calc_num_zones(87.0) == 2
    assert cpr.calc_num_zones(-87.0) == 2
    assert cpr.calc_num_zones(90.0) == 1
    assert cpr.calc_num_zones(-90.0) == 1
    assert cpr.calc_num_zones(10.0) == 59
    assert cpr.calc_num_zones(52.25720214843750) == 36


def test_latitude_calculation():
    lat, _, _ = cpr.calculate_latitude(93000, 74158, CprFormat.ODD)
    assert abs(lat - 52.25720) < 0.0001


def test_longitude_calculation():
    # NOTE: the reference's own unit test (src/adsb/cpr.rs:180-188) expects
    # 3.8295 here, but its *code* produces 3.91937255859375 for this input
    # (as does the standard CPR worked example for this frame pair) — that
    # reference test fails against its own implementation. We pin parity to
    # the reference code's behavior, not its broken expectation.
    lon = cpr.calculate_longitude(51372, 50194, 52.25720214843750, CprFormat.ODD)
    assert lon == 3.91937255859375


def test_nl_gate_consistency():
    # src/adsb/cpr.rs:191-206 — even/odd latitudes must agree on NL
    lat, even_lat, odd_lat = cpr.calculate_latitude(23868, 38688, CprFormat.ODD)
    assert cpr.calc_num_zones(even_lat) == cpr.calc_num_zones(odd_lat)


def test_full_pair_textbook():
    geo = cpr.calculate_geographic_position(
        (93000, 51372), (74158, 50194), CprFormat.ODD
    )
    assert geo is not None
    assert abs(geo.latitude - 52.25720) < 0.0001
    # Reference-code behavior (see note in test_longitude_calculation).
    assert geo.longitude == 3.91937255859375


def test_full_pair_southern_hemisphere():
    # Wellington capture pair (src/adsb/aircraft.rs:215-262): exercises
    # negative latitude (Rust fmod vs Python floored-% divergence).
    geo = cpr.calculate_geographic_position(
        (15489, 111562), (30551, 47917), CprFormat.EVEN
    )
    assert geo is not None
    assert abs(geo.latitude - -41.28964698920816) < 0.0001
    assert abs(geo.longitude - 174.80927207253197) < 0.0001
