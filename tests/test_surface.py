"""TC5-8 surface position decode (extension; the reference decodes TC9-18
airborne positions only, src/adsb/packet.rs:34-35)."""

import numpy as np
import pytest

from airjax.io import synth
from airjax.protocol.packet import (
    AdsbPacket,
    CprFormat,
    SurfacePositionMsg,
    UnknownMsg,
    decode_movement_kt,
)
from airjax.track.aircraft import handle_aircraft_update
from airjax.track.cpr import calculate_surface_position

# A ground vehicle at Wellington airport; receiver a few km away.
WLG = (-41.3272, 174.8053)
REF = (-41.29, 174.78)


def test_movement_table():
    assert decode_movement_kt(0) is None
    assert decode_movement_kt(1) == 0.0
    assert decode_movement_kt(2) == 0.125
    assert decode_movement_kt(8) == 0.875
    assert decode_movement_kt(9) == 1.0
    assert decode_movement_kt(12) == 1.75
    assert decode_movement_kt(13) == 2.0
    assert decode_movement_kt(38) == 14.5
    assert decode_movement_kt(39) == 15.0
    assert decode_movement_kt(93) == 69.0
    assert decode_movement_kt(94) == 70.0
    assert decode_movement_kt(108) == 98.0
    assert decode_movement_kt(109) == 100.0
    assert decode_movement_kt(123) == 170.0
    assert decode_movement_kt(124) == 175.0
    assert decode_movement_kt(125) is None and decode_movement_kt(127) is None


def test_movement_encode_roundtrip():
    for code in range(125):
        speed = decode_movement_kt(code)
        assert synth.encode_movement(speed) == code


def test_field_extraction():
    me = synth.make_surface_me(*WLG, odd=False, speed_kt=17.0, track_deg=92.8125)
    msg = SurfacePositionMsg.from_me(me)
    assert msg.msg_type == 7
    assert msg.movement_kt == 17.0
    assert abs(msg.track_deg - 92.8125) < 360 / 128
    assert msg.cpr_format is CprFormat.EVEN

    # Track status 0 -> no track.
    me2 = synth.make_surface_me(*WLG, odd=True, track_deg=None)
    msg2 = SurfacePositionMsg.from_me(me2)
    assert msg2.track_deg is None
    assert msg2.cpr_format is CprFormat.ODD


def test_parity_mode_keeps_tc5_8_unknown():
    me = synth.make_surface_me(*WLG, odd=False)
    pkt = AdsbPacket.from_bytes(synth.make_df17(0x123456, me), 100.0)
    assert isinstance(pkt.msg, UnknownMsg)


@pytest.mark.parametrize(
    "lat,lon,ref",
    [
        (-41.3272, 174.8053, (-41.29, 174.78)),  # Wellington (south, near 180)
        (52.32061, 4.73473, (52.0, 4.375)),  # Schiphol (north)
        (0.5, 0.5, (0.4, 0.6)),  # equator / prime meridian
        (-33.9461, 151.1772, (-33.9, 151.2)),  # Sydney
        (61.174, -149.996, (61.2, -150.0)),  # Anchorage (high lat, west)
    ],
)
def test_surface_cpr_global_roundtrip(lat, lon, ref):
    even = synth.encode_surface_cpr(lat, lon, odd=False)
    odd = synth.encode_surface_cpr(lat, lon, odd=True)
    for first in (CprFormat.EVEN, CprFormat.ODD):
        geo = calculate_surface_position(even, odd, first, *ref)
        assert geo is not None
        assert abs(geo.latitude - lat) < 1e-3
        assert abs(geo.longitude - lon) < 1e-3


def test_southern_nl_boundary_straddle_rejected():
    """Regression (code review): a southern-hemisphere pair straddling an
    NL zone boundary must be rejected, not decoded with a wrong longitude.
    The NL gate has to run AFTER hemisphere resolution — the raw [0,90)
    latitude images of this pair share NL=58 even though the true
    latitudes straddle NL 10/11."""
    even = synth.encode_surface_cpr(-79.29402, 43.9, odd=False)
    odd = synth.encode_surface_cpr(-79.29467, 43.9, odd=True)
    for first in (CprFormat.EVEN, CprFormat.ODD):
        geo = calculate_surface_position(even, odd, first, -79.3, 43.9)
        if geo is not None:
            # If a fix is produced, it must be a correct one.
            assert abs(geo.latitude + 79.294) < 0.01
            assert abs(geo.longitude - 43.9) < 0.01


def test_southern_hemisphere_surface_roundtrip():
    lat, lon = -79.2, 43.9
    even = synth.encode_surface_cpr(lat, lon, odd=False)
    odd = synth.encode_surface_cpr(lat, lon, odd=True)
    for first in (CprFormat.EVEN, CprFormat.ODD):
        geo = calculate_surface_position(even, odd, first, -79.1, 43.8)
        assert geo is not None
        assert abs(geo.latitude - lat) < 1e-3
        assert abs(geo.longitude - lon) < 1e-3


def test_surface_cpr_global_fuzz():
    """Random positions worldwide: every decode is either rejected (NL
    boundary straddle) or accurate — never silently wrong."""
    rng = np.random.default_rng(17)
    n_decoded = 0
    for _ in range(400):
        lat = float(rng.uniform(-89.5, 89.5))
        lon = float(rng.uniform(-180.0, 180.0))
        # Up to ~1 km of movement between the two frames.
        lat2 = lat + float(rng.uniform(-0.01, 0.01))
        even = synth.encode_surface_cpr(lat, lon, odd=False)
        odd = synth.encode_surface_cpr(lat2, lon, odd=True)
        ref_lat = lat + float(rng.uniform(-0.5, 0.5))
        ref_lon = lon + float(rng.uniform(-0.5, 0.5))
        for first in (CprFormat.EVEN, CprFormat.ODD):
            geo = calculate_surface_position(even, odd, first, ref_lat, ref_lon)
            if geo is None:
                continue
            n_decoded += 1
            newest = lat2 if first is CprFormat.EVEN else lat
            assert abs(geo.latitude - newest) < 0.02, (lat, lon)
            assert abs(geo.longitude - lon) < 0.02, (lat, lon)
    assert n_decoded > 500  # the vast majority decode


def test_tracker_surface_pairing():
    icao = 0x7C1234
    aircrafts = {}
    pkt_e = AdsbPacket.from_bytes(
        synth.make_df17(icao, synth.make_surface_me(*WLG, odd=False, speed_kt=12.0)),
        100.0,
        extensions=True,
    )
    pkt_o = AdsbPacket.from_bytes(
        synth.make_df17(icao, synth.make_surface_me(*WLG, odd=True, speed_kt=12.5)),
        101.0,
        extensions=True,
    )
    handle_aircraft_update(pkt_e, aircrafts, ref_position=REF)
    handle_aircraft_update(pkt_o, aircrafts, ref_position=REF)
    plane = aircrafts[icao]
    assert plane.on_ground
    assert plane.ground_speed_kt == 12.5
    assert plane.geo_position is not None
    assert abs(plane.geo_position.latitude - WLG[0]) < 1e-3
    assert abs(plane.geo_position.longitude - WLG[1]) < 1e-3

    # Without a receiver reference, no position is resolved (ambiguous).
    blind = {}
    handle_aircraft_update(pkt_e, blind)
    handle_aircraft_update(pkt_o, blind)
    assert blind[icao].geo_position is None
    assert blind[icao].on_ground


def test_surface_and_airborne_stashes_do_not_mix():
    icao = 0x7C5678
    aircrafts = {}
    # An airborne even frame followed by a surface odd frame must NOT
    # produce a position fix.
    airborne_even = AdsbPacket.from_bytes(
        synth.make_df17(
            icao, synth.make_position_me(11, 5000, 60000, 70000, odd=False)
        ),
        100.0,
        extensions=True,
    )
    surface_odd = AdsbPacket.from_bytes(
        synth.make_df17(icao, synth.make_surface_me(*WLG, odd=True)),
        101.0,
        extensions=True,
    )
    handle_aircraft_update(airborne_even, aircrafts, ref_position=REF)
    handle_aircraft_update(surface_odd, aircrafts, ref_position=REF)
    assert aircrafts[icao].geo_position is None
