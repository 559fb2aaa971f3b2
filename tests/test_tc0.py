"""TC0 airborne position without a fix (extension; reference -> Unknown).

TC0 is broadcast when the transponder has altitude but no position; the
CPR fields are meaningless and must never enter pairing, and an all-zero
AC12 code means no altitude either.
"""

import numpy as np

from airjax.io import synth
from airjax.protocol.packet import AdsbPacket, AircraftPositionMsg, UnknownMsg
from airjax.track.aircraft import handle_aircraft_update

ICAO = 0x7C6B30


def _tc0_frame(altitude_ft=None, cpr_lat=12345, cpr_lon=54321):
    if altitude_ft is None:
        # True "no altitude available": ALL 12 AC12 bits zero (Q included).
        me = synth.make_position_me(
            0, -1000, cpr_lat, cpr_lon, odd=False, q25=False
        )
    else:
        me = synth.make_position_me(0, altitude_ft, cpr_lat, cpr_lon, odd=False)
    return synth.make_df17(ICAO, me)


def test_tc0_decodes_altitude_only():
    pkt = AdsbPacket.from_bytes(_tc0_frame(10000), 1.0, extensions=True)
    assert isinstance(pkt.msg, AircraftPositionMsg)
    assert pkt.msg.no_position and pkt.msg.altitude_valid
    assert pkt.msg.altitude == 10000
    assert "no fix" in pkt.msg.format()


def test_tc0_never_pairs_cpr():
    aircrafts = {}
    # A TC0 "even" and a real odd TC11 within the window: must NOT pair
    # (the TC0 CPR fields are garbage).
    handle_aircraft_update(
        AdsbPacket.from_bytes(_tc0_frame(8000), 1.0, extensions=True), aircrafts
    )
    odd_me = synth.make_position_me(11, 8000, 74158, 50194, odd=True)
    handle_aircraft_update(
        AdsbPacket.from_bytes(synth.make_df17(ICAO, odd_me), 2.0, extensions=True),
        aircrafts,
    )
    a = aircrafts[ICAO]
    assert a.altitude == 8000
    assert a.geo_position is None  # no pairing happened


def test_tc0_zero_code_means_no_altitude():
    aircrafts = {}
    handle_aircraft_update(
        AdsbPacket.from_bytes(_tc0_frame(12000), 1.0, extensions=True), aircrafts
    )
    handle_aircraft_update(
        AdsbPacket.from_bytes(_tc0_frame(None), 2.0, extensions=True), aircrafts
    )
    a = aircrafts[ICAO]
    assert a.altitude == 12000  # the "no altitude" TC0 did not clobber it
    assert a.last_contact == 2.0


def test_tc0_q_bit_only_is_a_valid_minus_1000():
    """AC12 with only the Q bit set encodes -1000 ft and must NOT be
    misread as 'no altitude' (the validity check covers all 12 bits)."""
    me = synth.make_position_me(0, -1000, 1, 1, odd=False, q25=True)
    pkt = AdsbPacket.from_bytes(synth.make_df17(ICAO, me), 1.0, extensions=True)
    assert pkt.msg.no_position and pkt.msg.altitude_valid
    assert pkt.msg.altitude == -1000


def test_tc0_stays_unknown_in_parity_mode():
    pkt = AdsbPacket.from_bytes(_tc0_frame(10000), 1.0, extensions=False)
    assert isinstance(pkt.msg, UnknownMsg)
