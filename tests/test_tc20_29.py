"""TC20-22 GNSS-altitude positions and TC29 target state & status —
extensions (the reference classes all of these Unknown)."""

from airjax.io import synth
from airjax.protocol.packet import (
    AdsbPacket,
    AircraftPositionMsg,
    CprFormat,
    TargetStateMsg,
    UnknownMsg,
)
from airjax.track.aircraft import handle_aircraft_update

ICAO = 0x7C6B30
POS = (-41.3, 174.8)


def test_tc20_gnss_position_decode():
    lat17, lon17 = synth.encode_airborne_cpr(*POS, odd=False)
    me = synth.make_gnss_position_me(20, 3000, lat17, lon17, odd=False)
    pkt = AdsbPacket.from_bytes(synth.make_df17(ICAO, me), 100.0, extensions=True)
    msg = pkt.msg
    assert isinstance(msg, AircraftPositionMsg)
    assert msg.altitude_gnss
    assert msg.altitude == round(3000 * 3.28084)
    assert msg.cpr_format is CprFormat.EVEN
    assert "GNSS" in msg.format()

    # Parity: default mode keeps TC20-22 Unknown.
    plain = AdsbPacket.from_bytes(synth.make_df17(ICAO, me), 100.0)
    assert isinstance(plain.msg, UnknownMsg)


def test_tc20_pairs_with_tc11_for_position():
    # A GNSS even frame and a baro odd frame pair for a CPR fix.
    lat_e, lon_e = synth.encode_airborne_cpr(*POS, odd=False)
    lat_o, lon_o = synth.encode_airborne_cpr(*POS, odd=True)
    gnss_even = AdsbPacket.from_bytes(
        synth.make_df17(ICAO, synth.make_gnss_position_me(20, 3000, lat_e, lon_e, odd=False)),
        100.0, extensions=True,
    )
    baro_odd = AdsbPacket.from_bytes(
        synth.make_df17(ICAO, synth.make_position_me(11, 10000, lat_o, lon_o, odd=True)),
        101.0, extensions=True,
    )
    aircrafts = {}
    handle_aircraft_update(gnss_even, aircrafts)
    handle_aircraft_update(baro_odd, aircrafts)
    geo = aircrafts[ICAO].geo_position
    assert geo is not None
    assert abs(geo.latitude - POS[0]) < 1e-3
    assert abs(geo.longitude - POS[1]) < 1e-3


def test_tc29_roundtrip():
    me = synth.make_target_state_me(
        selected_altitude_ft=32000,
        baro_setting_mb=1013.6,
        selected_heading_deg=221.5,
        autopilot=True,
        vnav=True,
    )
    msg = TargetStateMsg.from_me(me)
    assert msg.subtype == 1
    assert msg.selected_altitude_ft == 32000
    assert not msg.altitude_is_fms
    assert abs(msg.baro_setting_mb - 1013.6) < 0.4
    assert abs(msg.selected_heading_deg - 221.5) < 180 / 256
    assert msg.autopilot and msg.vnav and not msg.alt_hold
    assert msg.tcas_operational and not msg.lnav


def test_tc29_no_data_and_legacy_subtype():
    me = synth.make_target_state_me()  # everything unavailable
    msg = TargetStateMsg.from_me(me)
    assert msg.selected_altitude_ft is None
    assert msg.baro_setting_mb is None
    assert msg.selected_heading_deg is None

    # mode_valid=0 -> autopilot flags are meaningless (None).
    me2 = synth.make_target_state_me(autopilot=True, mode_valid=False)
    msg2 = TargetStateMsg.from_me(me2)
    assert msg2.autopilot is None

    # Legacy subtype 0 stays raw.
    legacy = bytes([(29 << 3) | 0b000]) + b"\x00" * 6
    msg3 = TargetStateMsg.from_me(legacy)
    assert msg3.subtype == 0 and msg3.selected_altitude_ft is None


def test_tc29_tracker_integration():
    me = synth.make_target_state_me(selected_altitude_ft=11008, selected_heading_deg=90.0)
    pkt = AdsbPacket.from_bytes(synth.make_df17(ICAO, me), 100.0, extensions=True)
    aircrafts = {}
    handle_aircraft_update(pkt, aircrafts)
    assert aircrafts[ICAO].selected_altitude_ft == 11008
    assert abs(aircrafts[ICAO].selected_heading_deg - 90.0) < 1
