"""TC28 aircraft status (emergency + squawk) and TC31 operational status —
extensions beyond the reference (which classes both as Unknown)."""

from airjax.io import synth
from airjax.protocol.packet import (
    AdsbPacket,
    AircraftStatusMsg,
    OperationalStatusMsg,
    UnknownMsg,
    squawk_from_id13,
)
from airjax.protocol.shortframe import _id13_from_squawk
from airjax.track.aircraft import handle_aircraft_update


def test_id13_roundtrip_exhaustive():
    # Every 4-digit octal Mode A code survives encode -> decode.
    for a in range(8):
        for b in range(8):
            for c in range(8):
                for d in range(8):
                    code = a * 1000 + b * 100 + c * 10 + d
                    assert squawk_from_id13(_id13_from_squawk(code)) == code


def test_tc28_emergency_and_squawk():
    me = synth.make_status_me(squawk=7700, emergency_state=1)
    pkt = AdsbPacket.from_bytes(synth.make_df17(0xABCDEF, me), 100.0, extensions=True)
    msg = pkt.msg
    assert isinstance(msg, AircraftStatusMsg)
    assert msg.subtype == 1
    assert msg.emergency_state == 1
    assert msg.squawk == 7700
    assert "general" in msg.format()

    # Parity: default decode keeps TC28 Unknown.
    plain = AdsbPacket.from_bytes(synth.make_df17(0xABCDEF, me), 100.0)
    assert isinstance(plain.msg, UnknownMsg)


def test_tc31_airborne():
    me = synth.make_opstatus_me(version=2, nac_p=10, sil=3, nic_a=1)
    pkt = AdsbPacket.from_bytes(synth.make_df17(0xABCDEF, me), 100.0, extensions=True)
    msg = pkt.msg
    assert isinstance(msg, OperationalStatusMsg)
    assert msg.subtype == 0
    assert msg.adsb_version == 2
    assert msg.nac_p == 10
    assert msg.sil == 3
    assert msg.nic_supplement_a == 1
    assert msg.lw_code is None and msg.gva is not None


def test_tc31_surface():
    me = synth.make_opstatus_me(version=1, surface=True, lw_code=9, capability_class=0x123)
    msg = OperationalStatusMsg.from_me(me)
    assert msg.subtype == 1
    assert msg.adsb_version == 1
    assert msg.lw_code == 9
    assert msg.capability_class == 0x123
    assert msg.gva is None and msg.nic_baro is None


def test_tracker_integration():
    icao = 0x40621D
    aircrafts = {}
    status = AdsbPacket.from_bytes(
        synth.make_df17(icao, synth.make_status_me(squawk=7421, emergency_state=0)),
        100.0,
        extensions=True,
    )
    ops = AdsbPacket.from_bytes(
        synth.make_df17(icao, synth.make_opstatus_me(version=2)),
        101.0,
        extensions=True,
    )
    handle_aircraft_update(status, aircrafts)
    handle_aircraft_update(ops, aircrafts)
    plane = aircrafts[icao]
    assert plane.squawk == 7421
    assert plane.emergency_state == 0
    assert plane.adsb_version == 2
    assert plane.last_contact == 101.0
