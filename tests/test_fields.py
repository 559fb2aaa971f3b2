"""Field extraction parity (vectors from src/adsb/msgs.rs:225-322)."""

import numpy as np
import jax.numpy as jnp

from airjax.protocol.fields import (
    MSG_AIRCRAFT_ID,
    MSG_AIRCRAFT_POSITION,
    MSG_UNKNOWN,
    callsign_to_str,
    extract_fields,
)
from airjax.protocol.packet import AdsbPacket, AircraftId, AircraftPositionMsg, CprFormat


def _frame_with_me(me: bytes, icao=0x406B90, df=17, cap=5) -> np.ndarray:
    body = bytes([(df << 3) | cap, (icao >> 16) & 0xFF, (icao >> 8) & 0xFF, icao & 0xFF])
    return np.frombuffer(body + me + b"\x00\x00\x00", dtype=np.uint8)


def test_callsign_klm1023():
    me = bytes([0x20, 0x2C, 0xC3, 0x71, 0xC3, 0x2C, 0xE0])
    f = extract_fields(jnp.asarray(_frame_with_me(me)[None]))
    assert callsign_to_str(np.asarray(f["callsign_codes"][0])) == "KLM1023_"
    assert int(f["msg_type"][0]) == 4
    assert int(f["msg_class"][0]) == MSG_AIRCRAFT_ID


def test_altitudes():
    cases = [
        (bytes([0x58, 0xC3, 0x82, 0xD6, 0x90, 0xC8, 0xAC]), 38000),
        (bytes([0x58, 0xC2, 0x82, 0xD6, 0x90, 0xC8, 0xAC]), 155000),
        (bytes([0x58, 0x01, 0x02, 0xD6, 0x90, 0xC8, 0xAC]), -1000),
        (bytes([0x58, 0x01, 0x12, 0xD6, 0x90, 0xC8, 0xAC]), -975),
    ]
    frames = np.stack([_frame_with_me(me) for me, _ in cases])
    f = extract_fields(jnp.asarray(frames))
    for i, (_, alt) in enumerate(cases):
        assert int(f["altitude_ft"][i]) == alt
        assert int(f["msg_class"][i]) == MSG_AIRCRAFT_POSITION


def test_position_flags_and_cpr():
    even = bytes([0x58, 0xC3, 0x82, 0xD6, 0x90, 0xC8, 0xAC])
    odd = bytes([0x58, 0xC3, 0x86, 0x43, 0x5C, 0xC4, 0x12])
    frames = np.stack([_frame_with_me(even), _frame_with_me(odd)])
    f = extract_fields(jnp.asarray(frames))

    assert int(f["msg_type"][0]) == 11
    assert int(f["surveillance_status"][0]) == 0
    assert int(f["nic_supplement"][0]) == 0
    assert int(f["cpr_time"][0]) == 0
    assert int(f["cpr_odd"][0]) == 0
    assert int(f["cpr_lat"][0]) == 93000
    assert int(f["cpr_lon"][0]) == 51372

    assert int(f["cpr_odd"][1]) == 1
    assert int(f["cpr_lat"][1]) == 74158
    assert int(f["cpr_lon"][1]) == 50194


def test_header_fields_and_quirky_capability():
    frame = _frame_with_me(bytes(7), icao=0x7C6B30, df=17, cap=7)
    f = extract_fields(jnp.asarray(frame[None]))
    assert int(f["df"][0]) == 17
    assert int(f["icao"][0]) == 0x7C6B30
    # capability = byte0 & 5 (reference quirk): 0b10001_111 & 5 = 5
    assert int(f["capability"][0]) == 5
    assert int(f["msg_class"][0]) == MSG_UNKNOWN


def test_host_packet_matches_batched():
    pkt = AdsbPacket.from_hex("8d7c6b3020293532d70820fc8090")
    assert isinstance(pkt.msg, AircraftId)
    assert pkt.msg.callsign == "JST250__"
    assert pkt.icao == 0x7C6B30

    pkt = AdsbPacket.from_hex("8d7c6b30581304f388bb4455896f")
    assert isinstance(pkt.msg, AircraftPositionMsg)
    assert pkt.msg.altitude == 2600

    frames = np.stack(
        [
            np.frombuffer(bytes.fromhex("8d7c6b3020293532d70820fc8090"), np.uint8),
            np.frombuffer(bytes.fromhex("8d7c6b30581304f388bb4455896f"), np.uint8),
        ]
    )
    f = extract_fields(jnp.asarray(frames))
    assert callsign_to_str(np.asarray(f["callsign_codes"][0])) == "JST250__"
    assert int(f["altitude_ft"][1]) == 2600


def test_display_format_parity():
    pkt = AdsbPacket.from_hex("8d7c6b30580d107903b3cabf62ab")
    text = pkt.format()
    # Field lines exactly as the reference Display impl renders them
    # (src/adsb/packet.rs:86-95, msgs.rs:128-137).
    assert "== 8d7c6b30580d107903b3cabf62ab ==" in text
    assert "Downlink Format : 17" in text
    assert "Capability      : 5" in text
    assert "ICAO            : 7C6B30" in text
    assert "Message Type    : 11" in text
    assert "Type                : 11 (Position)" in text
    assert "Altitude (ft)       : 1425" in text
    assert "Raw Latitude        : 15489" in text
    assert "Raw Longitude       : 111562" in text
