"""Aircraft tracker parity (vectors from src/adsb/aircraft.rs:167-263)."""

from airjax.protocol.packet import AdsbPacket
from airjax.track.aircraft import Aircraft, handle_aircraft_update


def test_aircraft_new():
    a = Aircraft(0x123456)
    assert a.icao == 0x123456
    assert a.get_callsign() == ""
    assert a.altitude == 0


def test_handle_packet_id():
    a = Aircraft(0x7C6B30)
    a.handle_packet(AdsbPacket.from_hex("8d7c6b3020293532d70820fc8090"))
    assert a.get_callsign() == "JST250__"


def test_handle_packet_alt():
    a = Aircraft(0x7C6B30)
    a.handle_packet(AdsbPacket.from_hex("8d7c6b30581304f388bb4455896f"))
    assert a.altitude == 2600


def test_two_frame_cpr_textbook():
    a = Aircraft(0x40621D)
    a.handle_packet(AdsbPacket.from_hex("8D40621D58C386435CC412692AD6"))
    a.handle_packet(AdsbPacket.from_hex("8D40621D58C382D690C8AC2863A7"))
    assert a.altitude == 38000
    assert abs(a.geo_position.latitude - 52.25720) < 0.0001
    # Reference *code* behavior: 3.91937255859375 (its own test file expects
    # 3.8295 for this pair but that fails against its own implementation —
    # see tests/test_cpr.py::test_longitude_calculation).
    assert a.geo_position.longitude == 3.91937255859375


def test_two_frame_cpr_wellington():
    a = Aircraft(0x7C6B30)
    a.handle_packet(AdsbPacket.from_hex("8d7c6b30580d107903b3cabf62ab"))
    a.handle_packet(AdsbPacket.from_hex("8d7c6b30580d24eeaebb2dfea5bb"))
    assert a.altitude == 1450
    assert abs(a.geo_position.latitude - -41.28964698920816) < 0.0001
    assert abs(a.geo_position.longitude - 174.80927207253197) < 0.0001


def test_pair_expiry_10s():
    # Opposite-parity frame older than 10 s must not pair
    # (src/adsb/aircraft.rs:68,84).
    a = Aircraft(0x40621D)
    a.handle_packet(AdsbPacket.from_hex("8D40621D58C386435CC412692AD6", time_processed=1000.0))
    a.handle_packet(AdsbPacket.from_hex("8D40621D58C382D690C8AC2863A7", time_processed=1011.0))
    assert a.geo_position is None
    # Within the window it pairs.
    a2 = Aircraft(0x40621D)
    a2.handle_packet(AdsbPacket.from_hex("8D40621D58C386435CC412692AD6", time_processed=1000.0))
    a2.handle_packet(AdsbPacket.from_hex("8D40621D58C382D690C8AC2863A7", time_processed=1009.0))
    assert a2.geo_position is not None


def test_icao_mismatch_ignored():
    a = Aircraft(0x111111)
    a.handle_packet(AdsbPacket.from_hex("8d7c6b3020293532d70820fc8090"))
    assert a.get_callsign() == ""


def test_handle_aircraft_update_and_summary_json():
    aircrafts = {}
    pkt = AdsbPacket.from_hex("8d7c6b3020293532d70820fc8090")
    handle_aircraft_update(pkt, aircrafts)
    assert 0x7C6B30 in aircrafts
    summary = aircrafts[0x7C6B30].get_summary().to_json()
    # camelCase schema per bindings/AircraftSummary.ts
    assert set(summary) == {"icao", "callsign", "altitude", "geoPosition", "lastContact"}
    assert summary["callsign"] == "JST250__"
    assert summary["geoPosition"] is None
