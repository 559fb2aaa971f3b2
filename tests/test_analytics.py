"""Mass-replay analytics: whole-capture decode into per-aircraft tracks
(batched device field extraction + vectorized CPR pairing)."""

import numpy as np

from airjax.analytics import analyze_capture
from airjax.io import synth
from airjax.protocol.packet import AdsbPacket
from airjax.track.aircraft import handle_aircraft_update

ICAO_A = 0x7C6B30
ICAO_B = 0x4840D6
POS = (-41.3, 174.8)
ALT = 10000


def _capture():
    lat_e, lon_e = synth.encode_airborne_cpr(*POS, odd=False)
    lat_o, lon_o = synth.encode_airborne_cpr(*POS, odd=True)
    frames = [
        synth.make_df17(ICAO_A, synth.make_id_me("ANLYT1")),
        synth.make_df17(
            ICAO_A, synth.make_position_me(11, ALT, lat_e, lon_e, odd=False)
        ),
        synth.make_df17(
            ICAO_A, synth.make_position_me(11, ALT, lat_o, lon_o, odd=True)
        ),
        synth.make_df17(ICAO_B, synth.make_id_me("ANLYT2")),
    ]
    offsets = [500, 9000, 21000, 33000]
    return synth.modulate(frames, offsets, 60000, noise_std=20.0, seed=5)


def test_tracks_and_fixes():
    tracks, stats = analyze_capture(_capture())
    assert stats["n_aircraft"] == 2
    a = tracks[ICAO_A]
    assert a.callsign == "ANLYT1__"
    assert a.n_messages >= 3
    assert a.altitudes and all(alt == ALT for _, alt in a.altitudes)
    assert stats["n_fixes"] >= 1 and a.fixes
    fix = a.fixes[0]
    assert abs(fix.latitude - POS[0]) < 1e-3
    assert abs(fix.longitude - POS[1]) < 1e-3
    assert fix.altitude_ft == ALT

    b = tracks[ICAO_B]
    assert b.callsign == "ANLYT2__"
    assert not b.fixes


def test_fix_matches_online_tracker():
    """The analytics pairing must reproduce the online tracker's decode
    for the same frame sequence."""
    lat_e, lon_e = synth.encode_airborne_cpr(*POS, odd=False)
    lat_o, lon_o = synth.encode_airborne_cpr(*POS, odd=True)
    even = synth.make_df17(
        ICAO_A, synth.make_position_me(11, ALT, lat_e, lon_e, odd=False)
    )
    odd = synth.make_df17(
        ICAO_A, synth.make_position_me(11, ALT, lat_o, lon_o, odd=True)
    )
    aircrafts = {}
    handle_aircraft_update(AdsbPacket.from_bytes(even, 100.0), aircrafts)
    handle_aircraft_update(AdsbPacket.from_bytes(odd, 101.0), aircrafts)
    online = aircrafts[ICAO_A].geo_position
    assert online is not None

    tracks, _ = analyze_capture(_capture())
    fix = tracks[ICAO_A].fixes[0]
    assert abs(fix.latitude - online.latitude) < 1e-12
    assert abs(fix.longitude - online.longitude) < 1e-12


def test_empty_capture():
    rng = np.random.default_rng(0)
    iq = rng.integers(-50, 50, size=(30000, 2), dtype=np.int16)
    tracks, stats = analyze_capture(iq)
    assert tracks == {} or all(t.n_messages == 0 for t in tracks.values()) is False
    assert stats["n_fixes"] == 0


def test_extended_analytics_tracks():
    """analyze_capture_extended: all-formats replay with per-event
    velocity/squawk/fix histories and a packet-kind histogram."""
    from airjax.analytics import analyze_capture_extended
    from airjax.protocol import shortframe

    lat_e, lon_e = synth.encode_airborne_cpr(*POS, odd=False)
    lat_o, lon_o = synth.encode_airborne_cpr(*POS, odd=True)
    frames = [
        synth.make_df17(ICAO_A, synth.make_id_me("EXTANL")),
        synth.make_df17(
            ICAO_A, synth.make_position_me(11, ALT, lat_e, lon_e, odd=False)
        ),
        synth.make_df17(
            ICAO_A, synth.make_position_me(11, ALT, lat_o, lon_o, odd=True)
        ),
        synth.make_df17(
            ICAO_A, synth.make_velocity_me(ew_kt=100, ns_kt=75, vertical_rate_fpm=-640)
        ),
        shortframe.make_df11(ICAO_B),
        shortframe.make_df5(ICAO_B, 7421),
        shortframe.make_df4(ICAO_B, 12000),
    ]
    offsets = [500, 9000, 21000, 33000, 40000, 44000, 48000]
    iq = synth.modulate(frames, offsets, 60000, noise_std=20.0, seed=7)

    tracks, stats = analyze_capture_extended(iq)
    assert stats["n_aircraft"] == 2
    a = tracks[ICAO_A]
    assert a.callsign == "EXTANL__"
    assert a.kinds == {"AdsbPacket": 4}
    assert len(a.fixes) == 1
    assert abs(a.fixes[0].latitude - POS[0]) < 0.01
    assert a.fixes[0].offset == 21000
    assert len(a.velocities) == 1
    off, gs, tr, vr = a.velocities[0]
    assert off == 33000 and vr == -640
    assert abs(gs - (100**2 + 75**2) ** 0.5) < 1e-6
    b = tracks[ICAO_B]
    assert b.kinds == {"AllCallReply": 1, "SurveillanceReply": 2}
    assert b.squawks == [(44000, 7421)]
    assert b.altitudes[-1] == (48000, 12000)


def test_extended_analytics_empty():
    from airjax.analytics import analyze_capture_extended

    iq = np.clip(
        np.round(np.random.default_rng(0).normal(0, 30, (40000, 2))), -128, 127
    ).astype(np.int16)
    tracks, stats = analyze_capture_extended(iq)
    assert tracks == {} and stats["n_aircraft"] == 0


def test_devices_param_identical_tracks():
    """analyze_capture / analyze_capture_extended over an 8-device mesh
    produce the same tracks as the single-device decompositions."""
    from airjax.analytics import analyze_capture_extended

    iq = _capture()
    t1, s1 = analyze_capture(iq)
    t8, s8 = analyze_capture(iq, devices=8)
    assert set(t1) == set(t8)
    for icao in t1:
        assert t1[icao].callsign == t8[icao].callsign
        assert t1[icao].n_messages == t8[icao].n_messages
        assert [
            (f.latitude, f.longitude, f.altitude_ft) for f in t1[icao].fixes
        ] == [(f.latitude, f.longitude, f.altitude_ft) for f in t8[icao].fixes]
    assert s1["n_fixes"] == s8["n_fixes"]

    e1, es1 = analyze_capture_extended(iq)
    e8, es8 = analyze_capture_extended(iq, devices=8)
    assert set(e1) == set(e8)
    for icao in e1:
        assert e1[icao].n_messages == e8[icao].n_messages
    assert es1["n_good_long"] == es8["n_good_long"]
