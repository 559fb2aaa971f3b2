"""Comm-B (BDS register) decode for DF20/21 MB fields — extension."""

import jax
import numpy as np

from airjax.extended import assemble_extended, handle_extended_update
from airjax.io import synth
from airjax.pipeline import decode_iq_block_extended
from airjax.protocol import commb, shortframe
from airjax.protocol.fields import CHAR_CONVERT
from airjax.protocol.packet import SurveillanceReply
from airjax.track.icao_cache import IcaoCache

ICAO = 0x7C6B30


def make_bds20(callsign: str) -> bytes:
    cs = callsign.ljust(8, "_")[:8]
    bits48 = 0
    for ch in cs:
        bits48 = (bits48 << 6) | CHAR_CONVERT.index(ch)
    return bytes([0x20]) + bits48.to_bytes(6, "big")


def _pack_fields(*fields):
    """[(value, width), ...] MSB-first -> 7 bytes."""
    v = 0
    total = 0
    for val, width in fields:
        v = (v << width) | (val & ((1 << width) - 1))
        total += width
    assert total == 56, total
    return v.to_bytes(7, "big")


def make_bds50(roll_deg=0.0, track_deg=0.0, gs_kt=0, track_rate=0.0, tas_kt=0):
    def enc(x, scale, width):
        return round(x / scale) & ((1 << width) - 1)

    return _pack_fields(
        (1, 1), (enc(roll_deg, 45 / 256, 10), 10),
        (1, 1), (enc(track_deg if track_deg < 180 else track_deg - 360, 90 / 512, 11), 11),
        (1, 1), (gs_kt // 2, 10),
        (1, 1), (enc(track_rate, 8 / 256, 10), 10),
        (1, 1), (tas_kt // 2, 10),
    )


def make_bds60(heading_deg=0.0, ias_kt=250, mach=0.78, baro_vs=-1024, inertial_vs=-1056):
    def enc(x, scale, width):
        return round(x / scale) & ((1 << width) - 1)

    return _pack_fields(
        (1, 1), (enc(heading_deg if heading_deg < 180 else heading_deg - 360, 90 / 512, 11), 11),
        (1, 1), (ias_kt, 10),
        (1, 1), (round(mach * 512 / 2.048), 10),
        (1, 1), (enc(baro_vs, 32, 10), 10),
        (1, 1), (enc(inertial_vs, 32, 10), 10),
    )


def test_bds20_known_vector():
    # Classic published Comm-B identification MB field.
    assert commb.decode_bds20(bytes.fromhex("202cc371c31de0")) == "KLM1017_"


def test_bds20_rejects_garbage():
    assert commb.decode_bds20(bytes.fromhex("10ffffffffffff")) is None  # not 0x20
    assert commb.decode_bds20(bytes.fromhex("20ffffffffffff")) is None  # '#' chars


def test_bds50_roundtrip():
    mb = make_bds50(roll_deg=-10.5, track_deg=221.0, gs_kt=440, track_rate=0.5, tas_kt=450)
    d = commb.decode_bds50(mb)
    assert d is not None
    assert abs(d["roll_deg"] + 10.5) < 0.2
    assert abs(d["track_deg"] - 221.0) < 0.2
    assert d["ground_speed_kt"] == 440
    assert d["tas_kt"] == 450


def test_bds50_validity_rules():
    # Status 0 with a nonzero field must reject.
    bad = bytearray(make_bds50(gs_kt=100))
    bad[0] &= 0x7F  # clear roll status, roll field left nonzero?
    # roll field was 0; instead set roll value with status cleared:
    bad = bytearray(make_bds50(roll_deg=20.0, gs_kt=100))
    bad[0] &= 0x7F
    assert commb.decode_bds50(bytes(bad)) is None
    # Implausible ground speed rejects.
    assert commb.decode_bds50(make_bds50(gs_kt=1900)) is None


def test_bds60_roundtrip():
    mb = make_bds60(heading_deg=42.2, ias_kt=252, mach=0.78, baro_vs=-1024, inertial_vs=-1056)
    d = commb.decode_bds60(mb)
    assert d is not None
    assert abs(d["heading_deg"] - 42.2) < 0.2
    assert d["ias_kt"] == 252
    assert abs(d["mach"] - 0.78) < 0.003
    assert d["baro_vs_fpm"] == -1024
    assert d["inertial_vs_fpm"] == -1056


def test_bds40_roundtrip_and_reject():
    mb = _pack_fields(
        (1, 1), (32000 // 16, 12),
        (1, 1), (31984 // 16, 12),
        (1, 1), (round((1013.2 - 800) / 0.1), 12),
        (0, 8), (0, 9),
    )
    d = commb.decode_bds40(mb)
    assert d == {"mcp_alt_ft": 32000, "fms_alt_ft": 31984, "baro_setting_mb": 1013.2}
    # Reserved bits nonzero -> reject.
    bad = bytearray(mb)
    bad[5] |= 0x04
    assert commb.decode_bds40(bytes(bad)) is None


def test_infer_and_e2e_df20_bds20():
    # DF17 registers the ICAO, then a DF20 whose MB carries BDS 2,0.
    df17 = synth.make_df17(ICAO, synth.make_id_me("COMMB"))
    df20 = shortframe.make_df20(ICAO, altitude_ft=36000, mb=make_bds20("KLM1017"))
    iq = synth.modulate([df17, df20], [500, 1500], 4000, seed=13)
    out = jax.device_get(
        decode_iq_block_extended(jax.numpy.asarray(iq), len(iq) - 240, 64)
    )
    pkts = [p for _, p in assemble_extended(out, 100.0, IcaoCache())]
    surv = [p for p in pkts if isinstance(p, SurveillanceReply)]
    assert surv and surv[0].bds and surv[0].bds["2,0"] == "KLM1017_"
    assert surv[0].altitude_ft == 36000

    aircrafts = {}
    handle_extended_update(surv[0], aircrafts)
    assert aircrafts[ICAO].callsign == "KLM1017_"
    assert aircrafts[ICAO].altitude == 36000


def test_tracker_bds60_velocity():
    rep = SurveillanceReply(
        df=21, icao=ICAO, flight_status=0, altitude_ft=None, squawk=7000,
        time_processed=100.0,
        bds={"6,0": commb.decode_bds60(make_bds60(baro_vs=-960))},
    )
    aircrafts = {}
    handle_extended_update(rep, aircrafts)
    assert aircrafts[ICAO].vertical_rate_fpm == -960
    assert aircrafts[ICAO].squawk == 7000


def test_empty_mb_infers_nothing():
    assert commb.infer_bds(b"\x00" * 7) == {}


def test_tracker_skips_ambiguous_50_60():
    """Review fix: when an MB co-validates as both 5,0 and 6,0 the tracker
    must not apply either velocity interpretation."""
    mb = make_bds50(gs_kt=440, tas_kt=450)
    both = {"5,0": commb.decode_bds50(mb), "6,0": {"baro_vs_fpm": -960}}
    rep = SurveillanceReply(
        df=20, icao=ICAO, flight_status=0, altitude_ft=None, squawk=None,
        time_processed=100.0, bds=both,
    )
    aircrafts = {}
    handle_extended_update(rep, aircrafts)
    assert aircrafts[ICAO].ground_speed_kt is None
    assert aircrafts[ICAO].vertical_rate_fpm is None


# ---------------------------------------------------------------------------
# BDS 1,0 / 1,7 / 3,0 (data link capability, GICB capability, ACAS RA)
# ---------------------------------------------------------------------------


def make_bds10(version=3, aircraft_id=True, overlay=True):
    return _pack_fields(
        (0x10, 8), (0, 1), (0, 5), (int(overlay), 1), (0, 1),
        (version, 7), (1, 1), (1, 1), (0, 3), (0, 4),
        (int(aircraft_id), 1), (1, 1), (0, 1), (1, 1), (0, 4), (0, 16),
    )


def make_bds17(reg_bits=("0,5", "2,0", "4,0", "5,0", "6,0")):
    mask = 0
    for i, name in enumerate(commb._GICB_REGS):
        if name in reg_bits:
            mask |= 1 << (23 - i)
    return _pack_fields((mask, 24), (0, 32))


def test_bds10_roundtrip():
    d = commb.decode_bds10(make_bds10(version=4, aircraft_id=True))
    assert d == {
        "continuation": False,
        "overlay_command_capability": True,
        "subnetwork_version": 4,
        "enhanced_protocol": True,
        "specific_services": True,
        "aircraft_id_capability": True,
    }
    # Wrong BDS code byte or bogus version rejects.
    assert commb.decode_bds10(b"\x11" + make_bds10()[1:]) is None
    assert commb.decode_bds10(make_bds10(version=99)) is None


def test_bds17_roundtrip():
    d = commb.decode_bds17(make_bds17())
    assert d == {"supported": ["0,5", "2,0", "4,0", "5,0", "6,0"]}
    # Reserved tail nonzero, or no BDS 2,0 support -> reject.
    assert commb.decode_bds17(make_bds17() [:6] + b"\x01") is None
    assert commb.decode_bds17(make_bds17(reg_bits=("5,0",))) is None


def test_bds30_ra_in_comm_b():
    from airjax.protocol import acas

    mv = acas.make_mv_ra(0b11000010000000, rac=0b0100, tti=1, tid=ICAO << 2)
    d = commb.decode_bds30(mv)
    assert d["advisories"] == ["corrective", "upward sense", "positive"]
    assert d["complements"] == ["do not pass above"]
    assert d["threat_icao"] == ICAO
    # Reserved threat type rejects.
    assert commb.decode_bds30(acas.make_mv_ra(1, tti=3)) is None
    assert commb.decode_bds30(b"\x20" + mv[1:]) is None


def test_infer_bds_identifies_new_registers():
    assert set(commb.infer_bds(make_bds10())) >= {"1,0"}
    assert "1,7" in commb.infer_bds(make_bds17())
    from airjax.protocol import acas

    mv = acas.make_mv_ra(0b11000010000000)
    assert "3,0" in commb.infer_bds(mv)
    # The existing registers still resolve unambiguously.
    assert set(commb.infer_bds(make_bds20("QFA12___"))) == {"2,0"}


def test_bds30_updates_tracker_ra():
    from airjax.protocol import acas
    from airjax.track.aircraft import Aircraft

    mv = acas.make_mv_ra(0b11000010000000, tti=1, tid=0xABC123 << 2)
    pkt = SurveillanceReply(
        df=20, icao=ICAO, flight_status=0, altitude_ft=35000, squawk=None,
        time_processed=99.0, bds=commb.infer_bds(mv),
    )
    aircrafts = {}
    handle_extended_update(pkt, aircrafts)
    a = aircrafts[ICAO]
    assert a.acas_ra and a.acas_ra["threat_icao"] == 0xABC123
    # A structural 3,0 match must not leak a coincidental 5,0/6,0 reading.
    assert a.ground_speed_kt is None and a.vertical_rate_fpm is None


def test_ambiguous_bds_surfaced_as_candidates():
    """A crafted MB validating as BOTH 5,0 and 6,0 (the classic Comm-B
    ambiguity) must surface in the tracker/WS schema as bdsCandidates
    instead of being silently picked (VERDICT r1 item 8)."""
    mb = bytes.fromhex("e21b371b29fc99")  # brute-forced ambiguous vector
    d = commb.infer_bds(mb)
    assert {"5,0", "6,0"} <= set(d)
    pkt = SurveillanceReply(
        df=20, icao=ICAO, flight_status=0, altitude_ft=35000, squawk=None,
        time_processed=99.0, bds=d,
    )
    aircrafts = {}
    handle_extended_update(pkt, aircrafts)
    a = aircrafts[ICAO]
    assert a.bds_candidates == sorted(d)
    assert len(a.bds_candidates) > 1
    # The ambiguous velocity/heading readings were NOT applied...
    assert a.ground_speed_kt is None and a.vertical_rate_fpm is None
    # ...and the extended WS schema carries the ambiguity.
    summary = a.get_summary().to_json(extended=True)
    assert summary["bdsCandidates"] == sorted(d)
    # Parity-mode schema stays reference-exact (no extension keys).
    assert "bdsCandidates" not in a.get_summary().to_json(extended=False)


def test_unambiguous_bds_candidates_single_entry():
    mb = _pack_fields(
        (1, 1), (0, 10), (1, 1), (512, 11), (1, 1), (220, 10),
        (1, 1), (0, 10), (1, 1), (225, 10),
    )
    d = commb.infer_bds(mb)
    pkt = SurveillanceReply(
        df=20, icao=ICAO, flight_status=0, altitude_ft=None, squawk=None,
        time_processed=1.0, bds=d,
    )
    aircrafts = {}
    handle_extended_update(pkt, aircrafts)
    a = aircrafts[ICAO]
    if a.bds_candidates == ["5,0"]:
        # Unambiguous 5,0: the velocity reading IS applied.
        assert a.ground_speed_kt == 440.0


# ---------------------------------------------------------------------------
# BDS 4,4 / 5,3 + capability-driven disambiguation (VERDICT r3 item 4)
# ---------------------------------------------------------------------------


def make_bds44(wind_kt=40, wind_dir_deg=225.0, temp_c=-45.0, press_hpa=1013,
               humidity_pct=25.0):
    temp_raw = round(temp_c / 0.25) & 0x7FF
    return _pack_fields(
        (0, 4),
        (1, 1), (wind_kt, 9), (round(wind_dir_deg * 256 / 180), 9),
        (temp_raw, 11),
        (1, 1), (press_hpa, 11),
        (0, 1), (0, 2),
        (1, 1), (round(humidity_pct * 64 / 100), 6),
    )


def make_bds53(heading_deg=100.0, ias_kt=250, mach=0.6, tas_kt=280, vs_fpm=-640):
    hdg = round((heading_deg if heading_deg < 180 else heading_deg - 360) / (90 / 512)) & 0x7FF
    return _pack_fields(
        (1, 1), (hdg, 11),
        (1, 1), (ias_kt, 10),
        (1, 1), (round(mach / 0.008), 9),
        (1, 1), (round(tas_kt / 0.5), 12),
        (1, 1), (round(vs_fpm / 64) & 0x1FF, 9),
    )


def test_bds44_roundtrip_and_reject():
    d = commb.decode_bds44(make_bds44())
    assert d is not None
    assert d["wind_speed_kt"] == 40
    assert abs(d["wind_dir_deg"] - 225.0) < 0.5
    assert d["static_air_temp_c"] == -45.0
    assert d["avg_static_pressure_hpa"] == 1013
    assert abs(d["humidity_pct"] - 25.0) < 1.0
    # Implausible wind speed, temperature, or pressure rejects.
    assert commb.decode_bds44(make_bds44(wind_kt=400)) is None
    assert commb.decode_bds44(make_bds44(temp_c=75.0)) is None
    assert commb.decode_bds44(make_bds44(press_hpa=1500)) is None


def test_bds53_roundtrip_and_reject():
    d = commb.decode_bds53(make_bds53())
    assert d is not None
    assert abs(d["magnetic_heading_deg"] - 100.0) < 0.2
    assert d["ias_kt"] == 250
    assert abs(d["mach"] - 0.6) < 0.005
    assert d["tas_kt"] == 280.0
    assert d["vs_fpm"] == -640
    assert commb.decode_bds53(make_bds53(ias_kt=900)) is None
    # TAS far below IAS is physically impossible -> reject.
    assert commb.decode_bds53(make_bds53(ias_kt=400, tas_kt=100)) is None


def test_infer_bds_includes_44_53():
    assert "4,4" in commb.infer_bds(make_bds44())
    assert "5,3" in commb.infer_bds(make_bds53())


def test_capability_prunes_ambiguous_candidates():
    """The classic 5,0-vs-6,0 ambiguity resolves once the aircraft's
    BDS 1,7 GICB report announces it services 5,0 but not 6,0: the
    candidate list shrinks to ['5,0'] and the 5,0 velocity applies."""
    mb = bytes.fromhex("e21b371b29fc99")  # validates as BOTH 5,0 and 6,0
    d = commb.infer_bds(mb)
    assert {"5,0", "6,0"} <= set(d)

    aircrafts = {}
    # Without a capability report: ambiguous, nothing applied.
    handle_extended_update(
        SurveillanceReply(
            df=20, icao=ICAO, flight_status=0, altitude_ft=None, squawk=None,
            time_processed=1.0, bds=d,
        ),
        aircrafts,
    )
    assert len(aircrafts[ICAO].bds_candidates) > 1
    assert aircrafts[ICAO].ground_speed_kt is None

    # BDS 1,7 report: transponder services 2,0/4,0/5,0 — NOT 6,0.
    cap = commb.infer_bds(make_bds17(reg_bits=("2,0", "4,0", "5,0")))
    assert set(cap) == {"1,7"}
    handle_extended_update(
        SurveillanceReply(
            df=20, icao=ICAO, flight_status=0, altitude_ft=None, squawk=None,
            time_processed=2.0, bds=cap,
        ),
        aircrafts,
    )
    assert aircrafts[ICAO].gicb_supported == ["2,0", "4,0", "5,0"]

    # Same ambiguous MB again: now pruned to 5,0 and APPLIED.
    handle_extended_update(
        SurveillanceReply(
            df=20, icao=ICAO, flight_status=0, altitude_ft=None, squawk=None,
            time_processed=3.0, bds=commb.infer_bds(mb),
        ),
        aircrafts,
    )
    a = aircrafts[ICAO]
    assert a.bds_candidates == ["5,0"]
    assert a.ground_speed_kt == commb.decode_bds50(mb)["ground_speed_kt"]


def test_capability_prune_never_empties():
    """A capability report that rules out EVERY candidate must not
    suppress the reading entirely (stale 1,7 defense): the original
    candidate set is kept."""
    mb = bytes.fromhex("e21b371b29fc99")
    d = commb.infer_bds(mb)
    pruned = commb.prune_by_capability(d, ["2,0"])  # supports neither
    assert pruned == d
    # Single candidates are never pruned either.
    assert commb.prune_by_capability({"5,0": {}}, ["2,0"]) == {"5,0": {}}


def test_gicb_capability_survives_checkpoint(tmp_path):
    from airjax.track.state import load_state, save_state

    aircrafts = {}
    cap = commb.infer_bds(make_bds17(reg_bits=("2,0", "5,0")))
    handle_extended_update(
        SurveillanceReply(
            df=20, icao=ICAO, flight_status=0, altitude_ft=None, squawk=None,
            time_processed=2.0, bds=cap,
        ),
        aircrafts,
    )
    path = tmp_path / "state.json"
    save_state(aircrafts, path)
    restored = load_state(path)
    assert restored[ICAO].gicb_supported == ["2,0", "5,0"]
    assert restored[ICAO].bds_candidates == ["1,7"]



def test_sole_candidate_bds44_feeds_met_and_schema():
    d = commb.infer_bds(make_bds44(wind_kt=40, wind_dir_deg=225.0, temp_c=-45.0))
    aircrafts = {}
    rep = SurveillanceReply(
        df=20, icao=ICAO, flight_status=0, altitude_ft=35000, squawk=None,
        time_processed=9.0, bds=d,
    )
    handle_extended_update(rep, aircrafts)
    a = aircrafts[ICAO]
    if list(d) == ["4,4"]:  # sole candidate: applied
        assert a.met is not None
        assert a.met["wind_speed_kt"] == 40
        assert a.met["static_air_temp_c"] == -45.0
        summary = a.get_summary().to_json(extended=True)
        assert summary["met"]["wind_speed_kt"] == 40
        assert "met" not in a.get_summary().to_json(extended=False)
    else:  # ambiguous MB: conservatively not applied
        assert a.met is None


def test_sole_candidate_bds40_feeds_selected_altitude():
    mb = _pack_fields(
        (1, 1), (32000 // 16, 12),
        (1, 1), (31984 // 16, 12),
        (1, 1), (round((1013.2 - 800) / 0.1), 12),
        (0, 8), (0, 9),
    )
    d = commb.infer_bds(mb)
    aircrafts = {}
    handle_extended_update(
        SurveillanceReply(
            df=20, icao=ICAO, flight_status=0, altitude_ft=None, squawk=None,
            time_processed=9.0, bds=d,
        ),
        aircrafts,
    )
    if list(d) == ["4,0"]:
        assert aircrafts[ICAO].selected_altitude_ft == 32000
    else:
        assert aircrafts[ICAO].selected_altitude_ft is None


def test_met_survives_checkpoint(tmp_path):
    from airjax.track.state import load_state, save_state
    from airjax.track.aircraft import Aircraft

    aircrafts = {ICAO: Aircraft(ICAO)}
    aircrafts[ICAO].met = {"wind_speed_kt": 12, "static_air_temp_c": -30.0}
    p = tmp_path / "s.json"
    save_state(aircrafts, p)
    assert load_state(p)[ICAO].met == aircrafts[ICAO].met
