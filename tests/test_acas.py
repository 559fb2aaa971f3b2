"""ACAS air-air surveillance (DF0/DF16) and DF18 TIS-B — extension tests.

The reference decodes neither (its detector hard-gates DF17,
src/adsb/demod.rs:38-54); extended mode classifies DF0 like DF4/5
(AP-addressed short candidate), DF16 like DF20/21 (AP-addressed long
candidate), and DF18 like DF17 (CRC-validated extended squitter).
"""

import jax
import jax.numpy as jnp
import numpy as np

from airjax import extended, golden
from airjax.io import synth
from airjax.pipeline import decode_iq_block_extended
from airjax.protocol import acas, shortframe
from airjax.protocol.packet import AcasReply, AdsbPacket, UnknownMsg
from airjax.track.aircraft import Aircraft
from airjax.track.icao_cache import IcaoCache

ICAO = 0x4840D6


def _decode_extended(iq):
    n_off = len(iq) - 240
    return jax.device_get(decode_iq_block_extended(jnp.asarray(iq), n_off, 256))


# ---------------------------------------------------------------------------
# MV resolution-advisory field
# ---------------------------------------------------------------------------


def test_mv_ra_roundtrip_climb():
    # Single-threat corrective climb RA: ARA41=1, corrective, upward,
    # positive; complement "do not pass below"; threat by ICAO.
    ara = 0b11000010000000
    mv = acas.make_mv_ra(ara, rac=0b1000, tti=1, tid=0xABCDEF << 2)
    ra = acas.decode_mv_ra(mv)
    assert ra is not None
    assert ra["advisories"] == ["corrective", "upward sense", "positive"]
    assert ra["complements"] == ["do not pass below"]
    assert not ra["terminated"] and not ra["multiple_threats"]
    assert ra["threat_type"] == 1 and ra["threat_icao"] == 0xABCDEF


def test_mv_ra_multi_threat_and_termination():
    ara = 0b01100000000000  # ARA41=0: multi-threat clauses
    mv = acas.make_mv_ra(ara, rat=1, mte=1)
    ra = acas.decode_mv_ra(mv)
    assert ra["multiple_threats"] and ra["terminated"]
    assert ra["advisories"] == [
        "requires upward correction",
        "requires positive climb",
    ]


def test_mv_non_ra_vds_is_ignored():
    assert acas.decode_mv_ra(b"\x00" * 7) is None
    assert acas.decode_mv_ra(b"\x31" + b"\x00" * 6) is None


# ---------------------------------------------------------------------------
# DF0/DF16 field extraction (device) and builders
# ---------------------------------------------------------------------------


def test_df0_fields_device():
    frame = shortframe.make_df0(ICAO, 23350, vs=1, cc=1, sl=4, ri=9)
    bits = jnp.asarray(np.unpackbits(np.frombuffer(frame, np.uint8)))
    f = jax.device_get(shortframe.extract_short_fields(bits))
    assert int(f["df"]) == 0
    assert int(f["vs"]) == 1 and int(f["cc"]) == 1
    assert int(f["sl"]) == 4 and int(f["ri"]) == 9
    assert bool(f["altitude_valid"]) and int(f["altitude_ft"]) == 23350
    assert int(f["icao_ap"]) == ICAO


def test_df16_fields_device():
    mv = acas.make_mv_ra(0b10100001000000)
    frame = shortframe.make_df16(ICAO, 4000, mv=mv, vs=0, sl=6, ri=8)
    bits = jnp.asarray(np.unpackbits(np.frombuffer(frame[:7], np.uint8)))
    f = jax.device_get(shortframe.extract_short_fields(bits))
    assert int(f["df"]) == 16
    assert int(f["sl"]) == 6 and int(f["ri"]) == 8
    assert int(f["altitude_ft"]) == 4000
    assert frame[4:11] == mv  # MV rides in the long-frame body


# ---------------------------------------------------------------------------
# End-to-end: device classification + host assembly + tracker
# ---------------------------------------------------------------------------


def _mixed_capture(snr=18.0, seed=7):
    mv = acas.make_mv_ra(0b11000010000000, rac=0b1000, tti=1, tid=ICAO << 2)
    frames = [
        synth.make_df17(ICAO, synth.make_id_me("ACASTST")),  # seeds the cache
        shortframe.make_df0(ICAO, 12000, vs=0, sl=5, ri=3),
        shortframe.make_df16(ICAO, 12025, mv=mv, vs=0, sl=5),
        synth.make_df18(0x123456, synth.make_id_me("TISBVEH"), cf=2),
    ]
    offsets = [300, 1400, 2300, 3400]
    return synth.modulate(frames, offsets, 5000, snr_db=snr, seed=seed)


def test_extended_assembly_acas_and_df18():
    iq = _mixed_capture()
    out = _decode_extended(iq)
    cache = IcaoCache()
    packets = [p for _, p in extended.assemble_extended(out, now=100.0, cache=cache)]

    acas_pkts = [p for p in packets if isinstance(p, AcasReply)]
    assert [p.df for p in acas_pkts] == [0, 16]
    df0, df16 = acas_pkts
    assert df0.icao == ICAO and df0.altitude_ft == 12000
    assert df0.sensitivity_level == 5 and df0.reply_information == 3
    assert df16.altitude_ft == 12025
    assert df16.ra is not None and df16.ra["threat_icao"] == ICAO
    assert "corrective" in df16.ra["advisories"]

    df18 = [
        p
        for p in packets
        if isinstance(p, AdsbPacket) and p.downlink_format == 18
    ]
    assert len(df18) == 1 and df18[0].icao == 0x123456
    assert df18[0].msg.callsign == "TISBVEH_"


def test_acas_rejected_without_cached_icao():
    mv = acas.make_mv_ra(0b11000010000000)
    frames = [
        shortframe.make_df0(ICAO, 12000),
        shortframe.make_df16(ICAO, 12025, mv=mv),
    ]
    iq = synth.modulate(frames, [300, 1300], 4000, snr_db=18.0, seed=1)
    out = _decode_extended(iq)
    packets = extended.assemble_extended(out, now=100.0, cache=IcaoCache())
    assert not any(isinstance(p, AcasReply) for _, p in packets)


def test_df18_coarse_tisb_stays_unknown():
    # CF=3 (coarse TIS-B) does not use the DF17 ME layout.
    pkt = AdsbPacket.from_bytes(
        synth.make_df18(0x123456, synth.make_id_me("BOGUS___"), cf=3),
        time_processed=0.0,
        extensions=True,
    )
    assert isinstance(pkt.msg, UnknownMsg)
    # ...while CF=6 (ADS-B rebroadcast) does.
    pkt6 = AdsbPacket.from_bytes(
        synth.make_df18(0x123456, synth.make_id_me("REAL____"), cf=6),
        time_processed=0.0,
        extensions=True,
    )
    assert pkt6.msg.callsign == "REAL____"


def test_tracker_update_from_acas():
    aircrafts: dict[int, Aircraft] = {}
    ra = {"advisories": ["corrective"], "complements": [], "terminated": False,
          "multiple_threats": False, "threat_type": 0, "ara": 0, "rac": 0}
    extended.handle_extended_update(
        AcasReply(
            df=16, icao=ICAO, vertical_status=1, sensitivity_level=5,
            reply_information=3, altitude_ft=900, time_processed=50.0, ra=ra,
        ),
        aircrafts,
    )
    a = aircrafts[ICAO]
    assert a.altitude == 900 and a.on_ground and a.acas_ra == ra

    summary = a.get_summary().to_json(extended=True)
    assert summary["onGround"] is True
    assert summary["acasRa"] == "corrective"
    # Terminated RAs stop being advertised.
    a.acas_ra = dict(ra, terminated=True)
    assert a.get_summary().to_json(extended=True)["acasRa"] is None
    # Parity-schema JSON stays reference-exact (no extra keys).
    assert set(a.get_summary().to_json()) == {
        "icao", "callsign", "altitude", "geoPosition", "lastContact",
    }


# ---------------------------------------------------------------------------
# Three-way oracle agreement on the mixed capture
# ---------------------------------------------------------------------------


def test_acas_mix_matches_scalar_and_native_oracles():
    iq = _mixed_capture(snr=9.0, seed=11)
    gold = golden.decode_chunk_extended(iq)
    kinds = {k for _, k, _, _ in gold}
    assert {"long", "short_ap", "long_ap"} <= kinds  # DF17/18, DF0, DF16

    out = _decode_extended(iq)
    ours = []
    for k in range(len(out["offsets"])):
        if not out["valid"][k]:
            continue
        off = int(out["offsets"][k])
        if out["good_long"][k]:
            ours.append((off, "long", out["frames"][k].tobytes(), 0))
        elif out["good_df11"][k]:
            ours.append((off, "df11", out["frames_raw"][k].tobytes()[:7], 0))
        elif out["cand_df11_ic"][k]:
            ours.append(
                (off, "df11_ic", out["frames_raw"][k].tobytes()[:7],
                 int(out["icao_ap_short"][k]))
            )
        elif out["cand_short_ap"][k]:
            ours.append(
                (off, "short_ap", out["frames_raw"][k].tobytes()[:7],
                 int(out["icao_ap_short"][k]))
            )
        elif out["cand_long_ap"][k]:
            ours.append(
                (off, "long_ap", out["frames_raw"][k].tobytes(),
                 int(out["icao_ap_long"][k]))
            )
    assert ours == gold

    from airjax import native

    n_hits, _ = native.decode_chunk_extended(iq)
    assert n_hits == gold
