"""DF24 Comm-D ELM support (extension depth): classification in all
three oracles (device pipeline / golden scalar / native C++), cache-gated
assembly into CommDReply, tracker segment stash, checkpoint survival."""

import jax
import jax.numpy as jnp
import numpy as np

from airjax import golden
from airjax.extended import assemble_extended, handle_extended_update
from airjax.io import synth
from airjax.pipeline import decode_iq_block_extended_with_fields
from airjax.protocol import shortframe
from airjax.protocol.packet import CommDReply
from airjax.track.icao_cache import IcaoCache

ICAO = 0x7C6B30
N = 8000
MD = bytes(range(10, 20))


def _capture(nd=5, ke=1, md=MD):
    frames = [
        synth.make_df17(ICAO, synth.make_id_me("COMMD")),  # seeds cache
        shortframe.make_df24(ICAO, nd=nd, md=md, ke=ke),
    ]
    return synth.modulate(frames, [500, 2500], N, seed=17), frames


def _decode(iq):
    return jax.device_get(
        decode_iq_block_extended_with_fields(jnp.asarray(iq), N - 240, 64)
    )


def test_device_classifies_df24_as_long_ap():
    iq, _ = _capture()
    out = _decode(iq)
    k = np.nonzero(np.asarray(out["offsets"]) == 2500)[0]
    assert len(k) == 1
    k = k[0]
    assert bool(out["cand_long_ap"][k])
    assert not bool(out["good_long"][k])
    assert int(out["df"][k]) >= 24
    assert int(out["icao_ap_long"][k]) == ICAO


def test_golden_oracle_matches():
    iq, frames = _capture()
    hits = golden.decode_chunk_extended(iq)
    by_off = {off: (kind, pkt, ap) for off, kind, pkt, ap in hits}
    kind, pkt, ap = by_off[2500]
    assert kind == "long_ap"
    assert ap == ICAO
    assert pkt == frames[1]


def test_native_oracle_matches():
    from airjax import native

    iq, frames = _capture()
    hits, _n_det = native.decode_chunk_extended(np.asarray(iq))
    by_off = {h[0]: h for h in hits}
    _off, kind, pkt, ap = by_off[2500]
    assert kind == "long_ap"
    assert ap == ICAO
    assert pkt == frames[1]


def test_assembly_gated_and_typed():
    iq, _ = _capture(nd=7, ke=0)
    out = _decode(iq)
    pkts = assemble_extended(out, 100.0, IcaoCache())
    commd = [p for _off, p in pkts if isinstance(p, CommDReply)]
    assert len(commd) == 1
    assert commd[0].icao == ICAO
    assert commd[0].nd == 7 and commd[0].ke == 0
    assert commd[0].md == MD
    assert "Comm-D ELM" in commd[0].format()

    # Without the cache-seeding DF17, the AP candidate is gated off.
    lone = synth.modulate(
        [shortframe.make_df24(ICAO, nd=7, md=MD)], [500], N, seed=18
    )
    pkts2 = assemble_extended(_decode(lone), 100.0, IcaoCache())
    assert not any(isinstance(p, CommDReply) for _o, p in pkts2)


def test_tracker_stashes_segments_and_checkpoints(tmp_path):
    from airjax.track.state import load_state, save_state

    aircrafts = {}
    for nd, md in ((0, bytes(10)), (1, MD)):
        handle_extended_update(
            CommDReply(icao=ICAO, ke=1, nd=nd, md=md, time_processed=50.0),
            aircrafts,
        )
    a = aircrafts[ICAO]
    assert a.commd_segments == {"0": bytes(10).hex(), "1": MD.hex()}
    assert a.last_contact == 50.0

    path = tmp_path / "s.json"
    save_state(aircrafts, path)
    restored = load_state(path)
    assert restored[ICAO].commd_segments == a.commd_segments


def test_jsonl_record(tmp_path):
    from airjax.ui.stream import jsonl_writer
    import json

    path = tmp_path / "out.jsonl"
    sink = jsonl_writer(str(path))
    sink(CommDReply(icao=ICAO, ke=1, nd=3, md=MD, time_processed=9.0))
    rec = json.loads(path.read_text())
    assert rec["df"] == 24 and rec["nd"] == 3 and rec["ke"] == 1
    assert rec["md"] == MD.hex()


def test_batched_sink_equivalence_with_df24():
    """DF24 routes through the batched sink's complex fallback; tracker
    state must equal the per-packet path (segment stash included)."""
    from airjax.track.batch import ExtendedBatchTracker

    iq, _ = _capture(nd=2, ke=1)
    out = _decode(iq)
    per = {}
    cp = IcaoCache()
    for _off, pkt in assemble_extended(out, 100.0, cp):
        handle_extended_update(pkt, per)
    bt = ExtendedBatchTracker()
    assert bt.on_extended_block(out, 100.0, IcaoCache()) == 2
    assert per[ICAO].commd_segments == bt.aircrafts[ICAO].commd_segments
    assert bt.aircrafts[ICAO].commd_segments == {"2": MD.hex()}


def test_assemble_elm():
    from airjax.extended import assemble_elm

    assert assemble_elm(None) is None
    assert assemble_elm({}) is None
    segs = {"0": "00" * 10, "2": "22" * 10}
    assert assemble_elm(segs) is None  # gap at nd=1
    segs["1"] = "11" * 10
    full = assemble_elm(segs)
    assert full == bytes(10) + b"\x11" * 10 + b"\x22" * 10
    # Trailing completeness is undecidable from the downlink alone; an
    # out-of-band segment count rejects short prefixes.
    assert assemble_elm(segs, expected_segments=4) is None
    assert assemble_elm(segs, expected_segments=3) == full

    # Driven through the tracker: three segments arrive out of order.
    aircrafts = {}
    for nd in (2, 0, 1):
        handle_extended_update(
            CommDReply(
                icao=ICAO, ke=1, nd=nd, md=bytes([nd]) * 10,
                time_processed=5.0,
            ),
            aircrafts,
        )
    got = assemble_elm(aircrafts[ICAO].commd_segments)
    assert got == bytes(10) + b"\x01" * 10 + b"\x02" * 10


def test_interpret_elm_register_shaped():
    """A register-shaped ELM payload (BDS 2,0 extraction delivered via
    Comm-D) is inferred and decoded; raw hex always surfaces (VERDICT r4
    item 4)."""
    from airjax.extended import interpret_elm

    from tests.test_commb import make_bds20

    payload = make_bds20("ELMTEST") + bytes(3)  # one 10-byte segment
    out = interpret_elm(payload)
    assert out["hex"] == payload.hex()
    assert out["segments"] == 1
    assert out["bds"] == ["2,0"]
    assert out["decoded"] == {"value": "ELMTEST_"}

    # Non-register payload: raw hex, empty candidates, no decoded key.
    raw = interpret_elm(bytes(range(20)))
    assert raw["segments"] == 2
    assert raw["bds"] == [] and "decoded" not in raw
    assert raw["hex"] == bytes(range(20)).hex()


def test_tracker_interprets_completed_elm(tmp_path):
    """Every gapless segment-prefix updates aircraft.commd_elm; it rides
    the extended summary schema (commdElm) and checkpoints."""
    from airjax.track.state import load_state, save_state

    from tests.test_commb import make_bds20

    seg0 = make_bds20("ELMAIR") + bytes(3)
    aircrafts = {}
    # Out-of-order arrival: nd=1 first (no gapless prefix -> no elm yet).
    handle_extended_update(
        CommDReply(icao=ICAO, ke=1, nd=1, md=b"\xaa" * 10, time_processed=5.0),
        aircrafts,
    )
    assert aircrafts[ICAO].commd_elm is None
    handle_extended_update(
        CommDReply(icao=ICAO, ke=1, nd=0, md=seg0, time_processed=6.0),
        aircrafts,
    )
    elm = aircrafts[ICAO].commd_elm
    assert elm is not None
    assert elm["segments"] == 2
    assert elm["hex"] == (seg0 + b"\xaa" * 10).hex()
    assert elm["bds"] == ["2,0"] and elm["decoded"] == {"value": "ELMAIR__"}

    # Schema: the extended summary carries it under commdElm.
    summary = aircrafts[ICAO].get_summary().to_json(extended=True)
    assert summary["commdElm"] == elm

    # Checkpoint roundtrip.
    path = tmp_path / "elm.json"
    save_state(aircrafts, path)
    assert load_state(path)[ICAO].commd_elm == elm


def test_batched_sink_interprets_elm_identically():
    """The batched sink's fallback path produces the same commd_elm as
    the per-packet path for a complete single-segment ELM."""
    from airjax.track.batch import ExtendedBatchTracker

    iq, _ = _capture(nd=0, ke=1)
    out = _decode(iq)
    per = {}
    for _off, pkt in assemble_extended(out, 100.0, IcaoCache()):
        handle_extended_update(pkt, per)
    bt = ExtendedBatchTracker()
    bt.on_extended_block(out, 100.0, IcaoCache())
    assert per[ICAO].commd_elm == bt.aircrafts[ICAO].commd_elm
    assert per[ICAO].commd_elm is not None
    assert per[ICAO].commd_elm["hex"] == MD.hex()


def test_full_chain_multisegment_elm_interpretation():
    """Device pipeline -> assemble_extended -> tracker: a 2-segment ELM
    whose register-shaped payload spans the reassembly boundary is
    interpreted from the CONCATENATED payload (oracle: interpret_elm of
    the known ground-truth payload)."""
    from airjax.extended import interpret_elm

    from tests.test_commb import make_bds20

    seg0 = make_bds20("CHAINELM") + bytes(3)
    seg1 = bytes(range(50, 60))
    frames = [
        synth.make_df17(ICAO, synth.make_id_me("COMMD")),  # seeds cache
        shortframe.make_df24(ICAO, nd=0, md=seg0, ke=0),
        shortframe.make_df24(ICAO, nd=1, md=seg1, ke=1),
    ]
    iq = synth.modulate(frames, [500, 2500, 4500], N, seed=23)
    out = _decode(iq)
    aircrafts = {}
    for _off, pkt in assemble_extended(out, 100.0, IcaoCache()):
        handle_extended_update(pkt, aircrafts)
    elm = aircrafts[ICAO].commd_elm
    want = interpret_elm(seg0 + seg1)
    assert elm == want
    assert elm["segments"] == 2
    assert elm["bds"] == ["2,0"] and elm["decoded"] == {"value": "CHAINELM"}


def test_elm_interpretation_uses_gicb_capability():
    """The per-aircraft BDS 1,7 capability prunes ambiguous ELM register
    inference exactly like the Comm-B path (review r5): the classic
    5,0-vs-6,0 payload resolves once the aircraft announced it does not
    service 6,0."""
    from airjax.extended import interpret_elm
    from airjax.protocol import commb

    payload = bytes.fromhex("e21b371b29fc99") + bytes(3)  # 5,0 AND 6,0
    amb = interpret_elm(payload)
    assert {"5,0", "6,0"} <= set(amb["bds"]) and "decoded" not in amb

    resolved = interpret_elm(payload, gicb_supported=["2,0", "4,0", "5,0"])
    assert resolved["bds"] == ["5,0"]
    assert "decoded" in resolved

    # Through the tracker: capability first (DF20 BDS 1,7), then the ELM.
    from airjax.protocol.packet import SurveillanceReply

    from tests.test_commb import make_bds17

    aircrafts = {}
    d17 = commb.infer_bds(make_bds17(("2,0", "4,0", "5,0")))
    handle_extended_update(
        SurveillanceReply(
            df=20, icao=ICAO, flight_status=0, altitude_ft=None,
            squawk=None, time_processed=1.0, bds=d17,
        ),
        aircrafts,
    )
    assert aircrafts[ICAO].gicb_supported == ["2,0", "4,0", "5,0"]
    handle_extended_update(
        CommDReply(icao=ICAO, ke=1, nd=0, md=payload, time_processed=2.0),
        aircrafts,
    )
    assert aircrafts[ICAO].commd_elm["bds"] == ["5,0"]
