"""Extended-mode 2-bit CRC recovery: device classification matches the
scalar golden oracle ('long2' kind), assembly gates repairs on the ICAO
acceptance cache (never seeding it), and the stream runner counts
accepted repairs. Default extended mode is untouched."""

import jax
import jax.numpy as jnp
import numpy as np

from airjax import golden
from airjax.extended import assemble_extended
from airjax.io import synth
from airjax.pipeline import decode_iq_block_extended
from airjax.protocol import shortframe
from airjax.protocol.packet import AdsbPacket
from airjax.runner import run_stream
from airjax.track.icao_cache import IcaoCache

ICAO = 0x7C6B30
FRAME = synth.make_df17(ICAO, synth.make_id_me("R2EXT"))
N = 20000


def _flip_bits(frame: bytes, positions) -> bytes:
    b = bytearray(frame)
    for p in positions:
        b[p // 8] ^= 1 << (7 - p % 8)
    return bytes(b)


def _decode(iq, recover2=True):
    return jax.device_get(
        decode_iq_block_extended(jnp.asarray(iq), N - 240, 128, recover2)
    )


def test_device_matches_golden_long2():
    bad = _flip_bits(FRAME, [9, 55])
    iq = synth.modulate([FRAME, bad], [500, 3000], N, seed=8)
    out = _decode(iq)
    k = int(np.nonzero(np.asarray(out["offsets"]) == 3000)[0][0])
    assert bool(out["good_long"][k]) and bool(out["recovered2"][k])
    assert out["frames"][k].tobytes() == FRAME  # repaired to the original

    ghits = {o: (kind, pkt) for o, kind, pkt, _ in
             golden.decode_chunk_extended(iq, recover2=True)}
    assert ghits[3000] == ("long2", FRAME)
    assert ghits[500] == ("long", FRAME)
    # Without recover2, neither tier validates the corrupted frame.
    out0 = _decode(iq, recover2=False)
    k0 = int(np.nonzero(np.asarray(out0["offsets"]) == 3000)[0][0])
    assert not bool(out0["good_long"][k0])
    assert "recovered2" not in out0
    assert 3000 not in {
        o for o, kind, _, _ in golden.decode_chunk_extended(iq)
        if kind == "long"
    }


def test_assembly_gates_on_cache():
    stranger = synth.make_df17(0x123456, synth.make_id_me("STRANGER"))
    iq = synth.modulate(
        [
            FRAME,  # clean: seeds the cache
            _flip_bits(FRAME, [9, 55]),  # accepted (cached ICAO)
            _flip_bits(stranger, [9, 55]),  # suppressed (never seen)
        ],
        [500, 3000, 6000],
        N,
        seed=9,
    )
    pkts = assemble_extended(_decode(iq), 100.0, IcaoCache())
    got = [(o, p.icao) for o, p in pkts if isinstance(p, AdsbPacket)]
    assert got == [(500, ICAO), (3000, ICAO)]


def test_repairs_never_seed_the_cache():
    """A gated-off repair must not validate a later AP candidate: the
    2-flip frame is the ONLY sighting of its ICAO, so the DF4 stays
    gated even though both share the address."""
    df4 = shortframe.make_df4(0x123456, altitude_ft=9000)
    bad = _flip_bits(
        synth.make_df17(0x123456, synth.make_id_me("NOSEED")), [9, 55]
    )
    iq = synth.modulate([bad, df4], [500, 3000], N, seed=10)
    pkts = assemble_extended(_decode(iq), 100.0, IcaoCache())
    assert pkts == []


def test_runner_extended_recover2_stats():
    iq = synth.modulate(
        [FRAME, _flip_bits(FRAME, [30, 31])], [500, 3000], N, seed=11
    )
    got = []
    stats = run_stream(
        iter([iq]), got.append, overlap=True, extended=True, recover2=True
    )
    assert [p.icao for p in got] == [ICAO, ICAO]
    assert stats.recovered2 == 1
    # Off: repair not attempted.
    got0 = []
    s0 = run_stream(iter([iq]), got0.append, overlap=True, extended=True)
    assert len(got0) == 1 and s0.recovered2 == 0


def test_native_tier_matches_golden_recover2():
    """Native C++ recover2 == golden recover2 on a crafted capture
    (repair classified 'long2', repaired bytes exact); default-mode
    native output unchanged."""
    from airjax import native

    bad = _flip_bits(FRAME, [9, 55])
    iq = synth.modulate([FRAME, bad], [500, 3000], N, seed=8)
    g = golden.decode_chunk_extended(iq, recover2=True)
    nh, _ = native.decode_chunk_extended(np.asarray(iq), recover2=True)
    assert nh == g
    by = {o: (k, p) for o, k, p, _ in nh}
    assert by[3000] == ("long2", FRAME)
    g0 = golden.decode_chunk_extended(iq)
    n0, _ = native.decode_chunk_extended(np.asarray(iq))
    assert n0 == g0 and 3000 not in {o for o, k, _, _ in n0 if k == "long"}
