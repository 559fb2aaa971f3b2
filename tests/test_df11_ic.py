"""Interrogated DF11 all-calls (nonzero II/SI code) — extension tests.

A DF11 reply to a ground interrogation carries PI = CRC ^ interrogator
code, so only spontaneous squitters (code 0) validate directly; encoded
II/SI codes are < 80 and such replies are accepted when the cleartext AA
address is already cached from validated traffic.
"""

import jax
import jax.numpy as jnp
import numpy as np

from airjax import extended, golden
from airjax.io import synth
from airjax.pipeline import decode_iq_block_extended
from airjax.protocol import shortframe
from airjax.protocol.packet import AllCallReply
from airjax.track.icao_cache import IcaoCache

ICAO = 0xC827A5


def _decode(iq):
    n_off = len(iq) - 240
    return jax.device_get(decode_iq_block_extended(jnp.asarray(iq), n_off, 256))


def _capture(interrogator, seed=0, with_seed_frame=True):
    frames = [shortframe.make_df11(ICAO, interrogator=interrogator)]
    offsets = [1400]
    if with_seed_frame:
        frames.insert(0, synth.make_df17(ICAO, synth.make_id_me("ICTEST_")))
        offsets.insert(0, 300)
    return synth.modulate(frames, offsets, 3000, snr_db=18.0, seed=seed)


def test_df11_ic_accepted_when_cached():
    out = _decode(_capture(interrogator=13))
    cache = IcaoCache()
    packets = [p for _, p in extended.assemble_extended(out, 100.0, cache)]
    acs = [p for p in packets if isinstance(p, AllCallReply)]
    assert len(acs) == 1
    assert acs[0].icao == ICAO and acs[0].interrogator == 13


def test_df11_ic_rejected_without_cache():
    out = _decode(_capture(interrogator=13, with_seed_frame=False))
    packets = extended.assemble_extended(out, 100.0, IcaoCache())
    assert not any(isinstance(p, AllCallReply) for _, p in packets)


def test_df11_ic_does_not_seed_cache():
    # An interrogated all-call must not itself register its ICAO.
    out = _decode(_capture(interrogator=13, with_seed_frame=False))
    cache = IcaoCache()
    extended.assemble_extended(out, 100.0, cache)
    assert not cache.contains(ICAO, 100.0)


def test_df11_large_residual_not_a_candidate():
    # Residual >= 80 cannot be an II/SI code: never a df11_ic candidate.
    # (The raw bitstream past the 56-bit DF11 may still pattern-match
    # another AP-addressed class — since DF24 support, first-two-bits-'11'
    # windows classify as cache-gated long_ap candidates; those are
    # legitimately present and gated off downstream.)
    iq = _capture(interrogator=0x5FEA3C, with_seed_frame=False)
    gold = golden.decode_chunk_extended(iq)
    assert not any(k == "df11_ic" for _, k, _, _ in gold)
    out = _decode(iq)
    assert not np.any(out["cand_df11_ic"] & out["valid"])
    # Anything that did classify is AP-gated: no cache seed, no packet.
    pkts = extended.assemble_extended(out, 100.0, IcaoCache())
    assert pkts == []


def test_df11_ic_three_way_oracle_agreement():
    iq = _capture(interrogator=42, seed=3)
    gold = golden.decode_chunk_extended(iq)
    assert any(k == "df11_ic" and a == 42 for _, k, _, a in gold)

    from airjax import native

    n_hits, _ = native.decode_chunk_extended(iq)
    assert n_hits == gold
