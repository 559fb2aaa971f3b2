"""Gillham (Q=0, 100 ft gray code) altitude decode for DF4/20 AC13 fields —
extension beyond the reference (which decodes no short frames). Exhaustively
round-trips every valid Gillham altitude through both the vectorized
device decoder and the independent host scalar decoder."""

import jax
import jax.numpy as jnp
import numpy as np

from airjax.extended import _short_fields_host, assemble_extended
from airjax.io import synth
from airjax.pipeline import decode_iq_block_extended
from airjax.protocol import shortframe
from airjax.protocol.packet import SurveillanceReply
from airjax.track.icao_cache import IcaoCache

ICAO = 0x7C6B30
ALL_ALTS = list(range(-1200, 126701, 100))  # full Gillham range, 1280 codes


def test_exhaustive_roundtrip_device():
    frames = b"".join(
        shortframe.make_df4(ICAO, alt, gillham=True) for alt in ALL_ALTS
    )
    bits = np.unpackbits(np.frombuffer(frames, np.uint8)).reshape(-1, 56)
    f = jax.device_get(shortframe.extract_short_fields(jnp.asarray(bits)))
    assert bool(f["altitude_valid"].all())
    np.testing.assert_array_equal(f["altitude_ft"], np.asarray(ALL_ALTS))


def test_exhaustive_roundtrip_host_scalar():
    for alt in ALL_ALTS:
        frame = shortframe.make_df4(ICAO, alt, gillham=True)
        assert _short_fields_host(frame[:7])["altitude_ft"] == alt


def test_q1_path_unchanged():
    frame = shortframe.make_df4(ICAO, 12000)
    bits = np.unpackbits(np.frombuffer(frame, np.uint8))[None]
    f = shortframe.extract_short_fields(jnp.asarray(bits))
    assert bool(f["altitude_valid"][0]) and int(f["altitude_ft"][0]) == 12000
    assert _short_fields_host(frame[:7])["altitude_ft"] == 12000


def test_invalid_codes_rejected():
    # C1=C2=C4=0 (c_gray == 0) is not a valid Gillham 100s code.
    word = (4 << 27) | 0  # DF4, all AC13 bits zero (M=0, Q=0, C=0)
    body = word.to_bytes(4, "big")
    from airjax.protocol.crc import crc24

    ap = crc24(body) ^ ICAO
    frame = body + ap.to_bytes(3, "big")
    bits = np.unpackbits(np.frombuffer(frame, np.uint8))[None]
    f = shortframe.extract_short_fields(jnp.asarray(bits))
    assert not bool(f["altitude_valid"][0])
    assert _short_fields_host(frame[:7])["altitude_ft"] is None

    # M=1 (metric) must also be rejected by both decoders.
    word_m = (4 << 27) | (1 << 6)
    body_m = word_m.to_bytes(4, "big")
    frame_m = body_m + (crc24(body_m) ^ ICAO).to_bytes(3, "big")
    bits_m = np.unpackbits(np.frombuffer(frame_m, np.uint8))[None]
    fm = shortframe.extract_short_fields(jnp.asarray(bits_m))
    assert not bool(fm["altitude_valid"][0])
    assert _short_fields_host(frame_m[:7])["altitude_ft"] is None


def test_e2e_df4_gillham_through_pipeline():
    # A DF17 registers the ICAO, then a Gillham-encoded DF4 is accepted
    # and its 100 ft altitude decoded.
    df17 = synth.make_df17(ICAO, synth.make_id_me("GILLHAM"))
    df4 = shortframe.make_df4(ICAO, 7500, gillham=True)
    iq = synth.modulate([df17, df4], [500, 1500], 4000, seed=11)
    n_off = len(iq) - 240
    out = jax.device_get(decode_iq_block_extended(jnp.asarray(iq), n_off, 64))
    pkts = [p for _, p in assemble_extended(out, 100.0, IcaoCache())]
    surv = [p for p in pkts if isinstance(p, SurveillanceReply)]
    assert surv and surv[0].altitude_ft == 7500
