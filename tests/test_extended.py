"""Extended decode mode (beyond-reference extension): DF11 all-call,
AP-addressed DF4/5 surveillance replies, ICAO acceptance gating."""

import numpy as np
import jax.numpy as jnp

from airjax.extended import assemble_extended
from airjax.io import synth
from airjax.pipeline import decode_iq_block_extended
from airjax.protocol import shortframe
from airjax.protocol.crc import crc24
from airjax.protocol.packet import AdsbPacket, AllCallReply, SurveillanceReply
from airjax.runner import run_stream
from airjax.track.icao_cache import IcaoCache

ICAO = 0x7C6B30
DF17 = synth.make_df17(ICAO, synth.make_id_me("EXTMODE"))
DF11 = shortframe.make_df11(ICAO, capability=5)
DF4 = shortframe.make_df4(ICAO, altitude_ft=12000)
DF5 = shortframe.make_df5(ICAO, squawk=7421)


def test_frame_builders_roundtrip():
    # DF11: PI equals CRC over first 4 bytes (interrogator 0).
    assert crc24(DF11[:4]) == int.from_bytes(DF11[4:], "big")
    # DF4/5: AP ^ CRC recovers the ICAO.
    assert crc24(DF4[:4]) ^ int.from_bytes(DF4[4:], "big") == ICAO
    assert crc24(DF5[:4]) ^ int.from_bytes(DF5[4:], "big") == ICAO


def test_short_field_extraction():
    bits = np.unpackbits(np.frombuffer(DF4 + DF5, np.uint8)).reshape(2, 56)
    f = shortframe.extract_short_fields(jnp.asarray(bits))
    assert int(f["df"][0]) == 4 and int(f["df"][1]) == 5
    assert bool(f["altitude_valid"][0])
    assert int(f["altitude_ft"][0]) == 12000
    assert int(f["squawk"][1]) == 7421
    assert int(f["icao_ap"][0]) == ICAO
    assert int(f["icao_ap"][1]) == ICAO

    bits11 = np.unpackbits(np.frombuffer(DF11, np.uint8))[None]
    f11 = shortframe.extract_short_fields(jnp.asarray(bits11))
    assert int(f11["df"][0]) == 11
    assert int(f11["icao_aa"][0]) == ICAO
    assert int(f11["icao_ap"][0]) == 0  # PI == CRC
    assert int(f11["capability"][0]) == 5


def _decode_ext(iq, cache=None):
    n_off = len(iq) - 240
    out = decode_iq_block_extended(jnp.asarray(iq), n_off, 64)
    import jax

    return assemble_extended(jax.device_get(out), 100.0, cache or IcaoCache())


def test_df11_decodes_without_prior_knowledge():
    iq = synth.modulate([DF11], [500], 4000, seed=0)
    pkts = [p for _, p in _decode_ext(iq)]
    assert any(isinstance(p, AllCallReply) and p.icao == ICAO for p in pkts)


def test_ap_frames_gated_on_known_icao():
    iq = synth.modulate([DF4], [500], 4000, seed=1)
    # Unknown ICAO: rejected.
    assert not _decode_ext(iq)
    # Known ICAO: accepted with decoded altitude.
    cache = IcaoCache()
    cache.add(ICAO, 100.0)
    pkts = [p for _, p in _decode_ext(iq, cache)]
    assert any(
        isinstance(p, SurveillanceReply) and p.altitude_ft == 12000 for p in pkts
    )


def test_mixed_stream_end_to_end():
    # DF11 validates first and unlocks the AP frames in the same stream.
    iq = synth.modulate(
        [DF11, DF17, DF4, DF5], [300, 1200, 2200, 3000], 6000, seed=2
    )
    got = []
    run_stream(iter([iq]), got.append, overlap=False, extended=True)
    kinds = [type(p).__name__ for p in got]
    assert "AllCallReply" in kinds
    assert "AdsbPacket" in kinds
    replies = [p for p in got if isinstance(p, SurveillanceReply)]
    assert {r.df for r in replies} == {4, 5}
    assert any(r.altitude_ft == 12000 for r in replies)
    assert any(r.squawk == 7421 for r in replies)
    # decode order follows offsets
    assert kinds[0] == "AllCallReply"


def test_extended_still_decodes_df17_identically():
    iq = synth.modulate([DF17], [700], 4000, seed=3)
    pkts = [p for _, p in _decode_ext(iq)]
    ours = [p for p in pkts if isinstance(p, AdsbPacket)]
    assert any(p.packet == DF17 for p in ours)


def test_short_fields_host_vs_device_fuzz():
    """assemble_ap_candidates now rides the device-extracted short_fields
    arrays when present (decode_iq_block_extended_with_fields); the scalar
    host decode (_short_fields_host) stays as the independent oracle. On
    ANY 7-byte frame the two must agree on every field the assembler
    consumes (fs, altitude incl. None-ness, squawk, vs, sl, ri)."""
    import jax

    from airjax.extended import _short_fields_host

    rng = np.random.default_rng(42)
    frames = rng.integers(0, 256, size=(4096, 7), dtype=np.uint8)
    # Bias some frames toward structured altitudes (Q=1 and Gillham) so
    # the valid paths are exercised, not just random garbage.
    for i in range(0, 1024, 2):
        alt = int(rng.integers(0, 500)) * 100
        f = shortframe.make_df4(
            int(rng.integers(0, 1 << 24)), alt, gillham=bool(i % 4 == 0)
        )
        frames[i] = np.frombuffer(f[:7], np.uint8)
    bits = np.unpackbits(frames, axis=1)
    dev = jax.device_get(shortframe.extract_short_fields(jnp.asarray(bits)))
    for i in range(len(frames)):
        host = _short_fields_host(frames[i].tobytes())
        dev_alt = int(dev["altitude_ft"][i]) if bool(dev["altitude_valid"][i]) else None
        assert dev_alt == host["altitude_ft"], (i, frames[i].tobytes().hex())
        for key in ("fs", "squawk", "vs", "sl", "ri"):
            assert int(dev[key][i]) == host[key], (key, i, frames[i].tobytes().hex())
