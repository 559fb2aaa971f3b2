"""End-to-end pipeline tests on synthetic IQ (SURVEY.md §4a/§4d):
modulated known frames -> decode -> bit-exact frame bytes, including
boundary-straddle behavior (parity mode drops them like the reference's
non-overlapping playback chunks; overlap mode must not)."""

import numpy as np
import pytest

from airjax.io import synth
from airjax.pipeline import (
    decode_capture_overlap,
    decode_capture_parity,
    reference_chunk_count,
)
from airjax.protocol.packet import AdsbPacket, AircraftId, AircraftPositionMsg


ID_FRAME = synth.make_df17(0x7C6B30, synth.make_id_me("JST250"))
POS_FRAME = synth.make_df17(
    0x7C6B30, synth.make_position_me(tc=11, altitude_ft=2600, cpr_lat=15489, cpr_lon=111562, odd=False)
)


def test_reference_chunk_count():
    # while i < len-20000 semantics (src/adsb.rs:77)
    assert reference_chunk_count(20000) == 0
    assert reference_chunk_count(20001) == 1
    assert reference_chunk_count(40000) == 1
    assert reference_chunk_count(40001) == 2
    assert reference_chunk_count(60000) == 2


def test_single_frame_decodes():
    iq = synth.modulate([ID_FRAME], [5000], 40001, seed=1)
    hits, stats = decode_capture_parity(iq)
    frames = {h[2] for h in hits}
    assert ID_FRAME in frames
    offsets = [h[1] for h in hits if h[2] == ID_FRAME]
    assert 5000 in offsets
    assert stats["n_good"] >= 1


def test_multiple_frames_in_order():
    frames = [ID_FRAME, POS_FRAME, ID_FRAME]
    offs = [1000, 9000, 15000]
    iq = synth.modulate(frames, offs, 40001, seed=2)
    hits, _ = decode_capture_parity(iq)
    got = [(h[1], h[2]) for h in hits if h[1] in offs]
    assert got == list(zip(offs, frames))
    # scan order: ascending offsets within a chunk
    hit_offsets = [h[1] for h in hits if h[0] == 0]
    assert hit_offsets == sorted(hit_offsets)


def test_corrupted_bit_recovered():
    bad = synth.flip_bit(ID_FRAME, 40)
    # modulate the corrupted frame noiselessly so exactly that bit is wrong
    iq = synth.modulate([bad], [3000], 40001, noise_std=30.0, seed=3)
    hits, stats = decode_capture_parity(iq)
    ours = [h for h in hits if h[1] == 3000]
    assert ours, "corrupted frame not detected at its offset"
    assert ours[0][2] == ID_FRAME  # recovered to the true frame
    assert ours[0][3] is True  # marked as recovered
    assert stats["n_recovered"] >= 1


def test_boundary_frame_parity_vs_overlap():
    # Frame straddling the 20000-sample chunk edge: the reference (and our
    # parity mode) lose it; overlap mode must decode it.
    iq = synth.modulate([ID_FRAME, POS_FRAME], [19900, 30000], 60000, seed=4)
    parity_hits, _ = decode_capture_parity(iq)
    assert all(h[2] != ID_FRAME for h in parity_hits)
    assert any(h[1] == 30000 - 20000 and h[0] == 1 for h in parity_hits)

    overlap_hits, _ = decode_capture_overlap(iq)
    assert any(h[1] == 19900 and h[2] == ID_FRAME for h in overlap_hits)
    assert any(h[1] == 30000 and h[2] == POS_FRAME for h in overlap_hits)


def test_overlap_mode_no_duplicates_across_blocks():
    # A frame fully inside one block must appear exactly once even though
    # blocks share halo samples.
    iq = synth.modulate([ID_FRAME], [19000], 60000, seed=5)
    hits, _ = decode_capture_overlap(iq)
    assert [h[1] for h in hits if h[2] == ID_FRAME] == [19000]


def test_decoded_packets_make_sense():
    iq = synth.modulate([ID_FRAME, POS_FRAME], [2000, 8000], 40001, seed=6)
    hits, _ = decode_capture_parity(iq)
    packets = [AdsbPacket.from_bytes(h[2]) for h in hits]
    ids = [p for p in packets if isinstance(p.msg, AircraftId)]
    poss = [p for p in packets if isinstance(p.msg, AircraftPositionMsg)]
    assert any(p.msg.callsign == "JST250__" for p in ids)
    assert any(p.msg.altitude == 2600 and p.msg.cpr_latitude == 15489 for p in poss)
    assert all(p.downlink_format == 17 for p in packets)


def test_sensitivity_reasonable_at_high_snr():
    # 64 frames at 20 dB should essentially all decode (BASELINE config 2).
    rng = np.random.default_rng(7)
    offs = sorted(rng.choice(np.arange(300, 19500), size=16, replace=False).tolist())
    offs = [o for i, o in enumerate(offs) if i == 0 or o - offs[i - 1] > 300]
    iq = synth.modulate([ID_FRAME] * len(offs), offs, 40001, snr_db=20.0, seed=8)
    hits, _ = decode_capture_parity(iq)
    decoded_offsets = {h[1] for h in hits if h[2] == ID_FRAME}
    assert len(decoded_offsets & set(offs)) >= len(offs) - 1
