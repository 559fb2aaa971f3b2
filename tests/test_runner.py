"""Streaming runner semantics: continuous-stream overlap mode must decode
every frame exactly once — including frames straddling consecutive chunk
boundaries (BASELINE config 3) — while parity mode reproduces the
reference's losses."""

import numpy as np

from airjax.io import synth
from airjax.runner import run_stream


FRAME = synth.make_df17(0x7C6B30, synth.make_id_me("STREAM"))


def _chunks(iq, size):
    for i in range(0, len(iq) - size + 1, size):
        yield iq[i : i + size]


def test_overlap_stream_no_boundary_loss():
    # Frames at chunk starts, middles, and straddling every boundary.
    chunk = 4000
    n = 5 * chunk
    offsets = [100, chunk - 120, 2 * chunk - 200, 2 * chunk + 500, 4 * chunk - 10]
    iq = synth.modulate([FRAME] * len(offsets), offsets, n, seed=0)
    got = []
    stats = run_stream(_chunks(iq, chunk), got.append, overlap=True)
    decoded = [p for p in got if p.packet == FRAME]
    assert len(decoded) == len(offsets)
    assert stats.good == len(offsets)


def test_parity_stream_loses_boundary_frames():
    chunk = 4000
    n = 3 * chunk
    offsets = [chunk - 120, chunk + 500]  # first straddles, second doesn't
    iq = synth.modulate([FRAME] * 2, offsets, n, seed=1)
    got = []
    run_stream(_chunks(iq, chunk), got.append, overlap=False)
    decoded = [p for p in got if p.packet == FRAME]
    assert len(decoded) == 1  # straddler lost, reference behavior


def test_overlap_stream_equals_whole_capture_scan():
    from airjax.config import PipelineConfig
    from airjax.pipeline import decode_capture_overlap

    chunk = 4000
    n = 4 * chunk
    rng = np.random.default_rng(7)
    offsets = [300, 3900, 7200, 11800, 15000]
    iq = synth.modulate([FRAME] * len(offsets), offsets, n, snr_db=8.0, seed=7)

    got = []
    run_stream(_chunks(iq, chunk), got.append, overlap=True)
    stream_frames = sorted(p.packet for p in got)

    whole, _ = decode_capture_overlap(iq, PipelineConfig(block_len=n))
    whole_frames = sorted(h[2] for h in whole)
    assert stream_frames == whole_frames


def test_short_blocks_skipped():
    got = []
    stats = run_stream(iter([np.zeros((100, 2), np.int16)]), got.append)
    assert stats.blocks == 0 and not got
