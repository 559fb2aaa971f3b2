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


def test_tuned_stream_path_no_loss():
    """Big blocks take the shape-tuned scan (1024-aligned slice, carry up
    to ~1.5k samples, final tail flush) — the hit stream must still be
    identical to the whole-capture scan, including straddlers and frames
    in the last carry."""
    from airjax.config import PipelineConfig
    from airjax.pipeline import decode_capture_overlap
    from airjax.runner import TUNED_STREAM_MIN, run_stream

    chunk = TUNED_STREAM_MIN  # 65536: every block uses the tuned shape
    n = 4 * chunk
    offsets = [
        100,
        chunk - 120,  # straddles the first block boundary
        chunk + 400,
        2 * chunk - 64,  # lands inside the tuned carry region
        3 * chunk - 200,
        n - 300,  # near stream end: decoded by the tail flush
    ]
    iq = synth.modulate([FRAME] * len(offsets), offsets, n, seed=3)

    got = []
    stats = run_stream(_chunks(iq, chunk), got.append, overlap=True)
    decoded = [p for p in got if p.packet == FRAME]
    assert len(decoded) == len(offsets)
    assert stats.good == len(offsets)

    whole, _ = decode_capture_overlap(iq, PipelineConfig(block_len=n))
    assert sorted(p.packet for p in got) == sorted(h[2] for h in whole)


def test_tuned_stream_mixed_block_sizes():
    """Alternating big (tuned) and small (classic) source blocks: the
    variable-length carry must hand off seamlessly between the two paths."""
    from airjax.runner import TUNED_STREAM_MIN, run_stream

    sizes = [TUNED_STREAM_MIN, 4000, TUNED_STREAM_MIN + 1000, 999, 70000]
    n = sum(sizes)
    bounds = np.cumsum([0] + sizes)
    # One frame straddling every source-block boundary, one mid-block.
    offsets = [int(b) - 120 for b in bounds[1:-1]] + [500, n - 400]
    iq = synth.modulate([FRAME] * len(offsets), sorted(offsets), n, seed=4)

    def blocks():
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            yield iq[lo:hi]

    got = []
    stats = run_stream(blocks(), got.append, overlap=True)
    decoded = [p for p in got if p.packet == FRAME]
    assert len(decoded) == len(offsets)
    assert stats.good == len(offsets)


def test_final_short_read_samples_are_scanned():
    """A trailing short read (< 240 samples, e.g. a live-SDR partial
    buffer at shutdown) accumulates in `pending` and must still be
    scanned at EOF: a frame ending inside those final samples decodes
    (review fix: the tail flush ignored pending, losing it)."""
    n = 8150  # chunks of 4000, 4000, then a 150-sample short read
    off = n - 250  # frame ends 26 samples before stream end
    iq = synth.modulate([FRAME], [off], n, seed=3)

    def chunks():
        yield iq[:4000]
        yield iq[4000:8000]
        yield iq[8000:]

    got = []
    run_stream(chunks(), got.append, overlap=True)
    assert [p.packet for p in got] == [FRAME]

    # Same samples as one block: identical result (decomposition
    # invariance holds through the EOF short read).
    got_whole = []
    run_stream(iter([iq]), got_whole.append, overlap=True)
    assert [p.packet for p in got_whole] == [FRAME]
