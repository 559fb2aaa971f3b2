"""Capacity-overflow fallback: detection storms (e.g. constant-magnitude
streams, where EVERY offset passes the equality-tolerant preamble check
and an all-zero frame has CRC 0) must still yield every hit, exactly like
the reference's unbounded scan."""

import numpy as np

from airjax import golden
from airjax.config import PipelineConfig
from airjax.pipeline import decode_capture_parity, decode_iq_block_adaptive
from airjax.runner import run_stream


def test_constant_stream_overflows_then_matches_golden():
    # Constant-amplitude IQ: every offset detects; every frame is all-zero
    # bytes with CRC 0 -> a hit at EVERY offset. Capacity 64 must overflow
    # and adaptively grow to cover all n_off hits.
    n = 2000
    iq = np.full((n, 2), 7, dtype=np.int16)
    cfg = PipelineConfig(block_len=n - 1, max_candidates=64)
    hits, stats = decode_capture_parity(iq, cfg)
    gold = golden.decode_capture_playback(iq, chunk=cfg.block_len)
    assert [(c, o, f) for c, o, f, _ in hits] == gold
    assert len(hits) == (n - 1) - 240  # every scanned offset hit


def test_adaptive_block_reports_all():
    n_off = 1000
    iq = np.zeros((n_off + 240, 2), dtype=np.int16)
    out = decode_iq_block_adaptive(iq, n_off, 16)
    assert not bool(out["overflow"])
    assert int(out["n_good"]) == n_off


def test_stream_overflow_recovery():
    n = 1500
    blocks = [np.full((n, 2), 3, dtype=np.int16)]
    got = []
    stats = run_stream(iter(blocks), got.append, overlap=False,
                       cfg=PipelineConfig(max_candidates=32))
    assert stats.good == n - 240
    assert len(got) == n - 240
