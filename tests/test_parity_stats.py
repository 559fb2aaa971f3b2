"""Fused parity stats must equal the literal per-chunk decode's stats.

Round 1 documented a divergence: the fused whole-stream scan reported a
whole-stream n_detections. Now an exact reference-chunked counting pass
makes the fused path's stats identical to fused=False on any input.
"""

import numpy as np
import pytest

from airjax.config import PipelineConfig
from airjax.io import synth
from airjax.pipeline import decode_capture_parity

CFG = PipelineConfig(block_len=4000, max_candidates=128)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_stats_match_per_chunk(seed):
    rng = np.random.default_rng(seed)
    kind = seed % 3
    if kind == 0:  # frames at random offsets incl. chunk straddles
        frame = synth.make_df17(0x7C6B30, synth.make_id_me("STAT"))
        n = 13000
        offs = [500, 3900, 4100, 7990, 11000]
        iq = synth.modulate([frame] * len(offs), offs, n, snr_db=12, seed=seed)
    elif kind == 1:  # pure noise
        iq = np.clip(
            np.round(rng.normal(0, 120, (9500, 2))), -32768, 32767
        ).astype(np.int16)
    else:  # truncation-tie storm (many detections)
        iq = rng.integers(-3, 4, size=(8123, 2)).astype(np.int16)

    hits_f, stats_f = decode_capture_parity(iq, CFG, fused=True)
    hits_l, stats_l = decode_capture_parity(iq, CFG, fused=False)
    assert hits_f == hits_l
    assert stats_f["n_detections"] == stats_l["n_detections"]
    assert stats_f["n_good"] == stats_l["n_good"]


def test_overlap_hits_invariant_under_block_size():
    """decode_capture_overlap must return the identical global hit stream
    for ANY block decomposition (incl. the shape-tuned large-block form
    with its off-power scan stride and the small-block halo form)."""
    from airjax.pipeline import decode_capture_overlap

    frame = synth.make_df17(0x7C6B30, synth.make_id_me("INVAR"))
    n = 21000
    # Offsets straddling several 4096-1264=2832 and 4096 boundaries.
    offs = [100, 2800, 4090, 5660, 8190, 16380, 20100]
    iq = synth.modulate([frame] * len(offs), offs, n, snr_db=14, seed=9)
    results = []
    for block in (4096, 8192, 2000, n):
        hits, _ = decode_capture_overlap(iq, PipelineConfig(block_len=block))
        results.append(sorted((g, f, r) for _, g, f, r in hits))
    assert results[0] == results[1] == results[2] == results[3]
    got = {g for g, f, _ in results[0] if f == frame}
    assert got >= set(offs)
