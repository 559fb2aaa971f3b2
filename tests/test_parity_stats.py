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
