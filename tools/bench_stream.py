"""Sustained streaming throughput through run_stream on the real TPU:
serial (pipeline_depth=0) vs pipelined dispatch (depth 1 and 2).

Unlike bench.py (pure device pipeline, fixed overhead subtracted), this
measures the PRODUCTION streaming path end-to-end: host prefetch, carry
stitching, device decode, result fetch, packet assembly — i.e. what a
deployment actually sustains, including the ~25 ms tunnel RTT per fetch.

Run: python tools/bench_stream.py [--blocks 12] [--block-len 16777216]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from airjax.io import synth
from airjax.runner import run_stream

ICAO = 0x7C6B30


def make_blocks(block_len: int, n_blocks: int, seed: int = 0):
    """n_blocks distinct IQ blocks with embedded frames, device-built."""
    frame = synth.make_df17(ICAO, synth.make_id_me("STREAM"))
    blocks = []
    rng = np.random.default_rng(seed)
    for b in range(n_blocks):
        n_frames = max(1, block_len // (1 << 20))
        offsets = np.sort(
            rng.choice(
                np.arange(1, (block_len - 300) // 300) * 300,
                size=n_frames, replace=False,
            )
        )
        blocks.append(
            np.asarray(
                synth.modulate_device(
                    [frame] * n_frames, list(map(int, offsets)), block_len,
                    noise_std=60.0, seed=seed * 1000 + b,
                )
            )
        )
    return blocks


def run_once(blocks, depth: int) -> dict:
    t0 = time.perf_counter()
    stats = run_stream(iter(blocks), lambda p: None, pipeline_depth=depth)
    dt = time.perf_counter() - t0
    return {
        "pipeline_depth": depth,
        "seconds": round(dt, 3),
        "msps": round(stats.samples / dt / 1e6, 1),
        "good": stats.good,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=12)
    ap.add_argument("--block-len", type=int, default=1 << 24)
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}", flush=True)
    blocks = make_blocks(args.block_len, args.blocks)
    # Warm the single compilation (first run pays it; discard).
    run_once(blocks[:2], 0)
    for depth in (0, 1, 2):
        print(json.dumps(run_once(blocks, depth)), flush=True)


if __name__ == "__main__":
    main()
