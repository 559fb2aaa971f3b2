"""Per-stage cost breakdown of the XLA decode pipeline on the real TPU.

Times nested prefixes of the pipeline (two-point slope, like bench.py):
  detect   — magnitude + preamble/DF17 stencil + count
  compact  — + candidate compaction
  pack     — + pack_cmp_words (the stream-sized bit pack)
  full     — + slicing + CRC + recovery

Run: python tools/bench_stages.py
"""

import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from airjax.dsp.demod import WINDOW, detect, pack_cmp_words, slice_bits_packed
from airjax.dsp.magnitude import magnitude_u32
from airjax.pipeline import compact_mask, decode_mags_block
from tools.bench_fused import BLOCK, CAPACITY, build_iq, make_step, timed


def detect_body(iq, n_off, capacity):
    det = detect(magnitude_u32(iq), n_off)
    s = jnp.sum(det, dtype=jnp.int32)
    return s, s


def compact_body(iq, n_off, capacity):
    det = detect(magnitude_u32(iq), n_off)
    offsets, n_det = compact_mask(det, capacity)
    return jnp.sum(offsets, dtype=jnp.int32), n_det


def pack_body(iq, n_off, capacity):
    mags = magnitude_u32(iq)
    det = detect(mags, n_off)
    offsets, n_det = compact_mask(det, capacity)
    words = pack_cmp_words(mags)
    return jnp.sum(words[:8].astype(jnp.int32)) + jnp.sum(offsets, dtype=jnp.int32), n_det


def full_body(iq, n_off, capacity):
    out = decode_mags_block(magnitude_u32(iq), n_off, capacity)
    return out["n_good"], out["n_detections"]


def main():
    n_off = BLOCK - WINDOW
    iq = build_iq()
    print(f"device: {jax.devices()[0]}", flush=True)
    for name, body in [
        ("detect", detect_body),
        ("compact", compact_body),
        ("pack", pack_body),
        ("full", full_body),
    ]:
        step = make_step(body, n_off, CAPACITY)
        int(step(iq, 2)[0])  # warm
        t_small, _ = timed(step, iq, 2)
        t_big, _ = timed(step, iq, 12)
        per_pass = (t_big - t_small) / 10
        print(
            json.dumps({"stage": name, "seconds_per_pass": round(per_pass, 6),
                        "msps": round(n_off / per_pass / 1e6, 1)}),
            flush=True,
        )


if __name__ == "__main__":
    main()
