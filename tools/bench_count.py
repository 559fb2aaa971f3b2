"""Count-step variant timing (the compaction hotspot) on the real TPU.

Run: python tools/bench_count.py
"""

import json
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from airjax.dsp.demod import COMPACT_TILE, WINDOW, detect
from airjax.dsp.magnitude import magnitude_u32
from tools.bench_fused import BLOCK, CAPACITY, build_iq, make_step, timed

TILE = COMPACT_TILE


def detect_only(iq, n_off, capacity):
    det = detect(magnitude_u32(iq), n_off)
    s = jnp.sum(det, dtype=jnp.int32)
    return s, s


def count_pad(iq, n_off, capacity):
    det = detect(magnitude_u32(iq), n_off)
    n_tiles = -(-n_off // TILE)
    padded = jnp.pad(det, (0, n_tiles * TILE - n_off)).reshape(n_tiles, TILE)
    row_counts = jnp.sum(padded, axis=1, dtype=jnp.int32)
    row_cum = jnp.cumsum(row_counts)
    return row_cum[-1], row_cum[-1]


def count_nopad(iq, n_off, capacity):
    # n_off is a multiple of TILE here: reshape is free.
    det = detect(magnitude_u32(iq), n_off)
    rows = det.reshape(n_off // TILE, TILE)
    row_counts = jnp.sum(rows, axis=1, dtype=jnp.int32)
    row_cum = jnp.cumsum(row_counts)
    return row_cum[-1], row_cum[-1]


def count_nocumsum(iq, n_off, capacity):
    det = detect(magnitude_u32(iq), n_off)
    rows = det.reshape(n_off // TILE, TILE)
    row_counts = jnp.sum(rows, axis=1, dtype=jnp.int32)
    return jnp.sum(row_counts), jnp.int32(0)


def count_dot(iq, n_off, capacity):
    det = detect(magnitude_u32(iq), n_off)
    rows = det.reshape(n_off // TILE, TILE).astype(jnp.float32)
    row_counts = (rows @ jnp.ones((TILE,), jnp.float32)).astype(jnp.int32)
    row_cum = jnp.cumsum(row_counts)
    return row_cum[-1], row_cum[-1]


def main():
    # Multiple of TILE so the no-pad variants are well-defined.
    n_off = BLOCK - TILE
    iq = build_iq()
    print(f"device: {jax.devices()[0]}, n_off={n_off}", flush=True)
    for name, body in [
        ("detect_only", detect_only),
        ("count_pad", count_pad),
        ("count_nopad", count_nopad),
        ("count_nocumsum", count_nocumsum),
        ("count_dot", count_dot),
    ]:
        step = make_step(body, n_off, CAPACITY)
        int(step(iq, 2)[0])
        t_small, _ = timed(step, iq, 2)
        t_big, _ = timed(step, iq, 12)
        per_pass = (t_big - t_small) / 10
        print(json.dumps({"stage": name, "seconds_per_pass": round(per_pass, 6)}), flush=True)


if __name__ == "__main__":
    main()
