"""Pack-stage variant timing on the real TPU: u32 cmp vs u8 cmp.

Run: python tools/bench_pack.py
"""

import json
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from airjax.dsp.demod import WINDOW, pack_cmp_words
from airjax.dsp.magnitude import magnitude_u32
from tools.bench_fused import BLOCK, CAPACITY, build_iq, make_step, timed


def pack_u32_body(iq, n_off, capacity):
    words = pack_cmp_words(magnitude_u32(iq))
    return jnp.sum(words[:8].astype(jnp.int32)), jnp.int32(0)


def pack_u8_body(iq, n_off, capacity):
    mags = magnitude_u32(iq)
    cmp = (mags[:-1] > mags[1:]).astype(jnp.uint8)
    n = cmp.shape[0]
    n_words = -(-n // 32)
    padded = jnp.pad(cmp, (0, n_words * 32 - n)).reshape(n_words, 32)
    weights = jnp.uint32(1) << jnp.arange(31, -1, -1, dtype=jnp.uint32)
    words = jnp.sum(padded.astype(jnp.uint32) * weights, axis=1, dtype=jnp.uint32)
    return jnp.sum(words[:8].astype(jnp.int32)), jnp.int32(0)


def pack_u8_bytes_body(iq, n_off, capacity):
    # Pack 8 bits/byte instead of 32/word (smaller per-element weights,
    # reduction over minor dim 8).
    mags = magnitude_u32(iq)
    cmp = (mags[:-1] > mags[1:]).astype(jnp.uint8)
    n = cmp.shape[0]
    n_bytes = -(-n // 8)
    padded = jnp.pad(cmp, (0, n_bytes * 8 - n)).reshape(n_bytes, 8)
    weights = jnp.uint8(1) << jnp.arange(7, -1, -1, dtype=jnp.uint8)
    by = jnp.sum(padded * weights, axis=1, dtype=jnp.int32).astype(jnp.uint8)
    return jnp.sum(by[:8].astype(jnp.int32)), jnp.int32(0)


def main():
    n_off = BLOCK - WINDOW
    iq = build_iq()
    print(f"device: {jax.devices()[0]}", flush=True)
    for name, body in [
        ("pack_u32", pack_u32_body),
        ("pack_u8", pack_u8_body),
        ("pack_u8_bytes", pack_u8_bytes_body),
    ]:
        step = make_step(body, n_off, CAPACITY)
        int(step(iq, 2)[0])
        t_small, _ = timed(step, iq, 2)
        t_big, _ = timed(step, iq, 12)
        per_pass = (t_big - t_small) / 10
        print(json.dumps({"stage": name, "seconds_per_pass": round(per_pass, 6)}), flush=True)


if __name__ == "__main__":
    main()
