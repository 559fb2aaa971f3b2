"""Full-pipeline variant matrix, measured WITHIN ONE RUN on the real TPU
(cross-run tunnel variance here is ~1.5x, so only within-run comparisons
are trustworthy; detect_only is included as the run's normalizer).

Variants:
  base        — production decode_mags_block
  pack_u8     — cmp bits materialized u8 instead of u32 before packing
  local_cmp   — per-row searchsorted replaced by sum-compare
  count2      — row counts via two-step (n*4,128)->(n,4) reduction
  all         — all three

Run: python tools/bench_variants.py
"""

import json
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from airjax.dsp.demod import (
    COMPACT_TILE,
    WINDOW,
    detect,
    pack_cmp_words,
    slice_bits,
    slice_bits_packed,
)
from airjax.dsp.magnitude import magnitude_u32
from airjax.pipeline import decode_mags_block
from airjax.protocol.crc import bits_to_bytes, crc_check_and_recover
from tools.bench_fused import BLOCK, CAPACITY, build_iq, make_step, timed

TILE = COMPACT_TILE


def pack_cmp_words_u8(mags):
    cmp = (mags[:-1] > mags[1:]).astype(jnp.uint8)
    n = cmp.shape[0]
    n_words = -(-n // 32)
    padded = jnp.pad(cmp, (0, n_words * 32 - n)).reshape(n_words, 32)
    weights = jnp.uint32(1) << jnp.arange(31, -1, -1, dtype=jnp.uint32)
    words = jnp.sum(padded.astype(jnp.uint32) * weights, axis=1, dtype=jnp.uint32)
    return jnp.pad(words, (0, 8))


def compact_variant(det, capacity, local_cmp=False, count2=False, local16=False):
    n_off = det.shape[-1]
    n_tiles = -(-n_off // TILE)
    padded = jnp.pad(det, (0, n_tiles * TILE - n_off)).reshape(n_tiles, TILE)
    if count2:
        quarter = padded.reshape(n_tiles * (TILE // 128), 128)
        qsum = jnp.sum(quarter, axis=1, dtype=jnp.int32)
        row_counts = jnp.sum(qsum.reshape(n_tiles, TILE // 128), axis=1)
    else:
        row_counts = jnp.sum(padded, axis=1, dtype=jnp.int32)
    row_cum = jnp.cumsum(row_counts)
    row_start = row_cum - row_counts
    ranks = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    row_idx = jnp.searchsorted(row_cum, ranks, side="left").astype(jnp.int32)
    safe_row = jnp.minimum(row_idx, n_tiles - 1)
    rows = padded[safe_row]
    cum_dtype = jnp.int16 if local16 else jnp.int32
    local_cum = jnp.cumsum(rows.astype(cum_dtype), axis=1)
    local_rank = ranks - row_start[safe_row]
    if local16:
        local_rank = local_rank.astype(jnp.int16)
    if local_cmp:
        local_idx = jnp.sum(local_cum < local_rank[:, None], axis=1, dtype=jnp.int32)
    else:
        local_idx = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="left"))(
            local_cum, local_rank
        ).astype(jnp.int32)
    offsets = safe_row * TILE + local_idx
    total = row_cum[-1]
    offsets = jnp.where(ranks <= total, offsets, n_off)
    return offsets, total


def make_variant_body(pack_u8=False, local_cmp=False, count2=False, local16=False,
                      direct_slice=False):
    def body(iq, n_off, capacity):
        mags = magnitude_u32(iq)
        det = detect(mags, n_off)
        offsets, n_det = compact_variant(
            det, capacity, local_cmp=local_cmp, count2=count2, local16=local16
        )
        valid = offsets < n_off
        safe = jnp.where(valid, offsets, 0)
        if direct_slice:
            bits = slice_bits(mags, safe)
        else:
            words = pack_cmp_words_u8(mags) if pack_u8 else pack_cmp_words(mags)
            bits = slice_bits_packed(words, safe)
        bits, crc_ok, recovered = crc_check_and_recover(bits)
        good = crc_ok & valid
        return jnp.sum(good, dtype=jnp.int32), n_det

    return body


def base_body(iq, n_off, capacity):
    out = decode_mags_block(magnitude_u32(iq), n_off, capacity)
    return out["n_good"], out["n_detections"]


def detect_only(iq, n_off, capacity):
    det = detect(magnitude_u32(iq), n_off)
    s = jnp.sum(det, dtype=jnp.int32)
    return s, s


def main():
    n_off = BLOCK - WINDOW
    iq = build_iq()
    print(f"device: {jax.devices()[0]}", flush=True)
    variants = [
        ("detect_only", detect_only),
        ("base", base_body),  # production (now with sum-compare local)
        ("direct", make_variant_body(local_cmp=True, direct_slice=True)),
        ("direct_c2", make_variant_body(local_cmp=True, count2=True, direct_slice=True)),
    ]
    results = {}
    for name, body in variants:
        step = make_step(body, n_off, CAPACITY)
        g = int(step(iq, 2)[0])
        t_small, _ = timed(step, iq, 2)
        t_big, out = timed(step, iq, 12)
        per_pass = (t_big - t_small) / 10
        results[name] = per_pass
        print(
            json.dumps(
                {"variant": name, "seconds_per_pass": round(per_pass, 6),
                 "msps": round(n_off / per_pass / 1e6, 1), "good": out[0] // 12}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
