"""Sub-stage cost breakdown of candidate compaction on the real TPU.

Run: python tools/bench_compact.py
"""

import json
import sys

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from airjax.dsp.demod import COMPACT_TILE, WINDOW, detect
from airjax.dsp.magnitude import magnitude_u32
from tools.bench_fused import BLOCK, CAPACITY, build_iq, make_step, timed


def _prep(iq, n_off):
    det = detect(magnitude_u32(iq), n_off)
    tile = COMPACT_TILE
    n_tiles = -(-n_off // tile)
    padded = jnp.pad(det, (0, n_tiles * tile - n_off)).reshape(n_tiles, tile)
    row_counts = jnp.sum(padded, axis=1, dtype=jnp.int32)
    row_cum = jnp.cumsum(row_counts)
    return padded, row_cum, row_counts


def count_body(iq, n_off, capacity):
    padded, row_cum, _ = _prep(iq, n_off)
    return row_cum[-1], row_cum[-1]


def tier1_body(iq, n_off, capacity):
    padded, row_cum, _ = _prep(iq, n_off)
    ranks = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    row_idx = jnp.searchsorted(row_cum, ranks, side="left").astype(jnp.int32)
    return jnp.sum(row_idx), row_cum[-1]


def gather_body(iq, n_off, capacity):
    padded, row_cum, _ = _prep(iq, n_off)
    ranks = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    row_idx = jnp.searchsorted(row_cum, ranks, side="left").astype(jnp.int32)
    safe_row = jnp.minimum(row_idx, padded.shape[0] - 1)
    rows = padded[safe_row]
    return jnp.sum(rows, dtype=jnp.int32), row_cum[-1]


def local_body(iq, n_off, capacity):
    padded, row_cum, row_counts = _prep(iq, n_off)
    ranks = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    row_idx = jnp.searchsorted(row_cum, ranks, side="left").astype(jnp.int32)
    safe_row = jnp.minimum(row_idx, padded.shape[0] - 1)
    rows = padded[safe_row]
    local_cum = jnp.cumsum(rows.astype(jnp.int32), axis=1)
    row_start = row_cum - row_counts
    local_rank = ranks - row_start[safe_row]
    # sum-compare instead of vmapped searchsorted
    local_idx = jnp.sum(local_cum < local_rank[:, None], axis=1, dtype=jnp.int32)
    return jnp.sum(safe_row * COMPACT_TILE + local_idx), row_cum[-1]


def local_ss_body(iq, n_off, capacity):
    padded, row_cum, row_counts = _prep(iq, n_off)
    ranks = jnp.arange(1, capacity + 1, dtype=jnp.int32)
    row_idx = jnp.searchsorted(row_cum, ranks, side="left").astype(jnp.int32)
    safe_row = jnp.minimum(row_idx, padded.shape[0] - 1)
    rows = padded[safe_row]
    local_cum = jnp.cumsum(rows.astype(jnp.int32), axis=1)
    row_start = row_cum - row_counts
    local_rank = ranks - row_start[safe_row]
    local_idx = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="left"))(
        local_cum, local_rank
    ).astype(jnp.int32)
    return jnp.sum(safe_row * COMPACT_TILE + local_idx), row_cum[-1]


def main():
    n_off = BLOCK - WINDOW
    iq = build_iq()
    print(f"device: {jax.devices()[0]}", flush=True)
    for name, body in [
        ("count", count_body),
        ("tier1_search", tier1_body),
        ("row_gather", gather_body),
        ("local_sumcmp", local_body),
        ("local_vmapss", local_ss_body),
    ]:
        step = make_step(body, n_off, CAPACITY)
        int(step(iq, 2)[0])
        t_small, _ = timed(step, iq, 2)
        t_big, _ = timed(step, iq, 12)
        per_pass = (t_big - t_small) / 10
        print(json.dumps({"stage": name, "seconds_per_pass": round(per_pass, 6)}), flush=True)


if __name__ == "__main__":
    main()
