"""Real-chip smoke + within-run cost A/B for the 2-bit CRC recovery.

Verifies the pairwise-syndrome repair compiles and repairs on the TPU
(a 2-bit-corrupted frame comes back bit-exact), then measures the
per-pass cost of decode_iq_block_r2 vs decode_iq_block on a bench-sized
block (the (K, 3828) syndrome-table compare is the only addition).
Within-run comparison only — cross-run tunnel variance is 3x.

Usage: python tools/tpu_recover2_smoke.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))


def timed_passes(fn, iq_dev, n_off, cap, reps=6):
    import jax
    import jax.numpy as jnp

    fn(iq_dev, n_off, cap)["n_good"].block_until_ready()  # compile
    # Two-point slope timing (bench.py pattern: block_until_ready does
    # not reliably block on the tunnel — force a scalar fetch).
    def run(k):
        t0 = time.perf_counter()
        acc = 0
        for _ in range(k):
            acc += int(jax.device_get(fn(iq_dev, n_off, cap)["n_good"]))
        return time.perf_counter() - t0, acc

    t1, _ = run(2)
    t2, _ = run(2 + reps)
    return (t2 - t1) / reps


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from airjax.io import synth
    from airjax.pipeline import decode_iq_block, decode_iq_block_r2

    print("platform:", jax.devices()[0].platform, flush=True)

    # Correctness on chip: 2-flip repair lands on the original bytes.
    icao = 0x7C6B30
    frame = synth.make_df17(icao, synth.make_id_me("R2CHIP"))
    bad = bytearray(frame)
    bad[2] ^= 0x04
    bad[8] ^= 0x20
    iq = synth.modulate([frame, bytes(bad)], [500, 3000], 20000, seed=3)
    out = jax.device_get(decode_iq_block_r2(jnp.asarray(iq), 20000 - 240, 64))
    goods = {
        int(out["offsets"][k]): (
            out["frames"][k].tobytes(),
            bool(out["recovered2"][k]),
        )
        for k in np.nonzero(out["good"])[0]
    }
    assert goods[500] == (frame, False), goods
    assert goods[3000] == (frame, True), goods
    print("repair on chip: bit-exact", flush=True)

    # Cost A/B at bench shape (within-run).
    n = (1 << 24) + 1024
    n_off = (1 << 24) - 240
    rng = np.random.default_rng(0)
    big = np.clip(
        np.round(rng.normal(0, 60.0, (n, 2))), -32768, 32767
    ).astype(np.int16)
    iq_dev = jnp.asarray(big)
    t_std = timed_passes(decode_iq_block, iq_dev, n_off, 256)
    t_r2 = timed_passes(decode_iq_block_r2, iq_dev, n_off, 256)
    print(
        json.dumps(
            {
                "std_s_per_pass": round(t_std, 5),
                "r2_s_per_pass": round(t_r2, 5),
                "r2_over_std": round(t_r2 / t_std, 3),
                "samples": n_off,
            }
        ),
        flush=True,
    )
    print("tpu_recover2_smoke ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
