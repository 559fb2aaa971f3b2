"""Within-run A/B of the shard-local kernel shapes for the halo path.

The sharded decoder (airjax/parallel/halo.py) historically scanned
n_off = block offsets over a (block + 239)-sample slice — with block a
power of two, exactly the shape PERF_r02 §2 measured 1.2-2x slower than
a 1024-aligned slice with an off-power offset count. This tool measures
the candidate shard-local shapes interleaved (ABAB) within ONE run on the
real chip, decoupled from the collective (the ppermute halo moves ~2.5 KB
and is not the cost; the per-shard decode_mags_block shape is).

Variants (per-shard block target 2^exp):
  halo239   — slice = B + 239,   n_off = B          (the old decomposition)
  tuned240  — slice = B' + 240 = B (1024-aligned), n_off = B' = B - 240
              (block' ≡ 784 mod 1024: off-power n_off, aligned slice —
              the decomposition halo.py adopts if this wins)
  anchor    — slice = B + 1024,  n_off = B - 240    (PERF_r02's measured-
              best shape, as the run's sanity normalizer)

Run: python tools/bench_shard_shapes.py [--exp 22] [--repeat 3]
"""

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from airjax.dsp.demod import WINDOW
from airjax.dsp.magnitude import magnitude_u16
from airjax.io import synth
from airjax.pipeline import decode_mags_block

CAPACITY = 2048


def build_iq(length: int, seed: int = 0) -> jnp.ndarray:
    """Synthetic traffic: one DF17 frame per ~16k samples, noise floor."""
    frame = synth.make_df17(0x7C6B30, synth.make_id_me("SHAPE00"))
    n_frames = max(length // 16384, 1)
    rng = np.random.default_rng(seed)
    # Keep frames clear of the tail so every variant's scan range sees them.
    hi = (length - WINDOW - 2048) // 300
    offsets = np.sort(rng.choice(np.arange(0, hi) * 300, size=n_frames, replace=False))
    return synth.modulate_device(
        [frame] * len(offsets), list(map(int, offsets)), length,
        noise_std=60.0, seed=seed,
    )


def make_step(n_off: int, capacity: int):
    @jax.jit
    def step(iq, reps):
        def one(r, acc):
            perturbed = iq + r.astype(jnp.int16)
            out = decode_mags_block(magnitude_u16(perturbed), n_off, capacity)
            return acc[0] + out["n_good"], acc[1] + out["n_detections"]

        return jax.lax.fori_loop(0, reps, one, (jnp.int32(0), jnp.int32(0)))

    return step


def timed(fn, *args, iters=3):
    best = float("inf")
    out = None
    for _ in range(iters):
        t0 = time.perf_counter()
        out = tuple(int(x) for x in fn(*args))  # scalar fetch = real sync
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", type=int, default=22, help="per-shard block = 2^exp")
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--r-small", type=int, default=2)
    ap.add_argument("--r-big", type=int, default=12)
    ap.add_argument("--variants", default="halo239,tuned240,anchor")
    args = ap.parse_args()

    B = 1 << args.exp
    shapes = {
        "halo239": (B + WINDOW - 1, B),
        "tuned240": (B, B - 240),
        "anchor": (B + 1024, B - 240),
    }
    names = args.variants.split(",")

    print(f"device: {jax.devices()[0]}, B=2^{args.exp}", flush=True)
    setups = {}
    for name in names:
        slice_len, n_off = shapes[name]
        iq = build_iq(slice_len)
        step = make_step(n_off, CAPACITY)
        t0 = time.perf_counter()
        g, d = (int(x) for x in step(iq, args.r_small))
        print(
            f"[{name}] slice={slice_len} n_off={n_off} compile+run "
            f"{time.perf_counter() - t0:.1f}s good={g // args.r_small} "
            f"det={d // args.r_small}",
            flush=True,
        )
        setups[name] = (step, iq, n_off)

    per_pass: dict[str, list] = {name: [] for name in names}
    for rep in range(args.repeat):
        for name in names:  # interleaved ABAB within the run
            step, iq, n_off = setups[name]
            t_small, _ = timed(step, iq, args.r_small)
            t_big, _ = timed(step, iq, args.r_big)
            per_pass[name].append((t_big - t_small) / (args.r_big - args.r_small))

    results = {}
    for name in names:
        med = statistics.median(per_pass[name])
        _, _, n_off = setups[name]
        results[name] = med
        print(
            json.dumps(
                {
                    "variant": name,
                    "seconds_per_pass": round(med, 6),
                    "msps": round(n_off / med / 1e6, 1),
                    "all_reps": [round(t, 6) for t in per_pass[name]],
                }
            ),
            flush=True,
        )
    if "halo239" in results and "tuned240" in results:
        print(
            f"tuned240 speedup vs halo239: "
            f"{results['halo239'] / results['tuned240']:.3f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
