"""Compare the XLA pipeline vs the fully-fused Pallas kernel path on the
real TPU (same two-point-slope methodology as bench.py).

Run:  python tools/bench_fused.py [--reps-big 12]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from airjax.dsp.demod import WINDOW, slice_bits_sparse_bytes
from airjax.dsp.magnitude import magnitude_u32
from airjax.io import synth
from airjax.kernels.magdet import EXTRA, TILE, magdet_packed
from airjax.pipeline import compact_mask, decode_mags_block
from airjax.protocol.crc import bits_to_bytes, crc_check_and_recover

BLOCK = 1 << 24  # 256 kernel tiles
CAPACITY = 2048


def build_iq(seed=0):
    frame = synth.make_df17(0x7C6B30, synth.make_id_me("BENCH00"))
    n = BLOCK + EXTRA
    n_frames = n // 16384
    rng = np.random.default_rng(seed)
    offsets = np.sort(
        rng.choice(np.arange(0, (n - WINDOW) // 300) * 300, size=n_frames, replace=False)
    )
    return synth.modulate_device(
        [frame] * len(offsets), list(map(int, offsets)), n, noise_std=60.0, seed=seed
    )


def fused_body(iq, n_off, capacity):
    det, pbytes = magdet_packed(iq)
    offsets, n_det = compact_mask(det[:n_off] != 0, capacity)
    valid = offsets < n_off
    bits = slice_bits_sparse_bytes(pbytes, jnp.where(valid, offsets, 0))
    bits, crc_ok, recovered = crc_check_and_recover(bits)
    good = crc_ok & valid
    return jnp.sum(good, dtype=jnp.int32), n_det


def make_step(body, n_off, capacity):
    @jax.jit
    def step(iq, reps):
        def one(r, acc):
            perturbed = iq + r.astype(jnp.int16)
            g, d = body(perturbed, n_off, capacity)
            return acc[0] + g, acc[1] + d

        return jax.lax.fori_loop(0, reps, one, (jnp.int32(0), jnp.int32(0)))

    return step


def xla_body(iq, n_off, capacity):
    out = decode_mags_block(magnitude_u32(iq), n_off, capacity)
    return out["n_good"], out["n_detections"]


def timed(fn, *args, iters=3):
    best = float("inf")
    out = None
    for _ in range(iters):
        t0 = time.perf_counter()
        out = tuple(int(x) for x in fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--r-small", type=int, default=2)
    ap.add_argument("--r-big", type=int, default=12)
    ap.add_argument("--paths", default="xla,fused")
    args = ap.parse_args()

    n_off = BLOCK - WINDOW
    iq = build_iq()
    print(f"device: {jax.devices()[0]}, block={BLOCK}, n_off={n_off}", flush=True)

    results = {}
    for name in args.paths.split(","):
        body = {"xla": xla_body, "fused": fused_body}[name]
        step = make_step(body, n_off, CAPACITY)
        t0 = time.perf_counter()
        g, d = (int(x) for x in step(iq, args.r_small))
        print(f"[{name}] warm compile+run: {time.perf_counter()-t0:.1f}s "
              f"good={g//args.r_small} det={d//args.r_small}", flush=True)
        t_small, _ = timed(step, iq, args.r_small)
        t_big, (gs, ds) = timed(step, iq, args.r_big)
        per_pass = (t_big - t_small) / (args.r_big - args.r_small)
        msps = n_off / per_pass / 1e6
        results[name] = {
            "seconds_per_pass": round(per_pass, 6),
            "msps": round(msps, 1),
            "good_per_pass": gs // args.r_big,
            "det_per_pass": ds // args.r_big,
        }
        print(f"[{name}] {json.dumps(results[name])}", flush=True)

    if len(results) == 2:
        speedup = results["xla"]["seconds_per_pass"] / results["fused"]["seconds_per_pass"]
        print(f"fused speedup vs xla: {speedup:.2f}x", flush=True)


if __name__ == "__main__":
    main()
