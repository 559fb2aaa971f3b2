"""Within-run A/B of the attempt-3 Mosaic stencils vs the XLA-fused path
(mag + detect + pair-compare stage only — the part a kernel can replace).

Variants (all compiled up front, timed interleaved, two-point slope):
  xla    : magnitude_u16 -> detect() -> cmp, at the production-tuned shape
  old    : attempt-1 kernel (magdet_fused, flat 25-roll int32)
  tree32 : attempt-3 shift-sharing tree, int32
  tree16 : attempt-3 tree, biased int16 (sublane-packed min/max)
  flat16 : flat 25-roll formulation, biased int16 (isolates the packing win)

Run:  python tools/bench_stencil3.py [--r-big 24] [--variants xla,tree16,...]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from airjax.dsp.demod import detect
from airjax.dsp.magnitude import magnitude_u16
from airjax.io import synth
from airjax.kernels.magdet import EXTRA, TILE, magdet_fused
from airjax.kernels.stencil3 import magdet_tree

BLOCK = 1 << 24  # 256 kernel tiles


def build_iq(seed=0):
    frame = synth.make_df17(0x7C6B30, synth.make_id_me("STENC03"))
    n = BLOCK + EXTRA
    n_frames = 1024
    rng = np.random.default_rng(seed)
    offsets = np.sort(
        rng.choice(np.arange(0, (n - 300) // 300) * 300, size=n_frames, replace=False)
    )
    return synth.modulate_device(
        [frame] * len(offsets), list(map(int, offsets)), n, noise_std=60.0, seed=seed
    )


def xla_body(iq):
    # Production-tuned shape: n_off off the power of two (PERF_r02 §2).
    n_off = BLOCK - 1264
    mags = magnitude_u16(iq)
    det = detect(mags, n_off)
    cmp = mags[:-1] > mags[1:]
    return jnp.sum(det, dtype=jnp.int32) + jnp.sum(cmp[:n_off], dtype=jnp.int32)


def kernel_body(fn):
    def body(iq):
        det, cmp = fn(iq)
        return jnp.sum(det, dtype=jnp.int32) + jnp.sum(cmp, dtype=jnp.int32)

    return body


BODIES = {
    "xla": xla_body,
    "old": kernel_body(magdet_fused),
    "tree32": kernel_body(lambda iq: magdet_tree(iq, variant="tree32")),
    "tree16": kernel_body(lambda iq: magdet_tree(iq, variant="tree16")),
    "flat16": kernel_body(lambda iq: magdet_tree(iq, variant="flat16")),
}


def make_step(body):
    @jax.jit
    def step(iq, reps):
        def one(r, acc):
            perturbed = iq + r.astype(jnp.int16)
            return acc + body(perturbed)

        return jax.lax.fori_loop(0, reps, one, jnp.int32(0))

    return step


def timed(fn, iq, reps, iters):
    best = float("inf")
    out = None
    for _ in range(iters):
        t0 = time.perf_counter()
        out = int(fn(iq, reps))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--r-small", type=int, default=2)
    ap.add_argument("--r-big", type=int, default=24)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--variants", default="xla,old,tree32,tree16,flat16")
    args = ap.parse_args()

    names = args.variants.split(",")
    iq = build_iq()
    print(f"device: {jax.devices()[0]}, block={BLOCK}", flush=True)

    steps = {}
    for name in names:
        step = make_step(BODIES[name])
        t0 = time.perf_counter()
        try:
            s = int(step(iq, args.r_small))
        except Exception as e:  # compile failure: skip, keep measuring others
            msg = str(e).splitlines()
            detail = next((l for l in msg if "not implemented" in l), msg[0])
            print(f"[{name}] COMPILE FAILED: {detail.strip()}", flush=True)
            continue
        print(
            f"[{name}] compile+warm {time.perf_counter()-t0:.1f}s sum={s}",
            flush=True,
        )
        steps[name] = step
    names = [n for n in names if n in steps]

    # Interleaved timing: small then big for each variant, round-robin
    # per iteration so drift hits all variants equally.
    t_small = {n: float("inf") for n in names}
    t_big = {n: float("inf") for n in names}
    for _ in range(args.iters):
        for n in names:
            t, _ = timed(steps[n], iq, args.r_small, 1)
            t_small[n] = min(t_small[n], t)
        for n in names:
            t, _ = timed(steps[n], iq, args.r_big, 1)
            t_big[n] = min(t_big[n], t)

    results = {}
    for n in names:
        per_pass = (t_big[n] - t_small[n]) / (args.r_big - args.r_small)
        results[n] = {
            "seconds_per_pass": round(per_pass, 6),
            "msps": round(BLOCK / per_pass / 1e6, 1),
        }
        print(f"[{n}] {json.dumps(results[n])}", flush=True)

    if "xla" in results:
        base = results["xla"]["seconds_per_pass"]
        for n in names:
            if n != "xla":
                print(
                    f"{n} vs xla: {base / results[n]['seconds_per_pass']:.2f}x",
                    flush=True,
                )


if __name__ == "__main__":
    main()
