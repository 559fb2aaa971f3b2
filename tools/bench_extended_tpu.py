"""Within-run cost of the EXTENDED device pipeline on the real TPU.

Three variants, identical shapes, interleaved in one run (two-point
slope over a traced fori_loop, like bench.py / tools/bench_fused.py):

  df17        — decode_mags_block (the production parity pipeline)
  ext         — decode_mags_block_extended (preamble-only stencil, dual
                long/short CRC, AP classification)
  ext_fields  — + on-device long-frame field extraction AND short-frame
                field extraction (decode_iq_block_extended_with_fields'
                body: what the batched extended host sink runs)

Answers two questions: what the all-formats capability costs relative
to the DF17-only flagship number, and whether fusing the field
extraction into the decode program costs anything measurable (it works
on (capacity,)-shaped candidates, so it should be noise).

Run: python tools/bench_extended_tpu.py [--r-big 12]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from airjax.dsp.demod import WINDOW
from airjax.dsp.magnitude import magnitude_u16
from airjax.pipeline import decode_mags_block, decode_mags_block_extended
from tools.bench_fused import build_iq, make_step, timed

BLOCK = 1 << 24
CAPACITY = 4096  # preamble-only detection fires more often than the
# DF17-gated stencil on noise; headroom avoids overflow skew


def df17_body(iq, n_off, capacity):
    out = decode_mags_block(magnitude_u16(iq), n_off, capacity)
    return out["n_good"], out["n_detections"]


def ext_body(iq, n_off, capacity):
    out = decode_mags_block_extended(magnitude_u16(iq), n_off, capacity)
    return (
        jnp.sum(out["good_long"], dtype=jnp.int32),
        out["n_detections"],
    )


def ext_fields_body(iq, n_off, capacity):
    from airjax.protocol.fields import extract_fields
    from airjax.protocol.shortframe import extract_short_fields

    out = decode_mags_block_extended(magnitude_u16(iq), n_off, capacity)
    fields = extract_fields(out["frames"])
    raw7 = out["frames_raw"][..., :7].astype(jnp.int32)
    bits56 = (
        (raw7[..., None] >> jnp.arange(7, -1, -1, dtype=jnp.int32)) & 1
    ).reshape(*raw7.shape[:-1], 56)
    sf = extract_short_fields(bits56)
    acc = (
        jnp.sum(out["good_long"], dtype=jnp.int32)
        + (jnp.sum(fields["icao"], dtype=jnp.int32) % 7)
        + (jnp.sum(sf["icao_ap"], dtype=jnp.int32) % 7)
    )
    return acc, out["n_detections"]


def main():
    global CAPACITY
    ap = argparse.ArgumentParser()
    ap.add_argument("--r-small", type=int, default=2)
    ap.add_argument("--r-big", type=int, default=12)
    ap.add_argument(
        "--capacity", type=int, default=CAPACITY,
        help="candidate capacity; 16384 covers every preamble-only "
        "detection at the default harness noise (equal-coverage A/B)",
    )
    args = ap.parse_args()
    CAPACITY = args.capacity

    n_off = BLOCK - WINDOW
    iq = build_iq()
    print(
        f"device: {jax.devices()[0]}, block={BLOCK}, n_off={n_off}, "
        f"capacity={CAPACITY}",
        flush=True,
    )

    variants = [
        ("df17", df17_body),
        ("ext", ext_body),
        ("ext_fields", ext_fields_body),
    ]
    steps = {}
    for name, body in variants:
        steps[name] = make_step(body, n_off, CAPACITY)
        t0 = time.time()
        out = tuple(int(x) for x in steps[name](iq, 1))
        print(f"compiled {name} in {time.time()-t0:.1f}s out={out}", flush=True)

    results = {}
    for name, _ in variants:  # interleaved within ONE run
        t_small, _ = timed(steps[name], iq, args.r_small)
        t_big, out = timed(steps[name], iq, args.r_big)
        per_pass = (t_big - t_small) / (args.r_big - args.r_small)
        results[name] = {
            "s_per_pass": round(per_pass, 6),
            "msps": round(BLOCK / per_pass / 1e6, 1),
            "out": out,
        }
        print(json.dumps({name: results[name]}), flush=True)

    base = results["df17"]["s_per_pass"]
    for name in ("ext", "ext_fields"):
        results[name]["vs_df17"] = round(base / results[name]["s_per_pass"], 3)
    results["fields_overhead_s"] = round(
        results["ext_fields"]["s_per_pass"] - results["ext"]["s_per_pass"], 6
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
