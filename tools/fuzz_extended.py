"""Three-way extended-mode parity fuzzer: device == golden == native.

Brings the extended path (DF0/4/5/11 incl. interrogated all-calls, 16,
17, 18, 20, 21 — with 1-bit CRC-recovery interplay and ICAO-AP overlay
addressing) to the same randomized differential discipline as the DF17
parity fuzzer (tools/fuzz_parity.py): random mixed-format captures at
random SNRs, corrupted frames, chunk-edge offsets, tie storms and
constant-magnitude storms; every iteration must produce the identical
(offset, kind, frame_bytes, icao_ap) stream from

  * the jitted device pipeline (airjax.pipeline.decode_iq_block_extended),
  * the golden scalar oracle   (airjax.golden.decode_chunk_extended), and
  * the native C++ decoder     (airjax.native.decode_chunk_extended).

Any mismatch is a bit-exactness bug. Exit 0 = all iterations agree.

Usage: python tools/fuzz_extended.py [--iters 320] [--seed 0] [--chunk 4000]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

from airjax import golden  # noqa: E402
from airjax.io import synth  # noqa: E402
from airjax.protocol import shortframe  # noqa: E402


def random_frame(rng: np.random.Generator) -> bytes:
    icao = int(rng.integers(0, 1 << 24))
    kind = int(rng.integers(0, 10))
    if kind == 0:
        return synth.make_df17(icao, synth.make_id_me("X" + str(rng.integers(10, 99))))
    if kind == 1:
        return synth.make_df17(
            icao,
            synth.make_position_me(
                tc=int(rng.integers(9, 19)),
                altitude_ft=int(rng.integers(0, 2000)) * 25 - 1000,
                cpr_lat=int(rng.integers(0, 1 << 17)),
                cpr_lon=int(rng.integers(0, 1 << 17)),
                odd=bool(rng.integers(0, 2)),
            ),
        )
    if kind == 2:
        return synth.make_df18(icao, synth.make_id_me("TISB"), cf=int(rng.integers(0, 2)))
    if kind == 3:  # all-call; 1/2 interrogated (PI ^= nonzero IC)
        return shortframe.make_df11(
            icao, interrogator=int(rng.integers(0, 16)) if rng.random() < 0.5 else 0
        )
    alt = int(rng.integers(0, 2000)) * 25 - 1000
    squawk = int("".join(str(rng.integers(0, 8)) for _ in range(4)))
    gillham = bool(rng.random() < 0.3) and 0 <= alt <= 50000 and alt % 100 == 0
    if kind == 4:
        return shortframe.make_df0(icao, alt, vs=int(rng.integers(0, 2)), gillham=gillham)
    if kind == 5:
        return shortframe.make_df16(icao, alt, gillham=gillham)
    if kind == 6:
        return shortframe.make_df4(icao, alt, fs=int(rng.integers(0, 6)), gillham=gillham)
    if kind == 7:
        return shortframe.make_df5(icao, squawk)
    if kind == 9:  # DF24 Comm-D ELM segment
        return shortframe.make_df24(
            icao, nd=int(rng.integers(0, 16)),
            md=bytes(rng.integers(0, 256, 10, dtype=np.uint8)),
            ke=int(rng.integers(0, 2)),
        )
    if rng.random() < 0.5:
        return shortframe.make_df20(icao, alt, gillham=gillham)
    return shortframe.make_df21(icao, squawk)


def random_capture(rng: np.random.Generator, chunk: int) -> np.ndarray:
    kind = rng.integers(0, 6)
    # Fixed length palette: every distinct length is a fresh XLA compile
    # of the device pipeline, so keep the set small and reused.
    n = int(rng.choice([chunk - 1, chunk, chunk + 1, 2 * chunk, chunk // 2, 700]))
    if kind == 0:  # pure noise
        return np.clip(
            np.round(rng.normal(0, rng.uniform(5, 500), (n, 2))), -32768, 32767
        ).astype(np.int16)
    if kind == 1:  # tiny amplitudes: truncation-tie storm
        return rng.integers(-4, 5, size=(n, 2)).astype(np.int16)
    if kind == 2:  # constant stream: every offset detects
        return np.full((n, 2), int(rng.integers(0, 50)), dtype=np.int16)
    n = max(n, 1200)
    count = int(rng.integers(1, 7))
    frames, offsets = [], []
    for _ in range(count):
        frame = random_frame(rng)
        if rng.random() < 0.3:  # corruption: exercises 1-bit recovery + AP
            frame = synth.flip_bit(frame, int(rng.integers(0, 8 * len(frame))))
        frames.append(frame)
        # Include chunk-edge offsets (partial frames past the scan limit).
        offsets.append(int(rng.integers(0, n - 300)) if rng.random() < 0.8
                       else int(n - rng.integers(240, 300)))
    snr = float(rng.uniform(0, 25)) if rng.random() < 0.7 else None
    return synth.modulate(
        frames,
        offsets,
        n,
        snr_db=snr,
        noise_std=float(rng.uniform(10, 200)),
        seed=int(rng.integers(0, 1 << 31)),
    )


def device_classified(
    iq: np.ndarray, recover2: bool = False
) -> list[tuple[int, str, bytes, int]]:
    """Jitted extended decode -> the oracle's (offset, kind, frame, icao_ap)
    stream (same mapping as tests/test_extended_golden.py). recover2=True
    classifies unique-2-flip repairs as 'long2' like the scalar tiers."""
    import jax
    import jax.numpy as jnp

    from airjax.pipeline import decode_iq_block_extended

    n_off = len(iq) - 240
    if n_off <= 0:
        return []
    out = jax.device_get(
        decode_iq_block_extended(jnp.asarray(iq), n_off, 256, recover2)
    )
    hits = []
    for k in range(len(out["offsets"])):
        off = int(out["offsets"][k])
        if not out["valid"][k]:
            continue
        if out["good_long"][k]:
            kind = (
                "long2"
                if recover2 and out["recovered2"][k]
                else "long"
            )
            hits.append((off, kind, out["frames"][k].tobytes(), 0))
        elif out["good_df11"][k]:
            hits.append((off, "df11", out["frames_raw"][k].tobytes()[:7], 0))
        elif out["cand_df11_ic"][k]:
            hits.append(
                (off, "df11_ic", out["frames_raw"][k].tobytes()[:7],
                 int(out["icao_ap_short"][k]))
            )
        elif out["cand_short_ap"][k]:
            hits.append(
                (off, "short_ap", out["frames_raw"][k].tobytes()[:7],
                 int(out["icao_ap_short"][k]))
            )
        elif out["cand_long_ap"][k]:
            hits.append(
                (off, "long_ap", out["frames_raw"][k].tobytes(),
                 int(out["icao_ap_long"][k]))
            )
    return hits


def run(iters: int, seed: int, chunk: int, recover2: bool = False) -> int:
    from airjax.native import decode_chunk_extended as native_decode

    rng = np.random.default_rng(seed)
    for i in range(iters):
        iq = random_capture(rng, chunk)
        gold = golden.decode_chunk_extended(iq, recover2=recover2)
        dev = device_classified(iq, recover2=recover2)
        nat, _ = native_decode(
            iq, max_hits=max(4096, len(gold) + 64), recover2=recover2
        )
        if dev != gold or nat != gold:
            print(f"MISMATCH at iteration {i} (len={len(iq)})")
            bad = "device" if dev != gold else "native"
            ours = dev if dev != gold else nat
            for a, b in zip(ours[:8], gold[:8]):
                mark = "  " if a == b else "->"
                print(f"{mark} {bad}: {a}\n   gold:   {b}")
            print(f"   lens: {bad}={len(ours)} gold={len(gold)}")
            np.save("/tmp/fuzz_extended_mismatch_iq.npy", iq)
            return 1
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{iters} ok ({len(gold)} hits last)")
    print(f"all {iters} iterations three-way bit-exact")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=320)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--chunk", type=int, default=4000)
    p.add_argument(
        "--platform", default="cpu",
        help="jax platform for the device tier (cpu = fast local XLA; "
        "pass 'axon,cpu' to fuzz against the real TPU)",
    )
    p.add_argument(
        "--recover2", action="store_true",
        help="fuzz the opt-in 2-bit-recovery mode three-way "
        "(device/golden/native all classify repairs as 'long2')",
    )
    args = p.parse_args(argv)
    import jax

    jax.config.update("jax_platforms", args.platform)
    return run(args.iters, args.seed, args.chunk, recover2=args.recover2)


if __name__ == "__main__":
    sys.exit(main())
