"""Run the sharded (shard_map + ppermute) decoders on REAL TPU hardware.

The weak-scaling curve and all sharding tests run on the 8-virtual-device
CPU mesh; this smoke proves the Mosaic lowering of the collective path
works on the actual chip (a 1-device mesh still compiles and executes the
full shard_map + ppermute + with_sharding_constraint program). Asserts
hit-for-hit parity with the unsharded production pipeline on the same
device, for both the DF17 parity decoder and the extended decoder, and
runs the channel-parallel decoders (shard_map + lax.map over local
channels) with per-channel parity against the unsharded pipeline.

Run:  python tools/tpu_shard_smoke.py [--samples 1048576] [--frames 64]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from airjax.io import synth
from airjax.parallel.halo import (
    decode_capture_sharded,
    decode_capture_sharded_extended,
)
from airjax.parallel.mesh import make_mesh
from airjax.pipeline import decode_capture_overlap


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=1 << 20)
    ap.add_argument("--frames", type=int, default=64)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    frame = synth.make_df17(0x7C6B30, synth.make_id_me("SHARD03"))
    rng = np.random.default_rng(17)
    offsets = np.sort(
        rng.choice(
            np.arange(0, (args.samples - 400) // 400) * 400,
            size=args.frames,
            replace=False,
        )
    )
    iq = synth.modulate(
        [frame] * args.frames,
        list(map(int, offsets)),
        args.samples,
        noise_std=40.0,
        seed=17,
    )

    mesh = make_mesh(1)
    t0 = time.perf_counter()
    hits_sh, stats_sh = decode_capture_sharded(iq, mesh, capacity_per_shard=256)
    t_shard = time.perf_counter() - t0
    print(
        f"[sharded df17] {len(hits_sh)} hits, stats={stats_sh}, "
        f"{t_shard:.1f}s (incl. compile)",
        flush=True,
    )

    hits_un, _stats_un = decode_capture_overlap(iq)
    assert [h[1] for h in hits_sh] == [h[1] for h in hits_un], (
        "sharded offsets != unsharded"
    )
    assert [h[2] for h in hits_sh] == [h[2] for h in hits_un], (
        "sharded frames != unsharded"
    )
    assert len(hits_sh) >= args.frames
    print(
        f"[parity] sharded == unsharded on-device ({len(hits_sh)} hits)",
        flush=True,
    )

    t0 = time.perf_counter()
    pkts, stats_ext = decode_capture_sharded_extended(iq, mesh)
    t_ext = time.perf_counter() - t0
    print(
        f"[sharded extended] {len(pkts)} packets, stats={stats_ext}, "
        f"{t_ext:.1f}s (incl. compile)",
        flush=True,
    )
    assert len(pkts) >= args.frames

    # Channel-parallel paths (shard_map + lax.map over local channels):
    # two channels, each a shorter capture with its own embedded frames.
    from airjax.parallel.channels import decode_channels, decode_channels_extended
    from airjax.parallel.mesh import make_mesh as _mm

    ch_len = args.samples // 4
    ch_offsets = [700, ch_len // 2, ch_len - 4000]
    ch_iq = np.stack(
        [
            synth.modulate(
                [frame] * len(ch_offsets), ch_offsets, ch_len,
                noise_std=40.0, seed=100 + ch,
            )
            for ch in range(2)
        ]
    )
    ch_mesh = _mm(1, axis="c")
    t0 = time.perf_counter()
    ch_hits = decode_channels(ch_iq, ch_mesh, capacity=256)
    t_ch = time.perf_counter() - t0
    for ch in range(2):
        ref_hits, _ = decode_capture_overlap(ch_iq[ch])
        assert [h[1] for h in ch_hits[ch]] == [h[1] for h in ref_hits], (
            f"channel {ch} offsets != unsharded"
        )
        assert [h[2] for h in ch_hits[ch]] == [h[2] for h in ref_hits]
    print(
        f"[channels df17] per-channel hits={[len(h) for h in ch_hits]}, "
        f"parity with unsharded, {t_ch:.1f}s (incl. compile)",
        flush=True,
    )
    t0 = time.perf_counter()
    ch_pkts = decode_channels_extended(ch_iq, ch_mesh)
    t_che = time.perf_counter() - t0
    assert all(len(p) >= len(ch_offsets) for p in ch_pkts)
    print(
        f"[channels extended] per-channel packets={[len(p) for p in ch_pkts]}, "
        f"{t_che:.1f}s (incl. compile)",
        flush=True,
    )

    print(
        json.dumps(
            {
                "platform": dev.platform,
                "n_hits_sharded": len(hits_sh),
                "n_hits_unsharded": len(hits_un),
                "n_packets_extended": len(pkts),
                "channel_hits": [len(h) for h in ch_hits],
                "channel_packets": [len(p) for p in ch_pkts],
                "parity": True,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
