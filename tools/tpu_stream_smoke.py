"""Real-chip smoke of the SHARDED streaming runner (round 5): a 1-device
mesh on the axon TPU drives run_stream_sharded end-to-end — upload,
compact sharded decode (ppermute halo is a self-loop at D=1), scalar +
row fetch, packet assembly — on a multi-step synthetic stream with
boundary-straddling frames.

Usage: python tools/tpu_stream_smoke.py [--extended]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--extended", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    from airjax.io import synth
    from airjax.parallel.halo import HALO
    from airjax.parallel.mesh import make_mesh
    from airjax.runner import run_stream_sharded

    print("platform:", jax.devices()[0].platform, flush=True)
    mesh = make_mesh(1)
    # One shard carries the whole step; sized like a multi-shard step so
    # the smoke exercises multi-step carry + a padded tail at realistic
    # step granularity (the exact D=8 default would be 20240*8).
    block = 17168 * 8
    F = block - HALO

    icao = 0x7C6B30
    frame = synth.make_df17(icao, synth.make_id_me("TPUSTRM"))
    frames = [frame] * 8
    if args.extended:
        from airjax.protocol import shortframe

        frames = [
            frame,
            shortframe.make_df11(icao, capability=5),
            shortframe.make_df4(icao, altitude_ft=12000),
            shortframe.make_df24(icao, nd=1, md=bytes(range(10)), ke=1),
        ] * 2
    n_total = 2 * F + 50_000
    offsets = [3_000 + 17_000 * i for i in range(6)] + [F - 130, 2 * F - 90]
    iq = np.asarray(
        synth.modulate(frames, offsets, n_total, noise_std=25.0, seed=9)
    )

    def blocks():
        for i in range(0, n_total, 20_000):
            yield iq[i : i + 20_000]

    got = []
    t0 = time.time()
    stats = run_stream_sharded(
        blocks(), got.append, mesh=mesh, shard_block=block,
        extended=args.extended,
    )
    dt = time.time() - t0
    d = stats.as_dict()
    d.update(
        mode="extended" if args.extended else "parity",
        wall_s=round(dt, 1),
        packets=len(got),
        kinds=sorted({type(p).__name__ for p in got}),
    )
    print(json.dumps(d), flush=True)
    assert len(got) == len(offsets), (len(got), len(offsets))
    if args.extended:
        assert set(d["kinds"]) == {
            "AdsbPacket", "AllCallReply", "SurveillanceReply", "CommDReply"
        }, d["kinds"]
    print("tpu_stream_smoke ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
