"""Weak-scaling sweep of the halo-sharded decoder over a virtual device
mesh (BASELINE "scaling" target artifact).

Runs the SAME per-device workload on 1, 2, 4, 8 virtual devices (work
grows with the mesh: weak scaling) and reports samples/s + efficiency.
On CPU the absolute numbers measure the host, not a TPU — the artifact
demonstrates the sharded program's correctness and scaling SHAPE (one
239-sample ppermute halo per shard, fully disjoint offsets); on a real
pod, pass JAX_PLATFORMS=tpu and the same script reports ICI scaling.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_sweep.py [--per-device 1000000] [--json OUT]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device", type=int, default=1_000_000)
    ap.add_argument("--frames-per-device", type=int, default=8)
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true", default=None,
                    help="force the CPU backend (default when axon/TPU has <2 devices)")
    args = ap.parse_args()

    import jax

    if args.cpu or args.cpu is None:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from airjax.io import synth
    from airjax.parallel.halo import decode_capture_sharded
    from airjax.parallel.mesh import make_mesh

    n_devices = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= n_devices]
    frame = synth.make_df17(0x7C6B30, synth.make_id_me("SCALE"))
    rows = []
    base_rate = None
    for n_dev in sizes:
        n = args.per_device * n_dev
        n_frames = args.frames_per_device * n_dev
        rng = np.random.default_rng(n_dev)
        offsets = np.sort(
            rng.choice(np.arange(1, (n - 300) // 300) * 300, size=n_frames, replace=False)
        )
        iq = np.asarray(
            synth.modulate_device(
                [frame] * n_frames, list(map(int, offsets)), n,
                noise_std=40.0, seed=n_dev,
            )
        )
        mesh = make_mesh(n_dev)
        # Warm (compile) then time.
        decode_capture_sharded(iq, mesh)
        t0 = time.perf_counter()
        hits, stats = decode_capture_sharded(iq, mesh)
        dt = time.perf_counter() - t0
        rate = n / dt / 1e6
        if base_rate is None:
            base_rate = rate
        row = {
            "devices": n_dev,
            "samples": n,
            "frames_embedded": n_frames,
            "frames_decoded": len(hits),
            "msps": round(rate, 1),
            # Perfect weak scaling => total rate grows with the mesh =>
            # per-device rate stays flat => efficiency 1.0.
            "weak_scaling_efficiency": round(rate / n_dev / base_rate, 3),
        }
        # Correctness: every embedded frame must decode (incl. any that
        # straddle shard boundaries via the ppermute halo).
        assert len(hits) >= n_frames, (len(hits), n_frames)
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
