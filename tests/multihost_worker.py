"""Worker process for the true 2-process multi-host test.

Launched (twice) by tests/test_multihost.py::test_two_process_loopback with
argv = [rank, coordinator_address]. Each rank synthesizes the SAME global
capture deterministically, ingests only its own half via
multihost.decode_capture (which goes through
jax.make_array_from_process_local_data and the process_allgather branch),
and prints the full gathered hit stream — the parent asserts both ranks
printed identical, complete results.
"""

import json
import sys


def main() -> None:
    rank = int(sys.argv[1])
    coordinator = sys.argv[2]

    import jax

    # The sitecustomize pins jax_platforms="axon,cpu"; force CPU in-process.
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=2, process_id=rank
    )
    assert jax.process_count() == 2, jax.process_count()

    from airjax.io import synth
    from airjax.parallel import multihost

    n = 32768
    frame = synth.make_df17(0x7C6B30, synth.make_id_me("TWOPROC_"))
    # One frame per host's interior + one STRADDLING the process boundary
    # (the class of loss the reference suffers at chunk edges, adsb.rs:77).
    offsets = [1000, n // 2 - 120, 30000]
    iq = synth.modulate([frame] * len(offsets), offsets, n, seed=9)
    half = n // 2
    local = iq[rank * half : (rank + 1) * half]

    hits, stats = multihost.decode_capture(local)
    print(
        "RESULT "
        + json.dumps(
            {
                "rank": rank,
                "expected_offsets": offsets,
                "frame_hex": frame.hex(),
                "hits": [[h[1], h[2].hex(), h[3]] for h in hits],
                "stats": stats,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
