"""Hit-proportional cross-shard candidate gather (VERDICT r4 item 3).

The compact builders must produce exactly the dense builders' hit/packet
streams while the host fetch scales with n_good/n_candidates instead of
D*K (stats["fetched_bytes"]). Runs on the 8-virtual-device CPU mesh
(conftest forces the platform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airjax.io import synth
from airjax.parallel import halo
from airjax.parallel.mesh import make_mesh
from airjax.protocol import shortframe

ICAO = 0x7C6B30


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _capture(n_dev, block):
    """Frames inside shards AND straddling every shard boundary."""
    n = block * n_dev
    frame = synth.make_df17(ICAO, synth.make_id_me("COMPACT"))
    offsets = [37 + 500 * i for i in range(6)]
    offsets += [b * block - 100 for b in range(1, n_dev)]
    return synth.modulate([frame] * len(offsets), offsets, n, seed=3), offsets, frame


def test_compact_equals_dense_parity(mesh):
    block = halo.tuned_block(16384)
    iq, offsets, frame = _capture(8, block)
    dense_hits, dense_stats = halo.decode_capture_sharded(
        iq, mesh, capacity_per_shard=64, gather="dense"
    )
    comp_hits, comp_stats = halo.decode_capture_sharded(
        iq, mesh, capacity_per_shard=64, gather="compact"
    )
    assert comp_hits == dense_hits
    assert sorted(h[1] for h in comp_hits) == sorted(offsets)
    assert comp_stats["n_good"] == dense_stats["n_good"] == len(offsets)
    # The point of the feature: fetched bytes ~ n_good rows, not D*K.
    assert comp_stats["fetched_bytes"] == len(offsets) * (4 + 4 + 14)
    assert comp_stats["fetched_bytes"] < dense_stats["fetched_bytes"] / 10


def test_compact_rows_are_offset_sorted(mesh):
    block = halo.tuned_block(16384)
    iq, offsets, _ = _capture(8, block)
    hits, _ = halo.decode_capture_sharded(iq, mesh, gather="compact")
    got = [h[1] for h in hits]
    assert got == sorted(got)


def test_compact_overflow_regrows(mesh):
    block = halo.tuned_block(16384)
    iq, offsets, _ = _capture(8, block)
    # Start with per-shard capacity 2 (6 frames in shard 0) AND compact
    # capacity far below n_good: both regrow paths must fire.
    hits, stats = halo.decode_capture_sharded(
        iq, mesh, capacity_per_shard=2, compact_capacity=4, gather="compact"
    )
    assert sorted(h[1] for h in hits) == sorted(offsets)
    assert stats["capacity_per_shard"] > 2
    assert stats["compact_capacity"] > 4


def test_compact_equals_dense_extended(mesh):
    block = halo.tuned_block(16384)
    n = block * 8
    frame = synth.make_df17(ICAO, synth.make_id_me("COMPACT"))
    df11 = shortframe.make_df11(ICAO, capability=5)
    df4 = shortframe.make_df4(ICAO, altitude_ft=12000)
    df24 = shortframe.make_df24(ICAO, nd=2, md=bytes(range(10)), ke=1)
    offsets = [200, block - 60, 2000, 3200, 2 * block - 100]
    iq = synth.modulate([df11, df4, frame, df24, frame], offsets, n, seed=1)

    dense_pkts, dense_stats = halo.decode_capture_sharded_extended(
        iq, mesh, now=100.0, gather="dense"
    )
    comp_pkts, comp_stats = halo.decode_capture_sharded_extended(
        iq, mesh, now=100.0, gather="compact"
    )
    d = [(o, type(p).__name__, repr(p)) for o, p in dense_pkts]
    c = [(o, type(p).__name__, repr(p)) for o, p in comp_pkts]
    assert c == d
    assert comp_stats["n_good_long"] == dense_stats["n_good_long"]
    assert comp_stats["n_good_df11"] == dense_stats["n_good_df11"]
    assert comp_stats["n_detections"] == dense_stats["n_detections"]
    # Candidate-proportional fetch (dense would be 8*2048 rows).
    assert comp_stats["n_candidates"] < 200
    assert comp_stats["fetched_bytes"] == comp_stats["n_candidates"] * 45


def test_compact_extended_fuzz_vs_dense(mesh):
    """Randomized frame soup: the compact path must match dense exactly,
    capture after capture (shared cache semantics included)."""
    from airjax.track.icao_cache import IcaoCache

    rng = np.random.default_rng(7)
    block = halo.tuned_block(16384)
    n = block * 8
    kinds = [
        synth.make_df17(ICAO, synth.make_id_me("FUZZCMP")),
        shortframe.make_df11(ICAO, capability=5),
        shortframe.make_df4(ICAO, altitude_ft=9000),
    ]
    for it in range(3):
        n_frames = int(rng.integers(3, 12))
        offsets = np.sort(
            rng.choice(np.arange(1, (n - 400) // 400) * 400, n_frames, replace=False)
        ).tolist()
        frames = [kinds[int(rng.integers(len(kinds)))] for _ in offsets]
        iq = synth.modulate(
            frames, offsets, n, noise_std=30.0, seed=100 + it
        )
        dp, _ = halo.decode_capture_sharded_extended(
            iq, mesh, now=50.0, cache=IcaoCache(), gather="dense"
        )
        cp, _ = halo.decode_capture_sharded_extended(
            iq, mesh, now=50.0, cache=IcaoCache(), gather="compact"
        )
        assert [(o, type(p).__name__, repr(p)) for o, p in dp] == [
            (o, type(p).__name__, repr(p)) for o, p in cp
        ], f"iter {it}"


def test_multihost_single_process_compact_matches_dense():
    """decode_capture (multihost wrapper) compact vs dense, single-proc
    path over all 8 virtual devices."""
    from airjax.parallel import multihost

    block = halo.tuned_block(4096)
    n_dev = len(jax.devices())
    iq, offsets, _ = _capture(n_dev, block)
    dh, ds = multihost.decode_capture(iq, capacity_per_shard=64, gather="dense")
    ch, cs = multihost.decode_capture(iq, capacity_per_shard=64, gather="compact")
    assert ch == dh
    assert cs["n_good"] == ds["n_good"] == len(offsets)
    assert cs["fetched_bytes"] == len(offsets) * 22


def test_multihost_extended_batched_compact():
    """The pod batched-sink path rides the compact gather by default and
    lands identical tracker state to the dense gather."""
    from airjax.parallel import multihost
    from airjax.track.batch import ExtendedBatchTracker

    block = halo.tuned_block(4096)
    n_dev = len(jax.devices())
    n = block * n_dev
    frame = synth.make_df17(ICAO, synth.make_id_me("PODCMP"))
    df11 = shortframe.make_df11(ICAO, capability=5)
    df4 = shortframe.make_df4(ICAO, altitude_ft=12000)
    iq = synth.modulate(
        [df11, df4, frame], [200, block - 60, 2000], n, seed=2
    )
    td, _ = ExtendedBatchTracker(), None
    ad, _ = multihost.decode_capture_extended_batched(
        iq, td, now=100.0, gather="dense"
    )
    tc = ExtendedBatchTracker()
    ac, stats = multihost.decode_capture_extended_batched(
        iq, tc, now=100.0, gather="compact"
    )
    assert ac == ad
    assert tc.aircrafts[ICAO].altitude == td.aircrafts[ICAO].altitude == 12000
    assert tc.aircrafts[ICAO].get_callsign() == td.aircrafts[ICAO].get_callsign()
    assert stats["n_candidates"] >= 3
