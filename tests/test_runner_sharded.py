"""Sharded streaming runner (VERDICT r4 item 1): run_stream_sharded must
emit the EXACT hit stream of single-device run_stream(overlap=True) over
the same source — including frames straddling source-block boundaries,
step boundaries, AND shard boundaries — and drive every sink the
single-device runner drives (per-packet, batched parity, per-packet
extended, batched extended). 8-virtual-device CPU mesh."""

import numpy as np
import pytest

from airjax.io import synth
from airjax.parallel.mesh import make_mesh
from airjax.runner import run_stream, run_stream_sharded

ICAO = 0x7C6B30
# Fresh samples per sharded step at the runner's ACTUAL default shard
# block (computed, not assumed: a hardcoded 17168 was wrong — the
# default is tuned_block(max(16384, cfg.block_len=20000)) = 20240 — and
# silently moved the "step-boundary straddle" offsets mid-step).
from airjax.config import DEFAULT_CONFIG  # noqa: E402
from airjax.parallel.halo import HALO, tuned_block  # noqa: E402

_DEFAULT_BLOCK = tuned_block(max(16384, DEFAULT_CONFIG.block_len))
STEP_F = _DEFAULT_BLOCK * 8 - HALO


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def _stream(n_total, extra_offsets=(), seed=5, extended=False):
    frame = synth.make_df17(ICAO, synth.make_id_me("SHRDSTRM"))
    rng = np.random.default_rng(seed)
    offsets = sorted(
        rng.choice(
            np.arange(1, (n_total - 400) // 400) * 400, 40, replace=False
        ).tolist()
    )
    offsets = sorted(set(offsets) | set(extra_offsets))
    frames = [frame] * len(offsets)
    if extended:
        from airjax.protocol import shortframe

        df11 = shortframe.make_df11(ICAO, capability=5)
        df4 = shortframe.make_df4(ICAO, altitude_ft=12000)
        frames = [
            [frame, df11, df4][i % 3] for i in range(len(offsets))
        ]
    iq = np.asarray(
        synth.modulate(
            frames, list(map(int, offsets)), n_total, noise_std=25.0, seed=seed
        )
    )

    def blocks():
        for i in range(0, n_total, 20000):
            yield iq[i : i + 20000]

    return blocks


def test_parity_hit_stream_equality(mesh):
    # Straddle a source-block edge, the first step edge, and shard edges
    # land wherever they land (17168-sample shards inside each step).
    blocks = _stream(
        400_000, extra_offsets=[19_899, 39_947, STEP_F - 120, 2 * STEP_F - 60]
    )
    got1, got2 = [], []
    s1 = run_stream(blocks(), got1.append, overlap=True)
    s2 = run_stream_sharded(blocks(), got2.append, mesh=mesh)
    assert [p.packet.hex() for p in got1] == [p.packet.hex() for p in got2]
    assert s1.good == s2.good > 40
    # detections: the sharded runner re-scans each step's last 239
    # offsets (junk-context in step k, masked; real context in step
    # k+1), so a boundary-region detection counts twice — the stat is
    # an upper bound, the hit stream above is the exactness contract.
    assert s2.detections >= s1.detections


def test_parity_tail_partial_step(mesh):
    # Stream shorter than one sharded step: everything decodes via the
    # padded tail path.
    blocks = _stream(60_000, extra_offsets=[59_700])
    got1, got2 = [], []
    run_stream(blocks(), got1.append, overlap=True)
    run_stream_sharded(blocks(), got2.append, mesh=mesh)
    assert [p.packet.hex() for p in got1] == [p.packet.hex() for p in got2]
    assert got1  # the 59_700 frame (window ends exactly at stream end)


def test_parity_overflow_regrow(mesh):
    blocks = _stream(300_000)
    got1, got2 = [], []
    run_stream(blocks(), got1.append, overlap=True)
    s2 = run_stream_sharded(
        blocks(), got2.append, mesh=mesh, capacity_per_shard=2,
        compact_capacity=4,
    )
    assert [p.packet.hex() for p in got1] == [p.packet.hex() for p in got2]
    assert s2.overflow_blocks >= 1


def test_parity_batched_tracker_state(mesh):
    from airjax.track.batch import BatchTracker

    blocks = _stream(300_000)
    t1, t2 = BatchTracker(), BatchTracker()
    run_stream(blocks(), t1, overlap=True)
    run_stream_sharded(blocks(), t2, mesh=mesh)
    assert set(t1.aircrafts) == set(t2.aircrafts) == {ICAO}
    a1, a2 = t1.aircrafts[ICAO], t2.aircrafts[ICAO]
    assert a1.get_callsign() == a2.get_callsign() == "SHRDSTRM"


def test_extended_packet_stream_equality(mesh):
    blocks = _stream(300_000, extra_offsets=[STEP_F - 150], extended=True)
    got1, got2 = [], []
    s1 = run_stream(blocks(), got1.append, overlap=True, extended=True)
    s2 = run_stream_sharded(blocks(), got2.append, mesh=mesh, extended=True)

    def key(p):  # identity minus the wall-clock receipt timestamp
        import re

        return re.sub(r"time_processed=[\d.]+", "", repr(p))

    assert [key(p) for p in got1] == [key(p) for p in got2]
    assert s1.good == s2.good > 30


def test_extended_batched_tracker_state(mesh):
    from airjax.track.batch import ExtendedBatchTracker

    blocks = _stream(300_000, extended=True)
    t1, t2 = ExtendedBatchTracker(), ExtendedBatchTracker()
    run_stream(blocks(), t1, overlap=True, extended=True)
    run_stream_sharded(blocks(), t2, mesh=mesh, extended=True)
    assert set(t1.aircrafts) == set(t2.aircrafts) == {ICAO}
    a1, a2 = t1.aircrafts[ICAO], t2.aircrafts[ICAO]
    assert a1.get_callsign() == a2.get_callsign()
    assert a1.altitude == a2.altitude
    assert a1.squawk == a2.squawk


def test_cli_devices_flag(capsys):
    from airjax.cli import main

    rc = main(["adsb", "--synthetic", "12", "--devices", "2"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "stats:" in out and "'good': " in out
    # Decoded something.
    assert "'good': 0" not in out


def test_cli_devices_rejects_single_device_debug_flags(capsys):
    from airjax.cli import main

    assert main(["adsb", "--synthetic", "1", "--devices", "2", "--no-overlap"]) == 2
    assert (
        main(["adsb", "--synthetic", "1", "--devices", "2", "--dump-preamble"])
        == 2
    )


def test_pipeline_depth_invariance(mesh):
    """Async dispatch depth must not change the emitted stream."""
    blocks = _stream(400_000, extra_offsets=[STEP_F - 130])
    outs = []
    for depth in (0, 1, 3):
        got = []
        run_stream_sharded(
            blocks(), got.append, mesh=mesh, pipeline_depth=depth
        )
        outs.append([p.packet.hex() for p in got])
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) > 40
