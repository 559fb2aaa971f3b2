"""Multi-chip overlap-save tests on an 8-device virtual CPU mesh
(SURVEY.md §4c): the sharded halo decode must equal the single-device scan,
including frames that straddle shard boundaries."""

import jax
import numpy as np
import pytest

from airjax.io import synth
from airjax.parallel.halo import decode_capture_sharded
from airjax.parallel.mesh import make_mesh
from airjax.pipeline import decode_capture_overlap
from airjax.config import PipelineConfig


ID_FRAME = synth.make_df17(0x7C6B30, synth.make_id_me("ANZ128"))
POS_FRAME = synth.make_df17(
    0x7C6B30,
    synth.make_position_me(tc=11, altitude_ft=5000, cpr_lat=12345, cpr_lon=54321, odd=True),
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_matches_single_device(mesh):
    # 8 shards of 4000 samples; frames everywhere incl. shard boundaries
    n = 32000
    shard = n // 8
    offsets = [100, shard - 120, shard + 130, 3 * shard - 200, 5 * shard - 10, n - 300]
    frames = [ID_FRAME, POS_FRAME, ID_FRAME, POS_FRAME, ID_FRAME, POS_FRAME]
    iq = synth.modulate(frames, offsets, n, seed=11)

    sharded_hits, sharded_stats = decode_capture_sharded(iq, mesh)
    single_hits, _ = decode_capture_overlap(
        iq, PipelineConfig(block_len=n)
    )
    assert [(h[1], h[2]) for h in sharded_hits] == [
        (h[1], h[2]) for h in single_hits
    ]
    got = {(h[1], h[2]) for h in sharded_hits}
    for off, fr in zip(offsets, frames):
        assert (off, fr) in got, f"lost frame at {off}"


def test_boundary_straddle_across_shards(mesh):
    # Place a frame exactly straddling every shard boundary.
    n = 32000
    shard = n // 8
    offsets = [b * shard - 120 for b in range(1, 8)]
    iq = synth.modulate([ID_FRAME] * len(offsets), offsets, n, seed=12)
    hits, _ = decode_capture_sharded(iq, mesh)
    got = {h[1] for h in hits if h[2] == ID_FRAME}
    assert got >= set(offsets)


def test_tail_mask(mesh):
    # No spurious detections from the ring-wraparound halo at the last shard.
    n = 16000
    iq = synth.modulate([ID_FRAME], [50], n, seed=13)
    hits, _ = decode_capture_sharded(iq, mesh)
    assert all(h[1] <= n - 240 for h in hits)
    assert any(h[1] == 50 for h in hits)


def test_tuned_block_math():
    from airjax.parallel.halo import HALO, _halo_size, tuned_block

    # Small blocks: minimal pad, classic 239 halo.
    assert tuned_block(1000) == 1000
    assert _halo_size(1000) == HALO
    # Big blocks land in the ≡784 (mod 1024) class, halo becomes 240 and
    # the per-shard slice (block + 240) is 1024-tile-aligned.
    for per in (4096, 6000, 1 << 20, (1 << 22) - 240, (1 << 22)):
        b = tuned_block(per)
        assert b >= per and b - per < 1024
        assert b % 1024 == 784
        assert _halo_size(b) == 240
        assert (b + 240) % 1024 == 0
    # A block already in the class is untouched.
    assert tuned_block((1 << 22) - 240) == (1 << 22) - 240


def test_tuned_decomposition_matches_single_device(mesh):
    # Force the tuned shape: per-shard >= 4096 so decode_capture_sharded
    # pads to block ≡ 784 (mod 1024) and exchanges a 240-sample halo.
    # Frames straddle the *tuned* shard boundaries.
    from airjax.parallel.halo import tuned_block

    n = 48000
    block = tuned_block(-(-n // 8))
    assert block == 6928  # 6000 rounded up into the tuned class
    offsets = [100, block - 120, 3 * block - 200, 5 * block - 10, n - 300]
    frames = [ID_FRAME, POS_FRAME, ID_FRAME, POS_FRAME, ID_FRAME]
    iq = synth.modulate(frames, offsets, n, seed=21)

    sharded_hits, _ = decode_capture_sharded(iq, mesh)
    single_hits, _ = decode_capture_overlap(iq, PipelineConfig(block_len=n))
    assert [(h[1], h[2]) for h in sharded_hits] == [
        (h[1], h[2]) for h in single_hits
    ]
    got = {(h[1], h[2]) for h in sharded_hits}
    for off, fr in zip(offsets, frames):
        assert (off, fr) in got, f"lost frame at {off}"
