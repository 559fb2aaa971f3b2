"""Extended mode (every Mode S downlink format) on a multi-chip mesh:
sharded halo decode and channel parallelism must match the single-device
extended decode, including DF4/DF5/DF11 frames straddling shard boundaries
(VERDICT r2 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airjax.extended import assemble_extended
from airjax.io import synth
from airjax.parallel.channels import decode_channels_extended
from airjax.parallel.halo import decode_capture_sharded_extended
from airjax.parallel.mesh import make_mesh
from airjax.pipeline import decode_iq_block_extended
from airjax.protocol import shortframe
from airjax.protocol.packet import AdsbPacket, AllCallReply, SurveillanceReply
from airjax.track.icao_cache import IcaoCache

ICAO = 0x7C6B30
DF17 = synth.make_df17(ICAO, synth.make_id_me("SHRDEXT"))
DF11 = shortframe.make_df11(ICAO, capability=5)
DF4 = shortframe.make_df4(ICAO, altitude_ft=12000)
DF5 = shortframe.make_df5(ICAO, squawk=7421)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def _single_device_ext(iq, now=100.0):
    """Whole capture as ONE extended block — the ground truth."""
    n_off = len(iq) - 240
    out = jax.device_get(decode_iq_block_extended(jnp.asarray(iq), n_off, 256))
    return assemble_extended(out, now, IcaoCache())


def _key(pkt):
    if isinstance(pkt, AdsbPacket):
        return ("adsb", pkt.icao, pkt.packet)
    if isinstance(pkt, AllCallReply):
        return ("allcall", pkt.icao, pkt.capability)
    if isinstance(pkt, SurveillanceReply):
        return ("surv", pkt.df, pkt.icao, pkt.altitude_ft, pkt.squawk)
    return ("other", repr(pkt))


def test_extended_sharded_matches_single_device(mesh):
    # 8 shards of 4000; DF11 first (unlocks the AP gate), then DF17 and
    # AP-addressed short frames scattered across shards — two of them
    # straddling shard boundaries.
    n = 32000
    shard = n // 8
    placements = [
        (DF11, 300),
        (DF17, 1200),
        (DF4, shard - 60),  # short frame straddling shard 0/1 (136 samples)
        (DF5, 2 * shard - 60),  # straddling shard 1/2
        (DF4, 3 * shard + 500),
        (DF17, 5 * shard - 120),  # long frame straddling shard 4/5
        (DF5, 6 * shard + 700),
        (DF11, n - 400),
    ]
    frames = [f for f, _ in placements]
    offsets = [o for _, o in placements]
    iq = synth.modulate(frames, offsets, n, seed=31)

    sharded, stats = decode_capture_sharded_extended(iq, mesh, now=100.0)
    single = _single_device_ext(iq)

    assert [(o, _key(p)) for o, p in sharded] == [
        (o, _key(p)) for o, p in single
    ]
    got_offsets = {o for o, _ in sharded}
    for off in offsets:
        assert off in got_offsets, f"lost frame at {off}"
    assert stats["n_good_long"] >= 2  # both DF17s
    assert stats["n_good_df11"] >= 2


def test_extended_sharded_ap_gating_is_global(mesh):
    # The DF11 in shard 0 must unlock an AP-addressed DF4 in shard 7 —
    # the ICAO acceptance cache sees the whole capture, exactly like the
    # single-device two-pass assembly.
    n = 32000
    shard = n // 8
    iq = synth.modulate([DF11, DF4], [100, 7 * shard + 500], n, seed=32)
    pkts, _ = decode_capture_sharded_extended(iq, mesh, now=100.0)
    kinds = [type(p).__name__ for _, p in pkts]
    assert "AllCallReply" in kinds
    assert "SurveillanceReply" in kinds

    # Without the DF11, the AP frame stays gated (unknown ICAO).
    iq2 = synth.modulate([DF4], [7 * shard + 500], n, seed=33)
    pkts2, _ = decode_capture_sharded_extended(iq2, mesh, now=100.0)
    assert not pkts2


def test_extended_sharded_tuned_shape(mesh):
    # Per-shard >= 4096 samples: the tuned decomposition (block ≡ 784 mod
    # 1024, 240-sample halo) carries the extended path too.
    from airjax.parallel.halo import tuned_block

    n = 48000
    block = tuned_block(-(-n // 8))
    assert block % 1024 == 784
    offsets = [300, block - 60, 3 * block - 120, n - 500]
    frames = [DF11, DF4, DF17, DF5]
    iq = synth.modulate(frames, offsets, n, seed=34)
    pkts, _ = decode_capture_sharded_extended(iq, mesh, now=100.0)
    single = _single_device_ext(iq)
    assert [(o, _key(p)) for o, p in pkts] == [(o, _key(p)) for o, p in single]
    assert {o for o, _ in pkts} >= set(offsets)


def test_extended_channels():
    # 8 independent receivers, one per device, each with its own ICAO
    # cache: a DF11+DF4 pair decodes per channel; a lone DF4 stays gated.
    mesh = make_mesh(8, axis="c")
    chans = []
    for c in range(8):
        if c == 3:
            chans.append(synth.modulate([DF4], [900], 4000, seed=40 + c))
        else:
            chans.append(
                synth.modulate([DF11, DF4], [300, 1500], 4000, seed=40 + c)
            )
    per_channel = decode_channels_extended(np.stack(chans), mesh, now=100.0)
    for c, pkts in enumerate(per_channel):
        kinds = [type(p).__name__ for _, p in pkts]
        if c == 3:
            assert kinds == []  # no DF11 -> AP frame gated
        else:
            assert "AllCallReply" in kinds and "SurveillanceReply" in kinds
