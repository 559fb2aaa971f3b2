"""Channel-parallel decode on the 8-device virtual mesh (config 4):
per-channel results must match single-device decode, and CPR pairs per
channel must produce global positions."""

import jax
import numpy as np
import pytest

from airjax.config import PipelineConfig
from airjax.io import synth
from airjax.parallel.channels import decode_channels
from airjax.parallel.mesh import make_mesh
from airjax.pipeline import decode_capture_overlap
from airjax.protocol.packet import AdsbPacket
from airjax.track.aircraft import handle_aircraft_update


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, axis="c")


def test_eight_channels_match_single_device(mesh):
    n = 8000
    rng = np.random.default_rng(0)
    channels = []
    expected = []
    for ch in range(8):
        frame = synth.make_df17(
            0x7C0000 + ch, synth.make_id_me(f"CH{ch}FLT")
        )
        offs = [500 + 700 * ch, 5000]
        channels.append(synth.modulate([frame] * 2, offs, n, seed=ch))
        expected.append((offs, frame))
    iq = np.stack(channels)

    results = decode_channels(iq, mesh)
    assert len(results) == 8
    for ch, (offs, frame) in enumerate(expected):
        got = {(h[1], h[2]) for h in results[ch]}
        for o in offs:
            assert (o, frame) in got, f"channel {ch} lost frame at {o}"
        # equality with the single-device overlap scan
        single, _ = decode_capture_overlap(iq[ch], PipelineConfig(block_len=n))
        assert [(h[1], h[2]) for h in results[ch]] == [
            (h[1], h[2]) for h in single
        ]


def test_channels_regrow_on_overflow(mesh):
    """A channel denser than the initial capacity must regrow, not
    silently truncate that channel's hits."""
    n = 8000
    frame = synth.make_df17(0x7C6B30, synth.make_id_me("CHOVFL"))
    offs = [500, 2000, 3500, 5000, 6500]
    busy = synth.modulate([frame] * len(offs), offs, n, seed=9)
    quiet = synth.modulate([], [], n, seed=10)
    iq = np.stack([busy] + [quiet] * 7)

    results = decode_channels(iq, mesh, capacity=1)
    got = {h[1] for h in results[0] if h[2] == frame}
    assert got >= set(offs)


def test_channels_extended_regrow_on_overflow(mesh):
    from airjax.parallel.channels import decode_channels_extended
    from airjax.protocol import shortframe
    from airjax.protocol.packet import AllCallReply

    n = 8000
    df11 = shortframe.make_df11(0x40621D)
    offs = [500, 2000, 3500, 5000]
    busy = synth.modulate([df11] * len(offs), offs, n, seed=11)
    quiet = synth.modulate([], [], n, seed=12)
    iq = np.stack([busy] + [quiet] * 7)

    results = decode_channels_extended(iq, mesh, capacity=1, now=100.0)
    by_off = {off: p for off, p in results[0]}
    for off in offs:
        assert isinstance(by_off[off], AllCallReply)


def test_channel_cpr_position_decode(mesh):
    # An even+odd CPR pair on one channel must produce a global position
    # (the full config-4 flow: sharded decode -> host tracker).
    n = 8000
    even_me = bytes.fromhex("58c382d690c8ac")
    odd_me = bytes.fromhex("58c386435cc412")
    f_even = synth.make_df17(0x40621D, even_me)
    f_odd = synth.make_df17(0x40621D, odd_me)
    ch0 = synth.modulate([f_odd, f_even], [400, 3000], n, seed=42)
    quiet = synth.modulate([], [], n, seed=43)
    iq = np.stack([ch0] + [quiet] * 7)

    results = decode_channels(iq, mesh)
    aircrafts = {}
    for _, off, frame, _ in results[0]:
        handle_aircraft_update(AdsbPacket.from_bytes(frame), aircrafts)
    assert 0x40621D in aircrafts
    geo = aircrafts[0x40621D].geo_position
    assert geo is not None
    assert abs(geo.latitude - 52.25720) < 0.0001
    assert geo.longitude == 3.91937255859375
    assert all(not results[ch] for ch in range(1, 8))
