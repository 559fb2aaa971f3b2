"""BatchTracker (batched online host path) must be semantically identical
to the per-packet tracker path on any message sequence (VERDICT r2 item 3:
host keep-up — the batched path is the fix for the measured 4.4x gap)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from airjax.io import synth
from airjax.protocol.fields import extract_fields
from airjax.protocol.packet import AdsbPacket
from airjax.track.aircraft import handle_aircraft_update
from airjax.track.batch import BatchTracker

ICAOS = [0x7C6B30, 0x40621D, 0xABCDEF, 0x111111]


def _random_frame(rng) -> bytes:
    icao = ICAOS[rng.integers(len(ICAOS))]
    kind = rng.integers(4)
    if kind == 0:
        cs = "".join(chr(ord("A") + rng.integers(26)) for _ in range(6))
        return synth.make_df17(icao, synth.make_id_me(cs))
    if kind in (1, 2):
        return synth.make_df17(
            icao,
            synth.make_position_me(
                tc=int(rng.integers(9, 19)),
                altitude_ft=int(rng.integers(0, 1600)) * 25 - 1000,
                cpr_lat=int(rng.integers(0, 1 << 17)),
                cpr_lon=int(rng.integers(0, 1 << 17)),
                odd=bool(rng.integers(2)),
            ),
        )
    # Unknown class (TC5 surface is class-position per reference? No:
    # reference classes TC 9-18 position; TC 20+ unknown). Use TC 28.
    return synth.make_df17(icao, bytes([28 << 3]) + bytes(6))


def _apply_per_packet(frames, times):
    aircrafts = {}
    for fb, t in zip(frames, times):
        handle_aircraft_update(AdsbPacket.from_bytes(fb, t), aircrafts)
    return aircrafts


def _apply_batched(frames, times, chunk=17):
    bt = BatchTracker()
    arr = np.frombuffer(b"".join(frames), np.uint8).reshape(len(frames), 14)
    i = 0
    while i < len(frames):
        # All frames in one batch share one timestamp, like one decode
        # block does; the driver chunks so every chunk is single-time.
        j = i
        while j < len(frames) and times[j] == times[i] and j - i < chunk:
            j += 1
        fields = jax.device_get(extract_fields(jnp.asarray(arr[i:j])))
        bt.on_fields(fields, np.arange(j - i), times[i])
        i = j
    return bt.aircrafts


def _assert_equal_state(per_pkt, batched):
    assert per_pkt.keys() == batched.keys()
    for icao, a in per_pkt.items():
        b = batched[icao]
        assert a.callsign == b.callsign, hex(icao)
        assert a.altitude == b.altitude, hex(icao)
        if a.geo_position is None:
            assert b.geo_position is None, hex(icao)
        else:
            assert b.geo_position is not None, hex(icao)
            assert abs(a.geo_position.latitude - b.geo_position.latitude) < 1e-9
            assert abs(a.geo_position.longitude - b.geo_position.longitude) < 1e-9


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_batch_tracker_equivalence_fuzz(seed):
    rng = np.random.default_rng(seed)
    frames, times = [], []
    t = 1000.0
    for _ in range(12):  # 12 "blocks"
        # Gaps sometimes exceed the 10 s CPR pairing window.
        t += float(rng.choice([0.5, 3.0, 11.0]))
        for _ in range(int(rng.integers(1, 30))):
            frames.append(_random_frame(rng))
            times.append(t)
    _assert_equal_state(
        _apply_per_packet(frames, times), _apply_batched(frames, times)
    )


def test_batch_tracker_textbook_pair():
    f_even = synth.make_df17(
        0x40621D,
        synth.make_position_me(
            tc=11, altitude_ft=38000, cpr_lat=93000, cpr_lon=51372, odd=False
        ),
    )
    f_odd = synth.make_df17(
        0x40621D,
        synth.make_position_me(
            tc=11, altitude_ft=38000, cpr_lat=74158, cpr_lon=50194, odd=True
        ),
    )
    # Odd first, even newest: the textbook 52.25720 is the even-frame
    # latitude (the newest frame picks the formulas).
    frames, times = [f_odd, f_even], [100.0, 101.0]
    per_pkt = _apply_per_packet(frames, times)
    batched = _apply_batched(frames, times)
    _assert_equal_state(per_pkt, batched)
    geo = batched[0x40621D].geo_position
    assert geo is not None and abs(geo.latitude - 52.25720) < 1e-4


def test_run_stream_batch_sink_equals_per_packet():
    from airjax.runner import run_stream

    frames = [
        synth.make_df17(0x7C6B30, synth.make_id_me("BATCH1")),
        synth.make_df17(
            0x7C6B30,
            synth.make_position_me(
                tc=11, altitude_ft=2600, cpr_lat=93000, cpr_lon=51372, odd=False
            ),
        ),
        synth.make_df17(
            0x7C6B30,
            synth.make_position_me(
                tc=11, altitude_ft=2650, cpr_lat=74158, cpr_lon=50194, odd=True
            ),
        ),
    ]
    n = 12000
    iq = synth.modulate(frames, [500, 4500, 9000], n, seed=5)

    bt = BatchTracker()
    stats_b = run_stream(iter([iq]), bt, overlap=True)

    per = {}
    stats_p = run_stream(
        iter([iq]),
        lambda p: handle_aircraft_update(p, per),
        overlap=True,
    )
    assert stats_b.good == stats_p.good == 3
    _assert_equal_state(per, bt.aircrafts)
    assert bt.aircrafts[0x7C6B30].callsign == "BATCH1__"
    assert bt.aircrafts[0x7C6B30].altitude == 2650


def test_batch_sink_eviction():
    bt = BatchTracker(evict_after_s=60.0)
    f = synth.make_df17(
        0x123456,
        synth.make_position_me(
            tc=11, altitude_ft=1000, cpr_lat=1, cpr_lon=2, odd=False
        ),
    )
    arr = np.frombuffer(f, np.uint8).reshape(1, 14)
    fields = jax.device_get(extract_fields(jnp.asarray(arr)))
    bt.on_fields(fields, np.arange(1), 100.0)
    assert 0x123456 in bt.aircrafts
    f2 = synth.make_df17(
        0x654321,
        synth.make_position_me(
            tc=11, altitude_ft=1000, cpr_lat=1, cpr_lon=2, odd=False
        ),
    )
    arr2 = np.frombuffer(f2, np.uint8).reshape(1, 14)
    fields2 = jax.device_get(extract_fields(jnp.asarray(arr2)))
    bt.on_fields(fields2, np.arange(1), 1000.0)
    assert set(bt.aircrafts) == {0x654321}
