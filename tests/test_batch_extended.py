"""ExtendedBatchTracker (batched extended-mode host path) must be
semantically identical to the per-packet extended path —
assemble_extended + handle_extended_update, one packet at a time in
offset order — on any mixed-DF stream (PERF_r03 host keep-up, extended
mode). The batched sink fast-paths the dominant ADS-B classes
(ID / airborne position / TC19 velocity) through device-extracted field
arrays and interleaves everything else through the exact per-packet
path, so tracker state and ICAO-cache state must come out IDENTICAL.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airjax.extended import assemble_extended, handle_extended_update
from airjax.io import synth
from airjax.pipeline import decode_iq_block_extended_with_fields
from airjax.protocol import shortframe
from airjax.track.batch import ExtendedBatchTracker
from airjax.track.icao_cache import IcaoCache

ICAOS = [0x7C6B30, 0x40621D, 0xABCDEF, 0x111111, 0x0F00BA]
REF_POS = (-41.3, 174.8)
N = 12000  # fixed capture length: one XLA compile for the whole fuzz
CAP = 256

# Synthetic block timestamps stay far below wall-clock epoch seconds, so
# a stamp >= 1e9 means "untouched Aircraft.__init__ default" (which is
# time.time() and legitimately differs between the two runs).
_SYNTH_T_MAX = 1e9


def _random_frame(rng) -> bytes:
    """One random frame across every class the extended decoder knows:
    batched fast-path classes (DF17/18 ID, airborne position, TC19
    velocity), per-packet fallback MEs (TC0/5-8/20-22/28/31, non-ADS-B
    DF18 CF), DF11 all-calls (plain + interrogated) and AP-addressed
    short/long surveillance frames."""
    icao = ICAOS[rng.integers(len(ICAOS))]
    kind = int(rng.integers(0, 15))
    if kind == 0:
        cs = "".join(chr(ord("A") + rng.integers(26)) for _ in range(6))
        return synth.make_df17(icao, synth.make_id_me(cs))
    if kind in (1, 2):  # airborne position (batched class)
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
    if kind in (3, 4):  # TC19 velocity, all subtypes (batched class)
        subtype = int(rng.choice([1, 1, 2, 3, 4]))
        return synth.make_df17(
            icao,
            synth.make_velocity_me(
                ew_kt=int(rng.integers(-300, 301)),
                ns_kt=int(rng.integers(-300, 301)),
                vertical_rate_fpm=(
                    None if rng.random() < 0.3 else int(rng.integers(-80, 81)) * 64
                ),
                subtype=subtype,
                heading_deg=(None if rng.random() < 0.3 else float(rng.integers(0, 360))),
                airspeed_kt=int(rng.integers(0, 500)),
            ),
        )
    if kind == 5:  # DF18 any CF: ADS-B CFs batch, others fall back
        me_kind = rng.integers(3)
        me = (
            synth.make_id_me("TISB")
            if me_kind == 0
            else synth.make_position_me(
                tc=11, altitude_ft=5000, cpr_lat=93000, cpr_lon=51372, odd=False
            )
            if me_kind == 1
            else synth.make_velocity_me(ew_kt=100, ns_kt=-50, vertical_rate_fpm=640)
        )
        return synth.make_df18(icao, me, cf=int(rng.integers(0, 8)))
    if kind == 6:  # surface position (per-packet fallback)
        return synth.make_df17(
            icao,
            synth.make_surface_me(
                REF_POS[0] + float(rng.uniform(-0.2, 0.2)),
                REF_POS[1] + float(rng.uniform(-0.2, 0.2)),
                odd=bool(rng.integers(2)),
                tc=int(rng.integers(5, 9)),
                speed_kt=float(rng.integers(0, 60)),
                track_deg=float(rng.integers(0, 360)),
            ),
        )
    if kind == 7:  # TC28 status / TC31 opstatus / TC0 no-fix (fallbacks)
        sel = rng.integers(3)
        me = (
            synth.make_status_me(int("".join(str(rng.integers(0, 8)) for _ in range(4))))
            if sel == 0
            else synth.make_opstatus_me()
            if sel == 1
            else bytes([0, 0, int(rng.integers(0, 256)), 0, 0, 0, 0])
        )
        return synth.make_df17(icao, me)
    if kind == 8:  # all-call; half interrogated (cache-gated pass 2)
        return shortframe.make_df11(
            icao, interrogator=int(rng.integers(1, 16)) if rng.random() < 0.5 else 0
        )
    alt = int(rng.integers(0, 2000)) * 25 - 1000
    squawk = int("".join(str(rng.integers(0, 8)) for _ in range(4)))
    if kind == 9:
        return shortframe.make_df0(icao, alt, vs=int(rng.integers(0, 2)))
    if kind == 10:
        return shortframe.make_df16(icao, alt)
    if kind == 11:
        return shortframe.make_df4(icao, alt, fs=int(rng.integers(0, 6)))
    if kind == 12:
        return shortframe.make_df5(icao, squawk)
    if kind == 13:
        if rng.random() < 0.5:
            return shortframe.make_df20(icao, alt)
        return shortframe.make_df21(icao, squawk)
    return shortframe.make_df24(  # Comm-D ELM (per-packet fallback)
        icao, nd=int(rng.integers(0, 16)),
        md=bytes(rng.integers(0, 256, 10, dtype=np.uint8)),
        ke=int(rng.integers(0, 2)),
    )


def _random_capture(rng) -> np.ndarray:
    count = int(rng.integers(2, 9))
    frames, offsets = [], []
    for _ in range(count):
        frame = _random_frame(rng)
        if rng.random() < 0.15:  # corruption: 1-bit recovery + AP interplay
            frame = synth.flip_bit(frame, int(rng.integers(0, 8 * len(frame))))
        frames.append(frame)
        offsets.append(int(rng.integers(0, N - 600)))
    snr = float(rng.uniform(8, 25)) if rng.random() < 0.5 else None
    return synth.modulate(
        frames,
        offsets,
        N,
        snr_db=snr,
        noise_std=float(rng.uniform(10, 120)),
        seed=int(rng.integers(0, 1 << 31)),
    )


def _decode(iq: np.ndarray) -> dict:
    return jax.device_get(
        decode_iq_block_extended_with_fields(jnp.asarray(iq), N - 240, CAP)
    )


_SCALARS = (
    "callsign",
    "altitude",
    "on_ground",
    "ground_speed_kt",
    "track_deg",
    "vertical_rate_fpm",
    "squawk",
    "emergency_state",
    "adsb_version",
    "selected_altitude_ft",
    "selected_heading_deg",
    "acas_ra",
    "bds_candidates",
    "gicb_supported",
    "commd_segments",
    "met",
)


def _assert_equal_state(per_pkt: dict, batched: dict) -> None:
    def norm(stash):
        # Non-mutating stash normalization (the trackers stay live across
        # fuzz blocks): msg object or CprStash -> plain (lat, lon) tuple.
        if stash is None or type(stash) is tuple:
            return stash
        return (stash.cpr_latitude, stash.cpr_longitude)

    assert per_pkt.keys() == batched.keys()
    for icao, a in per_pkt.items():
        b = batched[icao]
        for attr in _SCALARS:
            av, bv = getattr(a, attr), getattr(b, attr)
            if isinstance(av, float) and isinstance(bv, float):
                assert math.isclose(av, bv, rel_tol=0, abs_tol=1e-9), (
                    hex(icao), attr, av, bv,
                )
            else:
                assert av == bv, (hex(icao), attr, av, bv)
        # Timestamps: comparable only when a synthetic block time was
        # applied (untouched defaults are wall-clock and differ).
        if a.last_contact < _SYNTH_T_MAX or b.last_contact < _SYNTH_T_MAX:
            assert a.last_contact == b.last_contact, hex(icao)
        for stash, t_attr in (
            ("last_even_packet", "last_even_processed"),
            ("last_odd_packet", "last_odd_processed"),
            ("last_even_surface", "last_even_surface_t"),
            ("last_odd_surface", "last_odd_surface_t"),
        ):
            sa, sb = getattr(a, stash), getattr(b, stash)
            assert (sa is None) == (sb is None), (hex(icao), stash)
            if sa is not None:
                if stash.endswith("_packet"):
                    sa, sb = norm(sa), norm(sb)
                    sa, sb = tuple(sa), tuple(sb)
                assert sa == sb, (hex(icao), stash)
                ta, tb = getattr(a, t_attr), getattr(b, t_attr)
                if ta < _SYNTH_T_MAX or tb < _SYNTH_T_MAX:
                    assert ta == tb, (hex(icao), t_attr)
        ga, gb = a.geo_position, b.geo_position
        assert (ga is None) == (gb is None), hex(icao)
        if ga is not None:
            assert abs(ga.latitude - gb.latitude) < 1e-9, hex(icao)
            assert abs(ga.longitude - gb.longitude) < 1e-9, hex(icao)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_extended_batch_equivalence_fuzz(seed):
    rng = np.random.default_rng(seed)
    per: dict = {}
    cache_p = IcaoCache()
    bt = ExtendedBatchTracker(ref_position=REF_POS)
    cache_b = IcaoCache()
    t = 1000.0
    for _ in range(10):  # 10 blocks; gaps sometimes break CPR/cache windows
        t += float(rng.choice([0.5, 3.0, 11.0, 61.0]))
        out = _decode(_random_capture(rng))
        pkts = assemble_extended(out, t, cache_p)
        for _off, pkt in pkts:
            handle_extended_update(pkt, per, ref_position=REF_POS)
        applied = bt.on_extended_block(out, t, cache_b)
        assert applied == len(pkts)
        assert cache_p._seen == cache_b._seen
        _assert_equal_state(per, bt.aircrafts)


def test_extended_batch_velocity_exact():
    """The batched TC19 branch must reproduce AircraftVelocityMsg.from_me
    + Aircraft.handle_packet exactly, including the no-data encodings and
    the subtype 3/4 (airspeed) frames that update only last_contact."""
    frames = [
        synth.make_df17(
            0x40621D, synth.make_velocity_me(ew_kt=-120, ns_kt=85, vertical_rate_fpm=-832)
        ),
        # supersonic encoding (subtype 2, x4 scale)
        synth.make_df17(
            0xABCDEF,
            synth.make_velocity_me(ew_kt=800, ns_kt=-1200, subtype=2, vertical_rate_fpm=1920),
        ),
        # airspeed subtype: ground velocity must stay None
        synth.make_df17(
            0x111111,
            synth.make_velocity_me(
                subtype=3, heading_deg=270.0, airspeed_kt=444, vertical_rate_fpm=None
            ),
        ),
    ]
    iq = synth.modulate(frames, [500, 3000, 6000], N, seed=9)
    out = _decode(iq)

    per: dict = {}
    for _off, pkt in assemble_extended(out, 100.0, IcaoCache()):
        handle_extended_update(pkt, per, ref_position=REF_POS)
    bt = ExtendedBatchTracker(ref_position=REF_POS)
    assert bt.on_extended_block(out, 100.0, IcaoCache()) == 3
    _assert_equal_state(per, bt.aircrafts)

    a = bt.aircrafts[0x40621D]
    assert a.ground_speed_kt == pytest.approx(math.hypot(-120, 85))
    assert a.track_deg == pytest.approx(math.degrees(math.atan2(-120, 85)) % 360.0)
    assert a.vertical_rate_fpm == -832
    assert bt.aircrafts[0xABCDEF].ground_speed_kt == pytest.approx(math.hypot(800, -1200))
    air = bt.aircrafts[0x111111]
    assert air.ground_speed_kt is None and air.vertical_rate_fpm is None
    assert air.last_contact == 100.0


def test_run_stream_extended_batch_sink_equals_per_packet():
    """run_stream(extended=True) auto-detects the batched sink; stream
    output (stats + tracker state) must match the per-packet sink."""
    from airjax.runner import run_stream

    frames = [
        synth.make_df17(0x7C6B30, synth.make_id_me("EXTBAT")),
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
        synth.make_df17(
            0x7C6B30, synth.make_velocity_me(ew_kt=55, ns_kt=-10, vertical_rate_fpm=640)
        ),
        shortframe.make_df11(0x7C6B30),
        shortframe.make_df4(0x7C6B30, 2675),  # AP frame, cache-gated
    ]
    iq = synth.modulate(frames, [500, 3200, 6000, 8200, 9400, 10400], N, seed=7)

    bt = ExtendedBatchTracker()
    stats_b = run_stream(iter([iq]), bt, overlap=True, extended=True)

    per: dict = {}
    stats_p = run_stream(
        iter([iq]),
        lambda p: handle_extended_update(p, per),
        overlap=True,
        extended=True,
    )
    assert stats_b.good == stats_p.good == 6
    _assert_equal_state(per, bt.aircrafts)
    a = bt.aircrafts[0x7C6B30]
    assert a.callsign == "EXTBAT__"
    assert a.altitude == 2675  # the DF4 surveillance reply applied last
    assert a.ground_speed_kt == pytest.approx(math.hypot(55, -10))
    assert a.geo_position is not None


def test_extended_batch_sink_boundary_straddle_and_regrow():
    """Multi-chunk extended stream through the batched sink: frames
    straddling every chunk boundary decode exactly once and tracker
    state matches the per-packet sink; a small candidate capacity forces
    the adaptive overflow regrow loop through
    decode_iq_block_extended_with_fields."""
    from airjax.config import PipelineConfig
    from airjax.runner import run_stream

    chunk = 4000
    n = 4 * chunk
    mk = lambda i: [
        synth.make_df17(ICAOS[i % len(ICAOS)], synth.make_id_me(f"STRAD{i}")),
        shortframe.make_df11(ICAOS[i % len(ICAOS)]),
        shortframe.make_df4(ICAOS[i % len(ICAOS)], 8000 + 25 * i),
    ][i % 3]
    # Straddle every boundary plus interior frames; the first chunk is
    # packed densely enough (6 frames > capacity 4) to trip the regrow.
    offsets = [100, 700, 1300, 1900, 2500, chunk - 120, chunk + 600,
               2 * chunk - 100, 2 * chunk + 500, 3 * chunk - 60,
               3 * chunk + 900, n - 400]
    frames = [mk(i) for i in range(len(offsets))]
    iq = synth.modulate(frames, offsets, n, seed=11)

    def chunks():
        for i in range(0, n, chunk):
            yield iq[i : i + chunk]

    cfg = PipelineConfig(max_candidates=4)  # forces regrow (8 frames/blk)
    bt = ExtendedBatchTracker()
    stats_b = run_stream(chunks(), bt, cfg=cfg, overlap=True, extended=True)

    per: dict = {}
    stats_p = run_stream(
        chunks(),
        lambda p: handle_extended_update(p, per),
        cfg=cfg,
        overlap=True,
        extended=True,
    )
    # len-1: the DF4 at offset 1300 belongs to an ICAO (0xABCDEF) with
    # no CRC-validated frame in sight, so the acceptance cache gates it
    # off — in BOTH paths.
    assert stats_b.good == stats_p.good == len(offsets) - 1
    assert stats_b.overflow_blocks == stats_p.overflow_blocks >= 1
    _assert_equal_state(per, bt.aircrafts)


def test_min_offset_seeds_cache_without_applying():
    """Slots below min_offset (overlap streams: the padded head) must
    seed the acceptance cache — per-packet parity: assemble_extended
    registers ICAOs in pass 1 even for frames the runner then skips —
    while never touching the tracker."""
    iq = synth.modulate(
        [synth.make_df17(0x40621D, synth.make_id_me("HEADFRM"))], [500], N, seed=13
    )
    out = _decode(iq)
    bt = ExtendedBatchTracker()
    cache = IcaoCache()
    applied = bt.on_extended_block(out, 50.0, cache, min_offset=10_000)
    assert applied == 0
    assert bt.aircrafts == {}
    assert cache.contains(0x40621D, 50.0)
    # A DF4 for that ICAO in the next block is now accepted.
    iq2 = synth.modulate([shortframe.make_df4(0x40621D, 7000)], [500], N, seed=14)
    out2 = _decode(iq2)
    assert bt.on_extended_block(out2, 51.0, cache) == 1
    assert bt.aircrafts[0x40621D].altitude == 7000


@pytest.mark.parametrize("seed", [70, 71, 72])
def test_vectorized_apply_equals_ordered_walk(seed):
    """The vectorized last-wins apply (_vapply, fallback-free blocks) and
    the ordered walk (_walk) are two implementations of the same block
    semantics; force the SAME random blocks through both and require
    identical tracker + cache state. (The fuzz above checks each against
    the per-packet oracle on whichever path a block naturally takes;
    this pins the two internal paths against each other directly.)"""
    rng = np.random.default_rng(seed)
    bt_v = ExtendedBatchTracker(ref_position=REF_POS)
    cache_v = IcaoCache()
    bt_w = ExtendedBatchTracker(ref_position=REF_POS)
    bt_w._force_walk = True
    cache_w = IcaoCache()
    t = 1000.0
    for _ in range(8):
        t += float(rng.choice([0.5, 3.0, 11.0]))
        out = _decode(_random_capture(rng))
        a_v = bt_v.on_extended_block(out, t, cache_v)
        a_w = bt_w.on_extended_block(out, t, cache_w)
        assert a_v == a_w
        assert cache_v._seen == cache_w._seen
        _assert_equal_state(bt_w.aircrafts, bt_v.aircrafts)


@pytest.mark.parametrize("seed", [30, 31])
def test_assemble_with_device_short_fields_matches_host(seed):
    """assemble_extended must produce the IDENTICAL typed packet stream
    whether the per-candidate short-frame fields come from the device
    arrays (production: decode_iq_block_extended_with_fields) or from
    the independent scalar host decode (oracle path: the same dict with
    short_fields removed)."""
    rng = np.random.default_rng(seed)
    for _ in range(6):
        iq = _random_capture(rng)
        out_sf = _decode(iq)
        out_host = {k: v for k, v in out_sf.items() if k != "short_fields"}
        pk_sf = assemble_extended(out_sf, 100.0, IcaoCache())
        pk_host = assemble_extended(out_host, 100.0, IcaoCache())
        assert len(pk_sf) == len(pk_host)
        for (o1, p1), (o2, p2) in zip(pk_sf, pk_host):
            assert o1 == o2
            assert type(p1) is type(p2)
            assert p1 == p2, (o1, p1, p2)


@pytest.mark.parametrize("seed", [50, 51, 52])
def test_run_stream_extended_fuzz_batched_equals_per_packet(seed):
    """Randomized multi-chunk streams (mixed DFs, frames at interior AND
    chunk-boundary offsets, occasional corruption) through run_stream:
    the auto-detected batched sink must leave identical tracker state
    and stats as the per-packet sink — exercising the overlap carry,
    min_offset, capacity regrow and offset-order interleaving together."""
    from airjax.config import PipelineConfig
    from airjax.runner import run_stream

    rng = np.random.default_rng(seed)
    chunk, n_chunks = 4000, 7
    n = chunk * n_chunks
    frames, offsets = [], []
    for b in range(n_chunks):
        for _ in range(int(rng.integers(1, 5))):
            f = _random_frame(rng)
            if rng.random() < 0.1:
                f = synth.flip_bit(f, int(rng.integers(0, 8 * len(f))))
            frames.append(f)
            # Mostly interior; sometimes straddling the next boundary.
            if rng.random() < 0.3 and b < n_chunks - 1:
                offsets.append((b + 1) * chunk - int(rng.integers(20, 200)))
            else:
                offsets.append(b * chunk + int(rng.integers(0, chunk - 300)))
    iq = synth.modulate(frames, offsets, n, seed=seed + 1000)

    def chunks():
        for i in range(0, n, chunk):
            yield iq[i : i + chunk]

    cfg = PipelineConfig(max_candidates=8)  # regrow fires on dense blocks
    bt = ExtendedBatchTracker(ref_position=REF_POS)
    stats_b = run_stream(chunks(), bt, cfg=cfg, overlap=True, extended=True)

    per: dict = {}
    stats_p = run_stream(
        chunks(),
        lambda p: handle_extended_update(p, per, ref_position=REF_POS),
        cfg=cfg,
        overlap=True,
        extended=True,
    )
    assert stats_b.good == stats_p.good
    assert stats_b.detections == stats_p.detections
    assert stats_b.overflow_blocks == stats_p.overflow_blocks
    _assert_equal_state(per, bt.aircrafts)
