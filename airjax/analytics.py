"""Mass-replay analytics: whole-capture decode into per-aircraft tracks.

A capability the reference does not have (its tracker is an online,
one-packet-at-a-time HashMap): decode an entire capture with the batched
device pipeline, extract every protocol field of every frame in ONE
device call (airjax.protocol.fields.extract_fields), pair each position
message with its most recent opposite-parity predecessor (a per-message
host loop — cheap next to the DSP decode, as decoded messages are ~5
orders of magnitude rarer than samples), and decode ALL resulting CPR
pairs at once (airjax.track.cpr_batch). The result is a full
flight-track table, not just the final state.

Time is measured in sample offsets (2 MS/s -> the reference's 10 s CPR
pairing window is 20M samples).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from airjax.config import DEFAULT_CONFIG, PipelineConfig
from airjax.pipeline import decode_capture_overlap
from airjax.protocol.fields import (
    MSG_AIRCRAFT_ID,
    MSG_AIRCRAFT_POSITION,
    callsign_to_str,
    extract_fields,
)

SAMPLE_RATE = 2_000_000.0
CPR_WINDOW_SAMPLES = int(10.0 * SAMPLE_RATE)  # aircraft.rs:68, in samples


@dataclasses.dataclass
class Fix:
    offset: int  # global sample offset of the newest frame of the pair
    latitude: float
    longitude: float
    altitude_ft: int


@dataclasses.dataclass
class Track:
    icao: int
    callsign: str | None
    n_messages: int
    altitudes: list[tuple[int, int]]  # (offset, altitude_ft)
    fixes: list[Fix]


def analyze_capture(
    iq: np.ndarray,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    devices: int | None = None,
) -> tuple[dict[int, Track], dict]:
    """Decode a capture into per-aircraft tracks.

    Returns ({icao: Track}, stats). Positions use the same pairing rule
    as the online tracker (opposite-parity frame within 10 s, newest
    frame decides the formulas) so a fix here matches what the live
    pipeline would have shown at that moment.

    devices=N decodes through the halo-sharded mesh decoder instead of
    the single-device overlap decomposition — identical hit stream
    (both scan every offset exactly once), N-chip throughput.
    """
    if devices is not None:
        from airjax.parallel.halo import decode_capture_sharded
        from airjax.parallel.mesh import make_mesh

        hits, stats = decode_capture_sharded(
            iq, make_mesh(devices), capacity_per_shard=cfg.max_candidates
        )
    else:
        hits, stats = decode_capture_overlap(iq, cfg)
    if not hits:
        return {}, {**stats, "n_aircraft": 0, "n_fixes": 0}

    offsets = np.array([g for _, g, _, _ in hits], dtype=np.int64)
    frames = np.frombuffer(
        b"".join(f for _, _, f, _ in hits), dtype=np.uint8
    ).reshape(len(hits), 14)

    # One batched device call decodes every field of every frame.
    f = jax.device_get(extract_fields(jnp.asarray(frames)))
    icao = f["icao"].astype(np.int64)
    msg_class = f["msg_class"]
    cpr_odd = f["cpr_odd"].astype(bool)
    cpr_lat = f["cpr_lat"].astype(np.int64)
    cpr_lon = f["cpr_lon"].astype(np.int64)
    altitude = f["altitude_ft"]

    tracks: dict[int, Track] = {}
    for a in np.unique(icao):
        tracks[int(a)] = Track(
            icao=int(a), callsign=None, n_messages=0, altitudes=[], fixes=[]
        )
    counts = dict(zip(*np.unique(icao, return_counts=True)))
    for a, c in counts.items():
        tracks[int(a)].n_messages = int(c)

    # Callsigns: last ID message per aircraft wins (tracker semantics).
    id_idx = np.nonzero(msg_class == MSG_AIRCRAFT_ID)[0]
    for k in id_idx:
        tracks[int(icao[k])].callsign = callsign_to_str(f["callsign_codes"][k])

    # Vectorized CPR pairing: for every position message, find the most
    # recent PRIOR opposite-parity position message of the same aircraft.
    pos_idx = np.nonzero(msg_class == MSG_AIRCRAFT_POSITION)[0]
    for k in pos_idx:
        tracks[int(icao[k])].altitudes.append((int(offsets[k]), int(altitude[k])))

    pair_even = []  # (even_lat, even_lon, odd_lat, odd_lon, newest_odd, k)
    by_aircraft: dict[int, list[int]] = {}
    for k in pos_idx:
        by_aircraft.setdefault(int(icao[k]), []).append(int(k))
    for a, ks in by_aircraft.items():
        ks = sorted(ks, key=lambda k: offsets[k])
        last: dict[bool, int] = {}
        for k in ks:
            parity = bool(cpr_odd[k])
            other = last.get(not parity)
            if other is not None and offsets[k] - offsets[other] <= CPR_WINDOW_SAMPLES:
                e, o = (other, k) if parity else (k, other)
                pair_even.append(
                    (cpr_lat[e], cpr_lon[e], cpr_lat[o], cpr_lon[o], parity, k)
                )
            last[parity] = k

    n_fixes = 0
    if pair_even:
        arr = np.array(pair_even, dtype=np.int64)
        lat, lon, valid = _decode_pairs_batch(arr)
        for row, la, lo, ok in zip(pair_even, lat, lon, valid):
            if not ok:
                continue
            k = row[5]
            tracks[int(icao[k])].fixes.append(
                Fix(
                    offset=int(offsets[k]),
                    latitude=float(la),
                    longitude=float(lo),
                    altitude_ft=int(altitude[k]),
                )
            )
            n_fixes += 1

    return tracks, {**stats, "n_aircraft": len(tracks), "n_fixes": n_fixes}


def _decode_pairs_batch(arr: np.ndarray):
    from airjax.track.cpr_batch import decode_pairs

    return decode_pairs(
        arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4].astype(bool)
    )


@dataclasses.dataclass
class ExtendedTrack(Track):
    """Extended-mode track: everything Track has plus the histories only
    the all-formats decode can produce."""

    velocities: list[tuple] = dataclasses.field(default_factory=list)
    # (offset, ground_speed_kt, track_deg, vertical_rate_fpm)
    squawks: list[tuple[int, int]] = dataclasses.field(default_factory=list)
    kinds: dict[str, int] = dataclasses.field(default_factory=dict)
    # packet-kind histogram: AdsbPacket / AllCallReply / SurveillanceReply
    # / AcasReply message counts


def analyze_capture_extended(
    iq: np.ndarray,
    ref_position: tuple[float, float] | None = None,
    capacity_per_shard: int = 2048,
    devices: int | None = None,
) -> tuple[dict[int, "ExtendedTrack"], dict]:
    """Extended-mode replay analytics: every Mode S downlink format.

    Decodes the whole capture through the sharded extended pipeline
    (airjax.parallel.halo.decode_capture_sharded_extended on this
    process's device mesh — a 1-device mesh degenerates to the plain
    block decode), then replays the ordered typed packet stream through
    the live tracker semantics (airjax.extended.handle_extended_update),
    recording per-event history: position fixes (exactly what the online
    tracker would have shown at that offset), velocities, squawks and
    altitudes. Returns ({icao: ExtendedTrack}, stats).
    """
    from airjax.extended import handle_extended_update
    from airjax.parallel.halo import decode_capture_sharded_extended
    from airjax.parallel.mesh import make_mesh
    from airjax.protocol.packet import AdsbPacket, AircraftVelocityMsg

    # make_mesh raises on devices > available (matching the parity
    # path) instead of silently truncating to fewer chips.
    mesh = make_mesh(devices or 1)
    packets, stats = decode_capture_sharded_extended(
        iq, mesh, capacity_per_shard=capacity_per_shard, now=0.0
    )

    aircrafts: dict = {}
    tracks: dict[int, ExtendedTrack] = {}
    n_fixes = 0
    for off, pkt in packets:
        t = tracks.get(pkt.icao)
        if t is None:
            t = tracks[pkt.icao] = ExtendedTrack(
                icao=pkt.icao, callsign=None, n_messages=0, altitudes=[], fixes=[]
            )
        t.n_messages += 1
        kind = type(pkt).__name__
        t.kinds[kind] = t.kinds.get(kind, 0) + 1

        a_prev = aircrafts.get(pkt.icao)
        geo_prev = a_prev.geo_position if a_prev is not None else None
        # New aircraft start at the tracker's altitude-0 default; treat
        # that as the baseline so creation alone logs no altitude event.
        alt_prev = a_prev.altitude if a_prev is not None else 0
        squawk_prev = a_prev.squawk if a_prev is not None else None
        # Offsets are in samples; the tracker's pairing window is in
        # seconds — replay with time = offset / sample rate so the 10 s
        # CPR window means the same 20M samples as the online path.
        handle_extended_update(
            dataclasses.replace(pkt, time_processed=off / SAMPLE_RATE)
            if dataclasses.is_dataclass(pkt)
            else pkt,
            aircrafts,
            ref_position=ref_position,
        )
        a = aircrafts[pkt.icao]
        t.callsign = a.callsign
        if a.altitude != alt_prev:
            t.altitudes.append((off, a.altitude))
        if a.squawk is not None and a.squawk != squawk_prev:
            t.squawks.append((off, a.squawk))
        if a.geo_position is not None and a.geo_position is not geo_prev:
            t.fixes.append(
                Fix(
                    offset=off,
                    latitude=a.geo_position.latitude,
                    longitude=a.geo_position.longitude,
                    altitude_ft=a.altitude,
                )
            )
            n_fixes += 1
        if isinstance(pkt, AdsbPacket) and isinstance(pkt.msg, AircraftVelocityMsg):
            if pkt.msg.ground_speed_kt is not None or pkt.msg.vertical_rate_fpm is not None:
                t.velocities.append(
                    (off, a.ground_speed_kt, a.track_deg, a.vertical_rate_fpm)
                )

    return tracks, {**stats, "n_aircraft": len(tracks), "n_fixes": n_fixes}
