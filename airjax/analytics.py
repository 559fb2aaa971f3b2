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
    iq: np.ndarray, cfg: PipelineConfig = DEFAULT_CONFIG
) -> tuple[dict[int, Track], dict]:
    """Decode a capture into per-aircraft tracks.

    Returns ({icao: Track}, stats). Positions use the same pairing rule
    as the online tracker (opposite-parity frame within 10 s, newest
    frame decides the formulas) so a fix here matches what the live
    pipeline would have shown at that moment.
    """
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
