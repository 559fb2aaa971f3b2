"""Batched online tracker: a whole decode block's frames in one update.

The per-packet host path (AdsbPacket.from_bytes + handle_aircraft_update
per frame — the shape of the reference's thread-3 consumer,
src/adsb.rs:149-167) measures ~114k msgs/s on this host, 4.4x short of the
device's ~500k decoded msgs/s (tools/bench_host.py, PERF_r03). This sink
closes the gap: protocol fields are extracted on-device in the same jitted
program as the decode (airjax.pipeline.decode_iq_block_with_fields), the
per-frame host work shrinks to a few dict/attribute operations, and all
CPR pair decodes of a block run through the vectorized
airjax.track.cpr_batch at once.

Semantics are EXACTLY the per-packet tracker's (parity scope: the DF17
pipeline's AircraftID / AircraftPosition / Unknown classes,
src/adsb/aircraft.rs:48-111) — equivalence is fuzz-tested in
tests/test_batch_tracker.py:

  * every validated frame upserts its ICAO (even Unknown class);
  * ID messages set the callsign (and nothing else — not last_contact);
  * position messages set altitude + last_contact, stash by CPR parity,
    and pair with an opposite-parity stash <= 10 s old (the newest frame
    picks the formulas; NL-gate failures leave the position unchanged).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from airjax.protocol.fields import (
    MSG_AIRCRAFT_ID,
    MSG_AIRCRAFT_POSITION,
)
from airjax.track.aircraft import Aircraft, CPR_PAIR_MAX_AGE_S
from airjax.track.cpr import GeographicPosition


class BatchTracker:
    """Tracker sink consuming (fields, indices, timestamp) per block.

    Exposes the same `aircrafts` dict of Aircraft objects as the
    per-packet path, so UIs / checkpointing work unchanged. Also usable
    as a plain per-packet sink via __call__ (falls back to the classic
    path for odd callers), but its point is `on_fields`.
    """

    def __init__(self, evict_after_s: Optional[float] = None):
        self.aircrafts: dict[int, Aircraft] = {}
        self.evict_after_s = evict_after_s
        self.n_messages = 0

    # --- per-packet fallback (so the sink is drop-in for run_stream) ---
    def __call__(self, packet) -> None:
        from airjax.extended import handle_extended_update

        handle_extended_update(packet, self.aircrafts)
        self.n_messages += 1

    # --- the batched path ---
    def on_fields(self, fields: dict, idx: np.ndarray, now: float) -> int:
        """Apply `idx`-selected frames of a block's field arrays.

        `fields` is the device-fetched dict of
        airjax.protocol.fields.extract_fields; `idx` selects the
        CRC-validated slots in ascending offset (stream) order.
        Returns the number of messages applied.
        """
        if len(idx) == 0:
            return 0
        # Subset then convert once: python-list iteration is ~10x faster
        # than per-element numpy scalar indexing in this loop.
        icao_l = np.asarray(fields["icao"])[idx].tolist()
        cls_l = np.asarray(fields["msg_class"])[idx].tolist()
        alt_l = np.asarray(fields["altitude_ft"])[idx].tolist()
        odd_l = np.asarray(fields["cpr_odd"])[idx].tolist()
        clat_l = np.asarray(fields["cpr_lat"])[idx].tolist()
        clon_l = np.asarray(fields["cpr_lon"])[idx].tolist()
        codes = np.asarray(fields["callsign_codes"])[idx]

        aircrafts = self.aircrafts
        pair_jobs: list[tuple] = []  # (e_lat,e_lon,o_lat,o_lon,newest_odd,icao)
        for i, (icao, cls) in enumerate(zip(icao_l, cls_l)):
            a = aircrafts.get(icao)
            if a is None:
                a = aircrafts[icao] = Aircraft(icao)
            if cls == MSG_AIRCRAFT_POSITION:
                a.altitude = alt_l[i]
                a.last_contact = now
                a.on_ground = False
                lat, lon = clat_l[i], clon_l[i]
                if odd_l[i]:
                    a.last_odd_packet = (lat, lon)
                    a.last_odd_processed = now
                    other, other_t = a.last_even_packet, a.last_even_processed
                    newest_odd = True
                else:
                    a.last_even_packet = (lat, lon)
                    a.last_even_processed = now
                    other, other_t = a.last_odd_packet, a.last_odd_processed
                    newest_odd = False
                if other is not None and not isinstance(other, tuple):
                    # A per-packet update (__call__) stashed a message
                    # object; normalize so mixed use keeps pairing.
                    other = (other.cpr_latitude, other.cpr_longitude)
                if other is not None and abs(now - other_t) <= CPR_PAIR_MAX_AGE_S:
                    o_lat, o_lon = (
                        other if not newest_odd else (lat, lon)
                    )
                    e_lat, e_lon = (
                        other if newest_odd else (lat, lon)
                    )
                    pair_jobs.append(
                        (e_lat, e_lon, o_lat, o_lon, newest_odd, icao)
                    )
            elif cls == MSG_AIRCRAFT_ID:
                a.callsign = bytes(codes[i]).decode("ascii")
            # Unknown: upsert only (src/adsb/aircraft.rs:107-109).

        if pair_jobs:
            from airjax.track.cpr_batch import decode_pairs

            arr = np.asarray([j[:4] for j in pair_jobs], dtype=np.int64)
            newest = np.asarray([j[4] for j in pair_jobs], dtype=bool)
            lat, lon, valid = decode_pairs(
                arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], newest
            )
            for j, la, lo, ok in zip(pair_jobs, lat, lon, valid):
                if ok:
                    aircrafts[j[5]].geo_position = GeographicPosition(
                        float(la), float(lo)
                    )

        if self.evict_after_s is not None:
            from airjax.track.aircraft import evict_stale

            evict_stale(aircrafts, self.evict_after_s, now=now)
        self.n_messages += len(idx)
        return len(idx)


def mirror_stash(aircraft: Aircraft) -> None:
    """Per-packet Aircraft stashes AircraftPositionMsg objects; BatchTracker
    stashes (cpr_lat, cpr_lon) tuples. Both pair identically — this helper
    exists only so equivalence tests can normalize before comparing."""
    for attr in ("last_even_packet", "last_odd_packet"):
        v = getattr(aircraft, attr)
        if v is not None and not isinstance(v, tuple):
            setattr(aircraft, attr, (v.cpr_latitude, v.cpr_longitude))
