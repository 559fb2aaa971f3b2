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

import math
import time
import typing
from typing import Optional

import numpy as np

from airjax.protocol.fields import (
    MSG_AIRCRAFT_ID,
    MSG_AIRCRAFT_POSITION,
    MSG_AIRCRAFT_VELOCITY,
)
from airjax.track.aircraft import Aircraft, CPR_PAIR_MAX_AGE_S
from airjax.track.cpr import GeographicPosition


class CprStash(typing.NamedTuple):
    """Batched-path CPR stash: a tuple (so batch-path code can unpack it)
    that also exposes the AircraftPositionMsg attribute names, so a later
    per-packet update on the same aircraft (extended-mode fallback classes
    route through Aircraft.handle_packet) can pair against it."""

    cpr_latitude: int
    cpr_longitude: int


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
        # Optional per-block hook: called with the set of ICAOs whose
        # aircraft were touched by the block just applied (UI sinks
        # broadcast one summary per touched aircraft per block instead
        # of one per message — see airjax.ui.web.WebDisplay.batched_sink).
        self.on_applied: Optional[callable] = None

    # --- per-packet fallback (so the sink is drop-in for run_stream) ---
    def __call__(self, packet) -> None:
        from airjax.extended import handle_extended_update

        handle_extended_update(
            packet,
            self.aircrafts,
            ref_position=getattr(self, "ref_position", None),
        )
        self.n_messages += 1
        if self.evict_after_s is not None:
            from airjax.track.aircraft import evict_stale

            evict_stale(
                self.aircrafts, self.evict_after_s, now=packet.time_processed
            )
        if self.on_applied is not None:
            self.on_applied({packet.icao})

    # --- the batched path ---
    def on_fields(self, fields: dict, idx: np.ndarray, now: float) -> int:
        """Apply `idx`-selected frames of a block's field arrays.

        `fields` is the device-fetched dict of
        airjax.protocol.fields.extract_fields; `idx` selects the
        CRC-validated slots in ascending offset (stream) order.
        Returns the number of messages applied. Parity (DF17) classing;
        the extended-mode block path is ExtendedBatchTracker's
        on_extended_block, which drives _field_lists/_apply directly.
        """
        if len(idx) == 0:
            return 0
        L = self._field_lists(fields, idx, extended=False)
        pair_jobs: list[tuple] = []
        self._apply(L, range(len(idx)), now, pair_jobs)
        self._resolve_pairs(pair_jobs)
        if self.evict_after_s is not None:
            from airjax.track.aircraft import evict_stale

            evict_stale(self.aircrafts, self.evict_after_s, now=now)
        self.n_messages += len(idx)
        if self.on_applied is not None:
            self.on_applied(set(L["icao"]))
        return len(idx)

    @staticmethod
    def _field_lists(fields: dict, sel, extended: bool) -> dict:
        """Subset (by index array or slice) then convert the field arrays
        to python lists once: python-list iteration is ~10x faster than
        per-element numpy scalar indexing in the _apply loop."""

        def take(key):
            return np.asarray(fields[key])[sel].tolist()

        L = {
            "icao": take("icao"),
            "cls": take("msg_class_ext" if extended else "msg_class"),
            "alt": take("altitude_ft"),
            "odd": take("cpr_odd"),
            "clat": take("cpr_lat"),
            "clon": take("cpr_lon"),
            "codes": np.asarray(fields["callsign_codes"])[sel],
        }
        if extended:
            for short, key in (
                ("vst", "vel_subtype"),
                ("vsa", "vel_sign_a"),
                ("vva", "vel_val_a"),
                ("vsb", "vel_sign_b"),
                ("vvb", "vel_val_b"),
                ("vrs", "vel_vr_sign"),
                ("vrv", "vel_vr_val"),
            ):
                L[short] = take(key)
        return L

    def _apply(
        self, L: dict, indices, now: float, pair_jobs: list
    ) -> None:
        """Apply the messages at `indices` (positions into L's lists).
        Position pair decodes are APPENDED to pair_jobs, not resolved —
        the caller batches them through one vectorized decode_pairs call
        (_resolve_pairs); per-call fixed overhead on 1-2-pair batches
        measured 2x slower than the whole per-packet path otherwise.
        The velocity branch is unreachable for parity-mode L (msg_class
        never carries MSG_AIRCRAFT_VELOCITY), so the vel lists may be
        absent there."""
        aircrafts = self.aircrafts
        icao_l, cls_l = L["icao"], L["cls"]
        alt_l, odd_l, clat_l, clon_l = L["alt"], L["odd"], L["clat"], L["clon"]
        codes = L["codes"]
        for i in indices:
            icao, cls = icao_l[i], cls_l[i]
            a = aircrafts.get(icao)
            if a is None:
                a = aircrafts[icao] = Aircraft(icao)
            if cls == MSG_AIRCRAFT_POSITION:
                a.altitude = alt_l[i]
                a.last_contact = now
                a.on_ground = False
                lat, lon = clat_l[i], clon_l[i]
                if odd_l[i]:
                    a.last_odd_packet = CprStash(lat, lon)
                    a.last_odd_processed = now
                    other, other_t = a.last_even_packet, a.last_even_processed
                    newest_odd = True
                else:
                    a.last_even_packet = CprStash(lat, lon)
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
            elif cls == MSG_AIRCRAFT_VELOCITY:
                # Exact AircraftVelocityMsg.from_me ground-velocity +
                # vertical-rate math (packet.py:208-253) on the raw
                # device-extracted integers.
                a.last_contact = now
                st = L["vst"][i]
                if st in (1, 2):
                    va, vb = L["vva"][i], L["vvb"][i]
                    if va != 0 and vb != 0:
                        scale = 4 if st == 2 else 1
                        vx = (va - 1) * scale * (-1 if L["vsa"][i] else 1)
                        vy = (vb - 1) * scale * (-1 if L["vsb"][i] else 1)
                        a.ground_speed_kt = math.hypot(vx, vy)
                        a.track_deg = math.degrees(math.atan2(vx, vy)) % 360.0
                vr = L["vrv"][i]
                if vr != 0:
                    a.vertical_rate_fpm = (vr - 1) * 64 * (-1 if L["vrs"][i] else 1)
            # Unknown: upsert only (src/adsb/aircraft.rs:107-109).

    def _resolve_pairs(self, pair_jobs: list) -> None:
        """One vectorized CPR decode for a batch of
        (e_lat, e_lon, o_lat, o_lon, newest_odd, icao) jobs, applied in
        order (a later failed pairing leaves the earlier position, like
        the per-packet path)."""
        if not pair_jobs:
            return
        from airjax.track.cpr_batch import decode_pairs

        arr = np.asarray([j[:4] for j in pair_jobs], dtype=np.int64)
        newest = np.asarray([j[4] for j in pair_jobs], dtype=bool)
        lat, lon, valid = decode_pairs(
            arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], newest
        )
        aircrafts = self.aircrafts
        for j, la, lo, ok in zip(pair_jobs, lat, lon, valid):
            if ok:
                aircrafts[j[5]].geo_position = GeographicPosition(
                    float(la), float(lo)
                )


class ExtendedBatchTracker(BatchTracker):
    """Extended-mode batched sink: a whole extended decode block's frames
    in one `on_extended_block` call.

    The batched fast path covers the dominant message classes — ADS-B
    AircraftID (TC1-4), airborne position (TC9-18) and velocity (TC19)
    from DF17 / DF18 CF 0,1,2,5,6 / DF19 AF 0 — via the device-extracted
    field arrays; everything else (TC0/5-8/20-22/28/29/31, non-ADS-B ME,
    DF11 all-calls, cache-gated AP candidates) falls back to the exact
    per-packet path. Fallbacks are interleaved with batched runs in
    ascending offset order, so the tracker state is IDENTICAL to feeding
    assemble_extended's sorted packet list through
    handle_extended_update one at a time (fuzzed in
    tests/test_batch_extended.py).
    """

    def __init__(
        self,
        evict_after_s: Optional[float] = None,
        ref_position: Optional[tuple] = None,
    ):
        super().__init__(evict_after_s)
        self.ref_position = ref_position

    def on_extended_block(
        self, out: dict, now: float, cache, min_offset: int | None = None
    ) -> int:
        """Apply one extended device dict (must carry `fields`,
        i.e. produced by decode_iq_block_extended_with_fields). `cache`
        is the stream's IcaoCache. Returns messages applied.

        `min_offset` (overlap streams: the zero-padded head of the very
        first block) suppresses APPLICATION of any slot below it while
        still seeding the acceptance cache with its ICAO — exactly the
        per-packet path's split, where assemble_extended registers ICAOs
        in pass 1 and the runner skips only the emission.

        CPR pair decodes are deferred across batched runs and resolved in
        ONE vectorized call at block end; a fallback packet whose ICAO has
        a deferred pair pending forces that aircraft's pairs to resolve
        first, so geo_position writes still land in strict offset order
        (a later fallback surface/GNSS fix must win over an earlier
        deferred airborne pair, and vice versa)."""
        from airjax.extended import assemble_ap_candidates, handle_extended_update
        from airjax.protocol.packet import (
            DF18_ADSB_CF,
            DF19_ADSB_AF,
            AdsbPacket,
            AircraftPositionMsg,
            SurfacePositionMsg,
        )
        from airjax.track.aircraft import Aircraft

        good_long = np.asarray(out["good_long"])
        good_df11 = np.asarray(out["good_df11"])
        k_pass1 = np.nonzero(good_long | good_df11)[0]
        fields = out["fields"]
        frames = np.asarray(out["frames"])
        frames_raw = np.asarray(out["frames_raw"])
        offsets = np.asarray(out["offsets"])

        # Pass-1-subset python lists once (per-element numpy scalar
        # indexing in the walk below measured ~10x slower; subsetting by
        # k_pass1 keeps the conversion O(validated frames), not
        # O(detections) — noise detections can fill the whole capacity).
        k1_l = k_pass1.tolist()
        gl_l = good_long[k_pass1].tolist()
        off1_l = offsets[k_pass1].tolist()
        df_l = np.asarray(fields["df"])[k_pass1].tolist()
        sub_l = np.asarray(fields["subformat"])[k_pass1].tolist()
        cls_l = np.asarray(fields["msg_class_ext"])[k_pass1].tolist()
        raw_icao = (
            (frames_raw[k_pass1, 1].astype(np.int64) << 16)
            | (frames_raw[k_pass1, 2].astype(np.int64) << 8)
            | frames_raw[k_pass1, 3]
        )
        icao1_l = np.where(
            good_long[k_pass1], np.asarray(fields["icao"])[k_pass1], raw_icao
        ).tolist()

        # Seed the acceptance cache with every pass-1 ICAO first (same
        # visibility as assemble_extended: pass 2 gating sees the whole
        # block's validated addresses).
        for ic in icao1_l:
            cache.add(ic, now)
        pass2 = assemble_ap_candidates(out, now, cache)
        if min_offset is not None:
            pass2 = [t for t in pass2 if t[0] >= min_offset]

        L = self._field_lists(fields, k_pass1, True) if len(k_pass1) else None
        aircrafts = self.aircrafts
        applied = 0
        touched: set[int] = set()  # ICAOs actually applied (on_applied)
        run: list[int] = []  # k_pass1-subset positions into L
        pending: list[tuple] = []  # deferred pair jobs (…, icao)
        pending_icaos: set[int] = set()

        def flush_run() -> None:
            nonlocal applied
            if run:
                before = len(pending)
                touched.update(L["icao"][k] for k in run)
                self._apply(L, run, now, pending)
                applied += len(run)
                for j in pending[before:]:
                    pending_icaos.add(j[5])
                run.clear()

        def apply_fallback(pkt) -> None:
            nonlocal pending, applied
            # Only a position-carrying AdsbPacket can write geo_position;
            # every other fallback kind (AllCall/Surveillance/Acas
            # replies, status/velocity/unknown MEs) commutes with the
            # deferred pair decodes.
            if (
                pkt.icao in pending_icaos
                and isinstance(pkt, AdsbPacket)
                and isinstance(pkt.msg, (AircraftPositionMsg, SurfacePositionMsg))
            ):
                mine = [j for j in pending if j[5] == pkt.icao]
                pending = [j for j in pending if j[5] != pkt.icao]
                pending_icaos.discard(pkt.icao)
                self._resolve_pairs(mine)
            handle_extended_update(
                pkt, aircrafts, ref_position=self.ref_position
            )
            touched.add(pkt.icao)
            applied += 1

        # Merge-walk pass-1 slots and pass-2 packets in ascending offset
        # order (exactly assemble_extended's sorted emission order).
        p2, n2 = 0, len(pass2)
        for j1 in range(len(k1_l)):
            off = off1_l[j1]
            while p2 < n2 and pass2[p2][0] < off:
                flush_run()
                apply_fallback(pass2[p2][1])
                p2 += 1
            if min_offset is not None and off < min_offset:
                continue  # cache-seeded above, but never applied
            if gl_l[j1]:
                d, s = df_l[j1], sub_l[j1]
                adsb_me = (
                    d == 17
                    or (d == 18 and s in DF18_ADSB_CF)
                    or (d == 19 and s in DF19_ADSB_AF)
                )
                if adsb_me and cls_l[j1] in (
                    MSG_AIRCRAFT_ID,
                    MSG_AIRCRAFT_POSITION,
                    MSG_AIRCRAFT_VELOCITY,
                ):
                    run.append(j1)
                    continue
                flush_run()
                apply_fallback(
                    AdsbPacket.from_bytes(
                        frames[k1_l[j1]].tobytes(), now, extensions=True
                    )
                )
            else:  # DF11 all-call: upsert + last_contact (extended.py)
                flush_run()  # keep dict insertion order == offset order
                a = aircrafts.setdefault(icao1_l[j1], Aircraft(icao1_l[j1]))
                a.last_contact = now
                touched.add(icao1_l[j1])
                applied += 1
        flush_run()
        for _off, pkt in pass2[p2:]:
            apply_fallback(pkt)
        self._resolve_pairs(pending)

        if self.evict_after_s is not None:
            from airjax.track.aircraft import evict_stale

            evict_stale(aircrafts, self.evict_after_s, now=now)
        self.n_messages += applied
        if self.on_applied is not None and applied:
            self.on_applied(touched)
        return applied


def locked_sink(inner, lock, extended: bool = False):
    """Wrap a (Extended)BatchTracker so every tracker mutation happens
    under `lock` — the UI sinks (web server's HTTP snapshot, the TUI's
    render loop) read the shared aircraft table from another thread.
    The wrapper exposes exactly the interfaces run_stream auto-detects:
    __call__ (per-packet fallback), on_fields, and (extended only)
    on_extended_block. `inner.on_applied` callbacks run WITH the lock
    held — they must not re-acquire it."""

    class LockedSink:
        aircrafts = inner.aircrafts
        tracker = inner

        def __call__(self, packet):
            with lock:
                inner(packet)

        def on_fields(self, *a, **k):
            with lock:
                return inner.on_fields(*a, **k)

        if extended:

            def on_extended_block(self, *a, **k):
                with lock:
                    return inner.on_extended_block(*a, **k)

    return LockedSink()


def build_batched_sink(
    aircrafts: dict,
    lock,
    extended: bool = False,
    evict_after_s: Optional[float] = None,
    ref_position=None,
):
    """Shared construction recipe for the UI batched sinks (TUI, web):
    pick the tracker class by `extended`, share the caller's aircraft
    table, and wrap in locked_sink. Returns (sink, tracker); callers
    set `tracker.on_applied` afterwards (it is read at call time, so
    assignment after wrapping is safe)."""
    if extended:
        tracker = ExtendedBatchTracker(
            evict_after_s=evict_after_s, ref_position=ref_position
        )
    else:
        tracker = BatchTracker(evict_after_s=evict_after_s)
    tracker.aircrafts = aircrafts
    return locked_sink(tracker, lock, extended=extended), tracker


def mirror_stash(aircraft: Aircraft) -> None:
    """Per-packet Aircraft stashes AircraftPositionMsg objects; BatchTracker
    stashes (cpr_lat, cpr_lon) tuples. Both pair identically — this helper
    exists only so equivalence tests can normalize before comparing."""
    for attr in ("last_even_packet", "last_odd_packet"):
        v = getattr(aircraft, attr)
        if v is not None and not isinstance(v, tuple):
            setattr(aircraft, attr, (v.cpr_latitude, v.cpr_longitude))
