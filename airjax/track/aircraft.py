"""ICAO-keyed aircraft state tracking (mirrors src/adsb/aircraft.rs).

Position messages update altitude, stash the even/odd CPR frame, and — if an
opposite-parity frame arrived within the last 10 seconds
(src/adsb/aircraft.rs:68,84) — run the CPR global decode. ID messages set the
callsign. This is host-side state (a hash map of mutable aircraft), exactly
the part of the reference that does not belong on a TPU.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

from airjax.protocol.packet import (
    AdsbPacket,
    AircraftId,
    AircraftPositionMsg,
    AircraftVelocityMsg,
    CprFormat,
)
from airjax.track.cpr import GeographicPosition, calculate_geographic_position

CPR_PAIR_MAX_AGE_S = 10.0  # src/adsb/aircraft.rs:68


@dataclasses.dataclass
class AircraftSummary:
    """Display view of one aircraft (src/adsb/aircraft.rs:17-23).

    `to_json()` emits the camelCase schema of bindings/AircraftSummary.ts so
    the reference web frontend could connect unmodified.
    """

    icao: int
    callsign: str
    altitude: int
    geo_position: Optional[GeographicPosition]
    last_contact: int  # epoch seconds
    # Extension fields (extended mode only; None in parity mode).
    ground_speed_kt: Optional[float] = None
    track_deg: Optional[float] = None
    vertical_rate_fpm: Optional[int] = None
    squawk: Optional[int] = None

    def to_json(self, extended: bool = False) -> dict:
        out = {
            "icao": self.icao,
            "callsign": self.callsign,
            "altitude": self.altitude,
            "geoPosition": (
                self.geo_position.to_json() if self.geo_position else None
            ),
            "lastContact": self.last_contact,
        }
        if extended:
            # Extra keys beyond bindings/AircraftSummary.ts — only emitted
            # in extended mode so the default WS schema stays reference-
            # exact (unknown keys are ignored by the reference frontend
            # anyway, but parity mode shouldn't rely on that).
            out["groundSpeedKt"] = self.ground_speed_kt
            out["trackDeg"] = self.track_deg
            out["verticalRateFpm"] = self.vertical_rate_fpm
            out["squawk"] = self.squawk
        return out


class Aircraft:
    """Per-ICAO mutable state (src/adsb/aircraft.rs:27-150)."""

    def __init__(self, icao: int):
        now = time.time()
        self.icao = icao
        self.callsign: Optional[str] = None
        self.squawk: Optional[int] = None  # extension (DF5/21 identity)
        # Extension (TC19 velocity; the reference never decodes velocity
        # and its TUI column is hardwired "n/a", src/adsb/tui.rs:77).
        self.ground_speed_kt: Optional[float] = None
        self.track_deg: Optional[float] = None
        self.vertical_rate_fpm: Optional[int] = None
        self.altitude = 0
        self.geo_position: Optional[GeographicPosition] = None
        self.last_contact = now
        self.last_odd_packet: Optional[AircraftPositionMsg] = None
        self.last_odd_processed = now
        self.last_even_packet: Optional[AircraftPositionMsg] = None
        self.last_even_processed = now

    def handle_packet(self, msg: AdsbPacket) -> None:
        if msg.icao != self.icao:
            return

        if isinstance(msg.msg, AircraftPositionMsg):
            pos = msg.msg
            self.altitude = pos.altitude
            self.last_contact = msg.time_processed

            if pos.cpr_format is CprFormat.EVEN:
                self.last_even_packet = pos
                self.last_even_processed = msg.time_processed
                if self.last_odd_packet is None:
                    return
                if abs(msg.time_processed - self.last_odd_processed) > CPR_PAIR_MAX_AGE_S:
                    return
                cpr_even = (pos.cpr_latitude, pos.cpr_longitude)
                cpr_odd = (
                    self.last_odd_packet.cpr_latitude,
                    self.last_odd_packet.cpr_longitude,
                )
                first = CprFormat.ODD
            else:
                self.last_odd_packet = pos
                self.last_odd_processed = msg.time_processed
                if self.last_even_packet is None:
                    return
                if abs(msg.time_processed - self.last_even_processed) > CPR_PAIR_MAX_AGE_S:
                    return
                cpr_odd = (pos.cpr_latitude, pos.cpr_longitude)
                cpr_even = (
                    self.last_even_packet.cpr_latitude,
                    self.last_even_packet.cpr_longitude,
                )
                first = CprFormat.EVEN

            geo = calculate_geographic_position(cpr_even, cpr_odd, first)
            if geo is not None:
                self.geo_position = geo
        elif isinstance(msg.msg, AircraftId):
            self.callsign = msg.msg.callsign
        elif isinstance(msg.msg, AircraftVelocityMsg):
            # Extension: only reachable in extended mode (parity-mode
            # packets never carry this type).
            vel = msg.msg
            self.last_contact = msg.time_processed
            if vel.ground_speed_kt is not None:
                self.ground_speed_kt = vel.ground_speed_kt
                self.track_deg = vel.track_deg
            if vel.vertical_rate_fpm is not None:
                self.vertical_rate_fpm = vel.vertical_rate_fpm
        # Unknown messages: ignored (src/adsb/aircraft.rs:107-109)

    def get_callsign(self) -> str:
        return self.callsign or ""

    def get_age(self) -> int:
        return int(time.time() - self.last_contact)

    def get_summary(self) -> AircraftSummary:
        return AircraftSummary(
            icao=self.icao,
            callsign=self.get_callsign(),
            altitude=self.altitude,
            geo_position=self.geo_position,
            last_contact=int(self.last_contact),
            ground_speed_kt=self.ground_speed_kt,
            track_deg=self.track_deg,
            vertical_rate_fpm=self.vertical_rate_fpm,
            squawk=self.squawk,
        )


def handle_aircraft_update(
    packet: AdsbPacket, aircrafts: dict[int, Aircraft]
) -> Aircraft:
    """Upsert-and-update (src/adsb/aircraft.rs:158-165)."""
    aircraft = aircrafts.setdefault(packet.icao, Aircraft(packet.icao))
    aircraft.handle_packet(packet)
    return aircraft
