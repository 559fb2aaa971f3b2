"""Host-side ADS-B packet model (mirrors src/adsb/packet.rs, msgs.rs).

The TPU pipeline hands decoded 14-byte frames to the host; this module turns
them into typed packet objects for tracking and display, with a `format()`
that replicates the reference's `Display` output (src/adsb/packet.rs:77-99,
src/adsb/msgs.rs:127-139,215-222) character for character (timestamps aside).
"""

from __future__ import annotations

import dataclasses
import datetime
import enum
import time
from typing import Optional, Union

from airjax.protocol.fields import CHAR_CONVERT as _CHAR_CONVERT


class CprFormat(enum.Enum):
    EVEN = 0
    ODD = 1


def _to_6bit_chunks(data: bytes) -> list[int]:
    """MSB-first 6-bit chunking (src/adsb/msgs.rs:150-170)."""
    out = []
    acc = 0
    bits = 0
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= 6:
            bits -= 6
            out.append((acc >> bits) & 0x3F)
    if bits > 0:
        out.append((acc << (6 - bits)) & 0x3F)
    return out


@dataclasses.dataclass
class UnknownMsg:
    raw_msg: bytes

    def format(self) -> str:
        raw = ", ".join(str(b) for b in self.raw_msg)
        return f"Message:\nType    : Unknown\nRaw Msg :  [{raw}]\n"


@dataclasses.dataclass
class AircraftId:
    msg_type: int
    callsign: str

    @classmethod
    def from_me(cls, me: bytes) -> "AircraftId":
        # src/adsb/msgs.rs:180-201
        chunks = _to_6bit_chunks(me[1:7])
        callsign = "".join(_CHAR_CONVERT[c] for c in chunks)
        return cls(msg_type=(me[0] & 0xF8) >> 3, callsign=callsign)

    def format(self) -> str:
        return (
            "Message:\n"
            f"Type                : {self.msg_type} (ID)\n"
            f"Callsign            : {self.callsign}\n"
        )


@dataclasses.dataclass
class AircraftPositionMsg:
    msg_type: int
    surveillance_status: int
    nic_supplement: int
    altitude: int  # feet
    cpr_time: int
    cpr_format: CprFormat
    cpr_latitude: int
    cpr_longitude: int

    @classmethod
    def from_me(cls, me: bytes) -> "AircraftPositionMsg":
        # src/adsb/msgs.rs:70-101
        alt_mode_25 = (me[1] & 1) == 1
        altitude = (((me[1] & 0xFE) >> 1) << 4) | ((me[2] & 0xF0) >> 4)
        altitude *= 25 if alt_mode_25 else 100
        altitude -= 1000
        return cls(
            msg_type=(me[0] & 0xF8) >> 3,
            surveillance_status=(me[0] & 0b110) >> 1,
            nic_supplement=me[0] & 1,
            altitude=altitude,
            cpr_time=(me[2] & 0b1000) >> 3,
            cpr_format=CprFormat.ODD if (me[2] & 0b100) >> 2 else CprFormat.EVEN,
            cpr_latitude=((me[2] & 0b11) << 15)
            | (me[3] << 7)
            | ((me[4] & 0xFE) >> 1),
            cpr_longitude=((me[4] & 1) << 16) | (me[5] << 8) | me[6],
        )

    def format(self) -> str:
        fmt = "Odd" if self.cpr_format is CprFormat.ODD else "Even"
        return (
            "Message:\n"
            f"Type                : {self.msg_type} (Position)\n"
            f"Surveillance Status : {self.surveillance_status}\n"
            f"NIC Supplement      : {self.nic_supplement}\n"
            f"Altitude (ft)       : {self.altitude}\n"
            f"CPR Time            : {self.cpr_time}\n"
            f"CPR Format          : {fmt}\n"
            f"Raw Latitude        : {self.cpr_latitude}\n"
            f"Raw Longitude       : {self.cpr_longitude}\n"
        )


AdsbMsg = Union[AircraftId, AircraftPositionMsg, UnknownMsg]


# --- Extension: non-DF17 Mode S frames (see airjax.protocol.shortframe;
# the reference decodes only DF17) ---


@dataclasses.dataclass
class AllCallReply:
    """DF11 all-call reply (56-bit)."""

    icao: int
    capability: int
    time_processed: float

    def format(self) -> str:
        return (
            "== DF11 all-call ==\n"
            f"ICAO            : {self.icao:06X}\n"
            f"Capability      : {self.capability}\n"
        )


@dataclasses.dataclass
class SurveillanceReply:
    """DF4/5 (56-bit) or DF20/21 (112-bit Comm-B) surveillance reply.

    AP-addressed: the ICAO comes from the parity overlay and is only
    trusted because it matched a recently validated aircraft.
    """

    df: int
    icao: int
    flight_status: int
    altitude_ft: Optional[int]  # DF4/20 (None if AC13 not Q=1 metric)
    squawk: Optional[int]  # DF5/21
    time_processed: float

    def format(self) -> str:
        lines = [
            f"== DF{self.df} surveillance ==",
            f"ICAO            : {self.icao:06X}",
            f"Flight Status   : {self.flight_status}",
        ]
        if self.altitude_ft is not None:
            lines.append(f"Altitude (ft)   : {self.altitude_ft}")
        if self.squawk is not None:
            lines.append(f"Squawk          : {self.squawk:04d}")
        return "\n".join(lines) + "\n"


@dataclasses.dataclass
class AdsbPacket:
    packet: bytes  # full 14 frame bytes
    downlink_format: int
    capability: int
    icao: int
    msg_type: int
    msg: AdsbMsg
    time_processed: float  # epoch seconds

    @classmethod
    def from_bytes(
        cls, packet: bytes, time_processed: float | None = None
    ) -> "AdsbPacket":
        # src/adsb/packet.rs:25-49
        packet = bytes(packet)
        msg_type = packet[4] >> 3
        me = packet[4:11]
        msg: AdsbMsg
        if 1 <= msg_type <= 4:
            msg = AircraftId.from_me(me)
        elif 9 <= msg_type <= 18:
            msg = AircraftPositionMsg.from_me(me)
        else:
            msg = UnknownMsg(raw_msg=packet[4:])
        return cls(
            packet=packet,
            downlink_format=packet[0] >> 3,
            capability=packet[0] & 5,  # parity quirk (src/adsb/packet.rs:27)
            icao=(packet[1] << 16) | (packet[2] << 8) | packet[3],
            msg_type=msg_type,
            msg=msg,
            time_processed=time.time() if time_processed is None else time_processed,
        )

    @classmethod
    def from_hex(cls, hex_str: str, time_processed: float | None = None) -> "AdsbPacket":
        return cls.from_bytes(bytes.fromhex(hex_str), time_processed)

    def format(self) -> str:
        """Replicates the reference Display impl (src/adsb/packet.rs:77-99)."""
        ts = datetime.datetime.fromtimestamp(self.time_processed).astimezone()
        return (
            f"== {self.packet.hex()} ==\n"
            "Decoded Information:\n"
            f"Downlink Format : {self.downlink_format}\n"
            f"Capability      : {self.capability}\n"
            f"ICAO            : {self.icao:06X}\n"
            f"Processed Time  : {ts}\n"
            f"Message Type    : {self.msg_type}\n"
            f"{self.msg.format()}"
        )

    def __str__(self) -> str:
        return self.format()
