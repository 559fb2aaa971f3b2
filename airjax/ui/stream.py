"""Stream display: print each decoded packet (src/adsb.rs:154-160)."""

from __future__ import annotations

import sys

from airjax.protocol.packet import AdsbPacket


def stream_printer(out=None):
    out = out or sys.stdout

    def on_packet(packet: AdsbPacket) -> None:
        # Reference: print!("\n{}\n", packet) — Display ends with a newline.
        out.write(f"\n{packet.format()}\n")
        out.flush()

    return on_packet
