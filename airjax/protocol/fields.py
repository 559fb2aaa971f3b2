"""Batched (data-parallel) ADS-B field extraction as vectorized integer ops.

Replicates the reference's per-packet scalar decode (src/adsb/packet.rs:25-49
and src/adsb/msgs.rs:69-206) over a whole (N, 14)-byte candidate batch at
once, including its quirks:

  * capability = byte0 & 5      (reference bug, src/adsb/packet.rs:27 —
                                 kept for bit-exact parity; spec says & 0x7)
  * altitude   = code * (25|100) - 1000 with Q-bit = msg[1]&1
                                 (src/adsb/msgs.rs:71-75)
  * callsign from 6-bit chunks of ME bytes 1..7 against the reference's
    64-char table with '#' placeholders (src/adsb/msgs.rs:150-177)

Message classing follows src/adsb/packet.rs:32-38: TC 1-4 -> AircraftID,
TC 9-18 -> AircraftPosition, else Unknown.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# src/adsb/msgs.rs:172-177
CHAR_CONVERT = (
    "#ABCDEFGHIJKLMNOPQRSTUVWXYZ#####_###############0123456789######"
)
_CHAR_TABLE = np.frombuffer(CHAR_CONVERT.encode("ascii"), dtype=np.uint8)

MSG_UNKNOWN = 0
MSG_AIRCRAFT_ID = 1
MSG_AIRCRAFT_POSITION = 2
# Extension class (extended mode): the reference leaves TC19 Unknown.
MSG_AIRCRAFT_VELOCITY = 3


def extract_fields(frames: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Decode every protocol field of a batch of frames.

    Args:
      frames: (..., 14) uint8 frame bytes (CRC already validated upstream).

    Returns:
      dict of (...)-shaped arrays; `callsign_codes` is (..., 8) uint8 ASCII.
      Fields not applicable to a frame's message class are still computed
      (they're cheap and branch-free); `msg_class` says which are meaningful.
    """
    b = frames.astype(jnp.int32)
    b0, b1, b2, b3, b4 = b[..., 0], b[..., 1], b[..., 2], b[..., 3], b[..., 4]
    # ME field bytes (src/adsb/packet.rs:33-35 uses packet[4..11] as msg[0..7])
    m1, m2 = b[..., 5], b[..., 6]
    m3, m4, m5, m6 = b[..., 7], b[..., 8], b[..., 9], b[..., 10]

    df = b0 >> 3
    capability = b0 & 5  # parity quirk, see module docstring
    icao = (b1 << 16) | (b2 << 8) | b3
    msg_type = b4 >> 3

    is_id = (msg_type >= 1) & (msg_type <= 4)
    is_pos = (msg_type >= 9) & (msg_type <= 18)
    msg_class = jnp.where(
        is_id, MSG_AIRCRAFT_ID, jnp.where(is_pos, MSG_AIRCRAFT_POSITION, MSG_UNKNOWN)
    )

    # --- AircraftPosition (src/adsb/msgs.rs:70-101) ---
    alt_mode_25 = (m1 & 1) == 1
    alt_code = (((m1 & 0xFE) >> 1) << 4) | ((m2 & 0xF0) >> 4)
    altitude = alt_code * jnp.where(alt_mode_25, 25, 100) - 1000
    surveillance_status = (b4 & 0b110) >> 1
    nic_supplement = b4 & 1
    cpr_time = (m2 & 0b1000) >> 3
    cpr_odd = (m2 & 0b100) >> 2  # 1 = odd frame
    cpr_lat = ((m2 & 0b11) << 15) | (m3 << 7) | ((m4 & 0xFE) >> 1)
    cpr_lon = ((m4 & 1) << 16) | (m5 << 8) | m6

    # --- AircraftID callsign (src/adsb/msgs.rs:150-201) ---
    # ME bytes 1..7 = 6 bytes = 48 bits = exactly 8 six-bit chunks.
    # Build the 48-bit stream as two 24-bit halves to stay in 32-bit ints.
    hi24 = (m1 << 16) | (m2 << 8) | m3
    lo24 = (m4 << 16) | (m5 << 8) | m6
    chunks = jnp.stack(
        [
            (hi24 >> 18) & 0x3F,
            (hi24 >> 12) & 0x3F,
            (hi24 >> 6) & 0x3F,
            hi24 & 0x3F,
            (lo24 >> 18) & 0x3F,
            (lo24 >> 12) & 0x3F,
            (lo24 >> 6) & 0x3F,
            lo24 & 0x3F,
        ],
        axis=-1,
    )  # (..., 8)
    callsign_codes = jnp.asarray(_CHAR_TABLE)[chunks]  # (..., 8) uint8 ASCII

    # --- TC19 airborne velocity raw fields (extension; reference classes
    # TC19 Unknown). Sign+10-bit field pairs: subtype 1/2 = E-W / N-S
    # ground velocity, subtype 3/4 = heading-status+heading / TAS+airspeed.
    # Derived floats (speed, track) are host-side; these stay integer and
    # branch-free. `msg_class_ext` adds the velocity class on top of the
    # reference classing in `msg_class` (which is kept parity-exact). ---
    vel_subtype = b4 & 0x7
    vel_sign_a = (m1 >> 2) & 1
    vel_val_a = ((m1 & 0x3) << 8) | m2
    vel_sign_b = (m3 >> 7) & 1
    vel_val_b = ((m3 & 0x7F) << 3) | (m4 >> 5)
    vel_vr_source_baro = (m4 >> 4) & 1
    vel_vr_sign = (m4 >> 3) & 1
    vel_vr_val = ((m4 & 0x7) << 6) | (m5 >> 2)
    vel_gbd_sign = (m6 >> 7) & 1
    vel_gbd_val = m6 & 0x7F
    msg_class_ext = jnp.where(msg_type == 19, MSG_AIRCRAFT_VELOCITY, msg_class)

    return {
        "df": df,
        # CF (DF18) / AF (DF19) subformat — the full low-3-bit field, NOT
        # the &5 capability quirk; gates whether the ME is ADS-B-shaped
        # (packet.py from_bytes extensions branch).
        "subformat": b0 & 0b111,
        "capability": capability,
        "icao": icao,
        "msg_type": msg_type,
        "msg_class": msg_class,
        "altitude_ft": altitude,
        "alt_mode_25": alt_mode_25,
        "surveillance_status": surveillance_status,
        "nic_supplement": nic_supplement,
        "cpr_time": cpr_time,
        "cpr_odd": cpr_odd,
        "cpr_lat": cpr_lat,
        "cpr_lon": cpr_lon,
        "callsign_codes": callsign_codes,
        "msg_class_ext": msg_class_ext,
        "vel_subtype": vel_subtype,
        "vel_sign_a": vel_sign_a,
        "vel_val_a": vel_val_a,
        "vel_sign_b": vel_sign_b,
        "vel_val_b": vel_val_b,
        "vel_vr_source_baro": vel_vr_source_baro,
        "vel_vr_sign": vel_vr_sign,
        "vel_vr_val": vel_vr_val,
        "vel_gbd_sign": vel_gbd_sign,
        "vel_gbd_val": vel_gbd_val,
    }


def callsign_to_str(codes: np.ndarray) -> str:
    """(8,) uint8 ASCII -> python str (host side)."""
    return bytes(np.asarray(codes, dtype=np.uint8)).decode("ascii")
