"""Mode S short (56-bit) and AP-addressed frame decode — extension.

The reference decodes ONLY DF17 extended squitter (its detector hard-gates
the DF=17 bit pattern, src/adsb/demod.rs:38-54). Real 1090 MHz traffic is
dominated by 56-bit surveillance replies; the BASELINE north star names
DF4/DF11 explicitly, so airjax adds them as a clearly-marked extension
(`extended` decode mode — the default mode stays reference-parity):

  DF4  (0b00100) surveillance altitude reply : FS DR UM AC13 AP
  DF5  (0b00101) surveillance identity reply : FS DR UM ID13 AP
  DF11 (0b01011) all-call reply              : CA AA(ICAO) PI
  DF20/21 (112-bit Comm-B)                   : like DF4/5 + 56-bit MB field

Addressing: DF11's PI field is the CRC over the first 32 bits XOR'd with
the interrogator code (0 for spontaneous acquisition squitters — those
validate directly). DF4/5/20/21 overlay the CRC with the aircraft address
(AP = CRC XOR ICAO), so the "syndrome" crc_calc XOR parity_field IS the
transmitting aircraft's ICAO; receivers accept such frames only when that
ICAO is already known from validated traffic (the same heuristic dump1090
and friends use — there is no other integrity check).

Everything here is branch-free batched integer work on (N, bits) arrays,
same style as airjax.protocol.crc/fields.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from airjax.protocol.crc import CRC_BITS, crc24, pack_bits_msbfirst

SHORT_BITS = 56
SHORT_DATA_BITS = 32

DF_SHORT_SET = (0, 4, 5, 11)
DF_LONG_AP_SET = (16, 20, 21)


@functools.cache
def _short_tables() -> tuple[np.ndarray, np.ndarray]:
    """(crc matrix (32,24) uint8, syndromes (32,) uint32) for 4-byte
    messages (56-bit frame = 32 data bits + 24 parity bits)."""
    matrix = np.zeros((SHORT_DATA_BITS, CRC_BITS), dtype=np.uint8)
    syndromes = np.zeros((SHORT_DATA_BITS,), dtype=np.uint32)
    for j in range(SHORT_DATA_BITS):
        msg = bytearray(SHORT_DATA_BITS // 8)
        msg[j // 8] = 1 << (7 - j % 8)
        s = crc24(bytes(msg))
        syndromes[j] = s
        for k in range(CRC_BITS):
            matrix[j, k] = (s >> (CRC_BITS - 1 - k)) & 1
    return matrix, syndromes


def crc24_short_batch(bits32: jnp.ndarray) -> jnp.ndarray:
    """Batched CRC over the 32 data bits of short frames -> (...,) uint32."""
    matrix = jnp.asarray(_short_tables()[0], dtype=jnp.int32)
    sums = jnp.matmul(
        bits32.astype(jnp.int32), matrix, preferred_element_type=jnp.int32
    )
    return pack_bits_msbfirst(sums & 1, CRC_BITS)


def extract_short_fields(bits56: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """Decode short-frame fields from (..., 56) {0,1} bits.

    Returns per-frame arrays; which are meaningful depends on `df`:
      df, fs, dr, um          — header fields (DF4/5)
      capability              — CA field (DF11)
      icao_aa                 — the AA address field (DF11)
      crc_calc                — CRC over the 32 data bits
      parity_field            — the transmitted PI/AP 24-bit field
      icao_ap                 — crc_calc ^ parity_field (the transmitting
                                aircraft for AP-addressed DF4/5; equals the
                                interrogator code for DF11)
      altitude_ft / altitude_valid — AC13 decode (Q=1, M=0 metric off)
      squawk                  — ID13 -> 4-digit octal identity code
    """
    b = bits56.astype(jnp.int32)

    def field(lo: int, width: int) -> jnp.ndarray:
        return pack_bits_msbfirst(b[..., lo : lo + width], width).astype(jnp.int32)

    df = field(0, 5)
    fs = field(5, 3)
    dr = field(8, 5)
    um = field(13, 6)
    capability = field(5, 3)  # DF11: CA occupies the FS bits
    icao_aa = field(8, 24)  # DF11: AA address
    # DF0/16 (ACAS air-air) header fields sharing the same 32 data bits:
    vs = field(5, 1)  # vertical status (1 = on ground)
    cc = field(6, 1)  # crosslink capability (DF0)
    sl = field(8, 3)  # ACAS sensitivity level
    ri = field(13, 4)  # reply information (airspeed category)

    crc_calc = crc24_short_batch(b[..., :SHORT_DATA_BITS])
    parity_field = pack_bits_msbfirst(b[..., SHORT_DATA_BITS:SHORT_BITS], CRC_BITS)
    icao_ap = crc_calc ^ parity_field

    # --- AC13 altitude (bits 19..31): bit layout with M at AC bit 6 and
    # Q at AC bit 8 (ICAO Annex 10 v4 3.1.2.6.5.4). Transmitted order:
    # C1 A1 C2 A2 C4 A4 M B1 Q B2 D2 B4 D4. Q=1 -> 25 ft binary; Q=0 ->
    # 100 ft Gillham gray code (extension beyond the reference, which
    # decodes no short frames at all). ---
    ac13 = b[..., 19:32]  # (..., 13)
    m_bit = ac13[..., 6]
    q_bit = ac13[..., 8]
    # N = the 11 bits of AC13 minus M and Q, MSB first (Q=1 binary path).
    n11 = jnp.concatenate(
        [
            ac13[..., 0:6],
            ac13[..., 7:8],
            ac13[..., 9:13],
        ],
        axis=-1,
    )
    n_val = pack_bits_msbfirst(n11, 11).astype(jnp.int32)
    alt_q1 = n_val * 25 - 1000

    # Gillham (Q=0): 3-bit reflected gray C1 C2 C4 counts 100s within a
    # 500 ft band; 8-bit gray D2 D4 A1 A2 A4 B1 B2 B4 counts 500s.
    def gray2bin(g: jnp.ndarray) -> jnp.ndarray:
        g = g ^ (g >> 4)
        g = g ^ (g >> 2)
        return g ^ (g >> 1)

    c1, a1, c2, a2, c4, a4 = (ac13[..., i] for i in range(6))
    b1, b2, d2, b4, d4 = (ac13[..., i] for i in (7, 9, 10, 11, 12))
    c_gray = (c1 << 2) | (c2 << 1) | c4
    f_gray = (
        (d2 << 7) | (d4 << 6) | (a1 << 5) | (a2 << 4)
        | (a4 << 3) | (b1 << 2) | (b2 << 1) | b4
    )
    ones = gray2bin(c_gray)
    ones = jnp.where((ones & 5) == 5, ones ^ 2, ones)  # 7<->5 remap
    fives = gray2bin(f_gray)
    gillham_ok = (c_gray != 0) & (ones >= 1) & (ones <= 5)
    ones = jnp.where((fives & 1) == 1, 6 - ones, ones)  # reflection
    alt_q0 = fives * 500 + ones * 100 - 1300

    altitude_ft = jnp.where(q_bit == 1, alt_q1, alt_q0)
    altitude_valid = (m_bit == 0) & ((q_bit == 1) | gillham_ok)

    # --- ID13 squawk (same bit positions as AC13): order
    # C1 A1 C2 A2 C4 A4 X B1 D1 B2 D2 B4 D4 ---
    id13 = ac13
    c1, a1, c2, a2, c4, a4 = (id13[..., i] for i in range(6))
    b1, d1, b2, d2, b4, d4 = (id13[..., i] for i in range(7, 13))
    dig_a = (a4 << 2) | (a2 << 1) | a1
    dig_b = (b4 << 2) | (b2 << 1) | b1
    dig_c = (c4 << 2) | (c2 << 1) | c1
    dig_d = (d4 << 2) | (d2 << 1) | d1
    squawk = dig_a * 1000 + dig_b * 100 + dig_c * 10 + dig_d

    return {
        "df": df,
        "fs": fs,
        "dr": dr,
        "um": um,
        "vs": vs,
        "cc": cc,
        "sl": sl,
        "ri": ri,
        "capability": capability,
        "icao_aa": icao_aa,
        "crc_calc": crc_calc,
        "parity_field": parity_field,
        "icao_ap": icao_ap,
        "altitude_ft": altitude_ft,
        "altitude_valid": altitude_valid,
        "squawk": squawk,
    }


# ---------------------------------------------------------------------------
# Host-side frame assembly (for synth/tests)
# ---------------------------------------------------------------------------


def make_df11(icao: int, capability: int = 5, interrogator: int = 0) -> bytes:
    """Assemble a 7-byte DF11 all-call reply."""
    b0 = (11 << 3) | capability
    body = bytes([b0, (icao >> 16) & 0xFF, (icao >> 8) & 0xFF, icao & 0xFF])
    pi = crc24(body) ^ interrogator
    return body + bytes([(pi >> 16) & 0xFF, (pi >> 8) & 0xFF, pi & 0xFF])


def _ac13_from_altitude(altitude_ft: int) -> int:
    """Q=1 (25 ft) AC13 encoding."""
    n = (altitude_ft + 1000) // 25
    if not 0 <= n < 2048:
        raise ValueError("altitude out of AC13 Q=1 range")
    hi6 = (n >> 5) & 0x3F  # bits 0..5
    mid1 = (n >> 4) & 1  # bit 7 (M=0 at 6)
    lo4 = n & 0xF  # bits 9..12
    return (hi6 << 7) | (0 << 6) | (mid1 << 5) | (1 << 4) | lo4


def _ac13_gillham_from_altitude(altitude_ft: int) -> int:
    """Q=0 (100 ft Gillham gray) AC13 encoding — inverse of the decode in
    extract_short_fields. altitude must be a multiple of 100 in
    [-1200, 126700]."""
    if altitude_ft % 100 or not -1200 <= altitude_ft <= 126700:
        raise ValueError("altitude out of Gillham range / not a 100 ft step")
    total = altitude_ft // 100 + 13
    ones = (total - 1) % 5 + 1  # 1..5
    fives = (total - ones) // 5
    c_val = 6 - ones if fives & 1 else ones
    if c_val == 5:
        c_val = 7  # inverse of the decoder's 7->5 remap
    c_gray = c_val ^ (c_val >> 1)
    f_gray = fives ^ (fives >> 1)
    c1, c2, c4 = (c_gray >> 2) & 1, (c_gray >> 1) & 1, c_gray & 1
    d2 = (f_gray >> 7) & 1
    d4 = (f_gray >> 6) & 1
    a1 = (f_gray >> 5) & 1
    a2 = (f_gray >> 4) & 1
    a4 = (f_gray >> 3) & 1
    b1 = (f_gray >> 2) & 1
    b2 = (f_gray >> 1) & 1
    b4 = f_gray & 1
    bits = [c1, a1, c2, a2, c4, a4, 0, b1, 0, b2, d2, b4, d4]  # M=0, Q=0
    v = 0
    for bit in bits:
        v = (v << 1) | bit
    return v


def _id13_from_squawk(squawk: int) -> int:
    digits = [int(d) for d in f"{squawk:04d}"]
    a, b_, c, d = digits
    bits = [
        (c >> 0) & 1, (a >> 0) & 1, (c >> 1) & 1, (a >> 1) & 1,
        (c >> 2) & 1, (a >> 2) & 1, 0,
        (b_ >> 0) & 1, (d >> 0) & 1, (b_ >> 1) & 1, (d >> 1) & 1,
        (b_ >> 2) & 1, (d >> 2) & 1,
    ]
    v = 0
    for bit in bits:
        v = (v << 1) | bit
    return v


def _acas_header_word(
    df: int, altitude_ft: int, vs: int, cc: int, sl: int, ri: int,
    gillham: bool,
) -> int:
    """32-bit DF0/16 data word: DF VS CC _ SL __ RI __ AC13."""
    ac13 = (
        _ac13_gillham_from_altitude(altitude_ft)
        if gillham
        else _ac13_from_altitude(altitude_ft)
    )
    return (
        (df << 27) | (vs << 26) | (cc << 25) | (sl << 21) | (ri << 15) | ac13
    )


def make_df0(
    icao: int, altitude_ft: int, vs: int = 0, cc: int = 1, sl: int = 5,
    ri: int = 3, gillham: bool = False,
) -> bytes:
    """Assemble a 7-byte DF0 ACAS short air-air reply addressed via AP."""
    body = _acas_header_word(0, altitude_ft, vs, cc, sl, ri, gillham).to_bytes(
        4, "big"
    )
    ap = crc24(body) ^ icao
    return body + bytes([(ap >> 16) & 0xFF, (ap >> 8) & 0xFF, ap & 0xFF])


def make_df16(
    icao: int, altitude_ft: int, mv: bytes = b"\x00" * 7, vs: int = 0,
    sl: int = 5, ri: int = 3, gillham: bool = False,
) -> bytes:
    """Assemble a 14-byte DF16 ACAS long air-air reply addressed via AP.

    `mv` is the 7-byte MV field (see airjax.protocol.acas.make_mv_ra for
    RA reports)."""
    if len(mv) != 7:
        raise ValueError("MV field must be 7 bytes")
    body = (
        _acas_header_word(16, altitude_ft, vs, 0, sl, ri, gillham).to_bytes(
            4, "big"
        )
        + mv
    )
    ap = crc24(body) ^ icao
    return body + bytes([(ap >> 16) & 0xFF, (ap >> 8) & 0xFF, ap & 0xFF])


def make_df4(
    icao: int, altitude_ft: int, fs: int = 0, dr: int = 0, um: int = 0,
    gillham: bool = False,
) -> bytes:
    """Assemble a 7-byte DF4 altitude reply addressed to `icao` (AP)."""
    ac13 = (
        _ac13_gillham_from_altitude(altitude_ft)
        if gillham
        else _ac13_from_altitude(altitude_ft)
    )
    word = (4 << 27) | (fs << 24) | (dr << 19) | (um << 13) | ac13
    body = word.to_bytes(4, "big")
    ap = crc24(body) ^ icao
    return body + bytes([(ap >> 16) & 0xFF, (ap >> 8) & 0xFF, ap & 0xFF])


def make_df5(icao: int, squawk: int, fs: int = 0, dr: int = 0, um: int = 0) -> bytes:
    """Assemble a 7-byte DF5 identity reply addressed to `icao` (AP)."""
    id13 = _id13_from_squawk(squawk)
    word = (5 << 27) | (fs << 24) | (dr << 19) | (um << 13) | id13
    body = word.to_bytes(4, "big")
    ap = crc24(body) ^ icao
    return body + bytes([(ap >> 16) & 0xFF, (ap >> 8) & 0xFF, ap & 0xFF])


def make_df20(
    icao: int, altitude_ft: int, mb: bytes = b"\x00" * 7, fs: int = 0, dr: int = 0, um: int = 0,
    gillham: bool = False,
) -> bytes:
    """Assemble a 14-byte DF20 Comm-B altitude reply addressed via AP."""
    if len(mb) != 7:
        raise ValueError("MB field must be 7 bytes")
    ac13 = (
        _ac13_gillham_from_altitude(altitude_ft)
        if gillham
        else _ac13_from_altitude(altitude_ft)
    )
    word = (20 << 27) | (fs << 24) | (dr << 19) | (um << 13) | ac13
    body = word.to_bytes(4, "big") + mb
    ap = crc24(body) ^ icao
    return body + bytes([(ap >> 16) & 0xFF, (ap >> 8) & 0xFF, ap & 0xFF])


def extract_short_fields_from_raw(frames_raw: jnp.ndarray):
    """Short-frame field arrays straight from raw frame BYTES (..., >=7).

    The one shared bytes->bits56->extract_short_fields recipe for the
    single-chip fused program (airjax.pipeline
    .decode_iq_block_extended_with_fields) and the multihost
    gathered-array path (airjax.parallel.multihost
    .attach_candidate_fields) — one site, so the two cannot drift."""
    raw7 = jnp.asarray(frames_raw)[..., :7].astype(jnp.int32)
    bits56 = (
        (raw7[..., None] >> jnp.arange(7, -1, -1, dtype=jnp.int32)) & 1
    ).reshape(*raw7.shape[:-1], 56)
    return extract_short_fields(bits56)


def make_df24(icao: int, nd: int = 0, md: bytes = b"\x00" * 10, ke: int = 0) -> bytes:
    """Assemble a 14-byte DF24 Comm-D ELM segment addressed via AP
    (first two bits '11', bit 4 KE, bits 5-8 ND, bits 9-88 MD)."""
    if len(md) != 10:
        raise ValueError("MD field must be 10 bytes")
    if not 0 <= nd <= 15:
        raise ValueError("ND must be 0-15")
    body = bytes([0b11000000 | ((ke & 1) << 4) | nd]) + md
    ap = crc24(body) ^ icao
    return body + bytes([(ap >> 16) & 0xFF, (ap >> 8) & 0xFF, ap & 0xFF])


def make_df21(
    icao: int, squawk: int, mb: bytes = b"\x00" * 7, fs: int = 0, dr: int = 0, um: int = 0
) -> bytes:
    """Assemble a 14-byte DF21 Comm-B identity reply addressed via AP."""
    if len(mb) != 7:
        raise ValueError("MB field must be 7 bytes")
    id13 = _id13_from_squawk(squawk)
    word = (21 << 27) | (fs << 24) | (dr << 19) | (um << 13) | id13
    body = word.to_bytes(4, "big") + mb
    ap = crc24(body) ^ icao
    return body + bytes([(ap >> 16) & 0xFF, (ap >> 8) & 0xFF, ap & 0xFF])
