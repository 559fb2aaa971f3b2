"""CRC-24 parity tests (vectors from src/adsb/demod.rs:338-367 and the
GF(2)-linear batched formulation vs the scalar oracle)."""

import numpy as np
import jax.numpy as jnp
import pytest

from airjax.protocol import crc


KNOWN = bytes(
    [0x8D, 0x40, 0x6B, 0x90, 0x20, 0x15, 0xA6, 0x78, 0xD4, 0xD2, 0x20]
)


def test_crc_known_answer():
    # src/adsb/demod.rs:338-356
    assert crc.crc24(KNOWN) == 0xAA4BDA


def test_crc_known_answer_invalid():
    buf = bytearray(KNOWN)
    buf[2] = 0x6A
    assert crc.crc24(bytes(buf)) != 0xAA4BDA


def test_batched_matches_scalar():
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 256, size=(32, 11), dtype=np.uint8)
    bits = np.unpackbits(msgs, axis=1)  # (32, 88)
    batched = np.asarray(crc.crc24_batch(jnp.asarray(bits)))
    for i in range(32):
        assert int(batched[i]) == crc.crc24(msgs[i].tobytes())


def _full_frame(payload: bytes) -> bytes:
    c = crc.crc24(payload)
    return payload + bytes([(c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF])


def test_check_accepts_valid_frame():
    frame = _full_frame(KNOWN)
    bits = np.unpackbits(np.frombuffer(frame, np.uint8))[None]
    out, good, recovered = crc.crc_check_and_recover(jnp.asarray(bits))
    assert bool(good[0]) and not bool(recovered[0])
    assert np.array_equal(np.asarray(out[0]), bits[0])


@pytest.mark.parametrize("bit", [0, 5, 17, 42, 87])
def test_recovery_data_bit_flip(bit):
    frame = _full_frame(KNOWN)
    flipped = bytearray(frame)
    flipped[bit // 8] ^= 1 << (7 - bit % 8)
    bits = np.unpackbits(np.frombuffer(bytes(flipped), np.uint8))[None]
    out, good, recovered = crc.crc_check_and_recover(jnp.asarray(bits))
    assert bool(good[0]) and bool(recovered[0])
    # Corrected frame equals the original
    orig = np.unpackbits(np.frombuffer(frame, np.uint8))
    assert np.array_equal(np.asarray(out[0]), orig)
    # Matches the reference's scalar brute-force recovery
    scalar = crc.try_crc_recovery_scalar(bytes(flipped))
    assert scalar == frame


@pytest.mark.parametrize("bit", [88, 95, 111])
def test_recovery_crc_field_flip_never_validates(bit):
    # Reference quirk: flips inside the CRC field can't validate
    # (src/adsb/crc.rs:56-58 compares against the original packet CRC).
    frame = _full_frame(KNOWN)
    flipped = bytearray(frame)
    flipped[bit // 8] ^= 1 << (7 - bit % 8)
    bits = np.unpackbits(np.frombuffer(bytes(flipped), np.uint8))[None]
    _, good, recovered = crc.crc_check_and_recover(jnp.asarray(bits))
    assert not bool(good[0]) and not bool(recovered[0])
    assert crc.try_crc_recovery_scalar(bytes(flipped)) is None


def test_double_flip_not_recoverable():
    frame = _full_frame(KNOWN)
    flipped = bytearray(frame)
    flipped[0] ^= 0x81  # two bit flips in byte 0
    bits = np.unpackbits(np.frombuffer(bytes(flipped), np.uint8))[None]
    _, good, _ = crc.crc_check_and_recover(jnp.asarray(bits))
    assert bool(good[0]) == (crc.try_crc_recovery_scalar(bytes(flipped)) is not None)


def test_syndromes_distinct():
    s = crc.syndromes()
    assert len(set(int(x) for x in s)) == 88
