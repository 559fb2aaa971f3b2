"""Central configuration for the airjax pipeline.

The reference scatters its constants across files (gain 49.5 src/adsb.rs:27,
1090 MHz :42, 2 MS/s :44, derate 0.9 src/adsb/demod.rs:10, CPR NZ=15
src/adsb/cpr.rs:19, 10 s CPR pair window src/adsb/aircraft.rs:68, 20,000
sample playback chunks src/adsb.rs:78). Here they live in one frozen
dataclass so jitted functions can treat them as static arguments.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    # --- RF / sampling (reference src/adsb.rs:27,42,44) ---
    sample_rate_hz: float = 2_000_000.0
    center_freq_hz: float = 1_090_000_000.0
    gain_db: float = 49.5

    # --- Mode S framing (reference src/adsb/demod.rs:17-57,65) ---
    # 16 half-microsecond preamble samples + 112 bits * 2 samples/bit.
    preamble_samples: int = 16
    bits_per_frame: int = 112
    samples_per_bit: int = 2

    # --- Scan / blocking ---
    # Reference playback chunk size (src/adsb.rs:78). Blocks are scanned at
    # stride 1 over offsets [0, block_len - window_len) (src/adsb.rs:98).
    block_len: int = 20000
    # Fixed per-block candidate capacity (detections are ragged; we compact
    # into a masked fixed-size buffer). The author's whole capture produced
    # 149 preamble hits (src/adsb/demod.rs:85), so 256 per 20k block is ample.
    max_candidates: int = 256

    # --- Thresholding (only used by the dead "threshold" slicer variant,
    # kept for parity with src/adsb/demod.rs:10,56) ---
    high_threshold_derate: float = 0.9

    # --- Tracking (reference src/adsb/aircraft.rs:68,84) ---
    cpr_pair_max_age_s: float = 10.0

    # --- Display / web (reference src/adsb/web.rs:54) ---
    web_host: str = "127.0.0.1"
    web_port: int = 8080

    @property
    def frame_samples(self) -> int:
        """Samples occupied by the 112 data bits (224)."""
        return self.bits_per_frame * self.samples_per_bit

    @property
    def window_len(self) -> int:
        """Full detection window: preamble + data (240 samples)."""
        return self.preamble_samples + self.frame_samples

    @property
    def halo(self) -> int:
        """Overlap needed so no window straddling a block edge is lost."""
        return self.window_len - 1

    @property
    def bytes_per_frame(self) -> int:
        return self.bits_per_frame // 8


DEFAULT_CONFIG = PipelineConfig()
