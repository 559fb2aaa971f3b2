"""DSP hot path: magnitude, preamble/DF17 detection, PPM bit-slicing."""
