"""Streaming runner: block source -> jitted device decode -> packet sink.

This is the TPU-native replacement for the reference's thread-2 scalar scan
loop (src/adsb.rs:92-122): blocks arrive from a bounded prefetcher, each is
decoded by one jitted program, and validated frames surface as
`AdsbPacket`s in stream order.

Two stream modes:
  * parity  — each chunk scanned independently over offsets
              [0, len-240) exactly like the reference; frames straddling
              chunk edges are lost (reference behavior).
  * overlap — a 239-sample carry from the previous chunk is prepended, so
              consecutive chunks form a seamless scan (overlap-save in
              time): no frame is ever lost at a chunk boundary and every
              global offset is scanned exactly once.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator

import jax
import numpy as np

from airjax.config import DEFAULT_CONFIG, PipelineConfig
from airjax.dsp.demod import WINDOW
from airjax.io.source import Prefetcher
from airjax.pipeline import decode_iq_block_adaptive
from airjax.protocol.packet import AdsbPacket


class StreamStats:
    def __init__(self):
        self.blocks = 0
        self.samples = 0
        self.detections = 0
        self.good = 0
        self.recovered = 0
        self.overflow_blocks = 0
        self.started = time.time()

    def as_dict(self) -> dict:
        dt = max(time.time() - self.started, 1e-9)
        return {
            "blocks": self.blocks,
            "samples": self.samples,
            "detections": self.detections,
            "good": self.good,
            "recovered": self.recovered,
            "overflow_blocks": self.overflow_blocks,
            "msamples_per_s": round(self.samples / dt / 1e6, 3),
        }


def run_stream(
    source: Iterator[np.ndarray],
    on_packet: Callable[[AdsbPacket], None],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    overlap: bool = True,
    prefetch_depth: int = 4,
    stats: StreamStats | None = None,
    plot_dir: str | None = None,
    extended: bool = False,
) -> StreamStats:
    """Consume a block source until exhausted; call on_packet per frame.

    With plot_dir set, an SVG magnitude plot of each decoded frame's
    window is dumped there (debug aid; see airjax.visualise).

    With extended=True, every Mode S downlink format is decoded (DF11
    all-call, AP-addressed DF4/5/20/21 surveillance replies, in addition
    to the reference's DF17) — see airjax.extended. on_packet then also
    receives AllCallReply / SurveillanceReply objects.
    """
    stats = stats or StreamStats()
    if extended:
        from airjax.extended import assemble_extended
        from airjax.pipeline import decode_iq_block_extended
        from airjax.track.icao_cache import IcaoCache

        icao_cache = IcaoCache()
    halo = WINDOW - 1
    # Initial carry uses the non-detecting (1,0)-magnitude pattern: a
    # zero carry passes the equality-tolerant preamble gate at every
    # offset and floods the candidate capacity with bogus detections
    # (~214 per stream start, measured).
    carry = None
    if overlap:
        carry = np.zeros((halo, 2), dtype=np.int16)
        carry[::2, 0] = 1
    # Global sample index of carry[0]; first block's padded head is masked.
    global_base = -halo
    pending = np.zeros((0, 2), dtype=np.int16)

    for block in Prefetcher(source, depth=prefetch_depth):
        block = np.asarray(block, dtype=np.int16)
        if overlap and len(pending):
            # Short reads (live SDR partial buffers) accumulate rather
            # than being dropped, preserving stream continuity.
            block = np.concatenate([pending, block], axis=0)
            pending = pending[:0]
        if block.shape[0] < WINDOW:
            if overlap:
                pending = block
            # parity mode: the reference cannot process blocks < 240
            # samples at all (its offset range underflows), so skipping
            # matches its only well-defined behavior
            continue
        if overlap:
            ext = np.concatenate([carry, block], axis=0)
            n_off = block.shape[0]
            carry = ext[-halo:].copy()
        else:
            ext = block
            n_off = block.shape[0] - WINDOW
        now = time.time()
        emitted = 0
        if extended:
            capacity = cfg.max_candidates
            out = jax.device_get(
                decode_iq_block_extended(
                    jax.numpy.asarray(ext), n_off, capacity
                )
            )
            # Same adaptive overflow regrow as the parity path: dropped
            # detections would silently lose frames.
            while bool(out["overflow"]) and capacity < n_off:
                capacity = min(capacity * 4, n_off)
                out = jax.device_get(
                    decode_iq_block_extended(
                        jax.numpy.asarray(ext), n_off, capacity
                    )
                )
            for local, pkt in assemble_extended(out, now, icao_cache):
                if overlap and global_base + local < 0:
                    continue
                on_packet(pkt)
                emitted += 1
        else:
            out = decode_iq_block_adaptive(ext, n_off, cfg.max_candidates)
            for k in np.nonzero(out["good"])[0]:
                local = int(out["offsets"][k])
                if overlap and global_base + local < 0:
                    continue  # zero-padded head of the very first block
                on_packet(
                    AdsbPacket.from_bytes(out["frames"][k].tobytes(), now)
                )
                emitted += 1
                if plot_dir is not None:
                    from airjax import golden, visualise

                    window = ext[local : local + WINDOW]
                    visualise.plot_adsb_frame(
                        golden.magnitude(window),
                        out_dir=plot_dir,
                        detection_offset=0,
                        title=f"frame @ {global_base + local if overlap else local}",
                    )
        stats.blocks += 1
        stats.samples += block.shape[0]
        stats.detections += int(out["n_detections"])
        stats.good += emitted
        stats.recovered += int(np.sum(out["recovered"]))
        stats.overflow_blocks += bool(out["overflow"])
        if overlap:
            global_base += block.shape[0]
    return stats
