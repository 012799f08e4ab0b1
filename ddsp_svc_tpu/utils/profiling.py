"""Profiling / tracing utilities.

The reference has no systematic profiling (SURVEY §5: wall-clock RTF prints
only). Here: a context manager around jax.profiler for device traces
(viewable in TensorBoard / Perfetto), a wall-clock timer with
block_until_ready semantics, and a speed-of-light estimator for audio
synthesis workloads (audio-seconds/s vs HBM-bandwidth and FLOP roofs).
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture an XLA device trace: `with device_trace('exp/prof'): step()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 10, **kwargs):
    """Wall-clock a jitted function with proper blocking.

    Returns (mean_seconds, last_output)."""
    out = None
    for _ in range(warmup):
        out = jax.block_until_ready(fn(*args, **kwargs))
    st = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args, **kwargs))
    return (time.perf_counter() - st) / iters, out


@dataclass
class RooflineReport:
    seconds: float
    flops: float
    bytes_moved: float
    peak_flops: float
    peak_bw: float

    @property
    def flops_util(self) -> float:
        return self.flops / self.seconds / self.peak_flops

    @property
    def bw_util(self) -> float:
        return self.bytes_moved / self.seconds / self.peak_bw

    def __str__(self) -> str:
        return (
            f"{self.seconds * 1e3:.2f} ms | "
            f"MXU {100 * self.flops_util:.1f}% of peak | "
            f"HBM {100 * self.bw_util:.1f}% of peak"
        )


# v5e per-chip peaks (public figures): 197 TFLOP/s bf16, 394 TOPS int8,
# ~98.5 TFLOP/s fp32 effective on MXU, 819 GB/s HBM BW.
V5E_PEAK_FP32 = 98.5e12
V5E_PEAK_BF16 = 197e12
V5E_PEAK_BW = 819e9


def roofline(
    seconds: float, flops: float, bytes_moved: float,
    peak_flops: float = V5E_PEAK_FP32, peak_bw: float = V5E_PEAK_BW,
) -> RooflineReport:
    return RooflineReport(seconds, flops, bytes_moved, peak_flops, peak_bw)
