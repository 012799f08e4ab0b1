"""Windowed-sinc polyphase resampling as a strided convolution.

Replaces torchaudio.transforms.Resample (C++/ATen), used throughout the
reference for 44.1k<->16k unit-encoder input and enhancer adaptive-rate
conversion (/root/reference/ddsp/vocoder.py:42,194; enhancer.py:51,71;
gui.py:402) with `lowpass_filter_width=128`.

The kernel is the standard Kaiser-free hann-windowed sinc interpolation
filter (torchaudio 'sinc_interp_hann', rolloff 0.99): after reducing the
rate pair by their gcd, each of the `new_freq` output phases gets a windowed
sinc sampled at input positions; application is a single conv with stride
`orig_freq` — which XLA maps onto the MXU as a batched matmul. Kernels are
built once per (orig, new) pair on host in float64 and cached.
"""
from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax.numpy as jnp
import jax


@lru_cache(maxsize=32)
def _sinc_kernel(
    orig_freq: int, new_freq: int, lowpass_filter_width: int = 128, rolloff: float = 0.99
):
    """Build the polyphase kernel. Returns (kernel (new, width*2+orig), width)."""
    g = math.gcd(int(orig_freq), int(new_freq))
    orig = int(orig_freq) // g
    new = int(new_freq) // g
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)

    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = (-np.arange(new, dtype=np.float64)[:, None] / new + idx) * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    kernel = np.where(t == 0.0, 1.0, np.sin(t) / np.where(t == 0.0, 1.0, t))
    kernel = kernel * window * (base_freq / orig)
    return kernel.astype(np.float32), width, orig, new


def resample(
    x: jnp.ndarray, orig_freq: int, new_freq: int, lowpass_filter_width: int = 128
) -> jnp.ndarray:
    """Resample a batch of waveforms. :: (B, T) -> (B, ceil(T*new/orig)).

    torchaudio.functional.resample parity (sinc_interp_hann window).
    """
    if orig_freq == new_freq:
        return x
    kernel_np, width, orig, new = _sinc_kernel(orig_freq, new_freq, lowpass_filter_width)
    kernel = jnp.asarray(kernel_np, dtype=x.dtype)  # (new, taps)
    length = x.shape[-1]
    target_len = int(math.ceil(new * length / orig))

    xp = jnp.pad(x, ((0, 0), (width, width + orig)))
    # conv: outputs (B, new, n_steps) with stride `orig`
    out = jax.lax.conv_general_dilated(
        xp[:, None, :],
        kernel[:, None, :],
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    # interleave phases: (B, new, steps) -> (B, steps*new)
    out = jnp.swapaxes(out, 1, 2).reshape(x.shape[0], -1)
    return out[:, :target_len]
