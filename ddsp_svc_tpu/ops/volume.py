"""Frame-wise RMS volume extraction.

Behavioral contract from /root/reference/ddsp/vocoder.py:116-137: reflect-pad
(hop//2, (hop+1)//2), then per non-overlapped hop window take
sqrt(mean(x^2)); n_frames = len(audio)//hop + 1.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def extract_volume(audio: jnp.ndarray, hop_size: int) -> jnp.ndarray:
    """:: (..., T) -> (..., T//hop + 1) frame RMS."""
    t = audio.shape[-1]
    n_frames = t // hop_size + 1
    pad = [(0, 0)] * (audio.ndim - 1) + [(hop_size // 2, (hop_size + 1) // 2)]
    x = jnp.pad(audio, pad, mode="reflect")
    x = x[..., : n_frames * hop_size]
    x2 = (x * x).reshape(*audio.shape[:-1], n_frames, hop_size)
    return jnp.sqrt(jnp.mean(x2, axis=-1))


def extract_volume_np(audio: np.ndarray, hop_size: float) -> np.ndarray:
    """Host/numpy variant. Supports non-integer hop (needed when the input
    sample rate differs from the model rate, main.py:72,109 of the
    reference): frame n spans [int(n*hop), int((n+1)*hop))."""
    t = audio.shape[-1]
    n_frames = int(t // hop_size) + 1
    x = np.pad(
        audio, (int(hop_size // 2), int((hop_size + 1) // 2)), mode="reflect"
    )
    cs = np.concatenate([[0.0], np.cumsum(x.astype(np.float64) ** 2)])
    starts = (np.arange(n_frames) * hop_size).astype(np.int64)
    ends = np.minimum(
        ((np.arange(n_frames) + 1) * hop_size).astype(np.int64), len(x)
    )
    counts = np.maximum(ends - starts, 1)
    return np.sqrt((cs[ends] - cs[starts]) / counts).astype(np.float32)
