"""Frame-rate <-> sample-rate interpolation primitives.

`upsample_frames` reproduces the reference's frame->sample upsampler
(/root/reference/ddsp/core.py:7-21): append a copy of the last frame, linear
interpolation with `align_corners=True` to `factor*n_frames + 1` samples,
then drop the final sample. With align_corners the map from output index i to
input coordinate is exactly i/factor, so we implement it as a static
gather+lerp — no dynamic shapes, fuses into surrounding elementwise work.

`nearest_align` reproduces the unit-to-synth-frame nearest alignment of
Units_Encoder.encode (/root/reference/ddsp/vocoder.py:203-210).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def upsample_frames(signal: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Linearly upsample frame-rate signal to sample rate.

    Args:
        signal :: (B, Frame, Feat) - frame-rate series
        factor - samples per frame (block size)
    Returns:
        (B, Frame*factor, Feat)
    """
    n_frames = signal.shape[1]
    # output position i maps to input coordinate i/factor (align_corners=True
    # from n_frames+1 points to factor*n_frames+1 points)
    pos = np.arange(n_frames * factor) / factor
    idx0 = np.floor(pos).astype(np.int32)
    frac = (pos - idx0).astype(np.float32)
    idx1 = np.minimum(idx0 + 1, n_frames - 1)  # last frame repeated
    idx0 = np.minimum(idx0, n_frames - 1)
    x0 = signal[:, idx0, :]
    x1 = signal[:, idx1, :]
    w = jnp.asarray(frac, dtype=signal.dtype)[None, :, None]
    return x0 + (x1 - x0) * w


def nearest_align(units: jnp.ndarray, n_frames: int, ratio: float) -> jnp.ndarray:
    """Nearest-neighbor time alignment of encoder frames to synth frames.

    Args:
        units :: (B, RawFrame, Feat) - encoder output frames
        n_frames - number of target (synthesizer) frames
        ratio - target_frame_period / raw_frame_period
    Returns:
        (B, n_frames, Feat)
    """
    idx = np.clip(np.round(ratio * np.arange(n_frames)).astype(np.int64),
                  0, units.shape[1] - 1)
    return units[:, idx, :]
