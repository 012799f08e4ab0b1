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

    With align_corners the map from output index i to input coordinate is
    exactly i/factor, so output sample (f, s) is a[f] + (a[f+1]-a[f])*s/factor
    with the last frame repeated — a pure broadcast + reshape. (An index
    formulation lowers to an XLA gather, which measured ~20 ms at the
    batch-128 headline geometry vs ~1 ms for the broadcast form.)

    Args:
        signal :: (B, Frame, Feat) - frame-rate series
        factor - samples per frame (block size)
    Returns:
        (B, Frame*factor, Feat)
    """
    b, n_frames, feat = signal.shape
    nxt = jnp.concatenate([signal[:, 1:], signal[:, -1:]], axis=1)
    slope = nxt - signal
    w = jnp.asarray(np.arange(factor) / factor, dtype=signal.dtype)
    out = signal[:, :, None, :] + slope[:, :, None, :] * w[None, None, :, None]
    return out.reshape(b, n_frames * factor, feat)


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
