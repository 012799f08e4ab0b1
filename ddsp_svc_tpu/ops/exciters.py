"""Excitation signal generators: combtooth and additive sinusoid bank.

Contracts:
  - combtooth: sinc(sr * rot / (f0 + 1e-3)), zeroed where f0 <= 0
    (/root/reference/ddsp/vocoder.py:459-460,539). jnp.sinc == torch.sinc
    (normalized sinc).
  - oscillator_bank: sum_k upsample(amp_k) * sin(k * phase), chunked over
    harmonics in the reference (vocoder.py:404-412, max_upsample_dim=32) to
    bound memory. Here the full (T, n_harmonic) product is computed as an
    elementwise kernel that XLA fuses; amplitudes are upsampled at frame rate
    and expanded lazily inside the fused graph. A `harmonic_chunk` knob keeps
    peak memory bounded via lax.scan for very long signals.
  - remove_above_fmax: Nyquist masking of harmonic amplitudes
    (/root/reference/ddsp/core.py:24-28), incl. the +1e-7 floor.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .interp import upsample_frames


def combtooth(
    rot: jnp.ndarray, f0: jnp.ndarray, sr: float, zero_unvoiced: bool = True
) -> jnp.ndarray:
    """:: (B, T), (B, T) -> (B, T) sinc-comb excitation.

    zero_unvoiced: CombSubFast zeroes f0<=0 regions (vocoder.py:460); the old
    CombSub does not (vocoder.py:539).
    """
    x = sr * rot / (f0 + 1e-3)
    # sinc(x) = sin(pi*x)/(pi*x) with the sine argument wrapped to [-pi, pi]:
    # |x| reaches sr/(2*f0_min) ~ 340 here, where fp32 sin takes its slow
    # large-argument reduction path (measured ~20 ms of the batch-128
    # headline synth). x - 2*round(x/2) is exact to ulp(x), the same error
    # already present in x itself.
    xw = x - 2.0 * jnp.round(0.5 * x)
    tooth = jnp.where(
        jnp.abs(x) < 1e-6, 1.0, jnp.sin(np.pi * xw) / (np.pi * x)
    )
    if zero_unvoiced:
        tooth = jnp.where(f0 <= 0.0, 0.0, tooth)
    return tooth


def remove_above_fmax(
    amplitudes: jnp.ndarray, pitch: jnp.ndarray, fmax: float, level_start: int = 1
) -> jnp.ndarray:
    """Zero harmonic amplitudes above fmax (with the reference's 1e-7 floor).

    amplitudes :: (B, Frame, n_harm); pitch :: (B, Frame, 1)
    """
    n_harm = amplitudes.shape[-1]
    levels = jnp.asarray(
        np.arange(level_start, n_harm + level_start), dtype=pitch.dtype
    )
    pitches = pitch * levels
    aa = (pitches < fmax).astype(amplitudes.dtype) + 1e-7
    return amplitudes * aa


def oscillator_bank(
    phase: jnp.ndarray,
    amplitudes_frames: jnp.ndarray,
    block_size: int,
    harmonic_chunk: int = 32,
) -> jnp.ndarray:
    """Additive harmonic synthesis: sum_k up(amp_k) * sin((k+1) * phase).

    Args:
        phase :: (B, T) - sample-rate phase [rad]
        amplitudes_frames :: (B, Frame, n_harm) - frame-rate amplitudes
        block_size - samples per frame
        harmonic_chunk - harmonics processed per scan step (memory bound)
    Returns:
        (B, T) summed sinusoids
    """
    b, t = phase.shape
    n_harm = amplitudes_frames.shape[-1]
    n_chunks = (n_harm + harmonic_chunk - 1) // harmonic_chunk
    pad = n_chunks * harmonic_chunk - n_harm
    if pad:
        amplitudes_frames = jnp.pad(
            amplitudes_frames, ((0, 0), (0, 0), (0, pad))
        )
    # (n_chunks, B, Frame, chunk)
    amps = jnp.moveaxis(
        amplitudes_frames.reshape(b, -1, n_chunks, harmonic_chunk), 2, 0
    )
    levels = jnp.asarray(
        np.arange(1, n_chunks * harmonic_chunk + 1, dtype=np.float32), dtype=phase.dtype
    ).reshape(n_chunks, harmonic_chunk)

    def body(acc, inp):
        amp_f, lv = inp
        amp = upsample_frames(amp_f, block_size)  # (B, T, chunk)
        s = jnp.sin(phase[:, :, None] * lv[None, None, :])
        return acc + jnp.sum(amp * s, axis=-1), None

    out, _ = jax.lax.scan(body, jnp.zeros((b, t), dtype=phase.dtype), (amps, levels))
    return out
