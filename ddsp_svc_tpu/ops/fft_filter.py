"""Linear-phase time-varying FIR filtering in the frequency domain.

Behavioral contract from /root/reference/ddsp/core.py:128-337
(`frequency_filter` and helpers): frame-wise frequency responses are turned
into windowed impulse responses (static Hann or dynamic f0-dependent
half-width), the audio is cut into 50%-overlapped Bartlett-windowed frames,
convolved per-frame via FFT, overlap-added, and cropped to compensate the
linear-phase group delay (ir_size//2 head trim).

TPU-first difference: the reference FFT size is the exact linear-convolution
size ir+frame-1 (core.py:226 passes power_of_2=False) — on TPU we always pad
to the next power of two. Zero-padded linear convolution is exact under this
padding, so outputs are identical up to float rounding while the FFTs tile
onto hardware-friendly sizes (core.py:134 itself notes "TPU requires power
of 2").
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from .windows import hann_window, bartlett_window
from .spectral import frame_signal, overlap_add, next_pow2, rfft as _rfft, irfft as _irfft

# Backend for the framed spectral convolution inside fft_convolve:
#   'auto'   — XLA FFT when the native FFT op is usable; the fused Pallas
#              MXU DFT kernel when spectral mode is 'dft' (TPU SPMD/sharded
#              paths, where the FFT op is unavailable). Measured on v5e
#              (Sins forward, batch 2): XLA FFT 157x, Pallas 147x, plain
#              DFT matmuls 143x — so Pallas only replaces the DFT path.
#   'pallas' — force the Pallas kernel (interpret mode off-TPU; tests)
#   'xla'    — force the XLA FFT/DFT path
_CONV_BACKEND = "auto"


def set_conv_backend(mode: str) -> None:
    global _CONV_BACKEND
    assert mode in ("auto", "pallas", "xla"), mode
    _CONV_BACKEND = mode


def _use_pallas_conv(fft_size: int, frame_size: int) -> bool:
    import jax

    from .spectral import get_fft_mode

    if _CONV_BACKEND == "xla":
        return False
    if _CONV_BACKEND == "pallas":
        return True
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    return (
        on_tpu
        and get_fft_mode() == "dft"
        and fft_size & (fft_size - 1) == 0
        and frame_size % 8 == 0
    )


def _apply_window_to_impulse_response(ir: jnp.ndarray) -> jnp.ndarray:
    """Static full-size Hann windowing of a zero-phase IR; returns causal IR.

    (core.py:242-289, window_size==ir_size branch — the only one exercised.)
    """
    ir_size = ir.shape[-1]
    win = hann_window(ir_size, dtype=ir.dtype)
    win = jnp.roll(win, ir_size // 2)
    ir = ir * win
    return jnp.roll(ir, ir_size // 2, axis=-1)


def _apply_dynamic_window_to_impulse_response(
    ir: jnp.ndarray, half_width_frames: jnp.ndarray
) -> jnp.ndarray:
    """f0-dependent raised-cosine windowing (core.py:292-303).

    half_width_frames :: (B, Frame, 1) — window half-width in samples.
    Reproduces the reference exactly, including zeroing only the >1 side.
    """
    ir_size = ir.shape[-1]
    t = jnp.asarray(
        np.arange(-(ir_size // 2), (ir_size + 1) // 2), dtype=ir.dtype
    )
    win = t / half_width_frames
    win = jnp.where(win > 1.0, 0.0, win)
    win = (1.0 + jnp.cos(np.pi * win)) / 2.0
    ir = jnp.roll(ir, ir_size // 2, axis=-1)
    return ir * win


def _frequency_impulse_response(
    magnitudes: jnp.ndarray,
    hann_windowed: bool = True,
    half_width_frames: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Frequency response -> (windowed) causal impulse response (core.py:306-328).

    magnitudes :: (B, Frame, n_mags) complex (or real) half-spectrum.
    """
    from .spectral import irfft_any

    n_ir = 2 * (magnitudes.shape[-1] - 1)
    # n_ir is typically non-power-of-two (e.g. 510 for 256 mags) — route
    # through the TPU-safe transform
    ir = irfft_any(magnitudes.astype(jnp.complex64), n_ir)
    if hann_windowed:
        if half_width_frames is None:
            ir = _apply_window_to_impulse_response(ir)
        else:
            ir = _apply_dynamic_window_to_impulse_response(ir, half_width_frames)
    else:
        ir = jnp.roll(ir, ir.shape[-1] // 2, axis=-1)
    return ir


def fft_convolve(audio: jnp.ndarray, impulse_response: jnp.ndarray) -> jnp.ndarray:
    """Frame-wise FFT convolution with 50%-overlap Bartlett OLA (core.py:185-239).

    Args:
        audio :: (B, T)
        impulse_response :: (B, ir_size) or (B, Frame, ir_size)
    Returns:
        (B, T) filtered audio (group delay compensated)
    """
    if impulse_response.ndim == 2:
        impulse_response = impulse_response[:, None, :]
    _, n_ir_frames, ir_size = impulse_response.shape
    audio_size = audio.shape[-1]

    hop = audio_size // n_ir_frames
    frame_size = 2 * hop
    audio_padded = jnp.pad(audio, ((0, 0), (hop, hop)))
    audio_frames = frame_signal(audio_padded, frame_size, hop)  # (B, n+1, 2h)
    audio_frames = audio_frames * bartlett_window(frame_size, dtype=audio.dtype)

    fft_size = next_pow2(frame_size + ir_size - 1)
    ir_frames = jnp.concatenate(
        [impulse_response, impulse_response[:, -1:, :]], axis=1
    )
    if _use_pallas_conv(fft_size, frame_size):
        from .pallas_kernels import ltv_fir_convolve_pallas
        import jax

        b, nf = audio_frames.shape[:2]
        interpret = jax.default_backend() in ("cpu", "gpu")
        conv_frames = ltv_fir_convolve_pallas(
            audio_frames.reshape(b * nf, frame_size),
            ir_frames.reshape(b * nf, ir_size),
            fft_size,
            interpret,
        ).reshape(b, nf, fft_size)
    else:
        audio_fft = _rfft(audio_frames, fft_size)
        ir_fft = _rfft(ir_frames, fft_size)
        conv_frames = _irfft(audio_fft * ir_fft, fft_size)

    out = overlap_add(conv_frames, hop)
    start = hop + ir_size // 2
    return out[:, start : start + audio_size]


def frequency_filter(
    audio: jnp.ndarray,
    magnitudes: jnp.ndarray,
    hann_windowed: bool = True,
    half_width_frames: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Apply a frame-wise LTV-FIR filter given its frequency response
    (core.py:331-337)."""
    ir = _frequency_impulse_response(magnitudes, hann_windowed, half_width_frames)
    return fft_convolve(audio, ir)
