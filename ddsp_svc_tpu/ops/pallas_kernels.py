"""Pallas TPU kernels for the DSP hot paths.

Oscillator bank (the Sins synthesizer's dominant op, SURVEY §7 "Pallas
kernel targets"): out[t] = sum_k lerp(amp)[t, k] * sin((k+1) * phase[t]).
The XLA fallback (ops.exciters.oscillator_bank) materializes per-chunk
(B, T, H) intermediates in HBM; this kernel tiles time by frames so the
(frames, block, H) product lives entirely in VMEM and the amplitude
upsampling (linear interp between adjacent frames) fuses with the sine
evaluation and the harmonic reduction. H=128 harmonics lands exactly on the
TPU lane width; 8 frames per program satisfies the (8, 128) sublane/lane
tiling constraint.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FRAMES_PER_PROGRAM = 8


def _osc_kernel(phase_ref, amp_ref, out_ref, *, block_size: int):
    # phase_ref/out_ref: (FR, TILE); amp_ref: (FR, 2, H)
    fr, tile = phase_ref.shape
    h = amp_ref.shape[-1]
    phase = phase_ref[:, :]
    a0 = amp_ref[:, 0, :]  # (FR, H)
    a1 = amp_ref[:, 1, :]
    frac = (
        jax.lax.broadcasted_iota(jnp.int32, (1, tile, 1), 1).astype(jnp.float32)
        / block_size
    )
    amp = a0[:, None, :] * (1.0 - frac) + a1[:, None, :] * frac  # (FR,TILE,H)
    levels = 1.0 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, h), 2).astype(
        jnp.float32
    )
    s = jnp.sin(phase[:, :, None] * levels)
    out_ref[:, :] = jnp.sum(amp * s, axis=-1)


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def oscillator_bank_pallas(
    phase: jnp.ndarray,
    amplitudes_frames: jnp.ndarray,
    block_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused additive synthesis. phase :: (B, T) [rad];
    amplitudes_frames :: (B, F, H) with T == F * block_size. -> (B, T)."""
    b, t = phase.shape
    _, f, h = amplitudes_frames.shape
    assert t == f * block_size, (t, f, block_size)
    h_pad = max(128, ((h + 127) // 128) * 128)
    if h_pad != h:
        amplitudes_frames = jnp.pad(
            amplitudes_frames, ((0, 0), (0, 0), (0, h_pad - h))
        )
    # frame pairs (j, j+1), last frame repeated; flatten (B, F) -> rows
    ext = jnp.concatenate(
        [amplitudes_frames, amplitudes_frames[:, -1:, :]], axis=1
    )
    pairs = jnp.stack([ext[:, :-1, :], ext[:, 1:, :]], axis=2)  # (B,F,2,H)
    n_rows = b * f
    fr = FRAMES_PER_PROGRAM
    rows_pad = (-n_rows) % fr
    phase_rows = phase.reshape(n_rows, block_size)
    amp_rows = pairs.reshape(n_rows, 2, h_pad)
    if rows_pad:
        phase_rows = jnp.pad(phase_rows, ((0, rows_pad), (0, 0)))
        amp_rows = jnp.pad(amp_rows, ((0, rows_pad), (0, 0), (0, 0)))

    kernel = functools.partial(_osc_kernel, block_size=block_size)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(phase_rows.shape, phase.dtype),
        grid=(phase_rows.shape[0] // fr,),
        in_specs=[
            pl.BlockSpec(
                (fr, block_size), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (fr, 2, h_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (fr, block_size), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(phase_rows, amp_rows)
    return out[:n_rows].reshape(b, t)


# ----------------------- magnitude STFT as MXU DFT --------------------------
#
# The multi-resolution spectral loss evaluates |STFT| at sizes 128..2048 every
# training step. XLA lowers FFTs to the VPU; at these sizes the same transform
# expressed as a real DFT matmul runs on the MXU instead. The kernel tiles
# (frames x n_fft) @ (n_fft x freq_tile) with cos/sin weight blocks streamed
# through VMEM and fuses the magnitude. Backward is provided via custom_vjp
# (two transposed matmuls, left to XLA).


def _dft_mag_kernel(frames_ref, cos_ref, sin_ref, out_ref):
    f = frames_ref[:, :]  # (FT, N)
    c = cos_ref[:, :]  # (N, KT)
    s = sin_ref[:, :]
    re = jnp.dot(f, c, preferred_element_type=jnp.float32)
    im = -jnp.dot(f, s, preferred_element_type=jnp.float32)
    out_ref[:, :] = jnp.sqrt(re * re + im * im + 1e-12)


def _dft_mag_fwd_impl(frames: jnp.ndarray, n_fft: int, interpret: bool) -> jnp.ndarray:
    from .spectral import _dft_matrices

    nf, n = frames.shape
    assert n == n_fft
    bins = n_fft // 2 + 1
    cos_np, sin_np = _dft_matrices(n_fft)
    kt = 128
    bins_pad = ((bins + kt - 1) // kt) * kt
    cos = jnp.asarray(np.pad(cos_np, ((0, 0), (0, bins_pad - bins))))
    sin = jnp.asarray(np.pad(sin_np, ((0, 0), (0, bins_pad - bins))))
    ft = 128
    nf_pad = ((nf + ft - 1) // ft) * ft
    if nf_pad != nf:
        frames = jnp.pad(frames, ((0, nf_pad - nf), (0, 0)))
    out = pl.pallas_call(
        _dft_mag_kernel,
        out_shape=jax.ShapeDtypeStruct((nf_pad, bins_pad), jnp.float32),
        grid=(nf_pad // ft, bins_pad // kt),
        in_specs=[
            pl.BlockSpec((ft, n_fft), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, kt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, kt), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ft, kt), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(frames, cos, sin)
    return out[:nf, :bins]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def dft_magnitude_pallas(frames, n_fft: int, interpret: bool = False):
    """|rfft(frames, n_fft)| as an MXU matmul. frames :: (F, n_fft)."""
    return _dft_mag_fwd_impl(frames, n_fft, interpret)


def _dft_mag_vjp_fwd(frames, n_fft, interpret):
    mag = _dft_mag_fwd_impl(frames, n_fft, interpret)
    return mag, (frames, mag)


def _dft_mag_vjp_bwd(n_fft, interpret, res, g):
    from .spectral import _dft_matrices

    frames, mag = res
    cos_np, sin_np = _dft_matrices(n_fft)
    cos = jnp.asarray(cos_np)
    sin = jnp.asarray(sin_np)
    re = frames @ cos
    im = -(frames @ sin)
    inv = g / jnp.maximum(mag, 1e-12)
    # d|X|/dframes = (re * C^T - im * S^T) / |X|
    g_frames = (inv * re) @ cos.T - (inv * im) @ sin.T
    return (g_frames,)


dft_magnitude_pallas.defvjp(_dft_mag_vjp_fwd, _dft_mag_vjp_bwd)


def oscillator_bank_auto(
    phase: jnp.ndarray, amplitudes_frames: jnp.ndarray, block_size: int,
    harmonic_chunk: int = 32,
) -> jnp.ndarray:
    """Dispatch: Pallas on TPU backends, XLA scan elsewhere."""
    from .exciters import oscillator_bank

    t = phase.shape[1]
    f = amplitudes_frames.shape[1]
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu and t == f * block_size and block_size % 128 == 0:
        return oscillator_bank_pallas(phase, amplitudes_frames, block_size)
    return oscillator_bank(phase, amplitudes_frames, block_size, harmonic_chunk)


# ------------------- LTV-FIR spectral convolution on the MXU -----------------
#
# fft_convolve (ops/fft_filter.py; reference core.py:185-239) multiplies the
# spectra of Bartlett-windowed audio frames with per-frame impulse-response
# spectra. XLA lowers the three FFTs to the VPU; here the whole
# rfft(a) * rfft(h) -> irfft chain runs as MXU matmuls against shared
# cos/sin DFT blocks, fused in one kernel (no HBM round-trip for the
# spectra). Grid: (frame blocks, bin blocks) with the inverse-transform
# contribution of each bin block accumulated into the output rows.

_LTV_FT = 128   # frame rows per program
_LTV_KT = 128   # frequency bins per program


def _ltv_conv_kernel(a_ref, h_ref, cos_ref, sin_ref, out_ref, *, n_fft: int):
    j = pl.program_id(1)
    a = a_ref[:, :]          # (FT, frame_size)
    h = h_ref[:, :]          # (FT, ir_pad)
    c = cos_ref[:, :]        # (n_fft, KT)
    s = sin_ref[:, :]
    ca, sa = c[: a.shape[-1]], s[: a.shape[-1]]
    ch, sh = c[: h.shape[-1]], s[: h.shape[-1]]
    ar = jnp.dot(a, ca, preferred_element_type=jnp.float32)
    ai = -jnp.dot(a, sa, preferred_element_type=jnp.float32)
    br = jnp.dot(h, ch, preferred_element_type=jnp.float32)
    bi = -jnp.dot(h, sh, preferred_element_type=jnp.float32)
    pr = ar * br - ai * bi
    pi = ar * bi + ai * br
    # irfft bin weights: 1/n at DC and Nyquist, 2/n elsewhere, 0 for the
    # padded bins beyond n_fft//2
    k = j * _LTV_KT + jax.lax.broadcasted_iota(jnp.int32, (1, _LTV_KT), 1)
    w = jnp.where((k == 0) | (k == n_fft // 2), 1.0, 2.0) / n_fft
    w = jnp.where(k > n_fft // 2, 0.0, w)
    contrib = (
        jnp.dot(w * pr, c.T, preferred_element_type=jnp.float32)
        - jnp.dot(w * pi, s.T, preferred_element_type=jnp.float32)
    )

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = contrib

    @pl.when(j > 0)
    def _():
        out_ref[:, :] += contrib


def _spectral_convolve_dft(a: jnp.ndarray, h: jnp.ndarray, n_fft: int):
    """Plain-jnp reference of the same math (used for the VJP and tests).

    a :: (R, frame_size), h :: (R, ir_size) -> (R, n_fft)."""
    from .spectral import _dft_matrices

    cos_np, sin_np = _dft_matrices(n_fft)
    c, s = jnp.asarray(cos_np), jnp.asarray(sin_np)
    ar = a @ c[: a.shape[-1]]
    ai = -(a @ s[: a.shape[-1]])
    br = h @ c[: h.shape[-1]]
    bi = -(h @ s[: h.shape[-1]])
    pr = ar * br - ai * bi
    pi = ar * bi + ai * br
    k = np.arange(n_fft // 2 + 1)
    w = jnp.asarray(
        (np.where((k == 0) | (k == n_fft // 2), 1.0, 2.0) / n_fft
         ).astype(np.float32)
    )
    return (w * pr) @ c.T - (w * pi) @ s.T


def _ltv_conv_fwd_impl(a: jnp.ndarray, h: jnp.ndarray, n_fft: int,
                       interpret: bool) -> jnp.ndarray:
    from .spectral import _dft_matrices

    rows, frame_size = a.shape
    ir_size = h.shape[-1]
    bins = n_fft // 2 + 1
    bins_pad = ((bins + _LTV_KT - 1) // _LTV_KT) * _LTV_KT
    cos_np, sin_np = _dft_matrices(n_fft)
    cos = jnp.asarray(np.pad(cos_np, ((0, 0), (0, bins_pad - bins))))
    sin = jnp.asarray(np.pad(sin_np, ((0, 0), (0, bins_pad - bins))))
    rows_pad = ((rows + _LTV_FT - 1) // _LTV_FT) * _LTV_FT
    ir_pad = ((ir_size + 7) // 8) * 8
    if rows_pad != rows:
        a = jnp.pad(a, ((0, rows_pad - rows), (0, 0)))
        h = jnp.pad(h, ((0, rows_pad - rows), (0, 0)))
    if ir_pad != ir_size:  # zero rows of the DFT matrix contribute nothing
        h = jnp.pad(h, ((0, 0), (0, ir_pad - ir_size)))
    kernel = functools.partial(_ltv_conv_kernel, n_fft=n_fft)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows_pad, n_fft), jnp.float32),
        grid=(rows_pad // _LTV_FT, bins_pad // _LTV_KT),
        in_specs=[
            pl.BlockSpec((_LTV_FT, frame_size), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LTV_FT, ir_pad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, _LTV_KT), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, _LTV_KT), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_LTV_FT, n_fft), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, h, cos, sin)
    return out[:rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def ltv_fir_convolve_pallas(a_frames, ir_frames, n_fft: int,
                            interpret: bool = False):
    """Per-row spectral convolution irfft(rfft(a) * rfft(h), n_fft) fused as
    MXU DFT matmuls. a_frames :: (R, frame_size), ir_frames :: (R, ir_size),
    n_fft >= frame_size + ir_size - 1 (zero-padded linear convolution)."""
    return _ltv_conv_fwd_impl(a_frames, ir_frames, n_fft, interpret)


def _ltv_conv_vjp_fwd(a_frames, ir_frames, n_fft, interpret):
    out = _ltv_conv_fwd_impl(a_frames, ir_frames, n_fft, interpret)
    return out, (a_frames, ir_frames)


def _ltv_conv_vjp_bwd(n_fft, interpret, res, g):
    a_frames, ir_frames = res
    _, vjp = jax.vjp(
        lambda a, h: _spectral_convolve_dft(a, h, n_fft), a_frames, ir_frames
    )
    return vjp(g)


ltv_fir_convolve_pallas.defvjp(_ltv_conv_vjp_fwd, _ltv_conv_vjp_bwd)
