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
    y = phase[:, :, None] * levels
    # wrap to [-pi, pi] before the sine: |y| reaches ~128*pi at the top
    # harmonic, where fp32 sin takes its slow large-argument reduction path
    y = y - (2.0 * np.pi) * jnp.round(y * (0.5 / np.pi))
    out_ref[:, :] = jnp.sum(amp * jnp.sin(y), axis=-1)


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


# ------------------ fused NSF harmonic source (VPU) -------------------------
#
# SineGen + SourceModuleHnNSF merge (reference nsf_hifigan/models.py:139-218):
# out[t] = tanh(b + sum_k w_k * amp * sin(2pi*(start_k + rad_k * s))) for
# sample s within each frame. The XLA lowering (harmonic_source_fused)
# materializes the (B, F, upp, H) sine bank in HBM (~300 MB at the batch-32
# headline geometry — measured 33 ms, vs a ~0.1 ms traffic roof). Here each
# program keeps its frames' H=9 per-harmonic phases in registers and writes
# only the merged (rows, upp) audio; per harmonic the phase ramp is a scalar
# fma over the frame, so the whole bank never exists anywhere.

_HS_FR = 64  # frame rows per program (amortizes ~10 us/program fixed cost;
# VMEM per program at upp=512: ~4 live (FR, upp) fp32 buffers = 0.5 MB)


def _harmonic_source_kernel(start_ref, rad_ref, wb_ref, out_ref, *,
                            upp: int, n_h: int, sine_amp: float):
    s = (
        1.0
        + jax.lax.broadcasted_iota(jnp.int32, (1, upp), 1).astype(jnp.float32)
    )
    acc = None
    for k in range(n_h):
        ph = start_ref[:, k][:, None] + rad_ref[:, k][:, None] * s
        # wrap to (-0.5, 0.5] rotations before the sine: |arg| <= pi skips
        # the transcendental's large-argument reduction path (the in-frame
        # ramp reaches |ph| ~ upp/2 rotations, where fp32 sin is slow and no
        # more accurate than the wrapped form — the phase itself already
        # carries ulp(ph) quantization)
        ph = ph - jnp.round(ph)
        term = wb_ref[0, k] * jnp.sin(2.0 * np.pi * ph)
        acc = term if acc is None else acc + term
    out_ref[:, :] = jnp.tanh(sine_amp * acc + wb_ref[0, n_h])


@functools.partial(
    jax.jit, static_argnames=("upp", "sine_amp", "interpret")
)
def harmonic_source_pallas(
    start: jnp.ndarray,
    rad: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    upp: int,
    sine_amp: float = 0.1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused harmonic source. start/rad :: (B, F, H) per-frame start rotation
    and per-sample rotation increment; w :: (H,), b :: scalar (the
    SourceModuleHnNSF merge Linear). Returns tanh-merged audio (B, F*upp)."""
    bsz, f, h = start.shape
    n_rows = bsz * f
    fr = _HS_FR
    rows_pad = (-n_rows) % fr
    h_pad = 128  # one lane tile; h is tiny (9)
    pack = lambda a: jnp.pad(
        a.reshape(n_rows, h), ((0, rows_pad), (0, h_pad - h))
    )
    wb = jnp.concatenate([w, jnp.asarray(b)[None]])
    wb = jnp.pad(wb, (0, h_pad - h - 1))[None, :]
    kernel = functools.partial(
        _harmonic_source_kernel, upp=upp, n_h=h, sine_amp=sine_amp
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows + rows_pad, upp), jnp.float32),
        grid=((n_rows + rows_pad) // fr,),
        in_specs=[
            pl.BlockSpec((fr, h_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fr, h_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((fr, upp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pack(start), pack(rad), wb)
    return out[:n_rows].reshape(bsz, f * upp)


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


def _dft_mag_fwd_impl(frames: jnp.ndarray, n_fft: int, interpret: bool,
                      mxu_bf16: bool = False) -> jnp.ndarray:
    from .spectral import _dft_matrices

    nf, n = frames.shape
    assert n == n_fft
    bins = n_fft // 2 + 1
    cos_np, sin_np = _dft_matrices(n_fft)
    kt = 128
    bins_pad = ((bins + kt - 1) // kt) * kt
    in_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32
    cos = jnp.asarray(np.pad(cos_np, ((0, 0), (0, bins_pad - bins))),
                      dtype=in_dtype)
    sin = jnp.asarray(np.pad(sin_np, ((0, 0), (0, bins_pad - bins))),
                      dtype=in_dtype)
    ft = 128
    nf_pad = ((nf + ft - 1) // ft) * ft
    frames = frames.astype(in_dtype)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def dft_magnitude_pallas(frames, n_fft: int, interpret: bool = False,
                         mxu_bf16: bool = False):
    """|rfft(frames, n_fft)| as an MXU matmul. frames :: (F, n_fft).

    mxu_bf16=True feeds the MXU bf16 inputs (fp32 accumulation): 4x the
    matmul rate for ~2^-9 relative magnitude error — the staged-bf16
    enhancer configuration uses this for the mel frontend."""
    return _dft_mag_fwd_impl(frames, n_fft, interpret, mxu_bf16)


def _dft_mag_vjp_fwd(frames, n_fft, interpret, mxu_bf16):
    mag = _dft_mag_fwd_impl(frames, n_fft, interpret, mxu_bf16)
    return mag, (frames, mag)


def _dft_mag_vjp_bwd(n_fft, interpret, mxu_bf16, res, g):
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


# ------------------ fused Performer attention (FAVOR+) ----------------------
#
# The PCmer's non-causal attention (nn/pcmer.py softmax_kernel +
# linear_attention; reference pcmer.py:69-159) computes (B, H, T, m=266)
# feature tensors for q and k — at the batch-128 headline geometry ~0.5 GB
# each in HBM, round-tripped through the fp32 exp stabilization. This kernel
# processes one (batch row, head-group) per program: features, the (m, d)
# context, the key-sum and the normalized output all live in VMEM; HBM sees
# q/k/v once and the output once. Head loop inside the program keeps the
# live set small. Inference-path only (the PCmer plumbs `infer`); training
# keeps the XLA formulation and its full-precision gradients.

def _performer_attn_kernel(q_ref, k_ref, v_ref, proj_ref, vf_ref, out_ref, *,
                           n_heads: int, m_real: int, eps: float,
                           stab_eps: float, mxu_bf16: bool, masked: bool):
    # refs: (1, H, d, T) q/k/v (feature-major: last dims (d, T) satisfy the
    # (8, 128) tiling); (d, m_pad) projection (pre-transposed, pre-scaled by
    # d**-0.25); out (1, H, d, T). Everything per head computes in the
    # (m, T) orientation so the diag/max/denom (1, T) rows broadcast.
    cast = (lambda x: x.astype(jnp.bfloat16)) if mxu_bf16 else (lambda x: x)
    m_pad = proj_ref.shape[-1]
    d = proj_ref.shape[0]
    ratio = m_real ** -0.5
    row = jax.lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)
    valid = (row < m_real).astype(jnp.float32)
    if masked:
        # bucket-padding time mask: key features beyond this row's
        # valid_frames are zeroed so padded positions feed neither the
        # context sums nor the denominator — identical semantics to the XLA
        # fallback's `k * (arange(T) < valid_frames)` (nn/pcmer.py). The
        # (B, 1) lengths array sits whole in SMEM (Mosaic requires full-dim
        # SMEM blocks); each program reads its own row.
        t = q_ref.shape[-1]
        col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
        tmask = (col < vf_ref[pl.program_id(0), 0]).astype(jnp.float32)
    proj = proj_ref[:, :]
    for h in range(n_heads):
        q = q_ref[0, h]  # (d, T) fp32
        k = k_ref[0, h]
        v = v_ref[0, h]
        # ddT :: (m, T) = proj^T-major features
        dd_q = jax.lax.dot_general(
            proj, cast(q), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dd_k = jax.lax.dot_general(
            proj, cast(k), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        neg = -1e30  # pad feature rows must not win the max / contribute
        dd_q = jnp.where(valid > 0, dd_q, neg)
        dd_k = jnp.where(valid > 0, dd_k, neg)
        # diag = |x|^2/2 * d^-0.5 (x raw here; softmax_kernel folds the
        # d^-0.25 normalizer into the squared norm)
        dq = jnp.sum(q * q, axis=0, keepdims=True) * (0.5 / np.sqrt(d))
        dk = jnp.sum(k * k, axis=0, keepdims=True) * (0.5 / np.sqrt(d))
        qf = ratio * (
            jnp.exp(dd_q - dq - jnp.max(dd_q, axis=0, keepdims=True))
            + stab_eps
        ) * valid
        kf = ratio * jnp.exp(dd_k - dk + stab_eps) * valid
        if masked:
            kf = kf * tmask
        # context :: (m, d) = sum_t kf[:, t] v[:, t]^T
        ctx = jax.lax.dot_general(
            cast(kf), cast(v), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        k_sum = jnp.sum(kf, axis=1, keepdims=True)  # (m, 1)
        denom = jax.lax.dot_general(
            cast(k_sum), cast(qf), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + eps  # (1, T)
        num = jax.lax.dot_general(
            cast(ctx), cast(qf), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, T)
        out_ref[0, h] = num / denom


def performer_attention_reference(q, k, v, projection):
    """XLA reference: softmax_kernel(q/k) + linear_attention, matching
    nn/pcmer.py numerics. q/k/v :: (B, H, T, d)."""
    from ..nn.pcmer import softmax_kernel, linear_attention

    qf = softmax_kernel(q, projection, is_query=True)
    kf = softmax_kernel(k, projection, is_query=False)
    return linear_attention(qf, kf, v)


@functools.partial(
    jax.jit, static_argnames=("mxu_bf16", "interpret")
)
def performer_attention_pallas(
    q, k, v, projection, mxu_bf16: bool = False, interpret: bool = False,
    valid_frames=None,
):
    """Fused FAVOR+ attention. q/k/v :: (B, H, T, d); projection :: (m, d).
    Returns (B, H, T, d) fp32. Requires T % 128 == 0 and d % 8 == 0 (the
    caller transposes into the kernel's feature-major (B, H, d, T) layout).

    valid_frames (traced int scalar or per-item (B,) vector, optional):
    zero the key features at positions >= valid_frames — the bucket-padded
    inference mask (same semantics as the XLA fallback path in
    nn/pcmer.py). Each batch row's program reads its own length from SMEM.
    Output rows beyond valid_frames are meaningless, as in the fallback."""
    b, h, t, d = q.shape
    m = projection.shape[0]
    m_pad = -(-m // 128) * 128
    # pre-transpose + pre-scale the projection: dd = (x d^-0.25) @ proj^T
    pt = jnp.pad(
        jnp.transpose(projection, (1, 0)) * (d ** -0.25),
        ((0, 0), (0, m_pad - m)),
    )
    in_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32
    pt = pt.astype(in_dtype)
    tr = lambda x: jnp.transpose(x.astype(jnp.float32), (0, 1, 3, 2))
    masked = valid_frames is not None
    vf = jnp.broadcast_to(
        jnp.asarray(t if valid_frames is None else valid_frames,
                    jnp.int32).reshape(-1, 1),
        (b, 1),
    )
    kernel = functools.partial(
        _performer_attn_kernel, n_heads=h, m_real=m, eps=1e-8,
        stab_eps=1e-4, mxu_bf16=mxu_bf16, masked=masked,
    )
    qkv_spec = pl.BlockSpec((1, h, d, t), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, d, t), jnp.float32),
        grid=(b,),
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((d, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, d, t), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tr(q), tr(k), tr(v), pt, vf)
    return jnp.transpose(out, (0, 1, 3, 2))


# ------------------ fused CombSubFast spectral chain ------------------------
#
# The CombSubFast synthesizer's STFT-domain filtering (reference
# ddsp/vocoder.py:472-487) is rfft(tooth)*exp(mag + j*pi*phase) +
# rfft(noise)*exp(noise_mag)/128 -> irfft -> *window, per 50%-overlap frame.
# XLA lowers the three 2*block-point FFTs to the VPU and round-trips every
# intermediate (two complex spectra, the filter tensors, the product) through
# HBM — the largest remaining FFT consumer of the headline program
# (ROADMAP.md). Here the whole chain runs as MXU DFT matmuls against shared
# cos/sin blocks with the filter construction (exp/cos/sin of the PCmer
# controls) fused in-core; HBM sees the windowed excitation frames once and
# the windowed output frames once. Grid: (frame rows, bin blocks) with each
# bin block's inverse-transform contribution accumulated into the output
# rows (same revisiting pattern as the LTV-FIR kernel above).

_CS_FT = 128   # frame rows per program
_CS_KT = 128   # frequency bins per program


def _combsub_spectral_kernel(
    a_ref, n_ref, hm_ref, hp_ref, nm_ref, cos_ref, sin_ref, win_ref, out_ref,
    *, n_fft: int, mxu_bf16: bool,
):
    j = pl.program_id(1)
    cast = (lambda v: v.astype(jnp.bfloat16)) if mxu_bf16 else (lambda v: v)
    a = cast(a_ref[:, :])       # (FT, n_fft) windowed tooth frames
    nz = cast(n_ref[:, :])      # (FT, n_fft) windowed noise frames
    c = cos_ref[:, :]           # (n_fft, KT)
    s = sin_ref[:, :]
    ar = jnp.dot(a, c, preferred_element_type=jnp.float32)
    ai = -jnp.dot(a, s, preferred_element_type=jnp.float32)
    nr = jnp.dot(nz, c, preferred_element_type=jnp.float32)
    ni = -jnp.dot(nz, s, preferred_element_type=jnp.float32)
    # per-frame complex filters from the raw PCmer controls (vocoder.py:472-476)
    mag = jnp.exp(hm_ref[:, :])
    ph = np.pi * hp_ref[:, :]
    fr = mag * jnp.cos(ph)
    fi = mag * jnp.sin(ph)
    nf = jnp.exp(nm_ref[:, :]) * (1.0 / 128.0)
    pr = ar * fr - ai * fi + nr * nf
    pi_ = ar * fi + ai * fr + ni * nf
    # irfft bin weights: 1/n at DC/Nyquist, 2/n elsewhere, 0 for padded bins
    k = j * _CS_KT + jax.lax.broadcasted_iota(jnp.int32, (1, _CS_KT), 1)
    w = jnp.where((k == 0) | (k == n_fft // 2), 1.0, 2.0) / n_fft
    w = jnp.where(k > n_fft // 2, 0.0, w)
    contrib = (
        jnp.dot(cast(w * pr), c.T, preferred_element_type=jnp.float32)
        - jnp.dot(cast(w * pi_), s.T, preferred_element_type=jnp.float32)
    ) * win_ref[0:1, :]  # synthesis window folds into the j-sum linearly

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = contrib

    @pl.when(j > 0)
    def _():
        out_ref[:, :] += contrib


def _combsub_spectral_ref(tooth_frames, noise_frames, hm, hp, nm, n_fft):
    """Plain-jnp reference of the same chain (VJP + tests). Rows layout:
    all inputs (R, ...); returns windowed output frames (R, n_fft)."""
    from .spectral import rfft_any, irfft_any
    from .windows import sqrt_hann_window

    tf = rfft_any(tooth_frames, n_fft)
    nf = rfft_any(noise_frames, n_fft)
    flt = jnp.exp(hm + 1j * np.pi * hp)
    nflt = jnp.exp(nm) / 128.0
    sig = irfft_any(tf * flt + nf * nflt, n_fft)
    return sig * sqrt_hann_window(n_fft, dtype=sig.dtype)


def _combsub_spectral_fwd_impl(
    tooth_frames, noise_frames, hm, hp, nm, n_fft, mxu_bf16, interpret,
):
    from .spectral import _dft_matrices

    rows, fs = tooth_frames.shape
    assert fs == n_fft, (fs, n_fft)
    bins = n_fft // 2 + 1
    bins_pad = -(-bins // _CS_KT) * _CS_KT
    rows_pad = -(-rows // _CS_FT) * _CS_FT
    in_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32
    cos_np, sin_np = _dft_matrices(n_fft)
    cos = jnp.asarray(np.pad(cos_np, ((0, 0), (0, bins_pad - bins))),
                      dtype=in_dtype)
    sin = jnp.asarray(np.pad(sin_np, ((0, 0), (0, bins_pad - bins))),
                      dtype=in_dtype)
    pad_r = rows_pad - rows
    if pad_r:
        tooth_frames = jnp.pad(tooth_frames, ((0, pad_r), (0, 0)))
        noise_frames = jnp.pad(noise_frames, ((0, pad_r), (0, 0)))
    ctl = [
        jnp.pad(v, ((0, pad_r), (0, bins_pad - bins))) for v in (hm, hp, nm)
    ]
    win_np = np.sqrt(
        0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / max(n_fft, 1))
    ).astype(np.float32)  # sqrt_hann_window as a host constant
    win = jnp.asarray(np.pad(win_np[None, :], ((0, 7), (0, 0))))
    kernel = functools.partial(
        _combsub_spectral_kernel, n_fft=n_fft, mxu_bf16=mxu_bf16
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows_pad, n_fft), jnp.float32),
        grid=(rows_pad // _CS_FT, bins_pad // _CS_KT),
        in_specs=[
            pl.BlockSpec((_CS_FT, n_fft), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CS_FT, n_fft), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CS_FT, _CS_KT), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CS_FT, _CS_KT), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_CS_FT, _CS_KT), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, _CS_KT), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, _CS_KT), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_fft), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_CS_FT, n_fft), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tooth_frames, noise_frames, *ctl, cos, sin, win)
    return out[:rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def combsub_spectral_pallas(
    tooth_frames, noise_frames, hm, hp, nm, n_fft: int,
    mxu_bf16: bool = False, interpret: bool = False,
):
    """CombSubFast STFT-domain filtering fused as MXU DFT matmuls.

    tooth_frames/noise_frames :: (R, n_fft) windowed excitation frames;
    hm/hp/nm :: (R, n_fft//2+1) raw PCmer controls (harmonic log-magnitude,
    harmonic phase/pi, noise log-magnitude). Returns the windowed output
    frames (R, n_fft): irfft(rfft(tooth)*exp(hm+j*pi*hp) +
    rfft(noise)*exp(nm)/128) * sqrt_hann. Backward runs the XLA reference."""
    return _combsub_spectral_fwd_impl(
        tooth_frames, noise_frames, hm, hp, nm, n_fft, mxu_bf16, interpret
    )


def _combsub_spectral_bwd_kernel(
    g_ref, a_ref, n_ref, hm_ref, hp_ref, nm_ref, cos_ref, sin_ref, win_ref,
    da_ref, dn_ref, dhm_ref, dhp_ref, dnm_ref, *, n_fft: int, mxu_bf16: bool,
):
    """Analytic adjoint of the forward chain — the same DFT-matmul structure
    (6 forward-direction dots + 4 inverse dots per bin block) instead of the
    XLA-replay VJP (~6x the kernel's work).

    y = irfft(A*H + N*G) .* win with A = rfft(a), N = rfft(n),
    H = exp(hm + j*pi*hp), G = exp(nm)/128."""
    j = pl.program_id(1)
    cast = (lambda v: v.astype(jnp.bfloat16)) if mxu_bf16 else (lambda v: v)
    c = cos_ref[:, :]
    s = sin_ref[:, :]
    gw = cast(g_ref[:, :] * win_ref[0:1, :])
    k = j * _CS_KT + jax.lax.broadcasted_iota(jnp.int32, (1, _CS_KT), 1)
    w = jnp.where((k == 0) | (k == n_fft // 2), 1.0, 2.0) / n_fft
    w = jnp.where(k > n_fft // 2, 0.0, w)
    dSr = jnp.dot(gw, c, preferred_element_type=jnp.float32) * w
    dSi = -jnp.dot(gw, s, preferred_element_type=jnp.float32) * w
    a = cast(a_ref[:, :])
    nz = cast(n_ref[:, :])
    ar = jnp.dot(a, c, preferred_element_type=jnp.float32)
    ai = -jnp.dot(a, s, preferred_element_type=jnp.float32)
    nr = jnp.dot(nz, c, preferred_element_type=jnp.float32)
    ni = -jnp.dot(nz, s, preferred_element_type=jnp.float32)
    mag = jnp.exp(hm_ref[:, :])
    ph = np.pi * hp_ref[:, :]
    hr = mag * jnp.cos(ph)
    hi = mag * jnp.sin(ph)
    gq = jnp.exp(nm_ref[:, :]) * (1.0 / 128.0)
    # filter-control grads (per bin block, written once)
    dHr = dSr * ar + dSi * ai
    dHi = -dSr * ai + dSi * ar
    dhm_ref[:, :] = dHr * hr + dHi * hi
    dhp_ref[:, :] = np.pi * (-dHr * hi + dHi * hr)
    dnm_ref[:, :] = (dSr * nr + dSi * ni) * gq
    # excitation grads (accumulated over bin blocks)
    dAr = dSr * hr + dSi * hi
    dAi = -dSr * hi + dSi * hr
    da = (
        jnp.dot(cast(dAr), c.T, preferred_element_type=jnp.float32)
        - jnp.dot(cast(dAi), s.T, preferred_element_type=jnp.float32)
    )
    dNr = dSr * gq
    dNi = dSi * gq
    dn = (
        jnp.dot(cast(dNr), c.T, preferred_element_type=jnp.float32)
        - jnp.dot(cast(dNi), s.T, preferred_element_type=jnp.float32)
    )

    @pl.when(j == 0)
    def _():
        da_ref[:, :] = da
        dn_ref[:, :] = dn

    @pl.when(j > 0)
    def _():
        da_ref[:, :] += da
        dn_ref[:, :] += dn


def _combsub_spectral_bwd_impl(
    g, tooth_frames, noise_frames, hm, hp, nm, n_fft, mxu_bf16, interpret,
):
    from .spectral import _dft_matrices

    rows, fs = tooth_frames.shape
    bins = n_fft // 2 + 1
    bins_pad = -(-bins // _CS_KT) * _CS_KT
    rows_pad = -(-rows // _CS_FT) * _CS_FT
    in_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32
    cos_np, sin_np = _dft_matrices(n_fft)
    cos = jnp.asarray(np.pad(cos_np, ((0, 0), (0, bins_pad - bins))),
                      dtype=in_dtype)
    sin = jnp.asarray(np.pad(sin_np, ((0, 0), (0, bins_pad - bins))),
                      dtype=in_dtype)
    pad_r = rows_pad - rows
    if pad_r:
        g = jnp.pad(g, ((0, pad_r), (0, 0)))
        tooth_frames = jnp.pad(tooth_frames, ((0, pad_r), (0, 0)))
        noise_frames = jnp.pad(noise_frames, ((0, pad_r), (0, 0)))
    ctl = [
        jnp.pad(v, ((0, pad_r), (0, bins_pad - bins))) for v in (hm, hp, nm)
    ]
    win_np = np.sqrt(
        0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / max(n_fft, 1))
    ).astype(np.float32)
    win = jnp.asarray(np.pad(win_np[None, :], ((0, 7), (0, 0))))
    kernel = functools.partial(
        _combsub_spectral_bwd_kernel, n_fft=n_fft, mxu_bf16=mxu_bf16
    )
    row_spec = pl.BlockSpec((_CS_FT, n_fft), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    ctl_spec = pl.BlockSpec((_CS_FT, _CS_KT), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((n_fft, _CS_KT), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    da, dn, dhm, dhp, dnm = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows_pad, n_fft), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, n_fft), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, bins_pad), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, bins_pad), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, bins_pad), jnp.float32),
        ),
        grid=(rows_pad // _CS_FT, bins_pad // _CS_KT),
        in_specs=[
            row_spec, row_spec, row_spec, ctl_spec, ctl_spec, ctl_spec,
            mat_spec, mat_spec,
            pl.BlockSpec((8, n_fft), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(row_spec, row_spec, ctl_spec, ctl_spec, ctl_spec),
        interpret=interpret,
    )(g, tooth_frames, noise_frames, *ctl, cos, sin, win)
    return (
        da[:rows], dn[:rows],
        dhm[:rows, :bins], dhp[:rows, :bins], dnm[:rows, :bins],
    )


def _combsub_spectral_vjp_fwd(tooth_frames, noise_frames, hm, hp, nm, n_fft,
                              mxu_bf16, interpret):
    out = _combsub_spectral_fwd_impl(
        tooth_frames, noise_frames, hm, hp, nm, n_fft, mxu_bf16, interpret
    )
    return out, (tooth_frames, noise_frames, hm, hp, nm)


def _combsub_spectral_vjp_bwd(n_fft, mxu_bf16, interpret, res, g):
    tooth_frames, noise_frames, hm, hp, nm = res
    return _combsub_spectral_bwd_impl(
        g, tooth_frames, noise_frames, hm, hp, nm, n_fft, mxu_bf16, interpret
    )


combsub_spectral_pallas.defvjp(_combsub_spectral_vjp_fwd,
                               _combsub_spectral_vjp_bwd)


# ------------------ fused NSF-HiFiGAN resblock trio ---------------------
#
# The generator's narrow late stages (C=64/32/16 at 65k-262k samples) are
# HBM-bandwidth-bound: each stage runs 18 small dilated convs
# (3 resblocks x 3 dilations x 2 convs, models.py:46-63 in the reference)
# and XLA round-trips the (B, T, C) activation to HBM around every one —
# measured 44/61/88 ms per stage at batch 8 vs a ~6.6 ms traffic roof
# (tools/profile_stages.py). This kernel keeps a (C, tile+2*halo) time tile
# resident in VMEM across the whole trio: all convs, leaky_relus, residual
# adds and the final average happen in-core; HBM sees one read of x and one
# write of the result. Convs are per-tap (C_out, C_in) @ (C_in, W) dots;
# with C<=64 the MXU is padded anyway, so compute stays far below the
# bandwidth saved. MXU inputs optionally bf16 (fp32 accumulation + fp32
# residual carries — tighter than casting whole stages to bf16).

_RB_HALO = 64  # >= cumulative receptive margin: max_k 6*(k-1) = 60 (k=11)
_PER_TAP = False  # experiment switch: per-tap dots instead of roll-im2col
_NO_SHIFT = False  # experiment switch: skip the tap rolls (WRONG numerics) —
# bounds how much of the kernel's time the roll relayouts cost
_ROLL_MM = False  # experiment switch: lower tap rolls as MXU shift-matrix
# dots (rolled = hp @ R_s, R_s a (W, W) rotation matrix built from iota
# equality) instead of pltpu.roll — trades VPU relayout time for
# 2*C*W*W-flop matmuls; only sane at small tiles (pass tile=512)


def _leaky_k(x, slope=0.1):
    return jnp.where(x >= 0, x, slope * x)


def _rb_conv_cf(h, mask, w_ref, b_ref, i, j, k, d, n_ch, mxu_bf16,
                roll_im2col):
    """Channel-first 'same' conv on a VMEM tile.

    h :: (C, W) fp32; mask :: (1, W) zeroing positions outside the real
    sequence (torch convs zero-pad every *intermediate*, so the chain must
    not let bias terms propagate past the sequence edge); w_ref ::
    (n_dil, 2, C, ceil128(k*C)) [(out, tap-major k*C_in)-ordered,
    lane-padded]; b_ref :: (n_dil, 2, 8, 128). Zero-fill at tile edges is
    exact because callers keep a halo wider than the cumulative receptive
    margin.

    Two lowerings:
    - roll-im2col (TPU default): pltpu.roll produces ALIGNED layouts
      (unlike lane-shifted slices, which Mosaic refuses to concatenate:
      'result/input offset mismatch on non-concat dimension'), so the k
      taps stack along sublanes into ONE (C_out, k*C) @ (k*C, W) dot —
      at narrow C a per-tap dot pads its contraction to 128 and wastes
      the MXU up to 8x. Roll wraparound only contaminates the halo
      margin (<= off per conv, cumulative <= 60 < _RB_HALO), which the
      caller discards.
    - per-tap dots (interpret fallback): (C_out, C_in) @ (C_in, W) per
      tap, accumulated in fp32."""
    c, width = h.shape
    off = (k - 1) // 2 * d
    hp = h * mask
    if roll_im2col:
        # roll in fp32 (Mosaic: 'Rotate with non-32-bit data' unimplemented);
        # cast each rolled part before stacking to halve the concat's VMEM
        cast = (lambda v: v.astype(jnp.bfloat16)) if mxu_bf16 else (lambda v: v)
        if _ROLL_MM:
            # rolled[:, j] = hp[:, (j - s) % W]  ==  hp @ R, R[i, j] = [i == (j - s) % W]
            row = jax.lax.broadcasted_iota(jnp.int32, (width, width), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (width, width), 1)

            def rot(v, s):
                rmat = (row == (col - s) % width).astype(jnp.float32)
                return jax.lax.dot(v, rmat, preferred_element_type=jnp.float32)

            taps = jnp.concatenate(
                [
                    cast(hp if _NO_SHIFT
                         else rot(hp, (off - tap * d) % width))
                    for tap in range(k)
                ],
                axis=0,
            )
        else:
            taps = jnp.concatenate(
                [
                    cast(hp if _NO_SHIFT
                         else pltpu.roll(hp, (off - tap * d) % width, axis=1))
                    for tap in range(k)
                ],
                axis=0,
            )  # (k*C, W)
        out = jax.lax.dot(
            w_ref[i, j, :, : k * n_ch], taps,
            preferred_element_type=jnp.float32,
        )
        return out + b_ref[i, j, 0, :n_ch][:, None]
    if mxu_bf16:
        hp = hp.astype(jnp.bfloat16)
    hp = jnp.pad(hp, ((0, 0), (off, off)))
    acc = None
    for tap in range(k):
        wt = w_ref[i, j, :, tap * n_ch : (tap + 1) * n_ch]  # (C_out, C_in)
        contrib = jax.lax.dot(
            wt, hp[:, tap * d : tap * d + width],
            preferred_element_type=jnp.float32,
        )
        acc = contrib if acc is None else acc + contrib
    return acc + b_ref[i, j, 0, :n_ch][:, None]


_PAIR_TILES = False  # force-enable: process TWO whole tiles per grid
# program with their 2x3 independent chains emitted stepwise — unlike
# `split` (which halves a tile and pays duplicated halos) the tiles already
# carry their own halos, so this buys VPU/MXU overlap for free VMEM-wise.
# Default-on at C <= _PAIR_MAX_C where it measured -2.5/-2.7% (C=16/32,
# batch 128, interleaved A/B); at C=64 the doubled live set fails to
# compile (tools/ab_trio_pair.py).
_PAIR_MAX_C = 32


_INTERLEAVE = True  # emit the three independent resblock chains stepwise
# (conv-by-conv across resblocks) instead of chain-by-chain: Mosaic
# schedules largely in program order, so interleaving gives it one chain's
# tap rolls (VPU) to run under another's conv dots (MXU). No halo cost
# (unlike the `split` variant, which measured a loss). Bitwise-identical
# results; wins where rolls dominate (C<=32: 127->120 / 127->117 ms at
# batch 128), loses slightly at C=64 (132->133) — gated by width.
_INTERLEAVE_MAX_C = 32


def _trio_chain(x, mask, w_refs, b_refs, kernel_sizes, dilations, mxu_bf16,
                roll_im2col):
    """Resblock-trio chain on a VMEM tile (shared by the trio and stage
    kernels). x :: (C, W) fp32."""
    n_ch = x.shape[0]
    if _INTERLEAVE and n_ch <= _INTERLEAVE_MAX_C:
        hs = [x] * len(kernel_sizes)
        for i, d in enumerate(dilations):
            for j, (w_ref, b_ref, k) in enumerate(
                zip(w_refs, b_refs, kernel_sizes)
            ):
                t = _leaky_k(hs[j])
                t = _rb_conv_cf(t, mask, w_ref, b_ref, i, 0, k, d, n_ch,
                                mxu_bf16, roll_im2col)
                hs[j] = (hs[j], t)
            for j, (w_ref, b_ref, k) in enumerate(
                zip(w_refs, b_refs, kernel_sizes)
            ):
                h, t = hs[j]
                t = _leaky_k(t)
                t = _rb_conv_cf(t, mask, w_ref, b_ref, i, 1, k, 1, n_ch,
                                mxu_bf16, roll_im2col)
                hs[j] = h + t
        acc = None
        for h in hs:
            acc = h if acc is None else acc + h
        return acc / len(kernel_sizes)
    acc = None
    for w_ref, b_ref, k in zip(w_refs, b_refs, kernel_sizes):
        h = x
        for i, d in enumerate(dilations):
            t = _leaky_k(h)
            t = _rb_conv_cf(t, mask, w_ref, b_ref, i, 0, k, d, n_ch,
                            mxu_bf16, roll_im2col)
            t = _leaky_k(t)
            t = _rb_conv_cf(t, mask, w_ref, b_ref, i, 1, k, 1, n_ch,
                            mxu_bf16, roll_im2col)
            h = h + t
        acc = h if acc is None else acc + h
    return acc / len(kernel_sizes)


def _trio_chain_multi(xs, masks, w_refs, b_refs, kernel_sizes, dilations,
                      mxu_bf16, roll_im2col):
    """Resblock trios for SEVERAL independent tiles, emitted conv-by-conv
    across every (tile, resblock) chain: Mosaic schedules largely in
    program order, so one tile's tap rolls (VPU) can run under another
    tile's conv dots (MXU). Returns one (C, W) accumulator per tile."""
    n_ch = xs[0].shape[0]
    hs = [[x] * len(kernel_sizes) for x in xs]
    for i, d in enumerate(dilations):
        for j, (w_ref, b_ref, k) in enumerate(
            zip(w_refs, b_refs, kernel_sizes)
        ):
            for tn in range(len(xs)):
                t = _leaky_k(hs[tn][j])
                t = _rb_conv_cf(t, masks[tn], w_ref, b_ref, i, 0, k, d,
                                n_ch, mxu_bf16, roll_im2col)
                hs[tn][j] = (hs[tn][j], t)
        for j, (w_ref, b_ref, k) in enumerate(
            zip(w_refs, b_refs, kernel_sizes)
        ):
            for tn in range(len(xs)):
                h, t = hs[tn][j]
                t = _leaky_k(t)
                t = _rb_conv_cf(t, masks[tn], w_ref, b_ref, i, 1, k, 1,
                                n_ch, mxu_bf16, roll_im2col)
                hs[tn][j] = h + t
    outs = []
    for tn in range(len(xs)):
        acc = None
        for h in hs[tn]:
            acc = h if acc is None else acc + h
        outs.append(acc / len(kernel_sizes))
    return outs


def _fused_rb_kernel_pair(
    x_ref, *refs,
    kernel_sizes, dilations, mxu_bf16, n_tiles, tile, seq_len, roll_im2col,
):
    """Two whole tiles per grid program (`_PAIR_TILES` experiment)."""
    n_rb = len(kernel_sizes)
    w_refs = refs[:n_rb]
    b_refs = refs[n_rb:2 * n_rb]
    out_ref = refs[2 * n_rb]
    pid = pl.program_id(0)
    xs, masks = [], []
    for row in range(2):
        rglob = pid * 2 + row
        tile_idx = rglob % n_tiles
        xr = x_ref[row]
        g = (
            jax.lax.broadcasted_iota(jnp.int32, (1, xr.shape[1]), 1)
            + tile_idx * tile - _RB_HALO
        )
        masks.append(((g >= 0) & (g < seq_len)).astype(xr.dtype))
        xs.append(xr)
    accs = _trio_chain_multi(xs, masks, w_refs, b_refs, kernel_sizes,
                             dilations, mxu_bf16, roll_im2col)
    for row in range(2):
        out_ref[row, :, :] = accs[row][:, _RB_HALO:-_RB_HALO]


def _fused_rb_kernel(
    *refs,
    kernel_sizes, dilations, mxu_bf16, n_tiles, tile, seq_len,
    roll_im2col, split=1, inject=False, ksrc=0, c_out=0, masked=False,
):
    n_rb = len(kernel_sizes)
    base = 0
    if inject:
        har_ref, wnc_ref, bnc_ref = refs[1:4]
        base = 3
    x_ref = refs[0]
    w_refs = refs[1 + base : 1 + base + n_rb]
    b_refs = refs[1 + base + n_rb : 1 + base + 2 * n_rb]
    if masked:
        # per-row valid sample counts (B, 1) in SMEM — bucket-padded
        # batches: the existing per-conv boundary mask (g < limit) simply
        # tightens from the buffer length to this row's true length,
        # giving each conv the exact-length zero padding semantics
        valid_ref = refs[1 + base + 2 * n_rb]
        out_ref = refs[2 + base + 2 * n_rb]
        limit = valid_ref[pl.program_id(0) // n_tiles, 0]
    else:
        out_ref = refs[1 + base + 2 * n_rb]
        limit = seq_len
    x = x_ref[0]  # (C, W) fp32
    if inject:
        # f0-source injection conv, pre-im2col'd at output rate in XLA:
        # x0 = x_up + wnc @ har_im2col + bnc (the Generator's noise_conv,
        # models.py:264-270) — saves the XLA nc write + add round-trips
        x = x + jax.lax.dot(
            wnc_ref[:, :ksrc], har_ref[0, :ksrc],
            preferred_element_type=jnp.float32,
        ) + bnc_ref[0, :c_out][:, None]
    tile_idx = pl.program_id(0) % n_tiles
    # split > 1 carves the tile into independent half-chains (each with its
    # own halo): their DAGs have no data dependence, letting the scheduler
    # overlap one half's im2col relayouts (VPU) with the other's conv dots
    # (MXU) — the chain itself is strictly serial per position.
    sub = tile // split
    for si in range(split):
        xs = x[:, si * sub : si * sub + sub + 2 * _RB_HALO]
        g = (
            jax.lax.broadcasted_iota(jnp.int32, (1, xs.shape[1]), 1)
            + tile_idx * tile + si * sub - _RB_HALO
        )
        mask = ((g >= 0) & (g < limit)).astype(x.dtype)
        acc = _trio_chain(xs, mask, w_refs, b_refs, kernel_sizes, dilations,
                          mxu_bf16, roll_im2col)
        out_ref[0, :, si * sub : (si + 1) * sub] = acc[:, _RB_HALO:-_RB_HALO]


def resblocks_reference(x, weights, biases, kernel_sizes, dilations):
    """Plain-XLA trio: mean_k(chain of leaky->dilated conv->leaky->conv->add).

    x :: (B, T, C); weights[r] :: (n_dil, 2, k_r, C_in, C_out) (flax nn.Conv
    kernel layout stacked over (dilation, conv1/conv2)); biases[r] ::
    (n_dil, 2, C). Matches nn/nsf_hifigan.py ResBlock1 numerics."""
    acc = None
    for w, b, k in zip(weights, biases, kernel_sizes):
        h = x
        for i, d in enumerate(dilations):
            pad = (k * d - d) // 2
            t = _leaky_k(h)
            t = jax.lax.conv_general_dilated(
                t, w[i, 0], window_strides=(1,), padding=[(pad, pad)],
                rhs_dilation=(d,), dimension_numbers=("NHC", "HIO", "NHC"),
            ) + b[i, 0]
            t = _leaky_k(t)
            pad1 = (k - 1) // 2
            t = jax.lax.conv_general_dilated(
                t, w[i, 1], window_strides=(1,), padding=[(pad1, pad1)],
                dimension_numbers=("NHC", "HIO", "NHC"),
            ) + b[i, 1]
            h = h + t
        acc = h if acc is None else acc + h
    return acc / len(kernel_sizes)


def _fused_resblocks_fwd_impl(
    x, weights, biases, kernel_sizes, dilations, tile, mxu_bf16, interpret,
    split=1, inject=None, valid=None,
):
    """valid (optional traced scalar or (B,) vector, SAMPLE counts at this
    stage's rate): per-row true lengths for bucket-padded batches. The
    kernel's per-conv boundary mask tightens to each row's length, so valid
    outputs equal an exact-length forward (inference-only; the custom-VJP
    wrappers below never pass it)."""
    b, t, c = x.shape
    if tile is None:
        # larger tiles at narrow C amortize per-program fixed costs (DMA
        # issue + pipeline barriers measured ~10 us/program); bounded by
        # VMEM for the wide stages and by the input length for short runs
        tile = min(8192, max(512, 131072 // c), max(128, -(-t // 128) * 128))
    halo = _RB_HALO
    width = tile + 2 * halo
    n_tiles = -(-t // tile)
    t_pad = n_tiles * tile
    x_cf = jnp.transpose(x, (0, 2, 1)).astype(jnp.float32)  # (B, C, T)
    xp = jnp.pad(x_cf, ((0, 0), (0, 0), (halo, halo + t_pad - t)))
    tiles = jnp.stack(
        [xp[:, :, s : s + width] for s in range(0, t_pad, tile)], axis=1
    ).reshape(b * n_tiles, c, width)

    inj_in, inj_specs, inj_kw = [], [], {}
    if inject is not None:
        # f0-source injection: im2col the har signal at output rate in XLA
        # (column g, tap tau reads har[g*s_src - s_src//2 + tau], the
        # Generator noise_conv's padding), tiled like the x tiles
        har, nc_kernel, nc_bias, s_src = inject
        ksrc = nc_kernel.shape[0]
        t_final = har.shape[1]
        har2 = har[..., 0].astype(jnp.float32)
        need = (t_pad + halo) * s_src + ksrc
        harp = jnp.pad(
            har2, ((0, 0), (halo * s_src + s_src // 2,
                            max(0, need - s_src // 2 - t_final)))
        )
        imc = jnp.stack(
            [harp[:, tau :: s_src][:, : t_pad + 2 * halo]
             for tau in range(ksrc)],
            axis=1,
        )  # (B, ksrc, t_pad + 2*halo)
        ksrc_pad = -(-ksrc // 8) * 8
        imc = jnp.pad(imc, ((0, 0), (0, ksrc_pad - ksrc), (0, 0)))
        hw = jnp.stack(
            [imc[:, :, r * tile : r * tile + width] for r in range(n_tiles)],
            axis=1,
        ).reshape(b * n_tiles, ksrc_pad, width)
        wnc = jnp.pad(
            jnp.transpose(nc_kernel[:, 0, :], (1, 0)),
            ((0, 0), (0, (-ksrc) % 128)),
        )
        bnc = jnp.pad(nc_bias[None, :], ((0, 7), (0, (-c) % 128)))
        inj_in = [hw, wnc, bnc]
        full_spec = lambda arr: pl.BlockSpec(
            arr.shape, lambda r: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )
        inj_specs = [
            pl.BlockSpec((1, ksrc_pad, width), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            full_spec(wnc), full_spec(bnc),
        ]
        inj_kw = dict(inject=True, ksrc=ksrc, c_out=c)

    w_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32
    w_in, b_in = [], []
    for w, bias in zip(weights, biases):
        # (n_dil, 2, k, C_in, C_out) -> (n_dil, 2, C_out, k*C_in pad 128)
        # tap-major contraction layout matching the in-kernel im2col
        n_dil, _, k = w.shape[:3]
        wt = jnp.transpose(w, (0, 1, 4, 2, 3)).reshape(n_dil, 2, c, k * c)
        kc_pad = -(-(k * c) // 128) * 128
        wt = jnp.pad(
            wt, ((0, 0),) * 3 + ((0, kc_pad - k * c),)
        ).astype(w_dtype)
        bp = jnp.pad(
            bias[:, :, None, :], ((0, 0), (0, 0), (0, 7), (0, (-c) % 128))
        ).astype(jnp.float32)
        w_in.append(wt)
        b_in.append(bp)

    if tile % (split * 128) != 0:
        split = 1
    valid_in, valid_specs = [], []
    if valid is not None:
        valid_in = [jnp.broadcast_to(
            jnp.asarray(valid, jnp.int32).reshape(-1, 1), (b, 1)
        )]
        valid_specs = [pl.BlockSpec((b, 1), lambda r: (0, 0),
                                    memory_space=pltpu.SMEM)]
    kernel = functools.partial(
        _fused_rb_kernel, kernel_sizes=kernel_sizes, dilations=dilations,
        mxu_bf16=mxu_bf16, n_tiles=n_tiles, tile=tile, seq_len=t,
        # pltpu.roll has no interpret lowering; _PER_TAP forces the
        # per-tap-dot path for A/B experiments
        roll_im2col=not interpret and not _PER_TAP,
        split=split, masked=valid is not None, **inj_kw,
    )
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda r: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    if ((_PAIR_TILES or c <= _PAIR_MAX_C)
            and inject is None and valid is None and split == 1
            and (b * n_tiles) % 2 == 0):
        pair_kernel = functools.partial(
            _fused_rb_kernel_pair, kernel_sizes=kernel_sizes,
            dilations=dilations, mxu_bf16=mxu_bf16, n_tiles=n_tiles,
            tile=tile, seq_len=t,
            roll_im2col=not interpret and not _PER_TAP,
        )
        out = pl.pallas_call(
            pair_kernel,
            out_shape=jax.ShapeDtypeStruct((b * n_tiles, c, tile),
                                           jnp.float32),
            grid=(b * n_tiles // 2,),
            in_specs=(
                [pl.BlockSpec((2, c, width), lambda r: (r, 0, 0),
                              memory_space=pltpu.VMEM)]
                + [full(a) for a in w_in] + [full(a) for a in b_in]
            ),
            out_specs=pl.BlockSpec((2, c, tile), lambda r: (r, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(tiles, *w_in, *b_in)
        out = out.reshape(b, n_tiles, c, tile).transpose(0, 1, 3, 2)
        return out.reshape(b, t_pad, c)[:, :t].astype(x.dtype)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * n_tiles, c, tile), jnp.float32),
        grid=(b * n_tiles,),
        in_specs=(
            [pl.BlockSpec((1, c, width), lambda r: (r, 0, 0),
                          memory_space=pltpu.VMEM)]
            + inj_specs
            + [full(a) for a in w_in] + [full(a) for a in b_in]
            + valid_specs
        ),
        out_specs=pl.BlockSpec((1, c, tile), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(tiles, *inj_in, *w_in, *b_in, *valid_in)
    out = out.reshape(b, n_tiles, c, tile).transpose(0, 1, 3, 2)
    return out.reshape(b, t_pad, c)[:, :t].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def fused_resblocks_pallas(
    x, w0, w1, w2, b0, b1, b2,
    kernel_sizes=(3, 7, 11), dilations=(1, 3, 5), tile=None,
    mxu_bf16=True, interpret=False, split=1,
):
    """NSF-HiFiGAN resblock trio fused in VMEM. x :: (B, T, C) channel-last;
    w_r :: (n_dil, 2, k_r, C_in, C_out); b_r :: (n_dil, 2, C). tile=None
    picks a channel-scaled time tile. Backward runs the XLA reference
    (resblocks_reference)."""
    return _fused_resblocks_fwd_impl(
        x, (w0, w1, w2), (b0, b1, b2), kernel_sizes, dilations, tile,
        mxu_bf16, interpret, split,
    )


def _fused_rb_vjp_fwd(
    x, w0, w1, w2, b0, b1, b2, kernel_sizes, dilations, tile, mxu_bf16,
    interpret, split,
):
    out = _fused_resblocks_fwd_impl(
        x, (w0, w1, w2), (b0, b1, b2), kernel_sizes, dilations, tile,
        mxu_bf16, interpret, split,
    )
    return out, (x, w0, w1, w2, b0, b1, b2)


def _fused_rb_vjp_bwd(kernel_sizes, dilations, tile, mxu_bf16, interpret,
                      split, res, g):
    x, w0, w1, w2, b0, b1, b2 = res
    _, vjp = jax.vjp(
        lambda x_, *wb: resblocks_reference(
            x_, wb[:3], wb[3:], kernel_sizes, dilations
        ),
        x, w0, w1, w2, b0, b1, b2,
    )
    return vjp(g)


fused_resblocks_pallas.defvjp(_fused_rb_vjp_fwd, _fused_rb_vjp_bwd)


def resblocks_inject_reference(x_up, har, nc_kernel, nc_bias, weights,
                               biases, kernel_sizes, dilations, s_src):
    """Plain-XLA: x_up + noise_conv(har) -> trio (VJP oracle/tests)."""
    ksrc = nc_kernel.shape[0]
    if ksrc == 1 and s_src == 1:
        nc = har @ nc_kernel[0] + nc_bias
    else:
        nc = jax.lax.conv_general_dilated(
            har, nc_kernel, window_strides=(s_src,),
            padding=[(s_src // 2, s_src // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + nc_bias
    x0 = x_up + nc[:, : x_up.shape[1]]
    return resblocks_reference(x0, weights, biases, kernel_sizes, dilations)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15))
def fused_resblocks_inject_pallas(
    x_up, har, nc_kernel, nc_bias, w0, w1, w2, b0, b1, b2,
    s_src: int, kernel_sizes=(3, 7, 11), dilations=(1, 3, 5), tile=None,
    mxu_bf16=True, interpret=False,
):
    """fused_resblocks_pallas with the Generator's f0-source injection conv
    folded in: x = x_up + noise_conv(har), then the trio — the nc output
    and the add never round-trip HBM. x_up :: (B, T, C) (the ConvTranspose
    output); har :: (B, T_final, 1); nc_kernel :: (ksrc, 1, C) flax layout.
    Backward runs the XLA reference."""
    return _fused_resblocks_fwd_impl(
        x_up, (w0, w1, w2), (b0, b1, b2), kernel_sizes, dilations, tile,
        mxu_bf16, interpret, inject=(har, nc_kernel, nc_bias, s_src),
    )


def _fused_rbi_vjp_fwd(x_up, har, nc_kernel, nc_bias, w0, w1, w2, b0, b1, b2,
                       s_src, kernel_sizes, dilations, tile, mxu_bf16,
                       interpret):
    out = _fused_resblocks_fwd_impl(
        x_up, (w0, w1, w2), (b0, b1, b2), kernel_sizes, dilations, tile,
        mxu_bf16, interpret, inject=(har, nc_kernel, nc_bias, s_src),
    )
    return out, (x_up, har, nc_kernel, nc_bias, w0, w1, w2, b0, b1, b2)


def _fused_rbi_vjp_bwd(s_src, kernel_sizes, dilations, tile, mxu_bf16,
                       interpret, res, g):
    x_up, har, nc_kernel, nc_bias, w0, w1, w2, b0, b1, b2 = res
    _, vjp = jax.vjp(
        lambda xu, h, nk, nb, *wb: resblocks_inject_reference(
            xu, h, nk, nb, wb[:3], wb[3:], kernel_sizes, dilations, s_src
        ),
        x_up, har, nc_kernel, nc_bias, w0, w1, w2, b0, b1, b2,
    )
    return vjp(g)


fused_resblocks_inject_pallas.defvjp(_fused_rbi_vjp_fwd, _fused_rbi_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_resblock_chain_pallas(
    x, w, b, kernel_size, dilations=(1, 3, 5), tile=None,
    mxu_bf16=True, interpret=False,
):
    """ONE ResBlock1 chain fused in VMEM (no trio average). Built for wide
    stages (C=256) whose trio weights exceed VMEM — the Generator would run
    one kernel per resblock and average in XLA — but measured SLOWER there
    than XLA's bf16 convs (93 vs 64 ms A/B medians, batch 32, T=4096): at
    wide C the MXU is already well fed and the per-tap roll relayouts
    dominate. Kept for narrow-C chain use; the Generator keeps C>128 on
    XLA. Same layouts/semantics as fused_resblocks_pallas."""
    return _fused_resblocks_fwd_impl(
        x, (w,), (b,), (kernel_size,), dilations, tile, mxu_bf16, interpret,
    )


def _fused_rb1_vjp_fwd(x, w, b, kernel_size, dilations, tile, mxu_bf16,
                       interpret):
    out = _fused_resblocks_fwd_impl(
        x, (w,), (b,), (kernel_size,), dilations, tile, mxu_bf16, interpret,
    )
    return out, (x, w, b)


def _fused_rb1_vjp_bwd(kernel_size, dilations, tile, mxu_bf16, interpret,
                       res, g):
    x, w, b = res
    _, vjp = jax.vjp(
        lambda x_, w_, b_: resblocks_reference(
            x_, (w_,), (b_,), (kernel_size,), dilations
        ),
        x, w, b,
    )
    return vjp(g)


fused_resblock_chain_pallas.defvjp(_fused_rb1_vjp_fwd, _fused_rb1_vjp_bwd)


# ---------------- fused NSF-HiFiGAN stage (up + source + trio) --------------
#
# The narrow fp32 stages' transposed-conv upsample and f0-source injection
# conv (reference models.py:257-270) are HBM-bound XLA ops bracketing the
# fused trio: measured 8-14 ms per stage at batch 32 while their compute is
# negligible. This kernel computes the whole stage on the trio's VMEM tile:
# leaky -> stride-u transposed conv (per-phase tap dots on the pre-upsample
# window) -> + strided source conv (pre-im2col'd at frame rate in XLA) ->
# resblock trio. HBM sees the pre-upsample input (1/u the bytes of the
# upsampled activation the trio kernel used to read) and the stage output.


def _upconv_phase_taps(k: int, u: int, p: int):
    """Static tap table for the in-kernel transposed conv.

    Output column t (== phase phi mod u, after even tile/halo alignment)
    sums kernel[k-1-kappa].T @ x[m' + rel] over the phase's (kappa, rel)
    pairs, where m' = t // u indexes the pre-upsample window. Derived from
    ConvTranspose1dTorch's lowering: conv of the u-dilated input with the
    flipped kernel, padding k-1-p."""
    e = k - 1 - p
    taps = []
    for phi in range(u):
        k0 = (e - phi) % u
        taps.append([(kap, (phi - e + kap) // u) for kap in range(k0, k, u)])
    n_taps = max(len(l) for l in taps)
    rels = [r for l in taps for (_, r) in l]
    return taps, n_taps, min(rels), max(rels)


def _fused_stage_kernel(
    x_ref, har_ref, wup_ref, bup_ref, wnc_ref, bnc_ref, *refs,
    kernel_sizes, dilations, taps, u, c_in, c_out, ksrc,
    mxu_bf16, n_tiles, tile, seq_len, roll_im2col,
):
    n_rb = len(kernel_sizes)
    w_refs = refs[:n_rb]
    b_refs = refs[n_rb : 2 * n_rb]
    out_ref = refs[2 * n_rb]
    width = tile + 2 * _RB_HALO
    tile_idx = pl.program_id(0) % n_tiles
    col = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    g = col + tile_idx * tile - _RB_HALO
    mask = ((g >= 0) & (g < seq_len)).astype(jnp.float32)

    # Transposed conv on the u-repeated input window (x_ref[:, t] ==
    # x_pre[(g0 + t) // u], built by the XLA pre-tiler): output phase phi
    # tap rel reads repeated column t + (u*rel - phi), which floor-divides
    # to the right pre-upsample sample for every t of that phase. Phase
    # lanes are then select-merged — no rate-changing reshape, which Mosaic
    # does not support ('infer-vector-layout: unsupported shape cast').
    xin = _leaky_k(x_ref[0][:c_in])  # (C_in, width)
    if not roll_im2col:
        kpad = 2 * u * max(
            abs(rel) for lst in taps for (_, rel) in lst
        ) + u
        xin_p = jnp.pad(xin, ((0, 0), (kpad, kpad)))
    if u == 1:
        acc = None
        for j, (_, rel) in enumerate(taps[0]):
            sh = (
                pltpu.roll(xin, (-rel) % width, axis=1)
                if roll_im2col else xin_p[:, kpad + rel : kpad + rel + width]
            )
            d = jax.lax.dot(wup_ref[0, j, :, :c_in], sh,
                            preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        up = acc
    else:
        colmod = col % u  # g0 is a multiple of u (tile/halo alignment)
        up = jnp.zeros((c_out, width), jnp.float32)
        for phi in range(u):
            acc = None
            for j, (_, rel) in enumerate(taps[phi]):
                s = u * rel - phi
                sh = (
                    pltpu.roll(xin, (-s) % width, axis=1)
                    if roll_im2col else xin_p[:, kpad + s : kpad + s + width]
                )
                d = jax.lax.dot(wup_ref[phi, j, :, :c_in], sh,
                                preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            up = jnp.where(colmod == phi, acc, up)
    up = up + bup_ref[0, :c_out][:, None]

    nc = jax.lax.dot(
        wnc_ref[:, :ksrc], har_ref[0, :ksrc],
        preferred_element_type=jnp.float32,
    ) + bnc_ref[0, :c_out][:, None]

    x0 = (up + nc) * mask
    acc = _trio_chain(x0, mask, w_refs, b_refs, kernel_sizes, dilations,
                      mxu_bf16, roll_im2col)
    out_ref[0] = acc[:, _RB_HALO:-_RB_HALO]


def stage_reference(
    x_pre, har, up_kernel, up_bias, nc_kernel, nc_bias, weights, biases,
    kernel_sizes, dilations, u, p, s_src,
):
    """Plain-XLA stage: leaky -> ConvTranspose(u) -> + source conv -> trio.

    x_pre :: (B, T_in, C_in); har :: (B, T_final, 1); up_kernel :: (k, C_in,
    C_out) in ConvTranspose1dTorch's flipped-ready layout; nc_kernel ::
    (ksrc, 1, C_out) flax conv layout. Matches the Generator stage numerics
    (nn/nsf_hifigan.py)."""
    k = up_kernel.shape[0]
    x = _leaky_k(x_pre)
    y = jax.lax.conv_general_dilated(
        jnp.transpose(x, (0, 2, 1)),
        jnp.flip(up_kernel, 0).transpose(2, 1, 0),
        window_strides=(1,), padding=[(k - 1 - p, k - 1 - p)],
        lhs_dilation=(u,), dimension_numbers=("NCH", "OIH", "NCH"),
    )
    y = jnp.transpose(y, (0, 2, 1)) + up_bias
    ksrc = nc_kernel.shape[0]
    if ksrc == 1 and s_src == 1:
        nc = har @ nc_kernel[0] + nc_bias
    else:
        nc = jax.lax.conv_general_dilated(
            har, nc_kernel, window_strides=(s_src,),
            padding=[(s_src // 2, s_src // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + nc_bias
    x0 = y + nc[:, : y.shape[1]]
    return resblocks_reference(x0, weights, biases, kernel_sizes, dilations)


def _fused_stage_fwd_impl(
    x_pre, har, up_kernel, up_bias, nc_kernel, nc_bias, weights, biases,
    kernel_sizes, dilations, u, p, s_src, tile, mxu_bf16, interpret,
):
    b, t_in, c_in = x_pre.shape
    k_up = up_kernel.shape[0]
    c = up_kernel.shape[2]
    t_out = (t_in - 1) * u - 2 * p + k_up
    assert t_out == t_in * u, (t_out, t_in, u)  # generator geometry (k=2u)
    if tile is None:
        tile = min(8192, max(512, 131072 // c),
                   max(128, -(-t_out // 128) * 128))
    tile = -(-tile // (u * 128)) * (u * 128)  # phase alignment
    halo = _RB_HALO
    width = tile + 2 * halo
    w2 = width // u
    n_tiles = -(-t_out // tile)
    t_pad = n_tiles * tile

    taps, n_taps, rel_min, rel_max = _upconv_phase_taps(k_up, u, p)

    # u-repeated pre-upsample input, windowed exactly like the trio tiles
    # (the repeat/stack/pad fuse into one XLA gather; the kernel reads 1/u
    # distinct bytes per lane but keeps tile-invariant static indexing)
    x_cf = jnp.transpose(x_pre, (0, 2, 1)).astype(jnp.float32)
    x_rep = jnp.repeat(x_cf, u, axis=2)  # (B, C_in, T_out)
    xp = jnp.pad(x_rep, ((0, 0), (0, 0), (halo, halo + t_pad - t_out)))
    xw = jnp.stack(
        [xp[:, :, s : s + width] for s in range(0, t_pad, tile)], axis=1
    ).reshape(b * n_tiles, c_in, width)

    # source-conv im2col at output frame rate: column g (global out col, from
    # -halo) tap tau reads har[g*s - s//2 + tau]
    ksrc = nc_kernel.shape[0]
    t_final = har.shape[1]
    har2 = har[..., 0].astype(jnp.float32)
    need = (t_pad + halo) * s_src + ksrc
    harp = jnp.pad(
        har2, ((0, 0), (halo * s_src + s_src // 2,
                        max(0, need - s_src // 2 - t_final)))
    )
    imc = jnp.stack(
        [harp[:, tau :: s_src][:, : t_pad + 2 * halo] for tau in range(ksrc)],
        axis=1,
    )  # (B, ksrc, t_pad + 2*halo)
    ksrc_pad = -(-ksrc // 8) * 8
    imc = jnp.pad(imc, ((0, 0), (0, ksrc_pad - ksrc), (0, 0)))
    hw = jnp.stack(
        [imc[:, :, r * tile : r * tile + width] for r in range(n_tiles)],
        axis=1,
    ).reshape(b * n_tiles, ksrc_pad, width)

    # weights: up taps (u, n_taps, C_out, C_in pad 128); source (C, ksrc pad)
    cin_pad = -(-c_in // 128) * 128
    wup_j = jnp.zeros((u, n_taps, c, cin_pad), jnp.float32)
    for phi in range(u):
        for j, (kap, _) in enumerate(taps[phi]):
            wup_j = wup_j.at[phi, j, :, :c_in].set(
                jnp.transpose(up_kernel[k_up - 1 - kap], (1, 0))
            )
    bup = jnp.pad(up_bias[None, :], ((0, 7), (0, (-c) % 128)))
    wnc = jnp.pad(
        jnp.transpose(nc_kernel[:, 0, :], (1, 0)),
        ((0, 0), (0, (-ksrc) % 128)),
    )
    bnc = jnp.pad(nc_bias[None, :], ((0, 7), (0, (-c) % 128)))

    w_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32
    w_in, b_in = [], []
    for w, bias in zip(weights, biases):
        n_dil, _, k = w.shape[:3]
        wt = jnp.transpose(w, (0, 1, 4, 2, 3)).reshape(n_dil, 2, c, k * c)
        kc_pad = -(-(k * c) // 128) * 128
        wt = jnp.pad(wt, ((0, 0),) * 3 + ((0, kc_pad - k * c),)).astype(w_dtype)
        bp = jnp.pad(
            bias[:, :, None, :], ((0, 0), (0, 0), (0, 7), (0, (-c) % 128))
        ).astype(jnp.float32)
        w_in.append(wt)
        b_in.append(bp)

    kernel = functools.partial(
        _fused_stage_kernel, kernel_sizes=kernel_sizes, dilations=dilations,
        taps=taps, u=u, c_in=c_in, c_out=c, ksrc=ksrc,
        mxu_bf16=mxu_bf16, n_tiles=n_tiles, tile=tile, seq_len=t_out,
        roll_im2col=not interpret,
    )
    full = lambda arr: pl.BlockSpec(
        arr.shape, lambda r: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * n_tiles, c, tile), jnp.float32),
        grid=(b * n_tiles,),
        in_specs=(
            [
                pl.BlockSpec((1, c_in, width), lambda r: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ksrc_pad, width), lambda r: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                full(wup_j), full(bup), full(wnc), full(bnc),
            ]
            + [full(a) for a in w_in] + [full(a) for a in b_in]
        ),
        out_specs=pl.BlockSpec((1, c, tile), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xw, hw, wup_j, bup, wnc, bnc, *w_in, *b_in)
    out = out.reshape(b, n_tiles, c, tile).transpose(0, 1, 3, 2)
    return out.reshape(b, t_pad, c)[:, :t_out].astype(x_pre.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15, 16, 17, 18, 19))
def fused_stage_pallas(
    x_pre, har, up_kernel, up_bias, nc_kernel, nc_bias,
    w0, w1, w2, b0, b1, b2,
    u: int, p: int, s_src: int,
    kernel_sizes=(3, 7, 11), dilations=(1, 3, 5), tile=None,
    mxu_bf16: bool = False, interpret: bool = False,
):
    """Whole NSF-HiFiGAN stage fused in VMEM: leaky -> ConvTranspose(u, pad
    p) -> + stride-s_src source conv of har -> resblock trio. Layouts as
    stage_reference. Backward runs the XLA reference."""
    return _fused_stage_fwd_impl(
        x_pre, har, up_kernel, up_bias, nc_kernel, nc_bias,
        (w0, w1, w2), (b0, b1, b2), kernel_sizes, dilations, u, p, s_src,
        tile, mxu_bf16, interpret,
    )


def _fused_stage_vjp_fwd(x_pre, har, up_kernel, up_bias, nc_kernel, nc_bias,
                         w0, w1, w2, b0, b1, b2,
                         u, p, s_src, kernel_sizes, dilations, tile,
                         mxu_bf16, interpret):
    out = _fused_stage_fwd_impl(
        x_pre, har, up_kernel, up_bias, nc_kernel, nc_bias,
        (w0, w1, w2), (b0, b1, b2), kernel_sizes, dilations, u, p, s_src,
        tile, mxu_bf16, interpret,
    )
    return out, (x_pre, har, up_kernel, up_bias, nc_kernel, nc_bias,
                 w0, w1, w2, b0, b1, b2)


def _fused_stage_vjp_bwd(u, p, s_src, kernel_sizes, dilations, tile,
                         mxu_bf16, interpret, res, g):
    (x_pre, har, up_kernel, up_bias, nc_kernel, nc_bias,
     w0, w1, w2, b0, b1, b2) = res
    _, vjp = jax.vjp(
        lambda xp_, h_, uk, ub, nk, nb, *wb: stage_reference(
            xp_, h_, uk, ub, nk, nb, wb[:3], wb[3:],
            kernel_sizes, dilations, u, p, s_src,
        ),
        x_pre, har, up_kernel, up_bias, nc_kernel, nc_bias,
        w0, w1, w2, b0, b1, b2,
    )
    return vjp(g)


fused_stage_pallas.defvjp(_fused_stage_vjp_fwd, _fused_stage_vjp_bwd)
