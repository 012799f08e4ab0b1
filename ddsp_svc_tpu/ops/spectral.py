"""Framing, overlap-add, STFT, spectrogram and mel utilities.

Behavioral contracts covered (with reference citations):
  - frame/overlap_add implement the unfold/nn.Fold pairs used by the
    CombSubFast synthesizer (/root/reference/ddsp/vocoder.py:463-487) and the
    LTV-FIR filter (/root/reference/ddsp/core.py:216-235).
  - spectrogram matches torchaudio.transforms.Spectrogram(power=1,
    normalized=True, center=False) used by the SSS loss
    (/root/reference/ddsp/loss.py:14).
  - stft/mel match the NSF-HiFiGAN mel frontend
    (/root/reference/nsf_hifigan/nvSTFT.py:65-119): manual asymmetric pad,
    center=False torch.stft, librosa slaney mel basis, log(clamp(mel,1e-5)).

TPU-first notes: all shapes static; FFT sizes are powers of two wherever the
math allows (zero-padded linear convolution is exact under padding); the 50%
overlap-add is computed as two shifted adds (no scatter) since that is the
synthesis hot path.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from .windows import hann_window


def next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


# --------------------------- FFT backend switch -----------------------------
#
# jnp.fft is the default. The "dft" mode computes the same transforms as
# explicit DFT matmuls — sharding-robust (XLA:CPU's fft thunk rejects
# non-major layouts produced by SPMD partitioning) and MXU-friendly for the
# small fixed sizes the synthesizers use. Tests of the time-parallel path and
# sharded-inference deployments on backends with partitioned-FFT issues flip
# this to "dft".

_FFT_MODE = "fft"


def set_fft_mode(mode: str) -> None:
    global _FFT_MODE
    assert mode in ("fft", "dft"), mode
    _FFT_MODE = mode


def get_fft_mode() -> str:
    return _FFT_MODE


@lru_cache(maxsize=16)
def _dft_matrices(n: int):
    t = np.arange(n)
    k = np.arange(n // 2 + 1)
    ang = 2.0 * np.pi * np.outer(t, k) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def rfft(x: jnp.ndarray, n: int) -> jnp.ndarray:
    if _FFT_MODE == "fft":
        return jnp.fft.rfft(x, n)
    t = x.shape[-1]
    if t < n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - t)])
    else:
        x = x[..., :n]
    cos, sin = _dft_matrices(n)
    re = x @ jnp.asarray(cos)
    im = -(x @ jnp.asarray(sin))
    return jax.lax.complex(re, im)


def rfft_any(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """rfft that stays TPU-compatible for arbitrary n (the TPU FFT op only
    implements power-of-two sizes; others go through the DFT matmul path)."""
    if _FFT_MODE == "fft" and (n & (n - 1)) == 0:
        return jnp.fft.rfft(x, n)
    mode = _FFT_MODE
    try:
        set_fft_mode("dft")
        return rfft(x, n)
    finally:
        set_fft_mode(mode)


def irfft_any(X: jnp.ndarray, n: int) -> jnp.ndarray:
    """irfft (complex half-spectrum -> real) for arbitrary n; see rfft_any."""
    if _FFT_MODE == "fft" and (n & (n - 1)) == 0:
        return jnp.fft.irfft(X, n)
    mode = _FFT_MODE
    try:
        set_fft_mode("dft")
        return irfft(X, n)
    finally:
        set_fft_mode(mode)


def irfft(X: jnp.ndarray, n: int) -> jnp.ndarray:
    if _FFT_MODE == "fft":
        return jnp.fft.irfft(X, n)
    bins = n // 2 + 1
    Xr = jnp.real(X)[..., :bins]
    Xi = jnp.imag(X)[..., :bins]
    if X.shape[-1] < bins:
        pad = bins - X.shape[-1]
        Xr = jnp.pad(Xr, [(0, 0)] * (Xr.ndim - 1) + [(0, pad)])
        Xi = jnp.pad(Xi, [(0, 0)] * (Xi.ndim - 1) + [(0, pad)])
    cos, sin = _dft_matrices(n)
    # inverse real DFT: interior bins count twice (conjugate symmetry)
    w = np.ones(bins, dtype=np.float32) * 2.0
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    Xr = Xr * w
    Xi = Xi * w
    return (Xr @ jnp.asarray(cos.T) - Xi @ jnp.asarray(sin.T)) / n


def frame_signal(x: jnp.ndarray, frame_size: int, hop: int) -> jnp.ndarray:
    """:: (B, T) -> (B, n_frames, frame_size), n = (T - frame)//hop + 1
    (torch `unfold` semantics).

    When hop divides frame_size, frame column block j is a contiguous
    reshape of x offset by j*hop — build the frames from frame_size//hop
    slab reshapes instead of a gather (the gather lowering measured ~35 ms
    for the two excitations at the batch-128 headline geometry; the slab
    form is plain copies).
    """
    t = x.shape[-1]
    n = (t - frame_size) // hop + 1
    if frame_size % hop == 0:
        k = frame_size // hop
        slabs = [
            x[..., j * hop : (j + n) * hop].reshape(*x.shape[:-1], n, hop)
            for j in range(k)
        ]
        return jnp.concatenate(slabs, axis=-1)
    idx = np.arange(n)[:, None] * hop + np.arange(frame_size)[None, :]
    return x[..., idx]


def overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """:: (B, n, frame) -> (B, (n-1)*hop + frame). General OLA (nn.Fold)."""
    b, n, frame = frames.shape
    if frame == 2 * hop:
        return overlap_add_half(frames, hop)
    out_len = (n - 1) * hop + frame
    idx = (np.arange(n)[:, None] * hop + np.arange(frame)[None, :]).reshape(-1)
    out = jnp.zeros((b, out_len), dtype=frames.dtype)
    return out.at[:, idx].add(frames.reshape(b, -1))


def overlap_add_half(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """50%-overlap OLA as two shifted adds — no scatter, fully fusable.

    :: (B, n, 2*hop) -> (B, (n+1)*hop)
    """
    b, n, frame = frames.shape
    assert frame == 2 * hop
    first = frames[:, :, :hop].reshape(b, n * hop)
    second = frames[:, :, hop:].reshape(b, n * hop)
    pad = jnp.zeros((b, hop), dtype=frames.dtype)
    return jnp.concatenate([first, pad], 1) + jnp.concatenate([pad, second], 1)


def stft(
    x: jnp.ndarray,
    n_fft: int,
    hop: int,
    window: jnp.ndarray,
    center: bool = False,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Short-time Fourier transform. :: (B, T) -> (B, n_frames, n_fft//2+1) complex.

    `window` may be shorter than n_fft (centered zero-pad, torch.stft
    semantics).
    """
    win_length = window.shape[0]
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)],
                    mode=pad_mode)
    frames = frame_signal(x, n_fft, hop) * window
    return rfft(frames, n_fft)


# magnitude backend: 'fft' (jnp.fft), 'mxu' (Pallas DFT matmul — lands the
# transform on the systolic array), or 'auto' (mxu on TPU: handles the
# arbitrary non-power-of-2 sizes the RSS loss draws, which the TPU FFT op
# rejects as UNIMPLEMENTED; fft elsewhere).
_MAG_BACKEND = "auto"


def set_mag_backend(mode: str) -> None:
    global _MAG_BACKEND
    assert mode in ("fft", "mxu", "auto"), mode
    _MAG_BACKEND = mode


def _resolve_mag_backend() -> str:
    if _MAG_BACKEND != "auto":
        return _MAG_BACKEND
    return "mxu" if jax.default_backend() not in ("cpu", "gpu") else "fft"


def spectrogram(
    x: jnp.ndarray,
    n_fft: int,
    hop: int | None = None,
    power: float = 1.0,
    normalized: bool = True,
    center: bool = False,
) -> jnp.ndarray:
    """Magnitude spectrogram matching torchaudio Spectrogram semantics.

    Returns (B, n_fft//2+1, n_frames) (torchaudio channel-first layout) so
    loss code can take norms over (freq, time) axes directly.
    """
    hop = n_fft if hop is None else hop
    win = hann_window(n_fft, dtype=x.dtype)
    if _resolve_mag_backend() == "mxu":
        from .pallas_kernels import dft_magnitude_pallas

        frames = frame_signal(x, n_fft, hop) * win  # (B, F, n)
        b, f, n = frames.shape
        mag = dft_magnitude_pallas(
            frames.reshape(b * f, n), n_fft,
            jax.default_backend() in ("cpu", "gpu"),
        ).reshape(b, f, n_fft // 2 + 1)
    else:
        spec = stft(x, n_fft, hop, win, center=center)
        mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag ** power
    if normalized:  # torchaudio 'window' normalization
        mag = mag / jnp.sqrt(jnp.sum(win * win))
    return jnp.swapaxes(mag, -1, -2)


# ------------------------------- mel ---------------------------------------


def _hz_to_mel(f: np.ndarray | float) -> np.ndarray:
    """Slaney mel scale (librosa default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=16)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, librosa.filters.mel parity.

    Returns (n_mels, n_fft//2 + 1) float32.
    """
    fmax = sr / 2 if fmax is None else fmax
    fft_freqs = np.linspace(0.0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: scale by 2 / bandwidth
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def log_mel_spectrogram(
    x: jnp.ndarray,
    sr: int,
    n_fft: int,
    hop: int,
    win_length: int,
    n_mels: int,
    fmin: float,
    fmax: float,
    clip_val: float = 1e-5,
    mxu_bf16: bool = False,
    keyshift: float = 0.0,
    speed: float = 1.0,
    pre_padded: bool = False,
) -> jnp.ndarray:
    """NSF-HiFiGAN mel frontend (nvSTFT.get_mel parity, incl. keyshift/speed).

    Manual asymmetric padding then center=False STFT; log(clamp(mel, clip)).
    :: (B, T) -> (B, n_mels, n_frames)

    mxu_bf16=True runs the transform as a bf16-input MXU DFT matmul (fp32
    accumulation) instead of the fp32 FFT: measured 22 -> ~5 ms at the
    batch-32 headline geometry for ~2^-9 relative magnitude error — the
    staged-bf16 enhancer inference configuration.

    keyshift != 0 scales the analysis geometry by 2**(keyshift/12) and
    resizes the spectrum back to n_fft//2+1 bins with a win-size amplitude
    rescale (/root/reference/nsf_hifigan/nvSTFT.py:75-77,107-112); speed
    scales the hop. Both are static trace-time constants.
    """
    if keyshift != 0 or speed != 1:
        return _log_mel_keyshift(
            x, sr, n_fft, hop, win_length, n_mels, fmin, fmax, clip_val,
            keyshift, speed,
        )
    if not pre_padded:
        pad_l = (win_length - hop) // 2
        pad_r = max((win_length - hop + 1) // 2, hop)
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_l, pad_r)],
                    mode="reflect")
    # pre_padded=True: the caller already applied the (pad_l, pad_r) reflect
    # padding — the batched path pads PER ITEM on host so each segment of a
    # mixed-length batch sees its own reflection (mel_reflect_pad_batch in
    # infer/batch.py), not the buffer tail's zeros.
    win = hann_window(win_length, dtype=x.dtype)
    # the TPU FFT op only exists for power-of-2 sizes; route others through
    # the MXU DFT kernel. (For pow2 sizes the fp32 FFT op beats the fp32
    # Pallas DFT — 31 vs 87 ms at the batch-8 serving shape — but the bf16
    # MXU DFT beats both when the caller allows it.)
    use_mxu = _resolve_mag_backend() == "mxu" and (
        mxu_bf16 or (n_fft & (n_fft - 1)) != 0
    )
    if use_mxu:
        from .pallas_kernels import dft_magnitude_pallas

        if win_length < n_fft:
            lpad = (n_fft - win_length) // 2
            win = jnp.pad(win, (lpad, n_fft - win_length - lpad))
        frames = frame_signal(x, n_fft, hop) * win  # (B, F, n_fft)
        b, f, n = frames.shape
        mag = dft_magnitude_pallas(
            frames.reshape(b * f, n), n_fft,
            jax.default_backend() in ("cpu", "gpu"),
            mxu_bf16,
        ).reshape(b, f, n_fft // 2 + 1)
    else:
        spec = stft(x, n_fft, hop, win, center=False)
        mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("mf,btf->bmt", basis, mag)
    return jnp.log(jnp.clip(mel, clip_val, None))


def _log_mel_keyshift(
    x: jnp.ndarray,
    sr: int,
    n_fft: int,
    hop: int,
    win_length: int,
    n_mels: int,
    fmin: float,
    fmax: float,
    clip_val: float,
    keyshift: float,
    speed: float,
) -> jnp.ndarray:
    """keyshift/speed mel path (nvSTFT.get_mel keyshift!=0 semantics).

    The analysis n_fft/win scale by 2**(keyshift/12) (rounded), the hop by
    `speed`; the resulting spectrum is padded/truncated back to the
    keyshift=0 bin count and rescaled by win/win_new before the (unscaled)
    mel basis — /root/reference/nsf_hifigan/nvSTFT.py:75-77,94-112. The
    scaled n_fft is generally not a power of two, so the transform routes
    through the TPU-compatible DFT-matmul rfft.
    """
    factor = 2.0 ** (keyshift / 12.0)
    n_fft_new = int(np.round(n_fft * factor))
    win_new = int(np.round(win_length * factor))
    hop_new = int(np.round(hop * speed))
    t = x.shape[-1]
    pad_l = (win_new - hop_new) // 2
    pad_r = max((win_new - hop_new + 1) // 2, win_new - t - pad_l)
    mode = "reflect" if pad_r < t else "constant"
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_l, pad_r)], mode=mode)
    win = hann_window(win_new, dtype=x.dtype)
    if win_new < n_fft_new:
        lpad = (n_fft_new - win_new) // 2
        win = jnp.pad(win, (lpad, n_fft_new - win_new - lpad))
    frames = frame_signal(x, n_fft_new, hop_new) * win
    spec = rfft_any(frames, n_fft_new)
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
    if keyshift != 0:
        size = n_fft // 2 + 1
        bins = mag.shape[-1]
        if bins < size:
            mag = jnp.pad(mag, [(0, 0)] * (mag.ndim - 1) + [(0, size - bins)])
        mag = mag[..., :size] * (win_length / win_new)
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("mf,btf->bmt", basis, mag)
    return jnp.log(jnp.clip(mel, clip_val, None))
