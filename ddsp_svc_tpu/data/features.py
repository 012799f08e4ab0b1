"""Feature extraction: F0, volume, and acoustic units.

Capability parity with /root/reference/ddsp/vocoder.py:20-211:
  - F0Extractor supports the reference's extractor names, each a distinct
    algorithm family as in the reference (vocoder.py:62-86):
    'parselmouth' = Praat-style autocorrelation candidates + Viterbi (JAX,
    with an optional native C++ NCCF fast path); 'dio' = DIO + StoneMask
    (data/world_f0.py, matching pw.dio(channels_in_octave=2)+pw.stonemask);
    'harvest' = Harvest-style dense-candidate tracker (world_f0.harvest).
    Same frame contract for all: n_frames = len//hop + 1, silence_front
    skipping, uv_interp unvoiced filling clamped to f0_min
    (vocoder.py:45-113). 'crepe' runs the JAX CREPE port (nn/crepe.py) with
    median/masked-average smoothing and the 5 ms -> hop nearest resample
    (vocoder.py:89-102). Accuracy of all families is bounded by the
    synthetic golden suite (tests/test_f0_accuracy.py).
  - VolumeExtractor: frame RMS (vocoder.py:116-137).
  - UnitsEncoder: resample to encoder rate (cached kernels) -> HuBERT-soft ->
    nearest-neighbor frame alignment to the synth hop (vocoder.py:176-211).

All device compute is jitted with shape bucketing (audio padded to the next
power-of-two frame count) so repeated calls hit the compile cache.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import (
    resample,
    nearest_align,
    masked_avg_pool_1d,
    median_pool_1d,
    next_pow2,
    extract_volume_np,
)
from ..ops.windows import hann_window_symmetric


# ----------------------------- autocorrelation F0 ---------------------------


@partial(jax.jit, static_argnames=("sr", "f0_min", "f0_max", "top_k"))
def _autocorr_candidates(frames, sr: int, f0_min: float, f0_max: float,
                         top_k: int = 4):
    """Per-frame pitch candidates for Viterbi tracking.

    frames :: (N, W) -> (freqs (N, K) [Hz], strengths (N, K) in [0, 1]).
    Candidates are local maxima of the normalized autocorrelation with
    parabolic lag refinement (Praat's candidate stage).
    """
    win = frames.shape[-1]
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    w = hann_window_symmetric(win, dtype=frames.dtype)
    fx = frames * w

    fft_size = next_pow2(2 * win)
    spec = jnp.fft.rfft(fx, fft_size)
    r = jnp.fft.irfft(spec * jnp.conj(spec), fft_size)[..., :win]
    rw = jnp.fft.irfft(jnp.abs(jnp.fft.rfft(w, fft_size)) ** 2, fft_size)[:win]
    rn = (r / (r[..., :1] + 1e-12)) * (rw[0] / (rw + 1e-12))

    lag_min = max(2, int(math.floor(sr / f0_max)))
    lag_max = min(win - 2, int(math.ceil(sr / f0_min)))
    lags = jnp.arange(win)
    valid = (lags >= lag_min) & (lags <= lag_max)
    # local maxima only
    is_peak = (rn > jnp.roll(rn, 1, axis=-1)) & (rn >= jnp.roll(rn, -1, axis=-1))
    # Praat octave cost R = r - c*log2(f0_min * tau): a perfectly periodic
    # signal peaks equally at T, 2T, 3T, ... — without this, window
    # compensation noise makes the tracker lock onto subharmonics (caught
    # by tests/test_f0_accuracy.py: steady 440 Hz reported as 146.7 Hz)
    octave_pen = 0.01 * jnp.log2(
        jnp.maximum(lags, 1).astype(frames.dtype) * (f0_min / sr)
    )
    rn_masked = jnp.where(
        valid[None, :] & is_peak, rn - octave_pen[None, :], -jnp.inf
    )
    strengths, peaks = jax.lax.top_k(rn_masked, top_k)  # (N, K)

    p0 = jnp.take_along_axis(rn, jnp.maximum(peaks - 1, 0), axis=-1)
    p1 = jnp.take_along_axis(rn, peaks, axis=-1)
    p2 = jnp.take_along_axis(rn, jnp.minimum(peaks + 1, win - 1), axis=-1)
    denom = p0 - 2 * p1 + p2
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (p0 - p2) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    lag = peaks.astype(frames.dtype) + delta
    freqs = sr / jnp.maximum(lag, 1.0)

    energy = (r[..., :1] / win)
    silent = energy < 1e-8
    strengths = jnp.where(
        jnp.isfinite(strengths) & ~silent, jnp.clip(strengths, 0.0, 1.0), 0.0
    )
    return freqs, strengths


def _viterbi_track(
    freqs: np.ndarray,
    strengths: np.ndarray,
    voicing_threshold: float = 0.45,
    octave_jump_cost: float = 0.35,
    voiced_unvoiced_cost: float = 0.14,
) -> np.ndarray:
    """Praat-style best-path search over per-frame candidates + an unvoiced
    state. Maximizes sum(strength) - transition costs. Returns f0 (N,)
    with 0 for unvoiced frames."""
    n, k = freqs.shape
    # state k == unvoiced, with constant pseudo-strength
    cand_f = np.concatenate([freqs, np.zeros((n, 1))], axis=1)
    cand_s = np.concatenate(
        [strengths, np.full((n, 1), voicing_threshold)], axis=1
    )
    ks = k + 1
    logf = np.where(cand_f > 0, np.log2(np.maximum(cand_f, 1e-6)), 0.0)

    score = cand_s[0].copy()
    ptr = np.zeros((n, ks), dtype=np.int32)
    for t in range(1, n):
        # transition cost matrix (prev ks) x (cur ks)
        prev_v = cand_f[t - 1] > 0
        cur_v = cand_f[t] > 0
        jump = np.abs(logf[t - 1][:, None] - logf[t][None, :])
        cost = np.where(
            prev_v[:, None] & cur_v[None, :],
            octave_jump_cost * jump,
            np.where(prev_v[:, None] == cur_v[None, :], 0.0, voiced_unvoiced_cost),
        )
        total = score[:, None] - cost
        ptr[t] = np.argmax(total, axis=0)
        score = total[ptr[t], np.arange(ks)] + cand_s[t]

    path = np.zeros(n, dtype=np.int32)
    path[-1] = int(np.argmax(score))
    for t in range(n - 2, -1, -1):
        path[t] = ptr[t + 1][path[t + 1]]
    return cand_f[np.arange(n), path].astype(np.float32)


@partial(jax.jit, static_argnames=("sr", "f0_min", "f0_max"))
def _autocorr_f0_frames(frames, sr: int, f0_min: float, f0_max: float):
    """Boersma-style AC pitch. frames :: (N, W) centered windows -> (N,) [Hz]."""
    win = frames.shape[-1]
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    w = hann_window_symmetric(win, dtype=frames.dtype)
    fx = frames * w

    fft_size = next_pow2(2 * win)
    spec = jnp.fft.rfft(fx, fft_size)
    r = jnp.fft.irfft(spec * jnp.conj(spec), fft_size)[..., :win]
    rw = jnp.fft.irfft(
        jnp.abs(jnp.fft.rfft(w, fft_size)) ** 2, fft_size
    )[:win]
    # normalized AC with window-autocorrelation compensation
    rn = (r / (r[..., :1] + 1e-12)) * (rw[0] / (rw + 1e-12))

    lag_min = max(2, int(math.floor(sr / f0_max)))
    lag_max = min(win - 2, int(math.ceil(sr / f0_min)))
    lags = jnp.arange(win)
    valid = (lags >= lag_min) & (lags <= lag_max)
    # octave cost (Praat-style): prefer shorter lags when peaks tie, so the
    # fundamental wins over its subharmonics
    octave_penalty = 0.01 * jnp.log2(jnp.maximum(lags, 1).astype(frames.dtype))
    rn_masked = jnp.where(valid[None, :], rn - octave_penalty[None, :], -jnp.inf)
    peak = jnp.argmax(rn_masked, axis=-1)  # (N,)

    # parabolic interpolation around the peak
    p0 = jnp.take_along_axis(rn, (peak - 1)[:, None], axis=-1)[:, 0]
    p1 = jnp.take_along_axis(rn, peak[:, None], axis=-1)[:, 0]
    p2 = jnp.take_along_axis(rn, (peak + 1)[:, None], axis=-1)[:, 0]
    denom = p0 - 2 * p1 + p2
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (p0 - p2) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    lag = peak.astype(frames.dtype) + delta
    f0 = sr / jnp.maximum(lag, 1.0)

    energy = r[..., 0] / win
    voiced = (p1 > 0.6) & (energy > 1e-8) & (f0 >= f0_min) & (f0 <= f0_max)
    return jnp.where(voiced, f0, 0.0)


def _autocorr_f0(audio: np.ndarray, sr: int, hop: float, f0_min: float,
                 f0_max: float, win: int, viterbi: bool = True) -> np.ndarray:
    """Host wrapper: frame (float hop supported), bucket-pad, run the jitted
    candidate kernel, Viterbi-track. audio :: (T,) -> (T//hop + 1,) [Hz]."""
    n_frames = int(len(audio) // hop) + 1
    half = win // 2
    x = np.pad(audio, (half, half + win))
    pos = np.round(np.arange(n_frames) * hop).astype(np.int64)
    idx = pos[:, None] + np.arange(win)[None, :]
    frames = x[np.minimum(idx, len(x) - 1)]
    bucket = next_pow2(n_frames)
    if bucket > n_frames:
        frames = np.pad(frames, ((0, bucket - n_frames), (0, 0)))
    if viterbi:
        freqs, strengths = _autocorr_candidates(
            jnp.asarray(frames), sr, float(f0_min), float(f0_max)
        )
        return _viterbi_track(
            np.asarray(freqs)[:n_frames], np.asarray(strengths)[:n_frames]
        )
    out = np.asarray(
        _autocorr_f0_frames(jnp.asarray(frames), sr, float(f0_min), float(f0_max))
    )
    return out[:n_frames]


class F0Extractor:
    def __init__(
        self,
        f0_extractor: str,
        sample_rate: int = 44100,
        hop_size: int = 512,
        f0_min: float = 65,
        f0_max: float = 800,
        backend: str = "jax",
    ):
        """backend selects the implementation of the 'parselmouth' AC family:
        'jax' (device autocorrelation), 'native' (C++ NCCF host library — the
        CPU fast path for preprocessing), or 'auto' (native if built, else
        jax). 'dio'/'harvest' run their own host-numpy WORLD-family
        algorithms (world_f0.py) and 'crepe' the JAX CREPE model — the
        backend knob does not apply to them."""
        if f0_extractor not in ("parselmouth", "dio", "harvest", "crepe"):
            raise ValueError(f" [x] Unknown f0 extractor: {f0_extractor}")
        self.f0_extractor = f0_extractor
        self.backend = backend
        self.sample_rate = sample_rate
        self.hop_size = hop_size
        self.f0_min = f0_min
        self.f0_max = f0_max
        # analysis window: ~3 periods of f0_min (Praat AC convention)
        self.win = next_pow2(int(3 * sample_rate / f0_min))
        self._crepe = None

    def extract(
        self,
        audio: np.ndarray,
        uv_interp: bool = False,
        device=None,
        silence_front: float = 0,
    ) -> np.ndarray:
        """:: (T,) -> (T//hop + 1,) f0 [Hz]; 0 = unvoiced."""
        audio = np.asarray(audio, dtype=np.float32)
        n_frames = int(len(audio) // self.hop_size) + 1
        start_frame = int(silence_front * self.sample_rate / self.hop_size)
        real_silence_front = start_frame * self.hop_size / self.sample_rate
        audio_trim = audio[int(np.round(real_silence_front * self.sample_rate)):]

        if self.f0_extractor == "crepe":
            f0 = self._extract_crepe(audio_trim, n_frames - start_frame)
        elif self.f0_extractor == "dio":
            from . import world_f0

            f0 = world_f0.dio(
                audio_trim, self.sample_rate, self.hop_size,
                self.f0_min, self.f0_max,
            )
        elif self.f0_extractor == "harvest":
            from . import world_f0

            f0 = world_f0.harvest(
                audio_trim, self.sample_rate, self.hop_size,
                self.f0_min, self.f0_max,
            )
        else:
            f0 = None
            if self.backend in ("native", "auto"):
                from .. import native

                f0 = native.extract_f0_native(
                    audio_trim, self.sample_rate, self.hop_size,
                    self.f0_min, self.f0_max, self.win,
                )
                if f0 is None and self.backend == "native":
                    raise RuntimeError("native f0 library unavailable")
            if f0 is None:
                f0 = _autocorr_f0(
                    audio_trim, self.sample_rate, self.hop_size,
                    self.f0_min, self.f0_max, self.win,
                )

        f0 = np.pad(f0.astype(np.float32), (start_frame, 0))
        if len(f0) < n_frames:
            f0 = np.pad(f0, (0, n_frames - len(f0)))
        f0 = f0[:n_frames]

        if uv_interp:
            uv = f0 == 0
            if (~uv).any():
                f0[uv] = np.interp(np.where(uv)[0], np.where(~uv)[0], f0[~uv])
            f0[f0 < self.f0_min] = self.f0_min
        return f0

    def _extract_crepe(self, audio: np.ndarray, n_frames: int) -> np.ndarray:
        from ..nn.crepe import CrepeExtractor

        if self._crepe is None:
            self._crepe = CrepeExtractor(self.f0_min, self.f0_max)
        wav16k = np.asarray(
            resample(jnp.asarray(audio)[None], self.sample_rate, 16000)[0]
        )
        f0_5ms, pd = self._crepe.predict(wav16k)
        pd = np.asarray(median_pool_1d(jnp.asarray(pd)[None], 4))[0]
        f0_5ms = np.where(pd < 0.05, np.nan, f0_5ms)
        f0_5ms = np.asarray(masked_avg_pool_1d(jnp.asarray(f0_5ms)[None], 4))[0]
        f0_5ms = np.nan_to_num(f0_5ms)
        # nearest resample from 5 ms grid to hop grid (vocoder.py:101)
        idx = np.minimum(
            np.round(np.arange(n_frames) * self.hop_size / self.sample_rate / 0.005).astype(int),
            len(f0_5ms) - 1,
        )
        return f0_5ms[idx]


class VolumeExtractor:
    def __init__(self, hop_size: int = 512):
        self.hop_size = hop_size

    def extract(self, audio: np.ndarray) -> np.ndarray:
        return extract_volume_np(np.asarray(audio, dtype=np.float32), self.hop_size)


class UnitsEncoder:
    """Audio -> soft units, aligned to the synthesizer frame grid."""

    def __init__(
        self,
        encoder: str,
        encoder_ckpt: Optional[str],
        encoder_sample_rate: int = 16000,
        encoder_hop_size: int = 320,
    ):
        from ..nn.hubert import HubertSoft

        if encoder not in (
            "hubertsoft", "hubertbase", "hubertbase768", "contentvec", "contentvec768",
        ):
            raise ValueError(f" [x] Unknown units encoder: {encoder}")
        self.encoder = encoder
        self.encoder_sample_rate = encoder_sample_rate
        self.encoder_hop_size = encoder_hop_size
        # encoder variant matrix (vocoder.py:153-166): base/contentvec take
        # transformer layer 9, with or without the 768->256 final projection
        if encoder == "hubertsoft":
            self.model = HubertSoft()
        elif encoder in ("hubertbase", "contentvec"):
            self.model = HubertSoft(output_layer=9, proj_dim=256, pad_input=False)
        else:  # hubertbase768 / contentvec768
            self.model = HubertSoft(output_layer=9, proj_dim=None, pad_input=False)
        if encoder_ckpt:
            self.variables = self._load_ckpt(encoder_ckpt)
        else:  # random init (tests / benchmarking without pretrained assets)
            import warnings

            warnings.warn(
                f" [!] no checkpoint for units encoder '{encoder}' — using "
                "RANDOM weights. Unit embeddings will be garbage; set "
                "data.encoder_ckpt for real conversions (random init is only "
                "meant for tests/benchmarks).",
                RuntimeWarning, stacklevel=2,
            )
            self.variables = self.model.init(
                jax.random.key(0), jnp.zeros((1, 1600))
            )
        def _encode(variables, audio, sample_rate, n_frames, ratio):
            if sample_rate != self.encoder_sample_rate:
                audio = resample(audio, sample_rate, self.encoder_sample_rate)
            units = self.model.apply(variables, audio)
            return nearest_align(units, n_frames, ratio)

        self._encode_jit = jax.jit(
            _encode, static_argnames=("sample_rate", "n_frames", "ratio")
        )

    def _load_ckpt(self, path: str):
        from ..utils.convert import (
            convert_hubert_state_dict,
            convert_fairseq_hubert_state_dict,
        )

        if path.endswith((".ckpt", ".msgpack")):
            from flax import serialization

            with open(path, "rb") as f:
                return serialization.msgpack_restore(f.read())
        # torch checkpoint
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=False)
        for key in ("state_dict", "model"):
            if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
                sd = sd[key]
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
        if any(k.startswith("encoder.layers.0.self_attn.k_proj") for k in sd):
            # fairseq layout (ContentVec / HuBERT-base)
            variables = convert_fairseq_hubert_state_dict(
                sd, final_proj=self.encoder in ("hubertbase", "contentvec")
            )
        else:
            variables = convert_hubert_state_dict(sd)
        return jax.tree.map(jnp.asarray, variables)

    def encode(self, audio: np.ndarray, sample_rate: int, hop_size: int) -> np.ndarray:
        """:: (B, T) at sample_rate -> (B, T//hop+1, 256).

        resample -> encoder -> nearest alignment run as ONE jit program
        (the eager resample/align dispatched ~7 extra device round-trips
        per call — each a full relay round-trip on remote backends)."""
        n_frames = int(audio.shape[-1] // hop_size) + 1
        ratio = (hop_size / sample_rate) / (
            self.encoder_hop_size / self.encoder_sample_rate
        )
        return np.asarray(self._encode_jit(
            self.variables, jnp.asarray(audio, dtype=jnp.float32),
            int(sample_rate), n_frames, float(ratio),
        ))
