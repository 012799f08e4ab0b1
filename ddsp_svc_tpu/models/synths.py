"""Differentiable DSP synthesizers: Sins, CombSubFast, CombSub.

Capability parity with /root/reference/ddsp/vocoder.py:372-550, re-expressed
as pure flax modules over the TPU-native ops layer. All three share the
contract:

    signal, phase_out, (component_a, component_b) = model.apply(
        variables, units, f0_frames, volume_frames, spk_id,
        spk_mix_dict=..., initial_phase=..., infer=..., noise=...,
        rngs={'noise': key})   # rngs only needed when noise is None

  units  :: (B, Frame, Feat)   f0_frames :: (B, Frame, 1)
  volume :: (B, Frame)         spk_id    :: (B,) 1-based

`infer=True` selects the high-precision (compensated) phase accumulation, as
the reference selects fp64 (vocoder.py:392,450). Noise excitation can be
injected explicitly (parity tests) or drawn from the 'noise' rng stream.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.unit2control import Unit2Control
from ..ops import (
    upsample_frames,
    f0_to_rot,
    f0_to_rot_upsampled,
    frequency_filter,
    combtooth as combtooth_op,
    oscillator_bank,
    remove_above_fmax,
    sqrt_hann_window,
    frame_signal,
    overlap_add_half,
)
from ..ops.spectral import rfft as _rfft, irfft as _irfft

Output = Tuple[jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]


class Sins(nn.Module):
    """Additive harmonic-oscillator-bank synthesizer (vocoder.py:372-423)."""

    sampling_rate: int
    block_size: int
    n_harmonics: int
    n_mag_allpass: int
    n_mag_noise: int
    n_unit: int = 256
    n_spk: int = 1
    causal: bool = False
    bf16: bool = False  # bf16 PCmer decoder compute (DSP/params stay fp32)
    fused_attention: object = True  # Pallas FAVOR+ at inference (nn/pcmer.py)

    def setup(self):
        self.unit2ctrl = Unit2Control(
            self.n_unit,
            self.n_spk,
            {
                "amplitudes": self.n_harmonics,
                "group_delay": self.n_mag_allpass,
                "noise_magnitude": self.n_mag_noise,
            },
            self.causal,
            compute_dtype=jnp.bfloat16 if self.bf16 else None,
            fused_attention=self.fused_attention,
        )

    def __call__(
        self,
        units_frames: jnp.ndarray,
        f0_frames: jnp.ndarray,
        volume_frames: jnp.ndarray,
        spk_id: Optional[jnp.ndarray] = None,
        spk_mix_dict: Optional[Dict[int, float]] = None,
        initial_phase: Optional[jnp.ndarray] = None,
        infer: bool = True,
        max_upsample_dim: int = 32,
        noise: Optional[jnp.ndarray] = None,
        valid_frames=None,
    ) -> Output:
        f0 = upsample_frames(f0_frames, self.block_size)[..., 0]  # (B, T)
        # closed-form frame-rate accumulator: == f0_to_rot(f0, precise=True)
        # with the sequential scan at frame rate instead of sample rate
        phase = 2.0 * np.pi * f0_to_rot_upsampled(
            f0_frames[..., 0], self.block_size, self.sampling_rate,
            initial_phase,
        )
        phase_frames = phase[:, :: self.block_size]

        ctrls = self.unit2ctrl(
            units_frames, f0_frames, phase_frames, volume_frames, spk_id,
            spk_mix_dict=spk_mix_dict, infer=infer, valid_frames=valid_frames,
        )
        amplitudes_frames = jnp.exp(ctrls["amplitudes"]) / 128.0
        group_delay = np.pi * jnp.tanh(ctrls["group_delay"])
        noise_param = jnp.exp(ctrls["noise_magnitude"]) / 128.0

        amplitudes_frames = remove_above_fmax(
            amplitudes_frames, f0_frames, self.sampling_rate / 2.0, level_start=1
        )
        from ..ops.pallas_kernels import oscillator_bank_auto

        sinusoids = oscillator_bank_auto(
            phase, amplitudes_frames, self.block_size,
            harmonic_chunk=max_upsample_dim,
        )
        if valid_frames is not None:
            from ..ops.masking import frame_mask

            smask = frame_mask(
                sinusoids.shape[-1],
                jnp.asarray(valid_frames) * self.block_size,
                sinusoids.dtype,
            )
            sinusoids = sinusoids * smask

        # harmonic all-pass (predicted group delay)
        harmonic = frequency_filter(
            sinusoids,
            jnp.exp(1j * jnp.cumsum(group_delay, axis=-1)),
            hann_windowed=False,
        )
        # filtered uniform noise
        if noise is None:
            noise = (
                jax.random.uniform(self.make_rng("noise"), harmonic.shape,
                                   dtype=harmonic.dtype) * 2.0 - 1.0
            )
        if valid_frames is not None:
            noise = noise * smask
        noise = frequency_filter(
            noise, noise_param + 0j, hann_windowed=True
        )
        signal = harmonic + noise
        return signal, phase[..., None], (harmonic, noise)


class CombSubFast(nn.Module):
    """Combtooth subtractive synthesizer, STFT-domain (vocoder.py:426-492).

    The default model of the reference (configs/combsub.yaml). Excitation is
    a sinc comb; per-frame complex filters exp(mag + j*pi*phase) (harmonic)
    and exp(mag)/128 (noise) are applied in a sqrt-Hann 50%-overlap
    analysis/synthesis framework.
    """

    sampling_rate: int
    block_size: int
    n_unit: int = 256
    n_spk: int = 1
    causal: bool = False
    frame_norm: bool = False  # frame-local prenet norm (exactly streamable)
    bf16: bool = False  # bf16 PCmer decoder compute (DSP/params stay fp32)
    # Fuse the STFT-domain filtering (2x rfft -> complex filter -> irfft ->
    # window) into one Pallas MXU DFT kernel on TPU — the chain's spectra and
    # filter tensors never round-trip HBM, and the transforms land on the
    # systolic array instead of the VPU FFT. bf16 MXU inputs (fp32
    # accumulation) when model.bf16 is set. Auto-disabled off-TPU; "force"
    # runs it in interpret mode (tests).
    fused_spectral: object = True
    fused_attention: object = True  # Pallas FAVOR+ at inference (nn/pcmer.py)

    def setup(self):
        self.unit2ctrl = Unit2Control(
            self.n_unit,
            self.n_spk,
            {
                "harmonic_magnitude": self.block_size + 1,
                "harmonic_phase": self.block_size + 1,
                "noise_magnitude": self.block_size + 1,
            },
            self.causal,
            frame_norm=self.frame_norm,
            compute_dtype=jnp.bfloat16 if self.bf16 else None,
            fused_attention=self.fused_attention,
        )

    def __call__(
        self,
        units_frames: jnp.ndarray,
        f0_frames: jnp.ndarray,
        volume_frames: jnp.ndarray,
        spk_id: Optional[jnp.ndarray] = None,
        spk_mix_dict: Optional[Dict[int, float]] = None,
        initial_phase: Optional[jnp.ndarray] = None,
        infer: bool = True,
        noise: Optional[jnp.ndarray] = None,
        valid_frames=None,
        **kwargs,
    ) -> Output:
        bs = self.block_size
        f0 = upsample_frames(f0_frames, bs)[..., 0]  # (B, T)
        rot = f0_to_rot_upsampled(
            f0_frames[..., 0], bs, self.sampling_rate, initial_phase
        )
        phase_frames = 2.0 * np.pi * rot[:, ::bs]

        ctrls = self.unit2ctrl(
            units_frames, f0_frames, phase_frames, volume_frames, spk_id,
            spk_mix_dict=spk_mix_dict, infer=infer, valid_frames=valid_frames,
        )
        harmo_mag = ctrls["harmonic_magnitude"]
        harmo_phase = ctrls["harmonic_phase"]
        noise_mag = ctrls["noise_magnitude"]

        # excitations
        tooth = combtooth_op(rot, f0, self.sampling_rate)
        if noise is None:
            noise = (
                jax.random.uniform(self.make_rng("noise"), tooth.shape,
                                   dtype=tooth.dtype) * 2.0 - 1.0
            )
        if valid_frames is not None:
            # zero excitations beyond each item's true length: the first
            # padded frame then windows [tail audio, zeros] with the
            # replicated last filter — exactly the reference's own tail frame
            from ..ops.masking import frame_mask

            smask = frame_mask(
                tooth.shape[-1], jnp.asarray(valid_frames) * bs, tooth.dtype
            )
            tooth = tooth * smask
            noise = noise * smask

        window = sqrt_hann_window(2 * bs, dtype=tooth.dtype)
        tooth_frames = (
            frame_signal(jnp.pad(tooth, ((0, 0), (bs, bs))), 2 * bs, bs) * window
        )
        noise_frames = (
            frame_signal(jnp.pad(noise, ((0, 0), (bs, bs))), 2 * bs, bs) * window
        )

        # training uses the kernel only under model.bf16: its analytic Pallas
        # backward runs at default (bf16-class) MXU dot precision, the same
        # accuracy class the bf16 flag opts into; fp32 training keeps the
        # XLA FFT chain's full-precision gradients
        if (infer or self.bf16) and self._use_fused_spectral():
            from ..ops.pallas_kernels import combsub_spectral_pallas

            b, n1, fs = tooth_frames.shape  # n1 = n_frames + 1
            rep = lambda v: jnp.concatenate([v, v[:, -1:, :]], 1).reshape(
                b * n1, bs + 1
            )
            signal_frames = combsub_spectral_pallas(
                tooth_frames.reshape(b * n1, fs),
                noise_frames.reshape(b * n1, fs),
                rep(harmo_mag), rep(harmo_phase), rep(noise_mag),
                2 * bs, self.bf16, self.fused_spectral == "force",
            ).reshape(b, n1, fs)
        else:
            # frequency-domain filters (last frame repeated -> n+1 frames)
            src_filter = jnp.exp(harmo_mag + 1j * np.pi * harmo_phase)
            src_filter = jnp.concatenate([src_filter, src_filter[:, -1:, :]], 1)
            noise_filter = jnp.exp(noise_mag) / 128.0
            noise_filter = jnp.concatenate(
                [noise_filter, noise_filter[:, -1:, :]], 1
            )

            tooth_fft = _rfft(tooth_frames, 2 * bs)
            noise_fft = _rfft(noise_frames, 2 * bs)
            signal_fft = tooth_fft * src_filter + noise_fft * noise_filter
            signal_frames = _irfft(signal_fft, 2 * bs) * window

        signal = overlap_add_half(signal_frames, bs)  # (B, (n+2)*bs)
        signal = signal[:, bs:-bs]
        return signal, phase_frames[..., None], (signal, signal)

    def _use_fused_spectral(self) -> bool:
        if not self.fused_spectral:
            return False
        if self.block_size % 64 != 0:  # (rows, 2*bs) lane tiling
            return False
        if self.fused_spectral == "force":
            return True
        return jax.default_backend() not in ("cpu", "gpu")


class CombSub(nn.Module):
    """Combtooth subtractive synthesizer, LTV-FIR cascade — the 'old' model
    (vocoder.py:495-550): all-pass(predicted group delay) then dynamic-
    windowed magnitude filter, plus constant-windowed filtered noise."""

    sampling_rate: int
    block_size: int
    n_mag_allpass: int
    n_mag_harmonic: int
    n_mag_noise: int
    n_unit: int = 256
    n_spk: int = 1
    causal: bool = False
    bf16: bool = False  # bf16 PCmer decoder compute (DSP/params stay fp32)
    fused_attention: object = True  # Pallas FAVOR+ at inference (nn/pcmer.py)

    def setup(self):
        self.unit2ctrl = Unit2Control(
            self.n_unit,
            self.n_spk,
            {
                "group_delay": self.n_mag_allpass,
                "harmonic_magnitude": self.n_mag_harmonic,
                "noise_magnitude": self.n_mag_noise,
            },
            self.causal,
            compute_dtype=jnp.bfloat16 if self.bf16 else None,
            fused_attention=self.fused_attention,
        )

    def __call__(
        self,
        units_frames: jnp.ndarray,
        f0_frames: jnp.ndarray,
        volume_frames: jnp.ndarray,
        spk_id: Optional[jnp.ndarray] = None,
        spk_mix_dict: Optional[Dict[int, float]] = None,
        initial_phase: Optional[jnp.ndarray] = None,
        infer: bool = True,
        noise: Optional[jnp.ndarray] = None,
        valid_frames=None,
        **kwargs,
    ) -> Output:
        bs = self.block_size
        f0 = upsample_frames(f0_frames, bs)[..., 0]
        rot = f0_to_rot_upsampled(
            f0_frames[..., 0], bs, self.sampling_rate, initial_phase
        )
        phase_frames = 2.0 * np.pi * rot[:, ::bs]

        ctrls = self.unit2ctrl(
            units_frames, f0_frames, phase_frames, volume_frames, spk_id,
            spk_mix_dict=spk_mix_dict, infer=infer, valid_frames=valid_frames,
        )
        group_delay = np.pi * jnp.tanh(ctrls["group_delay"])
        src_param = jnp.exp(ctrls["harmonic_magnitude"])
        noise_param = jnp.exp(ctrls["noise_magnitude"]) / 128.0

        tooth = combtooth_op(rot, f0, self.sampling_rate, zero_unvoiced=False)
        smask = None
        if valid_frames is not None:
            from ..ops.masking import frame_mask

            smask = frame_mask(
                tooth.shape[-1], jnp.asarray(valid_frames) * bs, tooth.dtype
            )
            tooth = tooth * smask
        harmonic = frequency_filter(
            tooth,
            jnp.exp(1j * jnp.cumsum(group_delay, axis=-1)),
            hann_windowed=False,
        )
        if smask is not None:
            # the all-pass spills ir_size//2 samples past the true length;
            # an exact-length run crops them, so zero them before the
            # cascaded magnitude filter
            harmonic = harmonic * smask
        harmonic = frequency_filter(
            harmonic,
            src_param + 0j,
            hann_windowed=True,
            half_width_frames=1.5 * self.sampling_rate / (f0_frames + 1e-3),
        )

        if noise is None:
            noise = (
                jax.random.uniform(self.make_rng("noise"), harmonic.shape,
                                   dtype=harmonic.dtype) * 2.0 - 1.0
            )
        if smask is not None:
            noise = noise * smask
        noise = frequency_filter(noise, noise_param + 0j, hann_windowed=True)

        signal = harmonic + noise
        return signal, phase_frames[..., None], (harmonic, noise)
