"""Pure jittable DSP ops (the TPU equivalent of the reference's ddsp/core.py
plus the C++ ops it imported from torchaudio)."""

from .windows import hann_window, hann_window_symmetric, bartlett_window, sqrt_hann_window
from .interp import upsample_frames, nearest_align
from .phase import f0_to_rot, f0_to_phase, f0_to_rot_upsampled
from .pools import masked_avg_pool_1d, median_pool_1d
from .spectral import (
    frame_signal,
    overlap_add,
    overlap_add_half,
    stft,
    spectrogram,
    mel_filterbank,
    log_mel_spectrogram,
    next_pow2,
)
from .fft_filter import frequency_filter, fft_convolve
from .resample import resample
from .volume import extract_volume, extract_volume_np
from .exciters import combtooth, oscillator_bank, remove_above_fmax

__all__ = [
    "hann_window", "hann_window_symmetric", "bartlett_window", "sqrt_hann_window",
    "upsample_frames", "nearest_align",
    "f0_to_rot", "f0_to_phase", "f0_to_rot_upsampled",
    "masked_avg_pool_1d", "median_pool_1d",
    "frame_signal", "overlap_add", "overlap_add_half", "stft", "spectrogram",
    "mel_filterbank", "log_mel_spectrogram", "next_pow2",
    "frequency_filter", "fft_convolve",
    "resample",
    "extract_volume", "extract_volume_np",
    "combtooth", "oscillator_bank", "remove_above_fmax",
]
