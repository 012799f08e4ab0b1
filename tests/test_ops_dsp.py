"""Parity tests for DSP ops vs the torch reference (executed, not copied)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ddsp_svc_tpu.ops import (
    upsample_frames,
    frequency_filter,
    fft_convolve,
    masked_avg_pool_1d,
    median_pool_1d,
    remove_above_fmax,
    extract_volume,
    extract_volume_np,
    overlap_add,
    overlap_add_half,
    frame_signal,
    spectrogram,
    hann_window,
    sqrt_hann_window,
    combtooth,
)


def test_upsample_parity(ref_core):
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 10, 3)).astype(np.float32)
    ref = ref_core.upsample(torch.from_numpy(x), 8).numpy()
    got = np.asarray(upsample_frames(jnp.asarray(x), 8))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_remove_above_fmax_parity(ref_core):
    import torch

    rng = np.random.default_rng(1)
    amp = rng.random((2, 5, 16)).astype(np.float32)
    pitch = (100 + 400 * rng.random((2, 5, 1))).astype(np.float32)
    ref = ref_core.remove_above_fmax(
        torch.from_numpy(amp), torch.from_numpy(pitch), 2000.0, level_start=1
    ).numpy()
    got = np.asarray(
        remove_above_fmax(jnp.asarray(amp), jnp.asarray(pitch), 2000.0, 1)
    )
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_masked_pools_parity(ref_core):
    import torch

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 50)).astype(np.float32)
    x[0, 5:9] = np.nan
    ref_avg = ref_core.MaskedAvgPool1d(torch.from_numpy(x), 4).numpy()
    got_avg = np.asarray(masked_avg_pool_1d(jnp.asarray(x), 4))
    np.testing.assert_allclose(got_avg, ref_avg, atol=1e-6)

    y = rng.standard_normal((2, 50)).astype(np.float32)
    ref_med = ref_core.MedianPool1d(torch.from_numpy(y), 4).numpy()
    got_med = np.asarray(median_pool_1d(jnp.asarray(y), 4))
    np.testing.assert_allclose(got_med, ref_med, atol=1e-6)


@pytest.mark.parametrize("hann", [True, False])
def test_frequency_filter_parity(ref_core, hann):
    """LTV-FIR filter vs reference, complex frequency response (all-pass
    style, as the Sins group-delay path: vocoder.py:415)."""
    import torch

    rng = np.random.default_rng(3)
    b, t, n_frames, n_mag = 2, 4096, 8, 65
    audio = rng.standard_normal((b, t)).astype(np.float32)
    if hann:
        mags = rng.random((b, n_frames, n_mag)).astype(np.float32)
        ref = ref_core.frequency_filter(
            torch.from_numpy(audio),
            torch.complex(torch.from_numpy(mags), torch.zeros(b, n_frames, n_mag)),
            hann_window=True,
        ).numpy()
        got = np.asarray(
            frequency_filter(jnp.asarray(audio), jnp.asarray(mags) + 0j, True)
        )
    else:
        gd = np.pi * np.tanh(rng.standard_normal((b, n_frames, n_mag))).astype(np.float32)
        phase = np.cumsum(gd, axis=-1)
        ref = ref_core.frequency_filter(
            torch.from_numpy(audio),
            torch.exp(1j * torch.from_numpy(phase)),
            hann_window=False,
        ).numpy()
        got = np.asarray(
            frequency_filter(jnp.asarray(audio), jnp.exp(1j * jnp.asarray(phase)), False)
        )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_frequency_filter_dynamic_window_parity(ref_core):
    """Dynamic f0-dependent window (CombSub old model path, vocoder.py:541)."""
    import torch

    rng = np.random.default_rng(4)
    b, t, n_frames, n_mag = 1, 2048, 4, 33
    audio = rng.standard_normal((b, t)).astype(np.float32)
    mags = np.exp(rng.standard_normal((b, n_frames, n_mag))).astype(np.float32)
    f0 = (100 + 200 * rng.random((b, n_frames, 1))).astype(np.float32)
    hw = (1.5 * 44100 / (f0 + 1e-3)).astype(np.float32)
    ref = ref_core.frequency_filter(
        torch.from_numpy(audio),
        torch.complex(torch.from_numpy(mags), torch.zeros_like(torch.from_numpy(mags))),
        hann_window=True,
        half_width_frames=torch.from_numpy(hw),
    ).numpy()
    got = np.asarray(
        frequency_filter(
            jnp.asarray(audio), jnp.asarray(mags) + 0j, True, jnp.asarray(hw)
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_overlap_add_half_equals_general():
    rng = np.random.default_rng(5)
    frames = jnp.asarray(rng.standard_normal((2, 7, 64)).astype(np.float32))
    fast = overlap_add_half(frames, 32)
    idx = (np.arange(7)[:, None] * 32 + np.arange(64)[None, :]).reshape(-1)
    slow = np.zeros((2, 8 * 32), dtype=np.float32)
    np.add.at(slow, (slice(None), idx), np.asarray(frames).reshape(2, -1))
    np.testing.assert_allclose(np.asarray(fast), slow, atol=1e-6)


def test_frame_ola_roundtrip_sqrt_hann():
    """CombSubFast analysis/synthesis: sqrt-hann framing + x2 window + OLA
    reconstructs the interior exactly (COLA)."""
    rng = np.random.default_rng(6)
    block = 64
    x = rng.standard_normal((1, 10 * block)).astype(np.float32)
    win = sqrt_hann_window(2 * block)
    xp = jnp.pad(jnp.asarray(x), ((0, 0), (block, block)))
    frames = frame_signal(xp, 2 * block, block) * win
    out = overlap_add(frames * win, block)
    out = out[:, block:-block]
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-5)


def test_spectrogram_matches_torch_stft():
    """torchaudio.Spectrogram(power=1, normalized=True, center=False) parity,
    rebuilt from torch.stft primitives (torchaudio itself not installed)."""
    import torch

    rng = np.random.default_rng(7)
    n_fft = 256
    x = rng.standard_normal((2, 2048)).astype(np.float32)
    win = torch.hann_window(n_fft)
    ref = torch.stft(
        torch.from_numpy(x), n_fft, hop_length=n_fft, win_length=n_fft,
        window=win, center=False, return_complex=True,
    )
    ref = ref.abs() / win.pow(2).sum().sqrt()
    got = np.asarray(spectrogram(jnp.asarray(x), n_fft))
    np.testing.assert_allclose(got, ref.numpy(), atol=1e-4)


def test_volume_extractor():
    rng = np.random.default_rng(8)
    x = rng.standard_normal(5000).astype(np.float32)
    v_np = extract_volume_np(x, 512)
    v_j = np.asarray(extract_volume(jnp.asarray(x), 512))
    assert v_np.shape == (5000 // 512 + 1,)
    np.testing.assert_allclose(v_j, v_np, atol=1e-6)


def test_combtooth_matches_torch_sinc():
    import torch

    rng = np.random.default_rng(9)
    rot = (rng.random((1, 500)) - 0.5).astype(np.float32)
    f0 = (200 * rng.random((1, 500))).astype(np.float32)
    f0[0, :50] = 0.0
    ref = torch.sinc(44100 * torch.from_numpy(rot) / (torch.from_numpy(f0) + 1e-3))
    ref[torch.from_numpy(f0) <= 0] = 0.0
    got = np.asarray(combtooth(jnp.asarray(rot), jnp.asarray(f0), 44100))
    np.testing.assert_allclose(got, ref.numpy(), atol=1e-5)
