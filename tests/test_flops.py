"""Analytic FLOP counters (utils/flops.py) vs XLA's own HLO cost analysis.

XLA reports 0 flops for Pallas custom calls (measured on TPU — the reason
the analytic counters exist), but on CPU with the fused kernels disabled
every conv/matmul is a plain HLO op with exact 2mnk accounting — so the
conv/matmul-dominated components can be cross-checked end to end. FFT flop
accounting differs wildly between XLA's formula and reality, so the
spectral chain is validated by construction (its executed MXU-DFT matmul
shapes) rather than against cost_analysis.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ddsp_svc_tpu.utils import flops as F


def _xla_flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)) + float(ca.get("transcendentals", 0.0))


def test_generator_cost_matches_xla():
    from ddsp_svc_tpu.nn.nsf_hifigan import Generator

    h = {
        "sampling_rate": 16000,
        "num_mels": 16,
        "n_fft": 512,
        "win_size": 512,
        "hop_size": 128,
        "fmin": 40,
        "fmax": 8000,
        "upsample_rates": [4, 4, 2, 2, 2],
        "upsample_kernel_sizes": [8, 8, 4, 4, 4],
        "upsample_initial_channel": 64,
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    }
    model = Generator(
        sampling_rate=h["sampling_rate"],
        num_mels=h["num_mels"],
        upsample_rates=tuple(h["upsample_rates"]),
        upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
        upsample_initial_channel=h["upsample_initial_channel"],
        resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in h["resblock_dilation_sizes"]
        ),
        fused_resblocks=False,
    )
    b, f = 2, 16
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((b, f, h["num_mels"])).astype(np.float32))
    f0 = jnp.asarray((150.0 + 50.0 * rng.random((b, f))).astype(np.float32))
    rand_ini = jnp.zeros((b, 9))
    v = model.init(jax.random.key(0), mel, f0, rand_ini)
    got = _xla_flops(lambda mel, f0, r: model.apply(v, mel, f0, r),
                     mel, f0, rand_ini)
    est = F.nsf_generator_cost(h, b, f, bf16_min_channels=0).flops
    assert 0.85 < est / got < 1.15, (est, got, est / got)


def test_unit2control_cost_matches_xla():
    from ddsp_svc_tpu.nn.unit2control import Unit2Control

    b, f, n_unit, block = 2, 128, 64, 96
    splits = {
        "harmonic_magnitude": block + 1,
        "harmonic_phase": block + 1,
        "noise_magnitude": block + 1,
    }
    model = Unit2Control(n_unit, 4, splits, fused_attention=False)
    rng = np.random.default_rng(1)
    units = jnp.asarray(rng.standard_normal((b, f, n_unit)).astype(np.float32))
    f0 = jnp.asarray((200 * rng.random((b, f, 1))).astype(np.float32))
    phase = jnp.asarray(rng.random((b, f)).astype(np.float32))
    volume = jnp.asarray(rng.random((b, f)).astype(np.float32))
    spk = jnp.ones((b, 1), dtype=jnp.int32)
    v = model.init(jax.random.key(0), units, f0, phase, volume, spk)
    got = _xla_flops(
        lambda u, f0, p, vol, s: model.apply(v, u, f0, p, vol, s, infer=True),
        units, f0, phase, volume, spk,
    )
    est = F.unit2control_cost(
        b, f, n_unit=n_unit, ndim_out=3 * (block + 1), fused=False
    ).flops
    assert 0.85 < est / got < 1.15, (est, got, est / got)


def test_headline_cost_magnitudes():
    """Regression guard on the headline-program counter: the bench-config
    cost must stay in the measured class (~4-5e13 flops at b=128; generator
    trios dominate) and the train-step counter in its own (~1e13)."""
    h = {
        "sampling_rate": 44100, "num_mels": 128, "n_fft": 2048,
        "win_size": 2048, "hop_size": 512, "fmin": 40, "fmax": 16000,
        "upsample_rates": [8, 8, 2, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4, 4],
        "upsample_initial_channel": 512,
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5]] * 3,
    }
    c = F.headline_window_cost(128, 512, 512, 44100, 256, h)
    assert 3e13 < c.flops < 8e13, c.flops
    assert 5e9 < c.bytes < 1e11, c.bytes
    # per-chip speed-of-light: at the bf16 roof this flop count bounds the
    # realtime factor; the measured 1391x must sit below it
    audio_sec = 128 * 512 * 512 / 44100
    sol_rtf = audio_sec / (c.flops / 197e12)
    assert sol_rtf > 1391, sol_rtf

    # the RSS train step is small-model work (b*F = 4128 PCmer tokens +
    # loss transforms): ~4e11 flops — training is not MXU-bound, which the
    # roofline output now states instead of leaving implied
    t = F.train_step_cost(24, 172, 512, 256,
                          (256, 512, 768, 1024, 1280, 1536, 1792, 2047))
    assert 5e10 < t.flops < 5e12, t.flops


def test_roofline_wiring():
    from ddsp_svc_tpu.utils.profiling import roofline, V5E_PEAK_BF16

    rep = roofline(0.5, 4.4e13, 2e10, peak_flops=V5E_PEAK_BF16)
    assert 0 < rep.flops_util < 1
    assert 0 < rep.bw_util < 1
    assert "MXU" in str(rep)
