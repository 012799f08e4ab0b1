"""Pallas kernel correctness (interpret mode on CPU) vs XLA reference."""
import numpy as np
import jax.numpy as jnp

from ddsp_svc_tpu.ops.exciters import oscillator_bank
from ddsp_svc_tpu.ops.pallas_kernels import oscillator_bank_pallas


def test_oscillator_bank_pallas_matches_xla():
    rng = np.random.default_rng(0)
    b, f, h, block = 2, 6, 128, 64
    phase = jnp.asarray(
        (rng.random((b, f * block)) * 2 * np.pi - np.pi).astype(np.float32)
    )
    amps = jnp.asarray((rng.random((b, f, h)) * 0.1).astype(np.float32))
    ref = oscillator_bank(phase, amps, block)
    got = oscillator_bank_pallas(phase, amps, block, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_oscillator_bank_pallas_nonlane_harmonics():
    """h < 128 pads to the lane width; results must be unaffected."""
    rng = np.random.default_rng(1)
    b, f, h, block = 1, 4, 60, 32
    phase = jnp.asarray(
        (rng.random((b, f * block)) * 2 * np.pi - np.pi).astype(np.float32)
    )
    amps = jnp.asarray((rng.random((b, f, h)) * 0.1).astype(np.float32))
    ref = oscillator_bank(phase, amps, block)
    got = oscillator_bank_pallas(phase, amps, block, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_dft_magnitude_matches_fft():
    from ddsp_svc_tpu.ops.pallas_kernels import dft_magnitude_pallas

    rng = np.random.default_rng(2)
    for n in (256, 1024):
        frames = jnp.asarray(rng.standard_normal((37, n)).astype(np.float32))
        ref = np.abs(np.fft.rfft(np.asarray(frames), n))
        got = np.asarray(dft_magnitude_pallas(frames, n, True))
        np.testing.assert_allclose(got, ref, atol=2e-3)


def test_dft_magnitude_gradient():
    import jax
    from ddsp_svc_tpu.ops.pallas_kernels import dft_magnitude_pallas

    rng = np.random.default_rng(3)
    n = 256
    frames = jnp.asarray(rng.standard_normal((8, n)).astype(np.float32))

    def loss_pallas(fr):
        return jnp.sum(jnp.log(dft_magnitude_pallas(fr, n, True) + 1e-7))

    def loss_fft(fr):
        return jnp.sum(jnp.log(jnp.abs(jnp.fft.rfft(fr, n)) + 1e-7))

    g1 = np.asarray(jax.grad(loss_pallas)(frames))
    g2 = np.asarray(jax.grad(loss_fft)(frames))
    np.testing.assert_allclose(g1, g2, atol=2e-3)


def test_spectrogram_mxu_backend_matches():
    from ddsp_svc_tpu.ops import spectral

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))
    ref = np.asarray(spectral.spectrogram(x, 256))
    spectral.set_mag_backend("mxu")
    try:
        got = np.asarray(spectral.spectrogram(x, 256))
    finally:
        spectral.set_mag_backend("fft")
    np.testing.assert_allclose(got, ref, atol=2e-4)
