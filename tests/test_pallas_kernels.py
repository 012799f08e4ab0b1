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
