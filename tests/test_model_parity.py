"""Full-model numerical parity: reference torch synthesizers (executed via
test stubs for their CUDA/native deps) vs our flax models with converted
weights and identical injected noise."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torch_stubs import install_stubs
from ddsp_svc_tpu.utils.convert import convert_synth_state_dict
from ddsp_svc_tpu.models import Sins, CombSub, CombSubFast


@pytest.fixture(scope="module")
def ref_vocoder():
    install_stubs()
    try:
        from ddsp import vocoder  # type: ignore
    except Exception as e:
        pytest.skip(f"reference ddsp.vocoder not importable: {e}")
    return vocoder


def _random_inputs(seed, b=2, n_frames=24, n_unit=256, block=512):
    rng = np.random.default_rng(seed)
    units = rng.standard_normal((b, n_frames, n_unit)).astype(np.float32)
    f0 = (110.0 + 440.0 * rng.random((b, n_frames, 1))).astype(np.float32)
    f0[0, :4] = 0.0  # unvoiced head
    volume = rng.random((b, n_frames)).astype(np.float32)
    spk_id = np.array([[1], [2]][:b], dtype=np.int64)
    noise = (rng.random((b, n_frames * block)) * 2.0 - 1.0).astype(np.float32)
    return units, f0, volume, spk_id, noise


def _run_pair(ref_model, jax_model, inputs, noise, n_frames, block, torch):
    units, f0, volume, spk_id = inputs
    sd = ref_model.state_dict()
    variables = convert_synth_state_dict(sd)
    variables = jax.tree.map(jnp.asarray, variables)

    t_units, t_f0, t_vol = map(torch.from_numpy, (units, f0, volume))
    t_spk = torch.from_numpy(spk_id)

    t_noise = torch.from_numpy(noise)
    orig_rand = torch.rand_like

    def fake_rand_like(x):
        return (t_noise[: x.shape[0], : x.shape[1]].to(x.dtype) + 1.0) / 2.0

    torch.rand_like = fake_rand_like
    try:
        with torch.no_grad():
            ref_sig, ref_phase, _ = ref_model(
                t_units, t_f0, t_vol, t_spk, infer=True
            )
    finally:
        torch.rand_like = orig_rand

    got_sig, got_phase, _ = jax_model.apply(
        variables, jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
        jnp.asarray(spk_id), infer=True, noise=jnp.asarray(noise),
    )
    return np.asarray(got_sig), ref_sig.numpy(), np.asarray(got_phase), ref_phase.numpy()


def test_combsubfast_parity(ref_vocoder):
    import torch

    torch.manual_seed(0)
    b, n_frames, block = 2, 24, 512
    units, f0, volume, spk_id, noise = _random_inputs(0, b, n_frames, block=block)
    ref_model = ref_vocoder.CombSubFast(44100, block, n_unit=256, n_spk=4)
    jax_model = CombSubFast(sampling_rate=44100, block_size=block, n_unit=256, n_spk=4)
    got, ref, got_ph, ref_ph = _run_pair(
        ref_model, jax_model, (units, f0, volume, spk_id), noise, n_frames, block, torch
    )
    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 2e-3, np.abs(got - ref).max() / scale
    # phases compared on the circle
    dp = np.abs(got_ph - ref_ph) % (2 * np.pi)
    dp = np.minimum(dp, 2 * np.pi - dp)
    assert dp.max() < 1e-2


def test_sins_parity(ref_vocoder):
    import torch

    torch.manual_seed(1)
    b, n_frames, block = 1, 16, 512
    units, f0, volume, spk_id, noise = _random_inputs(1, b, n_frames, block=block)
    ref_model = ref_vocoder.Sins(
        44100, block, n_harmonics=64, n_mag_allpass=128, n_mag_noise=128,
        n_unit=256, n_spk=4,
    )
    jax_model = Sins(
        sampling_rate=44100, block_size=block, n_harmonics=64,
        n_mag_allpass=128, n_mag_noise=128, n_unit=256, n_spk=4,
    )
    got, ref, _, _ = _run_pair(
        ref_model, jax_model, (units, f0, volume, spk_id), noise, n_frames, block, torch
    )
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 5e-3, np.abs(got - ref).max() / scale


def test_combsub_old_parity(ref_vocoder):
    import torch

    torch.manual_seed(2)
    b, n_frames, block = 1, 16, 512
    units, f0, volume, spk_id, noise = _random_inputs(2, b, n_frames, block=block)
    ref_model = ref_vocoder.CombSub(
        44100, block, n_mag_allpass=128, n_mag_harmonic=256, n_mag_noise=128,
        n_unit=256, n_spk=4,
    )
    jax_model = CombSub(
        sampling_rate=44100, block_size=block, n_mag_allpass=128,
        n_mag_harmonic=256, n_mag_noise=128, n_unit=256, n_spk=4,
    )
    got, ref, _, _ = _run_pair(
        ref_model, jax_model, (units, f0, volume, spk_id), noise, n_frames, block, torch
    )
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 5e-3, np.abs(got - ref).max() / scale


def test_combsubfast_spk_mix(ref_vocoder):
    import torch

    torch.manual_seed(3)
    b, n_frames, block = 1, 12, 512
    units, f0, volume, spk_id, noise = _random_inputs(3, b, n_frames, block=block)
    mix = {1: 0.5, 3: 0.5}
    ref_model = ref_vocoder.CombSubFast(44100, block, n_unit=256, n_spk=4)
    jax_model = CombSubFast(sampling_rate=44100, block_size=block, n_unit=256, n_spk=4)
    sd = ref_model.state_dict()
    variables = jax.tree.map(jnp.asarray, convert_synth_state_dict(sd))
    t_noise = torch.from_numpy(noise)
    orig = torch.rand_like
    torch.rand_like = lambda x: (t_noise[: x.shape[0], : x.shape[1]].to(x.dtype) + 1) / 2
    try:
        with torch.no_grad():
            ref_sig, _, _ = ref_model(
                torch.from_numpy(units), torch.from_numpy(f0),
                torch.from_numpy(volume), None, spk_mix_dict=mix, infer=True,
            )
    finally:
        torch.rand_like = orig
    got_sig, _, _ = jax_model.apply(
        variables, jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
        None, spk_mix_dict=mix, infer=True, noise=jnp.asarray(noise),
    )
    scale = np.abs(ref_sig.numpy()).max() + 1e-6
    assert np.abs(np.asarray(got_sig) - ref_sig.numpy()).max() / scale < 2e-3


def test_causal_mode_runs():
    """c=true (causal streaming mode) compiles and runs with finite output."""
    units, f0, volume, spk_id, noise = _random_inputs(4, 1, 12)
    model = CombSubFast(
        sampling_rate=44100, block_size=512, n_unit=256, n_spk=4, causal=True
    )
    variables = model.init(
        {"params": jax.random.key(0)},
        jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
        jnp.asarray(spk_id), noise=jnp.asarray(noise),
    )
    sig, _, _ = model.apply(
        variables, jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
        jnp.asarray(spk_id), noise=jnp.asarray(noise),
    )
    assert np.isfinite(np.asarray(sig)).all()


def test_combsubfast_causal_parity(ref_vocoder):
    """c=True (streaming) mode: causal convs + causal linear attention vs
    the reference (its CUDA CausalDotProduct replaced by the exact-math
    test stub)."""
    import torch

    torch.manual_seed(5)
    b, n_frames, block = 1, 16, 512
    units, f0, volume, spk_id, noise = _random_inputs(5, b, n_frames, block=block)
    ref_model = ref_vocoder.CombSubFast(44100, block, n_unit=256, n_spk=4, c=True)
    jax_model = CombSubFast(
        sampling_rate=44100, block_size=block, n_unit=256, n_spk=4, causal=True
    )
    got, ref, _, _ = _run_pair(
        ref_model, jax_model, (units, f0, volume, spk_id), noise, n_frames, block, torch
    )
    scale = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / scale < 2e-3, np.abs(got - ref).max() / scale


def test_combsubfast_fused_spectral_matches_xla():
    """CombSubFast with the fused Pallas spectral chain (forced, interpret on
    CPU) must match the plain XLA FFT chain."""
    b, n_frames, n_unit, block = 2, 12, 256, 128
    units, f0, volume, spk_id, noise = _random_inputs(
        31, b=b, n_frames=n_frames, n_unit=n_unit, block=block
    )
    kw = dict(sampling_rate=44100, block_size=block, n_unit=n_unit, n_spk=4)
    m_ref = CombSubFast(**kw, fused_spectral=False)
    m_fused = CombSubFast(**kw, fused_spectral="force")
    variables = m_ref.init(
        {"params": jax.random.key(5)}, jnp.asarray(units), jnp.asarray(f0),
        jnp.asarray(volume), jnp.asarray(spk_id), noise=jnp.asarray(noise),
    )
    args = (jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
            jnp.asarray(spk_id))
    ref, _, _ = m_ref.apply(variables, *args, infer=True,
                            noise=jnp.asarray(noise))
    got, _, _ = m_fused.apply(variables, *args, infer=True,
                              noise=jnp.asarray(noise))
    ref, got = np.asarray(ref), np.asarray(got)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 2e-5


def test_combsubfast_fused_attention_matches_xla():
    """CombSubFast with the fused Pallas FAVOR+ attention (forced, interpret
    on CPU) must match the XLA attention path. T=128 satisfies the kernel's
    lane constraint."""
    b, n_frames, n_unit, block = 2, 128, 64, 64
    units, f0, volume, spk_id, noise = _random_inputs(
        41, b=b, n_frames=n_frames, n_unit=n_unit, block=block
    )
    kw = dict(sampling_rate=16000, block_size=block, n_unit=n_unit, n_spk=4,
              fused_spectral=False)
    m_ref = CombSubFast(**kw, fused_attention=False)
    m_fused = CombSubFast(**kw, fused_attention="force")
    variables = m_ref.init(
        {"params": jax.random.key(6)}, jnp.asarray(units), jnp.asarray(f0),
        jnp.asarray(volume), jnp.asarray(spk_id), noise=jnp.asarray(noise),
    )
    args = (jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
            jnp.asarray(spk_id))
    ref, _, _ = m_ref.apply(variables, *args, infer=True,
                            noise=jnp.asarray(noise))
    got, _, _ = m_fused.apply(variables, *args, infer=True,
                              noise=jnp.asarray(noise))
    ref, got = np.asarray(ref), np.asarray(got)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 5e-5
