"""Mixed-precision (bf16 PCmer compute) mode: params and outputs stay fp32,
results track the fp32 forward closely, and training steps stay finite."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ddsp_svc_tpu.models import CombSubFast, RSSLoss
from ddsp_svc_tpu.train import create_optimizer, create_train_state, make_train_step

SR, BS, F, B = 16000, 256, 32, 2


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    units = jnp.asarray(rng.standard_normal((B, F, 256)).astype(np.float32))
    f0 = jnp.asarray((120.0 + 200.0 * rng.random((B, F, 1))).astype(np.float32))
    volume = jnp.asarray(rng.random((B, F)).astype(np.float32))
    spk_id = jnp.asarray(np.ones((B, 1), dtype=np.int64))
    noise = jnp.asarray((rng.random((B, F * BS)) * 2 - 1).astype(np.float32))
    return units, f0, volume, spk_id, noise


def test_bf16_forward_tracks_fp32():
    units, f0, volume, spk_id, noise = _inputs()
    kw = dict(sampling_rate=SR, block_size=BS, n_unit=256, n_spk=2)
    m32 = CombSubFast(**kw)
    m16 = CombSubFast(**kw, bf16=True)
    variables = m32.init(
        {"params": jax.random.key(0)}, units, f0, volume, spk_id, noise=noise
    )
    # same variables are valid for both: bf16 is a compute-dtype choice only
    y32, _, _ = m32.apply(variables, units, f0, volume, spk_id, noise=noise)
    y16, _, _ = m16.apply(variables, units, f0, volume, spk_id, noise=noise)
    assert y16.dtype == jnp.float32
    assert np.isfinite(np.asarray(y16)).all()
    # bf16 matmuls: expect ~1e-2 relative agreement on the waveform
    denom = np.sqrt(np.mean(np.asarray(y32) ** 2)) + 1e-12
    rel = np.sqrt(np.mean((np.asarray(y16) - np.asarray(y32)) ** 2)) / denom
    assert rel < 5e-2, rel


def test_bf16_param_dtypes_match_fp32():
    units, f0, volume, spk_id, noise = _inputs()
    kw = dict(sampling_rate=SR, block_size=BS, n_unit=256, n_spk=2)
    v16 = CombSubFast(**kw, bf16=True).init(
        {"params": jax.random.key(0)}, units, f0, volume, spk_id, noise=noise
    )
    dtypes = {
        str(p.dtype) for p in jax.tree_util.tree_leaves(v16["params"])
    }
    assert dtypes == {"float32"}


@pytest.mark.parametrize("causal", [False, True])
def test_bf16_train_steps_finite(causal):
    units, f0, volume, spk_id, noise = _inputs(1)
    model = CombSubFast(
        sampling_rate=SR, block_size=BS, n_unit=256, n_spk=2,
        causal=causal, bf16=True,
    )
    audio = np.asarray(noise) * 0.1
    batch = {
        "units": units, "f0": f0, "volume": volume, "spk_id": spk_id,
        "audio": jnp.asarray(audio),
    }
    opt = create_optimizer(1e-4)
    state = create_train_state(model, opt, batch, jax.random.key(0))
    rss = RSSLoss(128, 512, n_scale=2)
    step = make_train_step(model, rss, opt)
    losses = []
    for _ in range(3):
        state, loss = step(state, batch, jax.random.key(1))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), losses
    dtypes = {str(p.dtype) for p in jax.tree_util.tree_leaves(state.params)}
    assert dtypes == {"float32"}
