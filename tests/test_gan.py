"""Enhancer GAN fine-tuning: alternating steps run, losses finite, both
parameter sets update, mel term decreases when overfitting."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ddsp_svc_tpu.nn.nsf_hifigan import Generator
from ddsp_svc_tpu.train.gan import GanTrainer

H = {
    "sampling_rate": 16000,
    "num_mels": 16,
    "n_fft": 512,
    "win_size": 512,
    "hop_size": 64,
    "fmin": 40,
    "fmax": 8000,
    "upsample_rates": [4, 4, 2, 2],
    "upsample_kernel_sizes": [8, 8, 4, 4],
    "upsample_initial_channel": 32,
    "resblock_kernel_sizes": [3],
    "resblock_dilation_sizes": [[1, 3, 5]],
}


@pytest.fixture(scope="module")
def setup():
    gen = Generator(
        sampling_rate=H["sampling_rate"],
        num_mels=H["num_mels"],
        upsample_rates=tuple(H["upsample_rates"]),
        upsample_kernel_sizes=tuple(H["upsample_kernel_sizes"]),
        upsample_initial_channel=H["upsample_initial_channel"],
        resblock_kernel_sizes=tuple(H["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(tuple(d) for d in H["resblock_dilation_sizes"]),
    )
    trainer = GanTrainer(gen, H, lr=1e-4)
    rng = np.random.default_rng(0)
    b, f = 2, 16
    upp = 64
    t = np.arange(f * upp) / H["sampling_rate"]
    audio = np.stack(
        [0.4 * np.sin(2 * np.pi * 220 * t), 0.4 * np.sin(2 * np.pi * 300 * t)]
    ).astype(np.float32)
    batch = {
        "mel": jnp.asarray(rng.standard_normal((b, f, H["num_mels"])).astype(np.float32)),
        "f0": jnp.asarray(np.stack([np.full(f, 220.0), np.full(f, 300.0)]).astype(np.float32)),
        "audio": jnp.asarray(audio),
    }
    state = trainer.create_state(jax.random.key(0), batch["mel"], batch["f0"])
    return trainer, state, batch


def test_gan_alternating_steps(setup):
    trainer, state, batch = setup
    g0 = jax.tree.map(jnp.array, state.g_params)
    d0 = jax.tree.map(jnp.array, state.d_params)

    rng = jax.random.key(1)
    state, d_logs = trainer.step_d(state, batch, rng)
    state, g_logs = trainer.step_g(state, batch, rng)
    assert np.isfinite(float(d_logs["d_loss"]))
    for k in ("g_loss", "mel", "fm", "adv"):
        assert np.isfinite(float(g_logs[k])), k

    # both parameter sets moved
    dg = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(state.g_params))
    )
    dd = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(d0), jax.tree.leaves(state.d_params))
    )
    assert dg > 0 and dd > 0

    # overfit a few alternating rounds: mel term should decrease
    first_mel = float(g_logs["mel"])
    for i in range(12):
        state, _ = trainer.step_d(state, batch, jax.random.fold_in(rng, i))
        state, g_logs = trainer.step_g(state, batch, jax.random.fold_in(rng, 100 + i))
    assert float(g_logs["mel"]) < first_mel, (first_mel, float(g_logs["mel"]))
