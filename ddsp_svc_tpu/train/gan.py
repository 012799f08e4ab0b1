"""Adversarial fine-tuning for the NSF-HiFiGAN enhancer.

The reference ships the HiFi-GAN discriminators and GAN losses as dead code
(models.py:288-439 — its enhancer uses externally pretrained weights). This
module makes them trainable on TPU: the standard HiFi-GAN objective
(LSGAN adversarial + feature matching + mel-reconstruction L1) with the
usual alternating two-optimizer scheme, each phase a single donated jit.

    gan = GanTrainer(generator_model, h, mel_weight=45.0)
    state = gan.create_state(rng, example_mel, example_f0)
    state, logs = gan.step_d(state, batch, rng)   # discriminators
    state, logs = gan.step_g(state, batch, rng)   # generator
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..nn.discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    feature_loss,
    discriminator_loss,
    generator_loss,
)
from ..ops import log_mel_spectrogram


class GanState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any  # {"mpd": ..., "msd": ...}
    g_opt: Any
    d_opt: Any


class GanTrainer:
    def __init__(self, generator, h: dict, lr: float = 2e-4,
                 mel_weight: float = 45.0, fm_weight: float = 2.0,
                 mesh=None, mesh_axis: str = "data"):
        """mesh: optional jax.sharding.Mesh — run the D and G steps
        data-parallel over `mesh_axis` (batch sharded, params/opt state
        replicated; XLA inserts the gradient psum over ICI). The reference
        has no distributed training at all (SURVEY §2.3); the GAN step is
        the dominant-FLOPs training path (generator + 8 discriminators), so
        it is the one that must scale."""
        self.generator = generator
        self.h = h
        self.mpd = MultiPeriodDiscriminator()
        self.msd = MultiScaleDiscriminator()
        self.g_optimizer = optax.adamw(lr, b1=0.8, b2=0.99)
        self.d_optimizer = optax.adamw(lr, b1=0.8, b2=0.99)
        self.mel_weight = mel_weight
        self.fm_weight = fm_weight
        self.mesh, self.mesh_axis = mesh, mesh_axis
        self._step_d = jax.jit(self._step_d_impl, donate_argnums=(0,))
        self._step_g = jax.jit(self._step_g_impl, donate_argnums=(0,))

    # batch: {"mel": (B, F, M), "f0": (B, F), "audio": (B, T)}

    def _constrain(self, state: "GanState", batch: Dict):
        """DP sharding constraints: batch over the mesh axis, state
        replicated. No-op without a mesh."""
        if self.mesh is None:
            return state, batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(self.mesh, P(self.mesh_axis))
        repl = NamedSharding(self.mesh, P())
        batch = {
            k: jax.lax.with_sharding_constraint(v, batch_sh)
            for k, v in batch.items()
        }
        state = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, repl), state
        )
        return state, batch

    def create_state(self, rng, example_mel, example_f0) -> GanState:
        b = example_mel.shape[0]
        rand_ini = jnp.zeros((b, 9))

        @jax.jit
        def init_all(rng):
            rg, rm, rs = jax.random.split(rng, 3)
            g = self.generator.init(rg, example_mel, example_f0, rand_ini)
            fake = jnp.zeros(
                (b, example_f0.shape[1] * self._upp()), dtype=jnp.float32
            )
            d_mpd = self.mpd.init(rm, fake, fake)
            d_msd = self.msd.init(rs, fake, fake)
            return g, d_mpd["params"], d_msd["params"]

        g_vars, mpd_params, msd_params = init_all(rng)
        g_params = g_vars["params"]
        d_params = {"mpd": mpd_params, "msd": msd_params}
        return GanState(
            step=jnp.asarray(0, jnp.int32),
            g_params=g_params,
            d_params=d_params,
            g_opt=self.g_optimizer.init(g_params),
            d_opt=self.d_optimizer.init(d_params),
        )

    def _upp(self) -> int:
        import numpy as np

        return int(np.prod(self.h["upsample_rates"]))

    def _generate(self, g_params, batch, rng):
        b = batch["mel"].shape[0]
        rand_ini = jax.random.uniform(rng, (b, 9)).at[:, 0].set(0.0)
        return self.generator.apply(
            {"params": g_params}, batch["mel"], batch["f0"], rand_ini
        )

    def _step_d_impl(self, state: GanState, batch: Dict, rng) -> Tuple[GanState, Dict]:
        state, batch = self._constrain(state, batch)
        y = batch["audio"]
        y_hat = jax.lax.stop_gradient(
            self._generate(state.g_params, batch, jax.random.fold_in(rng, 0))
        )

        def d_loss(d_params):
            rs_p, gs_p, _, _ = self.mpd.apply({"params": d_params["mpd"]}, y, y_hat)
            rs_s, gs_s, _, _ = self.msd.apply({"params": d_params["msd"]}, y, y_hat)
            lp, _, _ = discriminator_loss(rs_p, gs_p)
            ls, _, _ = discriminator_loss(rs_s, gs_s)
            return lp + ls

        loss, grads = jax.value_and_grad(d_loss)(state.d_params)
        updates, d_opt = self.d_optimizer.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        return (
            state.replace(step=state.step + 1, d_params=d_params, d_opt=d_opt),
            {"d_loss": loss},
        )

    def _step_g_impl(self, state: GanState, batch: Dict, rng) -> Tuple[GanState, Dict]:
        state, batch = self._constrain(state, batch)
        y = batch["audio"]
        h = self.h

        def g_loss(g_params):
            y_hat = self._generate(g_params, batch, jax.random.fold_in(rng, 0))
            mel_hat = log_mel_spectrogram(
                y_hat, h["sampling_rate"], h["n_fft"], h["hop_size"],
                h["win_size"], h["num_mels"], h["fmin"], h["fmax"],
            )
            mel_ref = log_mel_spectrogram(
                y, h["sampling_rate"], h["n_fft"], h["hop_size"],
                h["win_size"], h["num_mels"], h["fmin"], h["fmax"],
            )
            l_mel = jnp.mean(jnp.abs(mel_hat - mel_ref)) * self.mel_weight
            rs_p, gs_p, fr_p, fg_p = self.mpd.apply(
                {"params": state.d_params["mpd"]}, y, y_hat
            )
            rs_s, gs_s, fr_s, fg_s = self.msd.apply(
                {"params": state.d_params["msd"]}, y, y_hat
            )
            l_fm = (feature_loss(fr_p, fg_p) + feature_loss(fr_s, fg_s)) * self.fm_weight
            l_adv_p, _ = generator_loss(gs_p)
            l_adv_s, _ = generator_loss(gs_s)
            total = l_mel + l_fm + l_adv_p + l_adv_s
            return total, {"mel": l_mel, "fm": l_fm, "adv": l_adv_p + l_adv_s}

        (loss, logs), grads = jax.value_and_grad(g_loss, has_aux=True)(state.g_params)
        updates, g_opt = self.g_optimizer.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        return (
            state.replace(g_params=g_params, g_opt=g_opt),
            {"g_loss": loss, **logs},
        )

    def step_d(self, state, batch, rng):
        return self._step_d(state, batch, rng)

    def step_g(self, state, batch, rng):
        return self._step_g(state, batch, rng)
