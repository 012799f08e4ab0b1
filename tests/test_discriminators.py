"""Discriminator/GAN-loss parity vs the reference torch implementation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_gan_losses_match_reference_formulas():
    from ddsp_svc_tpu.nn.discriminators import (
        feature_loss, discriminator_loss, generator_loss,
    )

    rng = np.random.default_rng(0)
    fr = [[jnp.asarray(rng.standard_normal((1, 8)).astype(np.float32))
           for _ in range(2)] for _ in range(3)]
    fg = [[jnp.asarray(rng.standard_normal((1, 8)).astype(np.float32))
           for _ in range(2)] for _ in range(3)]
    fl = float(feature_loss(fr, fg))
    manual = 2 * sum(
        float(np.mean(np.abs(np.asarray(a) - np.asarray(b))))
        for da, db in zip(fr, fg) for a, b in zip(da, db)
    )
    np.testing.assert_allclose(fl, manual, rtol=1e-5)

    dr = [jnp.asarray(rng.standard_normal((1, 5)).astype(np.float32)) for _ in range(2)]
    dg = [jnp.asarray(rng.standard_normal((1, 5)).astype(np.float32)) for _ in range(2)]
    loss, r_l, g_l = discriminator_loss(dr, dg)
    manual = sum(
        float(np.mean((1 - np.asarray(a)) ** 2) + np.mean(np.asarray(b) ** 2))
        for a, b in zip(dr, dg)
    )
    np.testing.assert_allclose(float(loss), manual, rtol=1e-5)

    gl, _ = generator_loss(dg)
    manual = sum(float(np.mean((1 - np.asarray(b)) ** 2)) for b in dg)
    np.testing.assert_allclose(float(gl), manual, rtol=1e-5)


def test_discriminators_run_and_grad():
    from ddsp_svc_tpu.nn.discriminators import (
        MultiPeriodDiscriminator, MultiScaleDiscriminator,
        discriminator_loss,
    )

    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    y_hat = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))

    for cls, n_out in ((MultiPeriodDiscriminator, 5), (MultiScaleDiscriminator, 3)):
        model = cls()
        variables = model.init(jax.random.key(0), y, y_hat)

        def loss_fn(params):
            rs, gs, _, _ = model.apply({"params": params}, y, y_hat)
            assert len(rs) == n_out
            l, _, _ = discriminator_loss(rs, gs)
            return l

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
