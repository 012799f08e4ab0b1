"""HiFi-GAN discriminators and GAN losses.

Capability parity with /root/reference/nsf_hifigan/models.py:288-439:
MultiPeriodDiscriminator (periods 2,3,5,7,11; strided 2-D conv stacks over
period-folded audio) and MultiScaleDiscriminator (3 scales with mean-pool
downsampling), plus feature-matching / LSGAN losses. In the reference these
are dead code (the enhancer ships inference-only weights); here they make
enhancer fine-tuning possible on TPU.

Weight norm / spectral norm are folded at conversion for inference; for
training these run as plain convs (weight-norm reparameterization of big
conv stacks buys little under Adam and costs extra HBM traffic on TPU).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

LRELU_SLOPE = 0.1


def _leaky(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


class DiscriminatorP(nn.Module):
    """Period discriminator (models.py:288-321): fold time into
    (frames, period) and run strided 2-D convs along frames."""

    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        # x :: (B, T)
        b, t = x.shape
        if t % self.period != 0:
            pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
            t = t + pad
        x = x.reshape(b, t // self.period, self.period, 1)  # (B, F, P, C)

        fmap = []
        pad_t = (self.kernel_size - 1) // 2
        for ch in (32, 128, 512, 1024):
            x = nn.Conv(
                ch, (self.kernel_size, 1), strides=(self.stride, 1),
                padding=((pad_t, pad_t), (0, 0)),
            )(x)
            x = _leaky(x)
            fmap.append(x)
        x = nn.Conv(1024, (self.kernel_size, 1), padding=((2, 2), (0, 0)))(x)
        x = _leaky(x)
        fmap.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)))(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator (models.py:348-373): grouped strided 1-D convs."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        # x :: (B, T)
        b = x.shape[0]
        x = x[..., None]  # (B, T, 1)
        specs = [
            (128, 15, 1, 1, 7),
            (128, 41, 2, 4, 20),
            (256, 41, 2, 16, 20),
            (512, 41, 4, 16, 20),
            (1024, 41, 4, 16, 20),
            (1024, 41, 1, 16, 20),
            (1024, 5, 1, 1, 2),
        ]
        fmap = []
        for ch, k, s, g, p in specs:
            x = nn.Conv(
                ch, (k,), strides=(s,), feature_group_count=g,
                padding=((p, p),),
            )(x)
            x = _leaky(x)
            fmap.append(x)
        x = nn.Conv(1, (3,), padding=((1, 1),))(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(period=p, name=f"disc_p{p}")
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def _avg_pool(x: jnp.ndarray, k: int = 4, s: int = 2, pad: int = 2) -> jnp.ndarray:
    x = jnp.pad(x, ((0, 0), (pad, pad)))
    n = (x.shape[1] - k) // s + 1
    idx = jnp.arange(n)[:, None] * s + jnp.arange(k)[None, :]
    return jnp.mean(x[:, idx], axis=-1)


class MultiScaleDiscriminator(nn.Module):
    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(3):
            if i != 0:
                y = _avg_pool(y)
                y_hat = _avg_pool(y_hat)
            d = DiscriminatorS(name=f"disc_s{i}")
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    """Feature-matching L1 (models.py:408-414)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(disc_real, disc_gen):
    """LSGAN discriminator loss (models.py:417-428)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        r = jnp.mean((1.0 - dr) ** 2)
        g = jnp.mean(dg ** 2)
        loss = loss + r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    """LSGAN generator loss (models.py:431-439)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses
