"""Multi-scale spectral losses.

Capability parity with /root/reference/ddsp/loss.py:
  - SSS (single-scale): spectral-convergence term + alpha * L1(log mag), on
    an amplitude (power=1), window-normalized, center=False spectrogram with
    hop == n_fft (zero overlap).
  - RSS (random-scale): per step, n_scale FFT sizes drawn uniformly from
    [fft_min, fft_max) and averaged.

TPU-native re-design: the reference instantiates 1792 Spectrogram modules up
front (loss.py:34-35) and would force one XLA recompilation per distinct
n_fft. Here the random draw is over a *static bucket set* of log-spaced FFT
sizes; every bucket branch is compiled exactly once and selected per-step
with lax.switch under jit, keeping the step fully compiled while preserving
the stochastic multi-scale training signal. For validation there is a
deterministic all-buckets average (`mss_loss`).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import spectrogram


def sss_loss(
    x_true: jnp.ndarray,
    x_pred: jnp.ndarray,
    n_fft: int,
    alpha: float = 1.0,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Single-scale spectral loss (loss.py:7-25). x :: (B, T)."""
    s_true = spectrogram(x_true, n_fft) + eps
    s_pred = spectrogram(x_pred, n_fft) + eps
    converge = jnp.mean(
        jnp.sqrt(jnp.sum((s_true - s_pred) ** 2, axis=(1, 2)))
        / jnp.sqrt(jnp.sum((s_true + s_pred) ** 2, axis=(1, 2)))
    )
    log_term = jnp.mean(jnp.abs(jnp.log(s_true) - jnp.log(s_pred)))
    return converge + alpha * log_term


def default_buckets(fft_min: int, fft_max: int, n_buckets: int = 16) -> tuple:
    """Linearly-spaced static FFT-size buckets spanning [fft_min, fft_max).

    Linear spacing matches the reference's uniform integer n_fft draw
    (loss.py:39) in distribution over scales. Measured (300-step training
    A/B on CPU, tools/rss_bucket_experiment.py): a 16-bucket *linear* set
    trains to the same final mel-L1 as a 48-size dense-draw proxy (0.4105
    vs 0.4121, inside the 3.4% seed-to-seed noise floor), while the
    earlier *log*-spaced set over-weighted small scales and landed ~7-10%
    worse (0.440-0.456) — 2-3x the noise floor. docs/PARITY.md has the
    full experiment table."""
    sizes = np.unique(
        np.round(np.linspace(fft_min, fft_max - 1, n_buckets)).astype(int)
    )
    return tuple(int(s) for s in sizes)


class RSSLoss:
    """Random-scale spectral loss over a static bucket set (loss.py:28-43).

    Callable: loss = rss(x_pred, x_true, rng). Fully jittable.
    """

    def __init__(
        self,
        fft_min: int = 256,
        fft_max: int = 2048,
        n_scale: int = 4,
        alpha: float = 1.0,
        eps: float = 1e-7,
        buckets: Sequence[int] | None = None,
        n_buckets: int = 16,
    ):
        self.n_scale = n_scale
        self.alpha = alpha
        self.eps = eps
        self.buckets = (
            tuple(buckets)
            if buckets is not None
            else default_buckets(fft_min, fft_max, n_buckets)
        )
        self._branches = [
            partial(sss_loss, n_fft=n, alpha=alpha, eps=eps) for n in self.buckets
        ]

    def __call__(
        self, x_pred: jnp.ndarray, x_true: jnp.ndarray, rng: jax.Array
    ) -> jnp.ndarray:
        idx = jax.random.randint(rng, (self.n_scale,), 0, len(self.buckets))
        total = 0.0
        for i in range(self.n_scale):
            total = total + jax.lax.switch(idx[i], self._branches, x_true, x_pred)
        return total / self.n_scale

    def mss(self, x_pred: jnp.ndarray, x_true: jnp.ndarray) -> jnp.ndarray:
        """Deterministic all-buckets average (validation metric)."""
        total = 0.0
        for branch in self._branches:
            total = total + branch(x_true, x_pred)
        return total / len(self._branches)


def mel_l1(
    x_pred: jnp.ndarray,
    x_true: jnp.ndarray,
    sr: int = 44100,
    n_fft: int = 2048,
    hop: int = 512,
    n_mels: int = 128,
) -> jnp.ndarray:
    """Log-mel L1 distance — the benchmark parity metric (BASELINE.md)."""
    from ..ops import log_mel_spectrogram

    m_p = log_mel_spectrogram(x_pred, sr, n_fft, hop, n_fft, n_mels, 0.0, sr / 2)
    m_t = log_mel_spectrogram(x_true, sr, n_fft, hop, n_fft, n_mels, 0.0, sr / 2)
    return jnp.mean(jnp.abs(m_p - m_t))
