"""CREPE pitch estimator in JAX (torchcrepe 'full' capability).

Replaces the reference's torchcrepe dependency (vocoder.py:89-102): 1024-
sample windows at 16 kHz, 5 ms hop, per-frame mean/std normalization, a
6-layer strided conv net with 360 pitch-bin sigmoid outputs, Viterbi
decoding with a band-limited transition prior, weighted local-average cents
refinement, and periodicity = probability at the decoded bin.

Architecture (full): channels 1->1024->128->128->128->256->512, first conv
k512 s4, then k64 s1, each layer ReLU -> BatchNorm -> maxpool(2). BatchNorm
is inference-folded into per-channel scale/bias at weight conversion
(utils.convert.convert_crepe_state_dict).

Pretrained torchcrepe weights convert directly; without them the module
still serves as the architecture definition (no pretrained assets ship in
this environment).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

CENTS_PER_BIN = 20.0
CENTS_OFFSET = 1997.3794084376191
N_BINS = 360
WINDOW_SIZE = 1024
HOP_16K = 80  # 5 ms at 16 kHz


class CrepeFull(nn.Module):
    """:: (B, 1024) normalized frames -> (B, 360) bin probabilities."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x[..., None]  # (B, 1024, 1)
        specs = [
            (1024, 512, 4, (254, 254)),
            (128, 64, 1, (31, 32)),
            (128, 64, 1, (31, 32)),
            (128, 64, 1, (31, 32)),
            (256, 64, 1, (31, 32)),
            (512, 64, 1, (31, 32)),
        ]
        for i, (ch, k, s, pad) in enumerate(specs):
            x = nn.Conv(
                ch, (k,), strides=(s,), padding=(pad,), name=f"conv{i + 1}"
            )(x)
            x = jax.nn.relu(x)
            scale = self.param(f"bn{i + 1}_scale", nn.initializers.ones, (ch,))
            bias = self.param(f"bn{i + 1}_bias", nn.initializers.zeros, (ch,))
            x = x * scale + bias
            # maxpool (2,) stride 2 over time
            b, t, c = x.shape
            x = x.reshape(b, t // 2, 2, c).max(axis=2)
        # (B, 4, 512) -> time-major flatten -> (B, 2048)
        b = x.shape[0]
        x = x.reshape(b, -1)
        return jax.nn.sigmoid(nn.Dense(N_BINS, name="classifier")(x))


def _viterbi(logits: np.ndarray) -> np.ndarray:
    """Band-limited Viterbi decode (torchcrepe transition prior:
    max(12 - |i-j|, 0), row-normalized). logits :: (T, 360) probabilities."""
    t, n = logits.shape
    idx = np.arange(n)
    transition = np.maximum(12 - np.abs(idx[:, None] - idx[None, :]), 0).astype(np.float64)
    transition = transition / transition.sum(axis=1, keepdims=True)
    log_trans = np.log(transition + 1e-16)
    # observation: normalized probabilities
    probs = logits.astype(np.float64)
    probs = probs / (probs.sum(axis=1, keepdims=True) + 1e-16)
    log_probs = np.log(probs + 1e-16)

    value = log_probs[0] + np.log(1.0 / n)
    ptr = np.zeros((t, n), dtype=np.int32)
    for i in range(1, t):
        scores = value[:, None] + log_trans
        ptr[i] = np.argmax(scores, axis=0)
        value = scores[ptr[i], idx] + log_probs[i]
    bins = np.zeros(t, dtype=np.int32)
    bins[-1] = int(np.argmax(value))
    for i in range(t - 2, -1, -1):
        bins[i] = ptr[i + 1][bins[i + 1]]
    return bins


def _local_average_cents(probs: np.ndarray, bins: np.ndarray) -> np.ndarray:
    """Weighted average of cents in a ±4-bin window around the decoded bin."""
    t = probs.shape[0]
    cents_map = CENTS_PER_BIN * np.arange(N_BINS) + CENTS_OFFSET
    out = np.zeros(t)
    for i in range(t):
        lo = max(0, bins[i] - 4)
        hi = min(N_BINS, bins[i] + 5)
        w = probs[i, lo:hi]
        out[i] = (w * cents_map[lo:hi]).sum() / (w.sum() + 1e-12)
    return out


class CrepeExtractor:
    """predict(wav16k) -> (f0 [Hz], periodicity) on the 5 ms grid."""

    def __init__(self, fmin: float = 50.0, fmax: float = 2006.0, variables=None):
        self.fmin, self.fmax = fmin, fmax
        self.model = CrepeFull()
        self.variables = variables or self.model.init(
            jax.random.key(0), jnp.zeros((1, WINDOW_SIZE))
        )
        self._apply = jax.jit(self.model.apply)

    def load_torch_checkpoint(self, path: str) -> None:
        import torch
        from ..utils.convert import convert_crepe_state_dict

        sd = torch.load(path, map_location="cpu", weights_only=True)
        self.variables = jax.tree.map(jnp.asarray, convert_crepe_state_dict(sd))

    def predict(self, wav16k: np.ndarray, batch_size: int = 512
                ) -> Tuple[np.ndarray, np.ndarray]:
        wav16k = np.asarray(wav16k, dtype=np.float32)
        # centered 1024-sample windows, 5 ms hop (torchcrepe pad=True)
        pad = WINDOW_SIZE // 2
        x = np.pad(wav16k, (pad, pad))
        n_frames = 1 + len(wav16k) // HOP_16K
        idx = np.arange(n_frames)[:, None] * HOP_16K + np.arange(WINDOW_SIZE)[None, :]
        frames = x[np.minimum(idx, len(x) - 1)]
        frames = frames - frames.mean(axis=1, keepdims=True)
        frames = frames / np.maximum(frames.std(axis=1, keepdims=True), 1e-10)

        probs = []
        for i in range(0, n_frames, batch_size):
            chunk = frames[i : i + batch_size]
            if len(chunk) < batch_size:
                chunk = np.pad(chunk, ((0, batch_size - len(chunk)), (0, 0)))
            p = np.asarray(self._apply(self.variables, jnp.asarray(chunk)))
            probs.append(p[: min(batch_size, n_frames - i)])
        probs = np.concatenate(probs, axis=0)  # (T, 360)

        # restrict to [fmin, fmax] bins
        cents_map = CENTS_PER_BIN * np.arange(N_BINS) + CENTS_OFFSET
        freq_map = 10.0 * 2.0 ** (cents_map / 1200.0)
        probs_masked = np.where(
            (freq_map >= self.fmin) & (freq_map <= self.fmax), probs, 0.0
        )
        bins = _viterbi(probs_masked)
        cents = _local_average_cents(probs_masked, bins)
        f0 = 10.0 * 2.0 ** (cents / 1200.0)
        periodicity = probs[np.arange(len(bins)), bins]
        return f0.astype(np.float32), periodicity.astype(np.float32)
