"""NaN-masked 1D pooling, used to smooth CREPE f0/periodicity tracks.

Behavioral contracts from /root/reference/ddsp/core.py:100-125:
  - masked_avg_pool_1d: reflect-pad ((k-1)//2, k//2), mean over non-NaN
    entries per window (count clamped to >=1).
  - median_pool_1d: same padding, sliding-window median taken as the
    (k-1)//2-th order statistic.

Implemented with static sliding-window gathers (stride-1 unfold) so they jit
to pure vector ops — window sizes here are tiny (k=4).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _reflect_pad_1d(x: jnp.ndarray, pad_l: int, pad_r: int) -> jnp.ndarray:
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_l, pad_r)], mode="reflect")


def _unfold_last(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """(..., T) -> (..., T-size+1, size) sliding windows, stride 1."""
    t = x.shape[-1] - size + 1
    idx = np.arange(t)[:, None] + np.arange(size)[None, :]
    return x[..., idx]


def masked_avg_pool_1d(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """:: (B, T) -> (B, T); NaNs excluded from each window's average."""
    xp = _reflect_pad_1d(x, (kernel_size - 1) // 2, kernel_size // 2)
    win = _unfold_last(xp, kernel_size)
    mask = ~jnp.isnan(win)
    summed = jnp.sum(jnp.where(mask, win, 0.0), axis=-1)
    count = jnp.maximum(jnp.sum(mask.astype(x.dtype), axis=-1), 1.0)
    return summed / count


def median_pool_1d(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """:: (B, T) -> (B, T); sliding (k-1)//2-th order statistic."""
    xp = _reflect_pad_1d(x, (kernel_size - 1) // 2, kernel_size // 2)
    win = _unfold_last(xp, kernel_size)
    win = jnp.sort(win, axis=-1)
    return win[..., (kernel_size - 1) // 2]
