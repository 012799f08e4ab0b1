"""Basic network layers with torch-compatible semantics.

Provides the building blocks the reference pulled from torch/extorch
(`Conv1dEx` with a `causal` switch, GroupNorm, weight-normalized Linear),
re-expressed for (B, T, C) channel-last layout — the natural layout for TPU
matmuls (last dim = 128-lane axis).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


class Conv1d(nn.Module):
    """1D convolution over (B, T, C) with 'same' or causal (left) padding.

    extorch.Conv1dEx parity (/root/reference/ddsp/unit2control.py:40,
    pcmer.py:54): causal=True pads (k-1, 0) on the time axis, otherwise
    symmetric 'same' padding.
    """

    features: int
    kernel_size: int
    causal: bool = False
    groups: int = 1
    use_bias: bool = True
    stride: int = 1
    dtype: object = None  # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        if self.causal:
            pad = (k - 1, 0)
        else:
            pad = ((k - 1) // 2, k // 2)
        return nn.Conv(
            features=self.features,
            kernel_size=(k,),
            strides=(self.stride,),
            padding=(pad,),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class GroupNorm(nn.Module):
    """torch.nn.GroupNorm parity on (B, T, C): normalize per channel group
    over (T, C//G), affine per channel. eps=1e-5.

    `valid_frames` (traced scalar or per-item (B,) vector) restricts the
    statistics to each segment's first N frames — bucket-padded inference
    then computes exactly the stats the reference computes at the segment's
    true length."""

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid_frames=None) -> jnp.ndarray:
        b, t, c = x.shape
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xg = x.reshape(b, t, g, c // g)
        if valid_frames is None:
            mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
            var = jnp.mean((xg - mean) ** 2, axis=(1, 3), keepdims=True)
        else:
            from ..ops.masking import frame_mask, valid_col

            m = frame_mask(t, valid_frames, x.dtype)[:, :, None, None]
            denom = (
                valid_col(valid_frames, x.dtype)[:, :, None, None] * (c // g)
            )
            mean = jnp.sum(xg * m, axis=(1, 3), keepdims=True) / denom
            var = jnp.sum(((xg - mean) * m) ** 2, axis=(1, 3), keepdims=True) / denom
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        return xg.reshape(b, t, c) * scale + bias


class FrameGroupNorm(nn.Module):
    """GroupNorm with *frame-local* statistics: normalize each frame's
    channel groups independently (no reduction over time).

    torch/reference GroupNorm reduces over (C//G, T) — which makes even the
    'causal' model depend on future frames (docs/PARITY.md). Models built
    with frame_norm=True are exactly streamable: see models/incremental.py.
    """

    num_groups: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, valid_frames=None) -> jnp.ndarray:
        # frame-local stats: padding can't leak, valid_frames is a no-op
        b, t, c = x.shape
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xg = x.reshape(b, t, g, c // g)
        mean = jnp.mean(xg, axis=3, keepdims=True)
        var = jnp.mean((xg - mean) ** 2, axis=3, keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.epsilon)
        return xg.reshape(b, t, c) * scale + bias


class LayerNorm(nn.Module):
    """LayerNorm with torch eps (1e-5)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(epsilon=self.epsilon)(x)


class WeightNormDense(nn.Module):
    """Dense with weight normalization (torch weight_norm(Linear), dim=0):
    W = g * V / ||V||, norm per output unit over the input axis.

    Used by the Unit2Control output head (/root/reference/ddsp/unit2control.py:61).
    Keeping the (g, v) parameterization preserves training dynamics.
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        v = self.param(
            "v",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        # init g to ||v|| so initial W == v (torch weight_norm init semantics)
        g = self.param(
            "g",
            lambda rng, shape: jnp.linalg.norm(v, axis=0),
            (self.features,),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        w = v * (g[None, :] / (norm + 1e-12))
        return x @ w + b


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


def glu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)
