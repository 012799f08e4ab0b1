"""HuBERT-soft unit encoder in JAX.

Capability parity with /root/reference/encoder/hubert/model.py (bshall
HuBERT-soft): conv feature extractor (320x downsample), feature projection,
positional conv embedding, 12-layer post-norm transformer (768 dim, 12
heads, 3072 FF, exact GELU), and the 768->256 soft-unit projection. The
`units` entry point pads the waveform by (400-320)/2 = 40 samples on both
sides (model.py:83).

This is an inference-path encoder (weights come from the pretrained torch
checkpoint via utils.convert.convert_hubert_state_dict; the torch
weight-norm on the positional conv is folded at conversion). Runs in a
single jit; attention is plain softmax MHA — frame counts are T/320 so the
O(F^2) cost is negligible against the conv frontend, and XLA maps it
straight onto the MXU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


class FeatureExtractor(nn.Module):
    """Conv downsampling stack k10s5 + [k3s2]x4 + [k2s2]x2 -> 512ch
    (model.py:100-122). Input (B, T) -> (B, Frame, 512)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x[..., None]  # (B, T, 1)
        x = nn.Conv(512, (10,), strides=(5,), padding="VALID", use_bias=False,
                    name="conv0")(x)
        # torch GroupNorm(512, 512): per-channel instance norm over time
        gn_scale = self.param("norm0_scale", nn.initializers.ones, (512,))
        gn_bias = self.param("norm0_bias", nn.initializers.zeros, (512,))
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * gn_scale + gn_bias
        x = _gelu(x)
        for i, (k, s) in enumerate([(3, 2)] * 4 + [(2, 2)] * 2, start=1):
            x = nn.Conv(512, (k,), strides=(s,), padding="VALID", use_bias=False,
                        name=f"conv{i}")(x)
            x = _gelu(x)
        return x


class FeatureProjection(nn.Module):
    """LayerNorm(512) -> Linear 512->768 (model.py:125-137)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(768, name="projection")(x)


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding k128 g16 pad64, crop last frame
    (model.py:140-155; torch weight-norm folded at conversion)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(
            768, (128,), padding=((64, 64),), feature_group_count=16, name="conv"
        )(x)
        return _gelu(y[:, :-1, :])


class TransformerLayer(nn.Module):
    """torch nn.TransformerEncoderLayer parity: post-norm, 12-head MHA,
    768->3072->768 FF with exact GELU."""

    dim: int = 768
    heads: int = 12
    ff: int = 3072

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_head = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, d_head).transpose(0, 2, 1, 3)

        q, k, v = map(heads, (q, k, v))
        attn = jnp.einsum("bhid,bhjd->bhij", q, k) / jnp.sqrt(
            jnp.asarray(d_head, x.dtype)
        )
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        out = nn.Dense(self.dim, name="out_proj")(out)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + out)

        y = nn.Dense(self.ff, name="linear1")(x)
        y = _gelu(y)
        y = nn.Dense(self.dim, name="linear2")(y)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + y)


def compute_mask(
    rng: jax.Array,
    shape: tuple,
    mask_prob: float = 0.8,
    mask_length: int = 10,
    min_masks: int = 2,
) -> jnp.ndarray:
    """SpecAugment-style span mask (model.py:186-238 parity; train-time
    masking for HuBERT fine-tuning). Returns bool (B, T)."""
    b, t = shape
    if mask_length > t:
        raise ValueError("mask_length must be <= sequence_length")
    rng_n, rng_idx = jax.random.split(rng)
    num_spans = int(mask_prob * t / mask_length + 0.5)
    num_spans = max(min(num_spans, t // mask_length), min_masks)
    starts = jax.random.randint(
        rng_idx, (b, num_spans), 0, t - mask_length + 1
    )
    idx = starts[..., None] + jnp.arange(mask_length)[None, None, :]
    mask = jnp.zeros((b, t), dtype=bool)
    return mask.at[
        jnp.arange(b)[:, None, None], idx
    ].set(True)


class HubertDiscrete:
    """Discrete-units variant: layer-7 features quantized by k-means
    (model.py:87-97; unused by the SVC pipeline but part of the encoder
    family). The k-means codebook loads from the reference's torch
    checkpoint dict ({n_features_in_, cluster_centers_})."""

    def __init__(self, variables, cluster_centers):
        import numpy as _np

        self.model = HubertSoft(output_layer=7, proj_dim=None)
        self.variables = variables
        self.centers = _np.asarray(cluster_centers, dtype=_np.float32)

    def units(self, wav) -> "jnp.ndarray":
        import numpy as _np

        x = self.model.apply(self.variables, wav)  # (B, F, 768)
        feats = _np.asarray(x).reshape(-1, x.shape[-1])
        d = ((feats[:, None, :] - self.centers[None, :, :]) ** 2).sum(-1)
        return d.argmin(axis=1).reshape(x.shape[0], x.shape[1])


class HubertSoft(nn.Module):
    """HuBERT-family encoder; __call__ == reference HubertSoft.units.

    Variants (the reference's encoder matrix, vocoder.py:153-166):
      - hubertsoft: full 12 layers + proj 768->256 (defaults)
      - hubertbase / contentvec: output_layer=9, final_proj 768->256
      - hubertbase768 / contentvec768: output_layer=9, no projection
    """

    num_layers: int = 12
    output_layer: int | None = None  # stop after this many layers (1-based)
    proj_dim: int | None = 256  # None = raw transformer features
    pad_input: bool = True  # (400-320)/2-sample pad (model.py:83)

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """:: (B, T) 16 kHz audio -> (B, Frame, proj_dim or 768)."""
        if self.pad_input:
            wav = jnp.pad(wav, ((0, 0), (40, 40)))
        x = FeatureExtractor(name="feature_extractor")(wav)
        x = FeatureProjection(name="feature_projection")(x)
        x = x + PositionalConvEmbedding(name="positional_embedding")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        n_layers = self.output_layer or self.num_layers
        for i in range(n_layers):
            x = TransformerLayer(name=f"layer_{i}")(x)
        if self.proj_dim is not None:
            x = nn.Dense(self.proj_dim, name="proj")(x)
        return x
