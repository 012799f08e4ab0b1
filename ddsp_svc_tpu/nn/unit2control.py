"""Unit2Control: units + f0/phase/volume/speaker -> DSP control parameters.

Capability parity with /root/reference/ddsp/unit2control.py:
  PreNet (Conv k3 [causal opt] -> GroupNorm(4) -> LeakyReLU -> Conv k3)
  + Linear(1,256) embeddings of log-scaled f0 / normalized phase / volume
  + Embedding(n_spk,256) speaker embedding indexed with spk_id - 1
    (1-based speaker ids; mixing = weighted sum over a {spk: weight} dict)
  -> PCmer(3 layers, 8 heads, 256) -> LayerNorm -> weight-norm Linear
  -> split into the named control dict.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv1d, GroupNorm, FrameGroupNorm, WeightNormDense, leaky_relu
from .pcmer import PCmer


def split_to_dict(
    tensor: jnp.ndarray, tensor_splits: Dict[str, int]
) -> Dict[str, jnp.ndarray]:
    """Split the last axis into named chunks (unit2control.py:10-20)."""
    out = {}
    start = 0
    for k, size in tensor_splits.items():
        out[k] = tensor[..., start : start + size]
        start += size
    return out


class Unit2Control(nn.Module):
    input_channel: int
    n_spk: int
    output_splits: Dict[str, int]
    causal: bool = False
    ndim_feat: int = 256
    num_layers: int = 3
    num_heads: int = 8
    frame_norm: bool = False  # frame-local prenet norm (exactly streamable)
    compute_dtype: object = None  # e.g. jnp.bfloat16 for the PCmer decoder
    fused_attention: object = True  # Pallas FAVOR+ at inference (nn/pcmer.py)

    @nn.compact
    def __call__(
        self,
        units: jnp.ndarray,
        f0: jnp.ndarray,
        phase: jnp.ndarray,
        volume: jnp.ndarray,
        spk_id: Optional[jnp.ndarray] = None,
        spk_mix_dict: Optional[Dict[int, float]] = None,
        infer: bool = False,
        valid_frames=None,
    ) -> Dict[str, jnp.ndarray]:
        """
        Args:
            units  :: (B, Frame, Feat) - unit series
            f0     :: (B, Frame, 1)    - f0 contour [Hz]
            phase  :: (B, Frame)       - frame-start phase [rad]
            volume :: (B, Frame)       - frame RMS
            spk_id :: (B,)             - 1-based speaker index
            spk_mix_dict - {speaker_id: weight} static mixing dict
            valid_frames - traced scalar (whole-batch true length) or (B,)
                vector (per-item true lengths) when the inputs are
                bucket-padded. Statistics/attention/convolutions are masked
                so each item's first `valid_frames` outputs equal an
                exact-length forward, and the padded tail is replaced by an
                edge-replication of the last valid control frame (the shape
                the reference's own "repeat last filter frame" tail expects).
        Returns:
            dict of (B, Frame, size) control series
        """
        from ..ops.masking import frame_mask, valid_col

        d = self.ndim_feat
        fmask = None
        if valid_frames is not None:
            fmask = frame_mask(units.shape[1], valid_frames,
                               units.dtype)[:, :, None]
            units = units * fmask

        # PreNet
        x = Conv1d(d, 3, causal=self.causal, name="prenet_conv0")(units)
        norm_cls = FrameGroupNorm if self.frame_norm else GroupNorm
        x = norm_cls(4, name="prenet_gn")(x, valid_frames=valid_frames)
        x = leaky_relu(x)
        if fmask is not None:
            x = x * fmask
        x = Conv1d(d, 3, causal=self.causal, name="prenet_conv1")(x)

        # Continuous embeddings
        f0_embed = nn.Dense(d, name="f0_embed")
        phase_embed = nn.Dense(d, name="phase_embed")
        volume_embed = nn.Dense(d, name="volume_embed")
        x = (
            x
            + f0_embed(jnp.log1p(f0 / 700.0))
            + phase_embed(phase[..., None] / np.pi)
            + volume_embed(volume[..., None])
        )

        # Speaker embedding (ids are 1-based; mixing = static weighted sum)
        spk_embed = nn.Embed(self.n_spk, d, name="spk_embed")
        if spk_mix_dict is not None:
            for k, w in spk_mix_dict.items():
                x = x + w * spk_embed(jnp.asarray([[int(k) - 1]]))
        else:
            if spk_id.ndim == 1:
                spk_id = spk_id[:, None]
            x = x + spk_embed(spk_id - 1)  # (B, 1, E) broadcasts over frames

        # Decoder + output head
        x = PCmer(
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            dim_model=d,
            causal=self.causal,
            compute_dtype=self.compute_dtype,
            fused_attention=self.fused_attention,
            name="decoder",
        )(x, infer=infer, valid_frames=valid_frames)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        ndim_out = sum(self.output_splits.values())
        e = WeightNormDense(ndim_out, name="dense_out")(x)
        if valid_frames is not None:
            # edge-replicate each item's last valid control frame over its
            # pad tail
            idx = jnp.minimum(
                jnp.arange(e.shape[1])[None, :],
                valid_col(valid_frames, jnp.int32) - 1,
            )
            e = jnp.take_along_axis(e, idx[:, :, None], axis=1)
        return split_to_dict(e, self.output_splits)
