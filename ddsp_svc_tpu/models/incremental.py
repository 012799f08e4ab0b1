"""Exact incremental (state-carrying) streaming inference for CombSubFast.

The reference's real-time mode recomputes a full sliding window every block
and SOLA-splices the results (gui.py:367-433) — necessary there because even
its 'causal' model is acausal through the prenet GroupNorm (docs/PARITY.md).
For models built with `causal=True, frame_norm=True` this module provides
true incremental inference: per incoming feature frame it advances carried
state and emits one audio block, bit-matching the batch forward (tested to
1e-4) at a fixed 2-frame (~23 ms @ 44.1 kHz/512) algorithmic delay and
O(block) work per block — no window recomputation, no splicing.

Carried state:
  - prenet: last 2 input/hidden frames per causal k3 conv
  - per PCmer layer: linear-attention (S = K^T V, sum K) moments and the
    last 30 frames feeding the causal depthwise conv
  - DSP: compensated (hi, lo) phase-rotation carry, previous f0 frame,
    previous combtooth/noise sample blocks, previous synthesis frame half
    (overlap-add tail), previous frame's control spectra

All steps are pure functions over the model's parameter tree; `process` is
jit-compiled once per (batch, chunk) shape.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..nn.pcmer import softmax_kernel
from ..ops.phase import _wrap, _two_sum, _fast_two_sum
from ..ops import sqrt_hann_window
from ..ops.spectral import rfft as _rfft, irfft as _irfft


class LayerState(NamedTuple):
    attn_s: jnp.ndarray  # (B, H, m, d)
    attn_ksum: jnp.ndarray  # (B, H, m)
    conv_tail: jnp.ndarray  # (B, 30, inner)


class StreamState(NamedTuple):
    prenet0_tail: jnp.ndarray  # (B, 2, n_unit)
    prenet1_tail: jnp.ndarray  # (B, 2, d)
    layers: Tuple[LayerState, ...]
    rot_hi: jnp.ndarray  # (B,)
    rot_lo: jnp.ndarray  # (B,)
    prev_f0: jnp.ndarray  # (B,) last seen f0 frame value
    prev_tooth: jnp.ndarray  # (B, bs) combtooth of the previous interval
    prev_noise: jnp.ndarray  # (B, bs)
    prev_filtered_half: jnp.ndarray  # (B, bs) OLA tail (2nd half of prev frame)
    prev_ctrl: jnp.ndarray  # (B, 3*(bs+1)) previous frame's raw control vec
    frame_idx: jnp.ndarray  # () int32
    spk_embed: jnp.ndarray  # (B, d) cached speaker embedding


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _layer_norm(p, x, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _frame_group_norm(p, x, groups=4, eps=1e-5):
    b, c = x.shape
    xg = x.reshape(b, groups, c // groups)
    mean = jnp.mean(xg, axis=-1, keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=-1, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xg.reshape(b, c) * p["scale"] + p["bias"]


def _causal_conv_frame(kernel, bias, tail, x):
    """One output frame of a causal k-tap conv. kernel :: (k, in, out);
    tail :: (B, k-1, in) previous inputs; x :: (B, in)."""
    k = kernel.shape[0]
    window = jnp.concatenate([tail, x[:, None, :]], axis=1)  # (B, k, in)
    y = jnp.einsum("bki,kio->bo", window, kernel) + bias
    return y, window[:, 1:, :]


def _depthwise_conv_frame(kernel, bias, tail, x):
    """Causal depthwise conv, one frame. kernel :: (k, 1, C)."""
    k = kernel.shape[0]
    window = jnp.concatenate([tail, x[:, None, :]], axis=1)  # (B, k, C)
    y = jnp.einsum("bkc,kc->bc", window, kernel[:, 0, :]) + bias
    return y, window[:, 1:, :]


def _leaky(x):
    return jnp.where(x >= 0, x, 0.01 * x)


class IncrementalCombSubFast:
    """Streaming engine over a trained CombSubFast(causal=True,
    frame_norm=True) parameter tree."""

    def __init__(self, model, variables):
        assert model.causal and model.frame_norm, (
            "incremental mode requires causal=True, frame_norm=True "
            "(see docs/PARITY.md on GroupNorm acausality)"
        )
        self.model = model
        self.bs = int(model.block_size)
        self.sr = int(model.sampling_rate)
        self.p = variables["params"]["unit2ctrl"]
        self.c = variables["constants"]["unit2ctrl"]
        self.num_layers = model.unit2ctrl.num_layers if hasattr(model, "unit2ctrl") else 3
        self.num_layers = 3
        self.heads = 8
        self.dim_head = 64
        self.d = 256
        self.window = sqrt_hann_window(2 * self.bs)
        self._process = jax.jit(self._process_impl)

    # ------------------------------ state ----------------------------------

    def init_state(self, spk_id: np.ndarray, batch: int = 1) -> StreamState:
        m = int(self.dim_head * math.log(self.dim_head))
        d = self.d
        inner = d * 2
        layers = tuple(
            LayerState(
                attn_s=jnp.zeros((batch, self.heads, m, self.dim_head)),
                attn_ksum=jnp.zeros((batch, self.heads, m)),
                conv_tail=jnp.zeros((batch, 30, inner)),
            )
            for _ in range(self.num_layers)
        )
        spk_emb = self.p["spk_embed"]["embedding"][
            np.asarray(spk_id).reshape(-1) - 1
        ]
        n_unit = self.p["prenet_conv0"]["Conv_0"]["kernel"].shape[1]
        return StreamState(
            prenet0_tail=jnp.zeros((batch, 2, n_unit)),
            prenet1_tail=jnp.zeros((batch, 2, d)),
            layers=layers,
            rot_hi=jnp.zeros((batch,)),
            rot_lo=jnp.zeros((batch,)),
            prev_f0=jnp.zeros((batch,)),
            prev_tooth=jnp.zeros((batch, self.bs)),
            prev_noise=jnp.zeros((batch, self.bs)),
            prev_filtered_half=jnp.zeros((batch, self.bs)),
            prev_ctrl=jnp.zeros((batch, 3 * (self.bs + 1))),
            frame_idx=jnp.asarray(0, jnp.int32),
            spk_embed=jnp.asarray(spk_emb),
        )

    # --------------------------- control network ---------------------------

    def _control_frame(self, state: StreamState, unit, f0, phase, volume):
        """One frame through Unit2Control. unit :: (B, n_unit); scalars (B,)."""
        p = self.p
        x, pre0 = _causal_conv_frame(
            p["prenet_conv0"]["Conv_0"]["kernel"],
            p["prenet_conv0"]["Conv_0"]["bias"],
            state.prenet0_tail, unit,
        )
        x = _frame_group_norm(p["prenet_gn"], x)
        x = _leaky(x)
        x, pre1 = _causal_conv_frame(
            p["prenet_conv1"]["Conv_0"]["kernel"],
            p["prenet_conv1"]["Conv_0"]["bias"],
            state.prenet1_tail, x,
        )
        x = (
            x
            + _dense(p["f0_embed"], jnp.log1p(f0 / 700.0)[:, None])
            + _dense(p["phase_embed"], (phase / np.pi)[:, None])
            + _dense(p["volume_embed"], volume[:, None])
            + state.spk_embed
        )

        new_layers = []
        for i in range(self.num_layers):
            lp = p["decoder"][f"layer_{i}"]
            lc = self.c["decoder"][f"layer_{i}"]
            ls = state.layers[i]
            # attention
            h = _layer_norm(lp["norm"], x)
            b = h.shape[0]
            q = _dense(lp["attn"]["to_q"], h).reshape(b, self.heads, self.dim_head)
            k = _dense(lp["attn"]["to_k"], h).reshape(b, self.heads, self.dim_head)
            v = _dense(lp["attn"]["to_v"], h).reshape(b, self.heads, self.dim_head)
            proj = lc["attn"]["projection"]
            qf = softmax_kernel(q[:, :, None, :], proj, is_query=True)[:, :, 0, :]
            kf = softmax_kernel(k[:, :, None, :], proj, is_query=False)[:, :, 0, :]
            s_new = ls.attn_s + jnp.einsum("bhm,bhd->bhmd", kf, v)
            ksum_new = ls.attn_ksum + kf
            num = jnp.einsum("bhm,bhmd->bhd", qf, s_new)
            den = jnp.einsum("bhm,bhm->bh", qf, ksum_new + 1e-6)
            attn_out = (num / den[..., None]).reshape(b, -1)
            x = x + _dense(lp["attn"]["to_out"], attn_out)
            # conformer conv module
            h = _layer_norm(lp["conv"]["LayerNorm_0"], x)
            h = _dense(lp["conv"]["Dense_0"], h)
            a, g = jnp.split(h, 2, axis=-1)
            h = a * jax.nn.sigmoid(g)
            h, tail_new = _depthwise_conv_frame(
                lp["conv"]["Conv1d_0"]["Conv_0"]["kernel"],
                lp["conv"]["Conv1d_0"]["Conv_0"]["bias"],
                ls.conv_tail, h,
            )
            h = jax.nn.silu(h)
            x = x + _dense(lp["conv"]["Dense_1"], h)
            new_layers.append(
                LayerState(attn_s=s_new, attn_ksum=ksum_new, conv_tail=tail_new)
            )

        x = _layer_norm(p["norm"], x)
        w = p["dense_out"]
        norm = jnp.linalg.norm(w["v"], axis=0, keepdims=True)
        kernel = w["v"] * (w["g"][None, :] / (norm + 1e-12))
        ctrl = x @ kernel + w["bias"]
        return ctrl, pre0, pre1, tuple(new_layers)

    # ------------------------------ dsp step -------------------------------

    def _frame_step(self, state: StreamState, unit, f0, volume, noise_blk):
        """Advance by one incoming frame; returns (audio_block, new_state).

        audio_block is the synthesized block for frame_idx-2 (zeros while
        the 2-frame pipeline fills)."""
        bs, sr = self.bs, self.sr
        b = f0.shape[0]

        first = state.frame_idx == 0  # no interval exists before frame 0

        # interval j-1 sample f0 (lerp prev -> current)
        frac = jnp.arange(bs, dtype=f0.dtype) / bs
        f0_seg = state.prev_f0[:, None] * (1 - frac) + f0[:, None] * frac

        # compensated cumulative rotation over the interval
        steps = f0_seg / sr
        local = jnp.cumsum(steps, axis=-1)
        hi0 = state.rot_hi[:, None]
        s, e = _two_sum(hi0, local)
        lo = state.rot_lo[:, None] + e
        rot_hi, rot_lo = _fast_two_sum(_wrap(s), lo)
        rot = _wrap(rot_hi + rot_lo)  # (B, bs)
        tooth = jnp.sinc(sr * rot / (f0_seg + 1e-3))
        tooth = jnp.where(f0_seg <= 0.0, 0.0, tooth)
        tooth = jnp.where(first, 0.0, tooth)

        new_rot_hi = jnp.where(first, 0.0, _wrap(rot_hi[:, -1]))
        new_rot_lo = jnp.where(first, 0.0, rot_lo[:, -1])
        noise_blk = jnp.where(first, 0.0, noise_blk)

        # control frame j (phase at sample j*bs = carry + f0[j]/sr, inclusive)
        phase_j = 2.0 * np.pi * _wrap(new_rot_hi + new_rot_lo + f0 / sr)
        ctrl, pre0, pre1, layers = self._control_frame(
            state, unit, f0, phase_j, volume
        )

        # analysis frame m = j-1: tooth blocks (j-2, j-1), filter ctrls[j-1]
        seg = jnp.concatenate([state.prev_tooth, tooth], axis=-1) * self.window
        nseg = jnp.concatenate([state.prev_noise, noise_blk], axis=-1) * self.window
        cm = state.prev_ctrl
        n_bins = bs + 1
        harmo_mag = cm[:, :n_bins]
        harmo_phase = cm[:, n_bins: 2 * n_bins]
        noise_mag = cm[:, 2 * n_bins:]
        src_filter = jnp.exp(harmo_mag + 1j * np.pi * harmo_phase)
        noise_filter = jnp.exp(noise_mag) / 128.0
        spec = _rfft(seg, 2 * bs) * src_filter + _rfft(nseg, 2 * bs) * noise_filter
        frame_out = _irfft(spec, 2 * bs) * self.window  # (B, 2bs)

        # emit orig block n = j-2: prev frame's 2nd half + this frame's 1st
        audio_block = state.prev_filtered_half + frame_out[:, :bs]

        new_state = StreamState(
            prenet0_tail=pre0,
            prenet1_tail=pre1,
            layers=layers,
            rot_hi=new_rot_hi,
            rot_lo=new_rot_lo,
            prev_f0=f0,
            prev_tooth=tooth,
            prev_noise=noise_blk,
            prev_filtered_half=frame_out[:, bs:],
            prev_ctrl=ctrl,
            frame_idx=state.frame_idx + 1,
            spk_embed=state.spk_embed,
        )
        return audio_block, new_state

    def _process_impl(self, state, units, f0, volume, noise):
        """Chunk of frames via scan. units :: (B, Fc, C); f0 :: (B, Fc);
        volume :: (B, Fc); noise :: (B, Fc*bs)."""
        bs = self.bs
        fc = units.shape[1]
        noise_blocks = noise.reshape(noise.shape[0], fc, bs)

        def body(st, inp):
            u, f, v, nb = inp
            blk, st = self._frame_step(st, u, f, v, nb)
            return st, blk

        xs = (
            jnp.moveaxis(units, 1, 0),
            jnp.moveaxis(f0, 1, 0),
            jnp.moveaxis(volume, 1, 0),
            jnp.moveaxis(noise_blocks, 1, 0),
        )
        state, blocks = jax.lax.scan(body, state, xs)
        return jnp.moveaxis(blocks, 0, 1).reshape(noise.shape[0], -1), state

    def process(self, state, units, f0, volume, noise):
        """Feed a chunk of frames; returns (audio, state). Output blocks are
        delayed 2 frames relative to the input frames."""
        return self._process(state, units, f0, volume, noise)

    def flush(self, state, noise_last: Optional[jnp.ndarray] = None
              ) -> Tuple[jnp.ndarray, StreamState]:
        """Drain the 2-frame pipeline, matching the batch forward's edge
        handling: f0 edge repeat for the final interval, last-filter repeat
        for the final analysis frame, zero back-padding of excitation.

        noise_last: excitation noise for the final interval (F-1); zeros if
        omitted."""
        b = state.prev_f0.shape[0]
        bs = self.bs
        if noise_last is None:
            noise_last = jnp.zeros((b, bs))
        last_ctrl = state.prev_ctrl  # ctrl[F-1], reused for analysis frame F

        # virtual incoming frame: interval F-1 uses (f0[F-1], f0[F-1]); the
        # fake control frame it computes is discarded
        fake_units = jnp.zeros_like(state.prenet0_tail[:, -1, :])
        blk1, st = self._frame_step(
            state, fake_units, state.prev_f0, jnp.zeros((b,)), noise_last
        )
        # analysis frame F: tooth/noise blocks (F-1, zero back-pad), filters
        # from the repeated last control frame (vocoder.py:473,476)
        seg = jnp.concatenate(
            [st.prev_tooth, jnp.zeros((b, bs))], axis=-1
        ) * self.window
        nseg = jnp.concatenate(
            [st.prev_noise, jnp.zeros((b, bs))], axis=-1
        ) * self.window
        n_bins = bs + 1
        src_filter = jnp.exp(
            last_ctrl[:, :n_bins] + 1j * np.pi * last_ctrl[:, n_bins: 2 * n_bins]
        )
        noise_filter = jnp.exp(last_ctrl[:, 2 * n_bins:]) / 128.0
        spec = _rfft(seg, 2 * bs) * src_filter + _rfft(nseg, 2 * bs) * noise_filter
        frame_out = _irfft(spec, 2 * bs) * self.window
        blk2 = st.prev_filtered_half + frame_out[:, :bs]
        return jnp.concatenate([blk1, blk2], axis=-1), st
