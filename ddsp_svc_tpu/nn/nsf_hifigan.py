"""NSF-HiFiGAN vocoder (enhancer) in JAX.

Capability parity with /root/reference/nsf_hifigan/models.py: SineGen
harmonic source (harmonic_num=8 -> 9 sine channels, random initial phase per
non-fundamental harmonic, amplitude 0.1), SourceModuleHnNSF (Linear(9->1) +
tanh merge), and the Generator: conv_pre k7 -> N x [leaky_relu ->
ConvTranspose upsample -> + f0-source injection conv -> mean of 3 parallel
ResBlock1] -> leaky_relu -> conv_post k7 -> tanh.

TPU-first notes:
  - SineGen's fp64 cumsum + wraparound-shift trick (models.py:154-171) is
    replaced by the framework's compensated mod-1 prefix scan at *frame*
    rate plus exact per-sample linear accumulation within frames — the same
    piecewise-linear phase the reference constructs, without fp64.
  - Weight norm is folded at conversion (the reference removes it at load,
    models.py:37).
  - Transposed convs are expressed via lhs-dilated conv_general_dilated with
    torch-compatible padding, so XLA lowers them to MXU matmuls.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.phase import _cumsum_mod1_compensated, _wrap

LRELU_SLOPE = 0.1


def _leaky(x, slope=LRELU_SLOPE):
    return jnp.where(x >= 0, x, slope * x)


def _source_phase(
    f0_frames: jnp.ndarray, upp: int, sr: int, rand_ini: jnp.ndarray,
    harmonic_num: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-start rotations + per-sample rad (SineGen phase bookkeeping).

    The reference adds rand_ini to frame 0's per-sample rad value
    (models.py:152) BEFORE the cumsum — so during frame 0 each sample
    accumulates (rad_0 + rand_ini), and every later frame inherits a
    wrapped offset of upp*rand_ini. A constant-phase-offset reading of
    rand_ini is NOT equivalent (caught by the -e true whole-pipeline A/B).
    Returns (start :: (B,F,H), rad :: (B,F,H)).
    """
    h = harmonic_num + 1
    k = jnp.arange(1, h + 1, dtype=f0_frames.dtype)
    rad = _wrap(f0_frames[..., None] * k / sr)  # per-sample rotation, (B,F,H)
    # integer phase shifts are invisible to sin(2*pi*x), so wrapped rad may
    # differ from the reference's (fn/sr)%1 by an integer — harmless
    rad = rad.at[:, 0, :].add(rand_ini)
    d = _wrap(rad * upp)  # per-frame rotation (mod 1)
    end = _cumsum_mod1_compensated(d, axis=1)  # rotation at each frame end
    start = _wrap(end - d)  # rotation at frame start
    return start, rad


def sine_source(
    f0_frames: jnp.ndarray,
    upp: int,
    sr: int,
    rand_ini: jnp.ndarray,
    harmonic_num: int = 8,
    sine_amp: float = 0.1,
) -> jnp.ndarray:
    """Harmonic sine bank at sample rate (SineGen parity, models.py:139-177).

    f0_frames :: (B, F); rand_ini :: (B, H) with [:,0] == 0 (random initial
    rotations). Returns (B, F*upp, H).
    """
    h = harmonic_num + 1
    start, rad = _source_phase(f0_frames, upp, sr, rand_ini, harmonic_num)
    # within-frame linear accumulation: sample s (1-indexed) adds rad*s
    s = jnp.arange(1, upp + 1, dtype=f0_frames.dtype)
    phase = start[:, :, None, :] + rad[:, :, None, :] * s[None, None, :, None]
    b, f = f0_frames.shape
    phase = phase.reshape(b, f * upp, h)
    # note: the reference applies no explicit unvoiced masking here
    # (models.py:176-177) — unvoiced regions yield a constant sin(rand phase)
    return jnp.sin(2.0 * np.pi * phase) * sine_amp


def harmonic_source_fused(
    f0_frames: jnp.ndarray,
    upp: int,
    sr: int,
    rand_ini: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    harmonic_num: int = 8,
    sine_amp: float = 0.1,
) -> jnp.ndarray:
    """sine_source + SourceModuleHnNSF merge (Linear(9->1) + tanh) with the
    harmonic reduction BEFORE the frame->sample reshape: identical math to
    tanh(Dense(sine_source(...))) but XLA fuses broadcast+sin+reduce into
    one pass over (B, F, upp) instead of materializing the (B, T, 9) sine
    bank around a reshape. Returns (B, F*upp, 1)."""
    start, rad = _source_phase(f0_frames, upp, sr, rand_ini, harmonic_num)
    s = jnp.arange(1, upp + 1, dtype=f0_frames.dtype)
    phase = start[:, :, None, :] + rad[:, :, None, :] * s[None, None, :, None]
    sines = jnp.sin(2.0 * np.pi * phase) * sine_amp  # (B, F, upp, H)
    lin = jnp.einsum("bfsh,h->bfs", sines, w) + b
    bsz, f = f0_frames.shape
    return jnp.tanh(lin).reshape(bsz, f * upp)[..., None]


def harmonic_source_auto(
    f0_frames: jnp.ndarray,
    upp: int,
    sr: int,
    rand_ini: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    harmonic_num: int = 8,
    sine_amp: float = 0.1,
) -> jnp.ndarray:
    """harmonic_source_fused with the per-sample part fused in Pallas on TPU:
    the XLA path materializes the (B, F, upp, H) sine bank in HBM (~300 MB,
    33 ms at the batch-32 headline geometry); the kernel writes only the
    merged audio. Frame-rate phase bookkeeping (the compensated scan) stays
    in XLA — it is (B, F, H)-sized and sequential."""
    if jax.default_backend() in ("cpu", "gpu") or upp % 128 != 0:
        return harmonic_source_fused(
            f0_frames, upp, sr, rand_ini, w, b, harmonic_num, sine_amp
        )
    from ..ops.pallas_kernels import harmonic_source_pallas

    start, rad = _source_phase(f0_frames, upp, sr, rand_ini, harmonic_num)
    return harmonic_source_pallas(start, rad, w, b, upp, sine_amp)[..., None]


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None) -> jnp.ndarray:
        """mask :: optional (B?, T, 1) 0/1 valid-sample mask (bucket-padded
        batches). Re-applied after every conv so the pad region stays zero —
        each conv then sees exactly the zero padding an exact-length forward
        provides at its boundary, keeping valid outputs bit-consistent."""
        for i, d in enumerate(self.dilation):
            pad = (self.kernel_size * d - d) // 2
            xt = _leaky(x)
            xt = nn.Conv(
                self.channels, (self.kernel_size,), kernel_dilation=(d,),
                padding=((pad, pad),), name=f"conv1_{i}", dtype=self.dtype,
            )(xt)
            if mask is not None:
                xt = xt * mask
            xt = _leaky(xt)
            pad1 = (self.kernel_size - 1) // 2
            xt = nn.Conv(
                self.channels, (self.kernel_size,),
                padding=((pad1, pad1),), name=f"conv2_{i}", dtype=self.dtype,
            )(xt)
            if mask is not None:
                xt = xt * mask
            x = xt + x
        return x


class ConvTranspose1dTorch(nn.Module):
    """ConvTranspose1d with torch length semantics:
    out = (in-1)*stride - 2*padding + kernel."""

    features: int
    kernel_size: int
    stride: int
    padding: int
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, in_ch, self.features)
        )  # stored flipped-ready: (k, in, out)
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            x.transpose(0, 2, 1)[:, :, :],  # (B, C, T)
            jnp.flip(kernel, 0).transpose(2, 1, 0),  # (out, in, k)
            window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p)],
            lhs_dilation=(s,),
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return out.transpose(0, 2, 1) + bias


class Generator(nn.Module):
    """NSF-HiFiGAN generator (models.py:219-276). Channel-last (B, T, C)."""

    sampling_rate: int
    num_mels: int
    upsample_rates: Sequence[int]
    upsample_kernel_sizes: Sequence[int]
    upsample_initial_channel: int
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    dtype: object = None  # compute dtype, e.g. jnp.bfloat16 (params stay fp32)
    # bf16 only while channels >= this count (0 = off). Measured on v5e:
    # full-bf16 is *slower* (late small-channel stages are not MXU-bound and
    # pay cast overhead), but bf16 on the early wide stages is +29%
    # (157x vs 122x realtime at the 44.1 kHz community-vocoder geometry).
    bf16_min_channels: int = 0
    # Fuse each stage's resblock trio into one Pallas kernel on TPU (the
    # narrow fp32 tail stages are HBM-bound: 18 conv round-trips become one
    # VMEM-resident pass — tools/profile_stages.py). Auto-disabled off-TPU
    # and for geometries the kernel doesn't cover; "force" runs it in
    # interpret mode off-TPU (tests).
    fused_resblocks: object = True
    # Fold each fused stage's f0-source injection conv into the trio
    # kernel (the nc output and the add skip HBM). Measured a wash at the
    # batch-128 headline (1389 vs 1391x, within relay drift) — kept on for
    # the saved XLA passes; flip for A/Bs.
    fused_inject: bool = True
    # MXU input precision inside the fused kernel (fp32 accumulation and
    # fp32 residual carries either way). False measured ~5% faster at the
    # fused widths (C<=64): TPU default dot precision truncates fp32 inputs
    # on the MXU anyway, so the explicit pre-concat bf16 casts only add VPU
    # work; weights at these widths fit VMEM in fp32.
    fused_mxu_bf16: bool = False
    # Fold the transposed-conv upsample + f0-source injection conv into the
    # fused stage kernel (fp32 narrow stages). Measured a NET LOSS at the
    # batch-32 headline (full generator 197 vs 177 ms): Mosaic cannot
    # rate-change lanes (no element-wise repeat / strided lane access /
    # interleave reshape), so the kernel must read a u-repeated full-rate
    # input window, doubling its HBM read and roll bytes — more than the
    # saved XLA up/noise round-trips. Kept as an option pending a Mosaic
    # interleave primitive.
    fused_stage: bool = False

    @nn.compact
    def __call__(
        self, mel: jnp.ndarray, f0_frames: jnp.ndarray, rand_ini: jnp.ndarray,
        valid_frames=None,
    ) -> jnp.ndarray:
        """mel :: (B, F, num_mels); f0_frames :: (B, F); rand_ini :: (B, 9).
        Returns (B, F*prod(upsample_rates)).

        valid_frames (traced scalar or per-item (B,) vector): true mel-frame
        counts for bucket-padded batches. Inputs and every stage boundary
        are re-masked to zero past each item's valid length, so every conv
        sees exactly the zero padding an exact-length forward provides —
        the first valid_frames*upp output samples equal a per-item
        exact-length forward (the batched offline path, infer/batch.py).
        The fused trio kernel participates: its per-conv boundary mask
        tightens to each row's valid length (per-row SMEM counts), so
        masked batches keep the VMEM-resident trio path. The fused *stage*
        variant (upsample fold) stays excluded under masking."""
        upp = int(np.prod(self.upsample_rates))
        _mask = None
        if valid_frames is not None:
            from ..ops.masking import frame_mask

            vf = jnp.asarray(valid_frames)
            f_in = mel.shape[1]
            _cache = {}

            def _mask(scale):
                if scale not in _cache:
                    _cache[scale] = frame_mask(
                        f_in * scale, vf * scale, jnp.float32
                    )[:, :, None]
                return _cache[scale]

            mel = mel * frame_mask(f_in, vf, mel.dtype)[:, :, None]
        # sine source stays fp32: phase accuracy matters. The Dense(9->1)
        # module is materialized once for its params; compute runs through
        # the reduce-before-reshape formulation (harmonic_source_fused).
        lin = nn.Dense(1, name="source_linear")
        lin(jnp.zeros((1, 1, 9), jnp.float32))
        p_lin = self.variables["params"]["source_linear"]
        har = harmonic_source_auto(
            f0_frames, upp, self.sampling_rate, rand_ini,
            p_lin["kernel"][:, 0], p_lin["bias"][0],
        )  # (B, T, 1)
        if _mask is not None:
            har = har * _mask(upp).astype(har.dtype)
        if self.dtype is not None:
            har = har.astype(self.dtype)
            mel = mel.astype(self.dtype)

        x = nn.Conv(
            self.upsample_initial_channel, (7,), padding=((3, 3),),
            name="conv_pre", dtype=self.dtype,
        )(mel)
        if _mask is not None:
            x = x * _mask(1).astype(x.dtype)
        n_up = len(self.upsample_rates)
        n_kernels = len(self.resblock_kernel_sizes)
        cum = 1
        for i, (u, k) in enumerate(
            zip(self.upsample_rates, self.upsample_kernel_sizes)
        ):
            cum *= u
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            stage_dtype = self.dtype
            if self.bf16_min_channels:
                stage_dtype = (
                    jnp.bfloat16 if ch >= self.bf16_min_channels else None
                )
                if stage_dtype is not None:
                    x = x.astype(stage_dtype)
            stride_f0 = (
                int(np.prod(self.upsample_rates[i + 1 :]))
                if i + 1 < n_up else 1
            )
            up_mod = ConvTranspose1dTorch(
                ch, k, u, (k - u) // 2, name=f"up_{i}", dtype=stage_dtype
            )
            if i + 1 < n_up:
                nc_mod = nn.Conv(
                    ch, (stride_f0 * 2,), strides=(stride_f0,),
                    padding=((stride_f0 // 2, stride_f0 // 2),),
                    name=f"noise_conv_{i}", dtype=stage_dtype,
                )
            else:
                nc_mod = nn.Conv(ch, (1,), name=f"noise_conv_{i}",
                                 dtype=stage_dtype)
            rbs = [
                ResBlock1(
                    ch, rk, tuple(rd), name=f"resblock_{i}_{j}",
                    dtype=stage_dtype,
                )
                for j, (rk, rd) in enumerate(
                    zip(self.resblock_kernel_sizes,
                        self.resblock_dilation_sizes)
                )
            ]
            if _mask is None and (
                self._use_fused(ch, stage_dtype)
                and self._stage_fusable(x.shape[-1], u, k, stage_dtype)
            ):
                x = self._fused_stage(
                    up_mod, nc_mod, rbs, x, har, i, ch, u, k, stride_f0
                )
                x = self._finish_stage(x, i, n_up, stage_dtype)
                continue
            x = _leaky(x)
            x = up_mod(x)
            if _mask is not None:
                x = x * _mask(cum).astype(x.dtype)
            if self._use_fused(ch, stage_dtype):
                # per-row valid sample counts ride into the kernel's
                # boundary mask (bucket-padded batches); None otherwise
                vsamp = None if _mask is None else vf * cum
                if self.fused_inject:
                    # f0-source injection folded into the trio kernel (the
                    # nc output and the add never round-trip HBM)
                    x = self._fused_trio(rbs, x, i, ch, nc_mod=nc_mod,
                                         har=har, stride_f0=stride_f0,
                                         valid=vsamp)
                else:
                    xs_src = nc_mod(har)
                    x = x + xs_src[:, : x.shape[1], :]
                    if _mask is not None:
                        x = x * _mask(cum).astype(x.dtype)
                    x = self._fused_trio(rbs, x, i, ch, valid=vsamp)
                if _mask is not None:
                    x = x * _mask(cum).astype(x.dtype)
            else:
                xs_src = nc_mod(har)
                x = x + xs_src[:, : x.shape[1], :]
                stage_mask = None
                if _mask is not None:
                    stage_mask = _mask(cum).astype(x.dtype)
                    x = x * stage_mask
                xs = None
                for r in rbs:
                    r_out = r(x, mask=stage_mask)
                    xs = r_out if xs is None else xs + r_out
                x = xs / n_kernels
            x = self._finish_stage(x, i, n_up, stage_dtype)
        x = _leaky(x, 0.01)  # final leaky_relu uses torch default slope (models.py:272)
        x = nn.Conv(1, (7,), padding=((3, 3),), name="conv_post",
                    dtype=self.dtype)(x)
        out = jnp.tanh(x.astype(jnp.float32))[..., 0]
        if _mask is not None:
            # zero the pad region outright (conv_post's bias makes it a
            # nonzero constant otherwise) so downstream batched resampling
            # sees exactly the zeros an exact-length output implies
            out = out * _mask(upp)[..., 0]
        return out

    def _use_fused(self, ch: int, stage_dtype) -> bool:
        if not self.fused_resblocks:
            return False
        # fp32 stages: C<=64 (the HBM-bound tail). bf16 stages: C<=128
        # (wider weights exceed VMEM); the kernel upgrades them to fp32
        # residual carries with bf16 MXU inputs.
        if stage_dtype is None:
            if ch > 64:
                return False
        elif stage_dtype == jnp.bfloat16:
            # bf16 stages with C>=128 stay on XLA: its bf16 convs fill the
            # MXU fine at these widths and beat the kernel's roll-im2col
            # relayouts (amortized A/B at batch 32: C=128 trio 36 ms XLA vs
            # 43 ms fused; C=256 single-chain kernels lost 93 vs 64 ms).
            # Narrow bf16 stages (full-bf16 mode) still win fused: XLA bf16
            # measured 48/95/87 ms at C=64/32/16 vs ~30 ms fused.
            if ch > 64:
                return False
        else:
            return False
        if ch % 8 != 0:  # sublane alignment of the (C, W) tiles
            return False
        if len(self.resblock_kernel_sizes) != 3:
            return False
        dils = [tuple(d) for d in self.resblock_dilation_sizes]
        if len(set(dils)) != 1:  # kernel assumes shared dilation schedule
            return False
        if self.fused_resblocks == "force":  # tests: interpret mode off-TPU
            return True
        return jax.default_backend() not in ("cpu", "gpu")

    def _finish_stage(self, x, i: int, n_up: int, stage_dtype) -> jnp.ndarray:
        if self.bf16_min_channels and stage_dtype is not None:
            next_ch = self.upsample_initial_channel // (2 ** (i + 2))
            if i + 1 >= n_up or next_ch < self.bf16_min_channels:
                x = x.astype(jnp.float32)  # hand off to the fp32 tail
        return x

    def _stage_fusable(self, c_in: int, u: int, k: int, stage_dtype) -> bool:
        if not self.fused_stage or stage_dtype is not None:
            return False
        # in-kernel transposed conv assumes the generator geometry k == 2u
        # (exact u-fold upsample) and the trio halo's phase alignment
        if k != 2 * u or c_in % 8 != 0:
            return False
        from ..ops.pallas_kernels import _RB_HALO

        return _RB_HALO % u == 0

    def _fused_stage(self, up_mod, nc_mod, rbs, x, har, i: int, ch: int,
                     u: int, k: int, stride_f0: int) -> jnp.ndarray:
        """Run leaky -> upsample -> source injection -> trio as one Pallas
        pass. Modules are invoked on dummies so the parameter tree (and
        checkpoint format) is identical to the unfused path."""
        from ..ops.pallas_kernels import fused_stage_pallas

        c_in = x.shape[-1]
        up_mod(jnp.zeros((1, 1, c_in), x.dtype))
        nc_mod(jnp.zeros((1, max(2 * stride_f0, 1), 1), har.dtype))
        dummy = jnp.zeros((1, 1, ch), x.dtype)
        for r in rbs:
            r(dummy)
        pv = self.variables["params"]
        n_dil = len(self.resblock_dilation_sizes[0])
        ws, bs = [], []
        for j in range(3):
            p = pv[f"resblock_{i}_{j}"]
            ws.append(jnp.stack([
                jnp.stack([p[f"conv1_{n}"]["kernel"],
                           p[f"conv2_{n}"]["kernel"]])
                for n in range(n_dil)
            ]))
            bs.append(jnp.stack([
                jnp.stack([p[f"conv1_{n}"]["bias"], p[f"conv2_{n}"]["bias"]])
                for n in range(n_dil)
            ]))
        ks = tuple(int(kk) for kk in self.resblock_kernel_sizes)
        dils = tuple(int(d) for d in self.resblock_dilation_sizes[0])
        interp = jax.default_backend() in ("cpu", "gpu")
        up_p = pv[f"up_{i}"]
        nc_p = pv[f"noise_conv_{i}"]
        return fused_stage_pallas(
            x, har, up_p["kernel"], up_p["bias"], nc_p["kernel"],
            nc_p["bias"], *ws, *bs,
            u, (k - u) // 2, stride_f0,
            kernel_sizes=ks, dilations=dils, tile=None,
            mxu_bf16=self.fused_mxu_bf16, interpret=interp,
        )

    def _fused_trio(self, rbs, x, i: int, ch: int, nc_mod=None, har=None,
                    stride_f0: int = 1, valid=None) -> jnp.ndarray:
        """Run the stage's resblock trio as one VMEM-resident Pallas pass,
        with the f0-source injection conv folded in when nc_mod is given.

        The flax modules are still invoked once on a dummy frame so the
        parameter tree (and checkpoint format) is identical to the unfused
        path; the real compute reads those params directly.

        valid (traced scalar or (B,) vector, sample counts at this stage's
        rate): per-row masking for bucket-padded batches — routes to the
        kernel's forward impl directly (inference-only, no VJP)."""
        from ..ops.pallas_kernels import (
            fused_resblocks_pallas, fused_resblocks_inject_pallas,
            _fused_resblocks_fwd_impl,
        )

        dummy = jnp.zeros((1, 1, ch), x.dtype)
        for r in rbs:
            r(dummy)
        if nc_mod is not None:
            nc_mod(jnp.zeros((1, max(2 * stride_f0, 1), 1), har.dtype))
        pv = self.variables["params"]
        n_dil = len(self.resblock_dilation_sizes[0])
        ws, bs = [], []
        for j in range(3):
            p = pv[f"resblock_{i}_{j}"]
            ws.append(jnp.stack([
                jnp.stack([p[f"conv1_{n}"]["kernel"],
                           p[f"conv2_{n}"]["kernel"]])
                for n in range(n_dil)
            ]))
            bs.append(jnp.stack([
                jnp.stack([p[f"conv1_{n}"]["bias"], p[f"conv2_{n}"]["bias"]])
                for n in range(n_dil)
            ]))
        ks = tuple(int(k) for k in self.resblock_kernel_sizes)
        dils = tuple(int(d) for d in self.resblock_dilation_sizes[0])
        interp = jax.default_backend() in ("cpu", "gpu")
        if nc_mod is not None:
            nc_p = pv[f"noise_conv_{i}"]
            if valid is not None:
                return _fused_resblocks_fwd_impl(
                    x, tuple(ws), tuple(bs), ks, dils, None,
                    self.fused_mxu_bf16, interp,
                    inject=(har, nc_p["kernel"], nc_p["bias"], stride_f0),
                    valid=valid,
                )
            return fused_resblocks_inject_pallas(
                x, har, nc_p["kernel"], nc_p["bias"], *ws, *bs,
                stride_f0, kernel_sizes=ks, dilations=dils, tile=None,
                mxu_bf16=self.fused_mxu_bf16, interpret=interp,
            )
        if valid is not None:
            return _fused_resblocks_fwd_impl(
                x, tuple(ws), tuple(bs), ks, dils, None,
                self.fused_mxu_bf16, interp, valid=valid,
            )
        return fused_resblocks_pallas(
            x, *ws, *bs,
            kernel_sizes=ks, dilations=dils, tile=None,
            mxu_bf16=self.fused_mxu_bf16, interpret=interp,
        )
