"""NSF-HiFiGAN enhancer front-end.

Capability parity with /root/reference/enhancer.py: adaptive-key pitch
adaptation (`adaptive_key='auto'` derives the key from max f0 vs 760 Hz;
adaptive sample rate rounded to 100 Hz), windowed-sinc resampling of the
DDSP output into the enhancer's rate, f0 re-gridding onto the enhancer frame
grid, the log-mel frontend (nvSTFT parity via ops.log_mel_spectrogram), the
Generator forward, resampling back, and silence-front re-padding.

Unlike the reference (which rebuilds its STFT object every call,
enhancer.py:97 — a quirk SURVEY §7 says not to copy), the mel frontend and
generator run inside one cached jit per input shape.
"""
from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..nn.nsf_hifigan import Generator
from ..ops import resample, log_mel_spectrogram


class NsfHifiGAN:
    """Generator + config, loadable from a reference torch checkpoint
    (sibling config.json, models.py:24-39) or a converted flax checkpoint."""

    def __init__(self, model_path: Optional[str], h: Optional[dict] = None,
                 variables=None, dtype=None, bf16_min_channels: int = 0,
                 generator_overrides: Optional[dict] = None,
                 mesh=None, mesh_axis: str = "data"):
        """dtype: compute dtype for the generator (params stay fp32).
        bf16_min_channels: run upsample stages in bf16 only while their
        channel count is >= this value (0 = off). Measured on v5e: staged
        bf16 (threshold 128) is +29% end-to-end while full-bf16 is slower
        (the narrow late stages are bandwidth-bound and pay cast overhead).
        generator_overrides: extra Generator fields (e.g. fused_resblocks)
        for dispatch-gate sweeps/benches.
        mesh: optional jax.sharding.Mesh — time-shard the mel+generator
        forward over `mesh_axis` (parallel/timeparallel.py), spreading one
        utterance's dominant-FLOPs component across chips."""
        if model_path is not None:
            config_file = os.path.join(os.path.dirname(model_path), "config.json")
            with open(config_file) as f:
                h = json.load(f)
        assert h is not None
        self.h = h
        self.model = Generator(
            sampling_rate=h["sampling_rate"],
            num_mels=h["num_mels"],
            upsample_rates=tuple(h["upsample_rates"]),
            upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
            upsample_initial_channel=h["upsample_initial_channel"],
            resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in h["resblock_dilation_sizes"]
            ),
            dtype=dtype,
            bf16_min_channels=bf16_min_channels,
            **(generator_overrides or {}),
        )
        if variables is not None:
            self.variables = variables
        elif model_path is not None and model_path.endswith((".ckpt", ".msgpack")):
            # flax checkpoint (e.g. written by the GAN fine-tuning loop)
            from flax import serialization

            with open(model_path, "rb") as f:
                self.variables = jax.tree.map(
                    jnp.asarray, serialization.msgpack_restore(f.read())
                )
        elif model_path is not None:
            self.variables = self._load_torch(model_path)
        else:  # random init (tests / benches without pretrained assets)
            self.variables = jax.jit(
                lambda k: self.model.init(
                    k,
                    jnp.zeros((1, 16, h["num_mels"])),
                    jnp.zeros((1, 16)),
                    jnp.zeros((1, 9)),
                )
            )(jax.random.key(0))
        if mesh is not None:
            from ..parallel.timeparallel import make_time_parallel_enhancer

            tp = make_time_parallel_enhancer(self, mesh, axis=mesh_axis)
            self._forward = lambda variables, audio, f0, ri: tp(audio, f0, ri)
        else:
            self._forward = jax.jit(self._forward_impl)
        self._forward_batch = jax.jit(self._forward_batch_impl)

    def _load_torch(self, path: str):
        import torch
        from ..utils.convert import convert_nsf_hifigan_state_dict

        cp = torch.load(path, map_location="cpu", weights_only=True)
        sd = cp["generator"] if "generator" in cp else cp
        return jax.tree.map(
            jnp.asarray, convert_nsf_hifigan_state_dict(sd, self.h)
        )

    @property
    def sample_rate(self) -> int:
        return int(self.h["sampling_rate"])

    @property
    def hop_size(self) -> int:
        return int(self.h["hop_size"])

    def _forward_impl(self, variables, audio, f0_frames, rand_ini):
        mel = log_mel_spectrogram(
            audio,
            self.h["sampling_rate"],
            self.h["n_fft"],
            self.h["hop_size"],
            self.h["win_size"],
            self.h["num_mels"],
            self.h["fmin"],
            self.h["fmax"],
            # staged-bf16 inference also takes the mel transform through the
            # bf16 MXU DFT (same ~2^-9 magnitude-error class as the bf16
            # generator stages; 22 -> ~5 ms at the batch-32 headline)
            mxu_bf16=bool(self.model.bf16_min_channels)
            or self.model.dtype == jnp.bfloat16,
        )  # (B, M, F)
        mel = jnp.swapaxes(mel, 1, 2)
        f0_frames = f0_frames[:, : mel.shape[1]]
        return self.model.apply(variables, mel, f0_frames, rand_ini)

    def _forward_batch_impl(self, variables, audio_prepadded, f0_frames,
                            rand_ini, valid_frames):
        """Mixed-length batch forward: `audio_prepadded` already carries
        each item's own reflect padding (infer/batch.py builds it), so the
        mel frames below each item's valid count match an exact-length
        forward; the generator masks everything past `valid_frames` (per
        item). Outputs beyond item i's valid_frames*upp samples are masked
        garbage the caller crops."""
        mel = log_mel_spectrogram(
            audio_prepadded,
            self.h["sampling_rate"],
            self.h["n_fft"],
            self.h["hop_size"],
            self.h["win_size"],
            self.h["num_mels"],
            self.h["fmin"],
            self.h["fmax"],
            mxu_bf16=bool(self.model.bf16_min_channels)
            or self.model.dtype == jnp.bfloat16,
            pre_padded=True,
        )
        mel = jnp.swapaxes(mel, 1, 2)
        f0_frames = f0_frames[:, : mel.shape[1]]
        return self.model.apply(variables, mel, f0_frames, rand_ini,
                                valid_frames=valid_frames)

    def __call__(self, audio: jnp.ndarray, f0_frames: jnp.ndarray,
                 rng: Optional[jax.Array] = None,
                 rand_ini: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, int]:
        """rand_ini :: optional (B, 9) explicit SineGen initial rotations
        (column 0 must be 0) — parity harnesses inject the exact values the
        reference drew (models.py:150-152); otherwise drawn from rng (zeros
        when rng is None)."""
        b = audio.shape[0]
        if rand_ini is not None:
            rand_ini = jnp.asarray(rand_ini, jnp.float32)
        elif rng is None:
            rand_ini = jnp.zeros((b, 9))
        else:
            rand_ini = jax.random.uniform(rng, (b, 9)).at[:, 0].set(0.0)
        return self._forward(self.variables, audio, f0_frames, rand_ini), self.sample_rate


class Enhancer:
    def __init__(self, enhancer_type: str, enhancer_ckpt: Optional[str],
                 h: Optional[dict] = None, variables=None,
                 bf16_min_channels: int = 0, mesh=None,
                 mesh_axis: str = "data"):
        if enhancer_type != "nsf-hifigan":
            raise ValueError(f" [x] Unknown enhancer: {enhancer_type}")
        self.enhancer = NsfHifiGAN(enhancer_ckpt, h=h, variables=variables,
                                   bf16_min_channels=bf16_min_channels,
                                   mesh=mesh, mesh_axis=mesh_axis)
        self.enhancer_sample_rate = self.enhancer.sample_rate
        self.enhancer_hop_size = self.enhancer.hop_size

    def enhance(
        self,
        audio: np.ndarray,          # (1, T)
        sample_rate: int,
        f0: np.ndarray,             # (1, n_frames, 1)
        hop_size: int,
        adaptive_key=0,
        silence_front: float = 0,
        rng: Optional[jax.Array] = None,
        rand_ini: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, int]:
        start_frame = int(silence_front * sample_rate / hop_size)
        real_silence_front = start_frame * hop_size / sample_rate
        audio = audio[:, int(np.round(real_silence_front * sample_rate)):]
        f0 = f0[:, start_frame:, :]

        if adaptive_key == "auto":
            adaptive_key = 12.0 * np.log2(float(np.max(f0)) / 760.0)
            adaptive_key = max(0, np.ceil(adaptive_key))
        adaptive_key = float(adaptive_key)
        adaptive_factor = 2.0 ** (-adaptive_key / 12.0)
        adaptive_sample_rate = 100 * int(
            np.round(self.enhancer_sample_rate / adaptive_factor / 100)
        )
        real_factor = self.enhancer_sample_rate / adaptive_sample_rate

        if sample_rate != adaptive_sample_rate:
            audio_res = np.asarray(
                resample(jnp.asarray(audio), sample_rate, adaptive_sample_rate)
            )
        else:
            audio_res = np.asarray(audio)

        n_frames = int(audio_res.shape[-1] // self.enhancer_hop_size + 1)
        f0_np = np.asarray(f0)[0, :, 0] * real_factor
        time_org = (hop_size / sample_rate) * np.arange(len(f0_np)) / real_factor
        time_frame = (
            self.enhancer_hop_size / self.enhancer_sample_rate
        ) * np.arange(n_frames)
        f0_res = np.interp(time_frame, time_org, f0_np, left=f0_np[0], right=f0_np[-1])
        f0_res = f0_res[None, :].astype(np.float32)

        enhanced, enhancer_sr = self.enhancer(
            jnp.asarray(audio_res), jnp.asarray(f0_res), rng=rng,
            rand_ini=rand_ini,
        )
        enhanced = np.asarray(enhanced)

        if adaptive_sample_rate != enhancer_sr:
            enhanced = np.asarray(
                resample(jnp.asarray(enhanced), adaptive_sample_rate, enhancer_sr)
            )
        if start_frame > 0:
            pad = int(np.round(enhancer_sr * real_silence_front))
            enhanced = np.pad(enhanced, ((0, 0), (pad, 0)))
        return enhanced, enhancer_sr

    def enhance_batch(
        self,
        audios,                      # list of (Ti,) / (1, Ti) arrays
        sample_rate: int,
        f0s,                         # list of (Fi, 1) / (1, Fi, 1) arrays
        hop_size: int,
        adaptive_key: float = 0,
        rand_ini: Optional[np.ndarray] = None,   # (B, 9) or None
        pad_to: int = 0,
    ) -> Tuple[list, int]:
        """Batched `enhance` for mixed-length segments at ONE resolved
        adaptive key (the batched offline driver resolves 'auto' per
        segment and groups segments by key — infer/batch.py). Exactness:
        the resampler zero-pads (as each exact-length call does), the mel
        sees each item's own host-built reflect padding, and the generator
        masks per-item valid frames — so each returned segment equals its
        own single-call `enhance` output. Returns ([(1, T_out_i)], sr).

        pad_to: pad the batch time axis to at least this many samples —
        the batched driver passes the synth bucket size so every chunk of
        one bucket group reuses a single compiled program."""
        import math

        assert adaptive_key != "auto", "resolve 'auto' per item before batching"
        h = self.enhancer.h
        adaptive_key = float(adaptive_key)
        adaptive_factor = 2.0 ** (-adaptive_key / 12.0)
        adaptive_sample_rate = 100 * int(
            np.round(self.enhancer_sample_rate / adaptive_factor / 100)
        )
        real_factor = self.enhancer_sample_rate / adaptive_sample_rate

        b = len(audios)
        flat = [np.asarray(a, np.float32).reshape(-1) for a in audios]
        lens = [len(a) for a in flat]
        t_max = max(max(lens), int(pad_to))
        batch = np.zeros((b, t_max), np.float32)
        for i, a in enumerate(flat):
            batch[i, : lens[i]] = a

        if sample_rate != adaptive_sample_rate:
            res = np.asarray(resample(
                jnp.asarray(batch), sample_rate, adaptive_sample_rate
            ))
            res_lens = [
                int(math.ceil(adaptive_sample_rate * L / sample_rate))
                for L in lens
            ]
        else:
            res, res_lens = batch, lens

        # per-item f0 regrid onto the enhancer frame grid (enhance() above)
        ehop, esr = self.enhancer_hop_size, self.enhancer_sample_rate
        win, n_fft = int(h["win_size"]), int(h["n_fft"])
        pad_l = (win - ehop) // 2
        pad_r = max((win - ehop + 1) // 2, ehop)
        n_mel = [
            (L + pad_l + pad_r - n_fft) // ehop + 1 for L in res_lens
        ]
        # f0 grid must span the full (pad_to-widened) mel frame count
        f_max = (res.shape[-1] + pad_l + pad_r - n_fft) // ehop + 1
        f0_res = np.zeros((b, f_max), np.float32)
        for i, f0 in enumerate(f0s):
            f0_np = np.asarray(f0, np.float32).reshape(-1) * real_factor
            time_org = (hop_size / sample_rate) * np.arange(len(f0_np)) / real_factor
            n_i = int(res[i].shape[-1] // ehop + 1)
            time_frame = (ehop / esr) * np.arange(max(n_i, n_mel[i]))
            vals = np.interp(time_frame, time_org, f0_np,
                             left=f0_np[0], right=f0_np[-1])
            f0_res[i, : n_mel[i]] = vals[: n_mel[i]]
            f0_res[i, n_mel[i]:] = vals[n_mel[i] - 1]

        # host-built per-item reflect padding for the mel frontend
        buf = np.zeros((b, pad_l + res.shape[-1] + pad_r), np.float32)
        for i in range(b):
            seg = res[i, : res_lens[i]]
            padded = np.pad(seg, (pad_l, pad_r), mode="reflect")
            buf[i, : len(padded)] = padded

        if rand_ini is None:
            rand_ini = np.zeros((b, 9), np.float32)
        out = np.asarray(self.enhancer._forward_batch(
            self.enhancer.variables, jnp.asarray(buf),
            jnp.asarray(f0_res), jnp.asarray(rand_ini, jnp.float32),
            jnp.asarray(n_mel, jnp.int32),
        ))
        upp = out.shape[-1] // ((buf.shape[-1] - n_fft) // ehop + 1)
        enhancer_sr = self.enhancer_sample_rate

        results = []
        if adaptive_sample_rate != enhancer_sr:
            out_res = np.asarray(resample(
                jnp.asarray(out), adaptive_sample_rate, enhancer_sr
            ))
            for i in range(b):
                valid = n_mel[i] * upp
                t_out = int(math.ceil(enhancer_sr * valid / adaptive_sample_rate))
                results.append(out_res[i: i + 1, : t_out])
        else:
            for i in range(b):
                results.append(out[i: i + 1, : n_mel[i] * upp])
        return results, enhancer_sr
