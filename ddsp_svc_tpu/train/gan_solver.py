"""Config-driven enhancer GAN fine-tuning loop.

Makes the reference's dead discriminator code (models.py:288-439) a drivable
product feature: `python train_gan.py -c config.yaml` fine-tunes the
NSF-HiFiGAN enhancer on the preprocessed dataset (ground-truth audio + f0),
with alternating D/G steps (train/gan.py), mel-L1 validation, checkpointing
of G+D+optimizers with max-step resume, and export of an
`Enhancer`-loadable checkpoint (`<expdir>/enhancer/model_{step}.ckpt` +
sibling config.json).

Config block (extends the reference schema):

    train:
      gan:
        expdir: exp/gan            # default: env.expdir + '/gan'
        lr: 0.0002
        mel_weight: 45.0
        fm_weight: 2.0
        batch_size: 8
        crop_frames: 32            # mel frames per training crop
        interval_log: 10
        interval_val: 200          # also checkpoints
        max_steps: 10000
        h: {...}                   # optional inline generator config; by
                                   # default read from the config.json next
                                   # to enhancer.ckpt (models.py:24-39)
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import serialization

from ..data.wavio import load_audio
from ..nn.nsf_hifigan import Generator
from ..ops import log_mel_spectrogram
from .gan import GanTrainer, GanState


def _resolve_h(args) -> dict:
    gan_cfg = args.train.gan
    if gan_cfg and gan_cfg.h:
        h = gan_cfg.h
        return h.to_dict() if hasattr(h, "to_dict") else dict(h)
    ckpt = args.enhancer.ckpt
    if not ckpt:
        raise ValueError(
            " [x] train.gan.h or enhancer.ckpt (with sibling config.json) "
            "required for GAN fine-tuning"
        )
    config_file = os.path.join(os.path.dirname(ckpt), "config.json")
    with open(config_file) as f:
        return json.load(f)


def _build_generator(h: dict) -> Generator:
    return Generator(
        sampling_rate=h["sampling_rate"],
        num_mels=h["num_mels"],
        upsample_rates=tuple(h["upsample_rates"]),
        upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
        upsample_initial_channel=h["upsample_initial_channel"],
        resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in h["resblock_dilation_sizes"]
        ),
    )


class GanDataset:
    """Ground-truth (audio, f0) clips on the enhancer's frame grid.

    Reads the preprocessed layout (`audio/{spk}/*.wav` + `f0/{spk}/*.npy`
    at the SVC hop) and re-grids f0 to the enhancer hop — the same
    np.interp re-gridding the inference-time Enhancer applies
    (/root/reference/enhancer.py:57-62)."""

    def __init__(self, path: str, h: dict, data_sr: int, data_hop: int):
        self.h = h
        self.clips: List[Tuple[np.ndarray, np.ndarray]] = []
        hop, sr = int(h["hop_size"]), int(h["sampling_rate"])
        audio_dir = os.path.join(path, "audio")
        for root, _, files in os.walk(audio_dir):
            for name in sorted(files):
                if not name.endswith(".wav"):
                    continue
                wav_path = os.path.join(root, name)
                audio, _ = load_audio(wav_path, sr=sr, mono=True)
                rel = os.path.relpath(wav_path, audio_dir)
                f0_path = os.path.join(path, "f0", os.path.splitext(rel)[0] + ".npy")
                if not os.path.isfile(f0_path):
                    continue
                f0 = np.load(f0_path).astype(np.float32)
                n_frames = len(audio) // hop + 1
                # SVC-hop grid (data_sr/data_hop) -> enhancer-hop grid
                src_t = np.arange(len(f0)) * (data_hop / data_sr)
                dst_t = np.arange(n_frames) * (hop / sr)
                f0_grid = np.interp(dst_t, src_t, f0).astype(np.float32)
                self.clips.append((audio.astype(np.float32), f0_grid))
        if not self.clips:
            raise ValueError(f" [x] no (audio, f0) pairs under {path}")

    def sample_batch(self, rng: np.random.Generator, batch_size: int,
                     crop_frames: int) -> Dict[str, np.ndarray]:
        hop = int(self.h["hop_size"])
        t = crop_frames * hop
        audio_b, f0_b = [], []
        for _ in range(batch_size):
            audio, f0 = self.clips[rng.integers(len(self.clips))]
            max_start = max(0, len(audio) // hop - crop_frames - 1)
            k = int(rng.integers(max_start + 1))
            a = audio[k * hop: k * hop + t]
            if len(a) < t:
                a = np.pad(a, (0, t - len(a)))
            audio_b.append(a)
            f0_b.append(f0[k: k + crop_frames]
                        if len(f0) >= k + crop_frames
                        else np.pad(f0[k:], (0, crop_frames - len(f0[k:])),
                                    mode="edge"))
        return {
            "audio": np.stack(audio_b),
            "f0": np.stack(f0_b),
        }


def save_gan_checkpoint(path: str, state: GanState) -> None:
    payload = {
        "global_step": np.asarray(int(state.step), dtype=np.int64),
        "generator": serialization.to_state_dict(jax.device_get(state.g_params)),
        "discriminators": serialization.to_state_dict(jax.device_get(state.d_params)),
        "g_opt": serialization.to_state_dict(jax.device_get(state.g_opt)),
        "d_opt": serialization.to_state_dict(jax.device_get(state.d_opt)),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def restore_gan_checkpoint(path: str, template: GanState) -> GanState:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return template.replace(
        step=jnp.asarray(int(payload["global_step"]), jnp.int32),
        g_params=serialization.from_state_dict(template.g_params,
                                               payload["generator"]),
        d_params=serialization.from_state_dict(template.d_params,
                                               payload["discriminators"]),
        g_opt=serialization.from_state_dict(template.g_opt, payload["g_opt"]),
        d_opt=serialization.from_state_dict(template.d_opt, payload["d_opt"]),
    )


def latest_gan_checkpoint(expdir: str) -> Optional[str]:
    import re

    if not os.path.isdir(expdir):
        return None
    steps = [int(m.group(1)) for name in os.listdir(expdir)
             if (m := re.fullmatch(r"gan_(\d+)\.ckpt", name))]
    if not steps:
        return None
    return os.path.join(expdir, f"gan_{max(steps)}.ckpt")


def train_gan(args, max_steps: Optional[int] = None, mesh=None):
    """Run the fine-tuning loop; returns (state, expdir).

    mesh: optional jax.sharding.Mesh for data-parallel D+G steps; also
    built automatically from all local devices when the config sets
    `train.gan.data_parallel: true` (batch_size must divide the device
    count)."""
    gan_cfg = args.train.gan
    h = _resolve_h(args)
    if mesh is None and gan_cfg and gan_cfg.data_parallel:
        from ..parallel import make_mesh

        mesh = make_mesh()
    expdir = (gan_cfg and gan_cfg.expdir) or os.path.join(
        args.env.expdir or "exp", "gan")
    lr = float((gan_cfg and gan_cfg.lr) or 2e-4)
    mel_weight = float((gan_cfg and gan_cfg.mel_weight) or 45.0)
    fm_weight = float((gan_cfg and gan_cfg.fm_weight) or 2.0)
    batch_size = int((gan_cfg and gan_cfg.batch_size) or 8)
    crop_frames = int((gan_cfg and gan_cfg.crop_frames) or 32)
    interval_log = int((gan_cfg and gan_cfg.interval_log) or 10)
    interval_val = int((gan_cfg and gan_cfg.interval_val) or 200)
    if max_steps is None:
        max_steps = int((gan_cfg and gan_cfg.max_steps) or 10000)

    generator = _build_generator(h)
    trainer = GanTrainer(generator, h, lr=lr, mel_weight=mel_weight,
                         fm_weight=fm_weight, mesh=mesh)

    data_sr = int(args.data.sampling_rate)
    data_hop = int(args.data.block_size)
    train_set = GanDataset(args.data.train_path, h, data_sr, data_hop)
    valid_set = GanDataset(args.data.valid_path, h, data_sr, data_hop)

    rng_np = np.random.default_rng(int(args.train.seed or 0))
    example = train_set.sample_batch(rng_np, batch_size, crop_frames)
    state = trainer.create_state(
        jax.random.key(0), jnp.zeros(
            (batch_size, crop_frames, h["num_mels"]), jnp.float32),
        jnp.asarray(example["f0"]),
    )
    # warm-start the generator from the pretrained enhancer checkpoint
    if args.enhancer.ckpt and not (gan_cfg and gan_cfg.h):
        from ..infer.enhancer import NsfHifiGAN

        pre = NsfHifiGAN(args.enhancer.ckpt)
        state = state.replace(
            g_params=serialization.from_state_dict(
                state.g_params, serialization.to_state_dict(
                    pre.variables["params"])))

    resume = latest_gan_checkpoint(expdir)
    if resume:
        print(f" [*] restoring GAN checkpoint: {resume}")
        state = restore_gan_checkpoint(resume, state)

    mel_of = jax.jit(lambda a: jnp.swapaxes(log_mel_spectrogram(
        a, h["sampling_rate"], h["n_fft"], h["hop_size"], h["win_size"],
        h["num_mels"], h["fmin"], h["fmax"]), 1, 2))

    # device-resident data (train.gan.data_on_device / train.data_on_device):
    # stage every (audio, f0) clip in HBM once; the jitted gather slices the
    # crops AND computes the mel on device, so the per-step host->device
    # traffic is the (B,) start indices — same rationale as the main loop's
    # DevicePool (docs/KERNELS.md round-5 training profile)
    use_pool = bool(
        (gan_cfg and gan_cfg.data_on_device)
        or (args.train.data_on_device or False)
    )
    pool = clip_base = clip_max_start = None
    if use_pool:
        hop = int(h["hop_size"])
        t_crop = crop_frames * hop
        audio_parts, f0_parts, base, kmax = [], [], [], []
        fb = 0
        for audio, f0 in train_set.clips:
            nf = len(f0)
            a = np.zeros(nf * hop, np.float32)
            a[: min(len(audio), nf * hop)] = audio[: nf * hop]
            audio_parts.append(a.astype(np.float16))
            f0_parts.append(f0.astype(np.float32))
            base.append(fb)
            kmax.append(max(0, len(audio) // hop - crop_frames - 1))
            fb += nf
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            put = lambda x: jax.device_put(  # noqa: E731
                jnp.asarray(x), NamedSharding(mesh, P()))
        else:
            put = lambda x: jax.device_put(jnp.asarray(x))  # noqa: E731
        pool = {
            "audio": put(np.concatenate(audio_parts)),
            "f0": put(np.concatenate(f0_parts)),
        }
        clip_base = np.asarray(base, dtype=np.int64)
        clip_max_start = np.asarray(kmax, dtype=np.int64)
        print(f" [pool] {len(train_set.clips)} clips, "
              f"{sum(a.nbytes for a in audio_parts) / 1e6:.0f} MB audio "
              "staged in device memory")

        @jax.jit
        def gather_gan(arrays, starts):
            def one(s):
                return (
                    jax.lax.dynamic_slice(arrays["audio"], (s * hop,),
                                          (t_crop,)),
                    jax.lax.dynamic_slice(arrays["f0"], (s,), (crop_frames,)),
                )

            a, f0g = jax.vmap(one)(starts)
            a = a.astype(jnp.float32)
            mel = jnp.swapaxes(log_mel_spectrogram(
                a, h["sampling_rate"], h["n_fft"], h["hop_size"],
                h["win_size"], h["num_mels"], h["fmin"], h["fmax"]), 1, 2)
            return {"audio": a, "f0": f0g, "mel": mel}

        def pool_batch(rng):
            clips_i = rng.integers(len(train_set.clips), size=batch_size)
            ks = np.asarray([
                rng.integers(clip_max_start[c] + 1) for c in clips_i
            ])
            starts = (clip_base[clips_i] + ks).astype(np.int32)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                starts = jax.device_put(starts,
                                        NamedSharding(mesh, P("data")))
            return gather_gan(pool, starts)

    @jax.jit
    def val_mel_l1(g_params, mel, f0, audio):
        y = generator.apply({"params": g_params}, mel, f0,
                            jnp.zeros((mel.shape[0], 9)))
        m = jnp.swapaxes(log_mel_spectrogram(
            y, h["sampling_rate"], h["n_fft"], h["hop_size"], h["win_size"],
            h["num_mels"], h["fmin"], h["fmax"]), 1, 2)
        return jnp.mean(jnp.abs(m - mel[:, : m.shape[1]]))

    val_batch = valid_set.sample_batch(np.random.default_rng(7), batch_size,
                                       crop_frames)
    val_mel = mel_of(jnp.asarray(val_batch["audio"]))
    best_val = np.inf

    key = jax.random.key(int(args.train.seed or 0))
    t0 = time.time()
    start = int(state.step)
    logs: Dict = {}
    for step in range(start, max_steps):
        if use_pool:
            batch = pool_batch(rng_np)
        else:
            batch_np = train_set.sample_batch(rng_np, batch_size, crop_frames)
            batch = {
                "audio": jnp.asarray(batch_np["audio"]),
                "f0": jnp.asarray(batch_np["f0"]),
            }
            batch["mel"] = mel_of(batch["audio"])
        key, kd, kg = jax.random.split(key, 3)
        state, d_logs = trainer.step_d(state, batch, kd)
        state, g_logs = trainer.step_g(state, batch, kg)
        logs = {**d_logs, **g_logs}
        n = int(state.step)
        if n % interval_log == 0:
            sps = (n - start) / max(time.time() - t0, 1e-9)
            msg = " | ".join(f"{k}: {float(v):.4f}" for k, v in logs.items())
            print(f"gan step {n}/{max_steps} | {msg} | {sps:.2f} it/s")
        if n % interval_val == 0 or n >= max_steps:
            v = float(val_mel_l1(state.g_params, val_mel,
                                 jnp.asarray(val_batch["f0"]),
                                 jnp.asarray(val_batch["audio"])))
            print(f" --- <gan validation> --- mel-L1: {v:.4f}")
            save_gan_checkpoint(os.path.join(expdir, f"gan_{n}.ckpt"), state)
            # Enhancer-loadable export: params + sibling config.json
            enh_dir = os.path.join(expdir, "enhancer")
            os.makedirs(enh_dir, exist_ok=True)
            with open(os.path.join(enh_dir, "config.json"), "w") as f:
                json.dump(h, f, indent=2)
            blob = serialization.msgpack_serialize(
                {"params": serialization.to_state_dict(
                    jax.device_get(state.g_params))})
            out = os.path.join(enh_dir, f"model_{n}.ckpt")
            with open(out + ".tmp", "wb") as f:
                f.write(blob)
            os.replace(out + ".tmp", out)
            if v < best_val:
                best_val = v
                best = os.path.join(enh_dir, "model_best.ckpt")
                with open(best + ".tmp", "wb") as f:
                    f.write(blob)
                os.replace(best + ".tmp", best)
                print(" [V] best enhancer updated.")
    return state, expdir
