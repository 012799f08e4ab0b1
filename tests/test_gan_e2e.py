"""Enhancer GAN fine-tuning as a PRODUCT feature: config-driven train_gan
CLI over a preprocessed-layout dataset — alternating steps, checkpointing,
max-step resume, and an Enhancer-loadable export that actually enhances."""
import json
import os

import numpy as np
import pytest

from ddsp_svc_tpu.utils.config import DotDict
from ddsp_svc_tpu.data.wavio import write_wav

SR, HOP = 16000, 256

H = {
    "sampling_rate": SR,
    "num_mels": 16,
    "n_fft": 512,
    "win_size": 512,
    "hop_size": 64,
    "fmin": 40,
    "fmax": 8000,
    "upsample_rates": [4, 4, 2, 2],
    "upsample_kernel_sizes": [8, 8, 4, 4],
    "upsample_initial_channel": 32,
    "resblock_kernel_sizes": [3],
    "resblock_dilation_sizes": [[1, 3, 5]],
}


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ganws")
    for split, n in (("train", 2), ("val", 1)):
        for i in range(n):
            adir = root / split / "audio" / "1"
            fdir = root / split / "f0" / "1"
            adir.mkdir(parents=True, exist_ok=True)
            fdir.mkdir(parents=True, exist_ok=True)
            t = np.arange(2 * SR) / SR
            f0_hz = 200.0 + 20 * i
            audio = (0.4 * np.sin(2 * np.pi * f0_hz * t)).astype(np.float32)
            write_wav(str(adir / f"u{i}.wav"), audio, SR)
            n_frames = len(audio) // HOP + 1
            np.save(str(fdir / f"u{i}.npy"),
                    np.full(n_frames, f0_hz, dtype=np.float32))
    return root


def _config(root):
    return DotDict({
        "data": {
            "sampling_rate": SR, "block_size": HOP,
            "train_path": str(root / "train"),
            "valid_path": str(root / "val"),
        },
        "enhancer": {"type": "nsf-hifigan", "ckpt": None},
        "env": {"expdir": str(root / "exp")},
        "train": {
            "seed": 0,
            "gan": {
                "h": H, "lr": 1e-4, "batch_size": 2, "crop_frames": 16,
                "interval_log": 2, "interval_val": 4, "max_steps": 100,
                "expdir": str(root / "exp" / "gan"),
            },
        },
    })


def test_train_gan_cli_checkpoint_resume_and_export(workspace):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from ddsp_svc_tpu.train.gan_solver import train_gan
    from ddsp_svc_tpu.utils.config import save_config

    args = _config(workspace)
    state, expdir = train_gan(args, max_steps=4)
    assert int(state.step) == 4
    assert os.path.isfile(os.path.join(expdir, "gan_4.ckpt"))
    enh_dir = os.path.join(expdir, "enhancer")
    assert os.path.isfile(os.path.join(enh_dir, "model_4.ckpt"))
    assert os.path.isfile(os.path.join(enh_dir, "model_best.ckpt"))
    assert json.load(open(os.path.join(enh_dir, "config.json"))) == H

    # resume picks gan_4.ckpt and continues to 6
    state2, _ = train_gan(args, max_steps=6)
    assert int(state2.step) == 6
    assert os.path.isfile(os.path.join(expdir, "gan_6.ckpt"))

    # the exported checkpoint loads into the inference Enhancer and runs
    from ddsp_svc_tpu.infer.enhancer import Enhancer

    enh = Enhancer("nsf-hifigan", os.path.join(enh_dir, "model_best.ckpt"))
    audio = np.zeros((1, 8 * HOP), np.float32)
    f0 = np.full((1, 8, 1), 220.0, np.float32)
    out, sr = enh.enhance(audio, SR, f0, HOP)
    assert sr == SR
    assert np.isfinite(np.asarray(out)).all()

    # CLI entry parses and drives the same loop
    cfg_path = str(workspace / "gan_cfg.yaml")
    save_config(cfg_path, args.to_dict())
    import train_gan as cli

    state3, _ = cli.main(["-c", cfg_path, "--max-steps", "8"])
    assert int(state3.step) == 8


def test_train_gan_data_on_device(workspace, tmp_path):
    """GAN fine-tune with the device-resident clip pool
    (train.gan.data_on_device): runs, checkpoints, and the pooled crops
    equal the host sampler's crops for the same (clip, start)."""
    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.train.gan_solver import GanDataset, train_gan
    from ddsp_svc_tpu.ops.spectral import log_mel_spectrogram

    args = _config(workspace)
    args["train"]["gan"]["data_on_device"] = True
    args["train"]["gan"]["expdir"] = str(tmp_path / "gan_pool")
    state, expdir = train_gan(args, max_steps=3)
    assert int(state.step) == 3
    assert os.path.isfile(os.path.join(expdir, "gan_3.ckpt"))

    # pooled gather == host sample for a pinned (clip, k): rebuild the pool
    # layout the way train_gan does and compare one crop
    ds = GanDataset(str(workspace / "train"), H, SR, HOP)
    hop = H["hop_size"]
    crop = 16
    audio, f0 = ds.clips[1]
    k = 3
    want_audio = audio[k * hop: k * hop + crop * hop]
    want_f0 = f0[k: k + crop]
    # pool concatenation base for clip 1
    nf0 = len(ds.clips[0][1])
    pool_audio = np.concatenate([
        np.pad(a[: len(fz) * hop], (0, len(fz) * hop - min(len(a), len(fz) * hop)))
        for a, fz in ds.clips
    ])
    got_audio = pool_audio[(nf0 + k) * hop: (nf0 + k) * hop + crop * hop]
    np.testing.assert_array_equal(got_audio.astype(np.float32), want_audio)
    pool_f0 = np.concatenate([fz for _, fz in ds.clips])
    np.testing.assert_array_equal(pool_f0[nf0 + k: nf0 + k + crop], want_f0)
