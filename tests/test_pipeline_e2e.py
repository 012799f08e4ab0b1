"""Full-pipeline integration test: raw wavs -> preprocess (real extractors,
random-init HuBERT) -> train a few steps via the solver -> checkpoint ->
offline inference CLI -> output wav."""
import os

import numpy as np
import pytest
import jax

from ddsp_svc_tpu.utils.config import DotDict, save_config
from ddsp_svc_tpu.data.wavio import write_wav, read_wav
from ddsp_svc_tpu.data.features import F0Extractor, VolumeExtractor, UnitsEncoder
from ddsp_svc_tpu.data.preprocess import preprocess
from ddsp_svc_tpu.data.dataset import get_data_loaders
from ddsp_svc_tpu.models import build_model, RSSLoss
from ddsp_svc_tpu.train import create_optimizer, create_train_state, solver
from ddsp_svc_tpu.infer import run_inference

SR = 16000
HOP = 256


def _sing(f0_hz, dur, sr=SR):
    t = np.arange(int(dur * sr)) / sr
    sig = 0.4 * np.sin(2 * np.pi * f0_hz * np.cumsum(np.ones_like(t)) / sr)
    sig += 0.1 * np.sin(2 * np.pi * 2 * f0_hz * t)
    return sig.astype(np.float32)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ws")
    for split_name, n in (("train", 4), ("val", 1)):
        for i in range(n):
            spk = 1 + (i % 2)
            d = root / split_name / "audio" / str(spk)
            d.mkdir(parents=True, exist_ok=True)
            write_wav(str(d / f"u{i}.wav"), _sing(180 + 40 * spk, 2.6), SR)

    enc = UnitsEncoder("hubertsoft", None)  # random-init HuBERT
    f0x = F0Extractor("dio", SR, HOP, 65, 800)
    vx = VolumeExtractor(HOP)
    preprocess(str(root / "train"), f0x, vx, enc, SR, HOP, gen_stats=True)
    preprocess(str(root / "val"), f0x, vx, enc, SR, HOP)
    return root


def _config(root):
    return DotDict(
        {
            "data": {
                "f0_extractor": "dio",
                "f0_min": 65,
                "f0_max": 800,
                "sampling_rate": SR,
                "block_size": HOP,
                "duration": 1.0,
                "encoder": "hubertsoft",
                "encoder_sample_rate": 16000,
                "encoder_hop_size": 320,
                "encoder_out_channels": 256,
                "encoder_ckpt": None,
                "n_aunit": 0,
                "use_vuv": False,
                "train_path": str(root / "train"),
                "valid_path": str(root / "val"),
            },
            "model": {"type": "CombSubFast", "n_spk": 2, "c": False},
            "enhancer": {"type": "nsf-hifigan", "ckpt": None},
            "loss": {"fft_min": 128, "fft_max": 512, "n_scale": 2},
            "env": {"expdir": str(root / "exp")},
            "train": {
                "batch_size": 2,
                "cache_all_data": True,
                "cache_fp16": False,
                "epochs": 10,
                "interval_log": 2,
                "interval_val": 4,
                "lr": 0.0005,
                "weight_decay": 0,
                "seed": 0,
            },
        }
    )


def test_preprocess_outputs(workspace):
    train = workspace / "train"
    units = list((train / "units").rglob("*.0.npy"))
    f0s = list((train / "f0").rglob("*.npy"))
    vols = list((train / "volume").rglob("*.npy"))
    assert len(units) == 4 and len(f0s) == 4 and len(vols) == 4
    stats = np.load(train / "f0_stats.npy", allow_pickle=True).item()
    assert set(stats.keys()) == {"1", "2"}
    u = np.load(units[0])
    f = np.load(f0s[0])
    v = np.load(vols[0])
    assert u.shape[0] == f.shape[0] == v.shape[0]
    assert u.shape[1] == 256
    assert (f > 0).all()  # uv-interpolated


def test_train_and_infer(workspace):
    args = _config(workspace)
    model = build_model(args)
    optimizer = create_optimizer(args.train.lr, args.train.weight_decay)
    loader_train, dataset_valid = get_data_loaders(args)
    example = next(iter(loader_train.epoch(0)))
    batch = {k: example[k] for k in ("audio", "f0", "volume", "units", "spk_id")}
    state = create_train_state(model, optimizer, batch, jax.random.key(0))
    rss = RSSLoss(args.loss.fft_min, args.loss.fft_max, args.loss.n_scale, n_buckets=4)

    state, saver = solver.train(
        args, 0, model, state, optimizer, rss, loader_train, dataset_valid,
        max_steps=4,
    )
    ckpt = os.path.join(args.env.expdir, "model_4.ckpt")
    assert os.path.isfile(ckpt)
    assert os.path.isfile(os.path.join(args.env.expdir, "config.yaml"))
    # validation audio (incl. VC triplet) written
    audio_files = os.listdir(os.path.join(args.env.expdir, "audio"))
    assert any("vc_" in f for f in audio_files)

    # offline inference through the CLI pipeline (no enhancer ckpt available)
    src = str(workspace / "val" / "audio" / "1" / "u0.wav")
    out = str(workspace / "out.wav")
    run_inference(
        model_path=ckpt, input_path=src, output_path=out,
        spk_id=2, key=2, enhance=False, pitch_extractor="dio",
        f0_min=65, f0_max=800, sampling_rate=SR,
        cache_dir=str(workspace / "cache"),
    )
    audio, sr = read_wav(out)
    assert sr == SR
    assert audio.shape[-1] > SR  # non-trivial output
    assert np.isfinite(audio).all()

    # spk-mix inference path
    out2 = str(workspace / "out_mix.wav")
    run_inference(
        model_path=ckpt, input_path=src, output_path=out2,
        spk_mix_dict={1: 0.5, 2: 0.5}, enhance=False, pitch_extractor="dio",
        f0_min=65, f0_max=800, sampling_rate=SR,
        cache_dir=str(workspace / "cache"),
    )
    audio2, _ = read_wav(out2)
    assert np.isfinite(audio2).all()


def test_preprocess_moves_all_unvoiced_to_skip(tmp_path):
    """A clip with NO voiced frames is quarantined in skip/ (reference
    preprocess.py:96-102 moves a file only when f0==0 everywhere),
    exercised with the real DIO extractor on digital silence; a sung clip
    in the same dataset must survive with its features written."""
    root = tmp_path / "ds"
    d = root / "audio" / "1"
    d.mkdir(parents=True)
    write_wav(str(d / "sung.wav"), _sing(220.0, 2.0), SR)
    write_wav(str(d / "silent.wav"), np.zeros(2 * SR, np.float32), SR)
    f0x = F0Extractor("dio", SR, HOP, 65, 800)
    vx = VolumeExtractor(HOP)
    preprocess(str(root), f0x, vx, None, SR, HOP)
    assert (root / "skip" / "1" / "silent.wav").exists()
    assert not (root / "audio" / "1" / "silent.wav").exists()
    assert (root / "audio" / "1" / "sung.wav").exists()
    assert (root / "f0" / "1" / "sung.npy").exists()
    f0 = np.load(root / "f0" / "1" / "sung.npy")
    assert (f0 > 0).all()  # uv_interp'd on save (preprocess.py contract)


def test_noise_voicing_per_family():
    """Pure breath noise: Harvest's harmonic-consistency scoring must mark
    it fully unvoiced; DIO (the permissive family, like WORLD's) may voice
    a small fraction via narrowband channel noise but must stay bounded."""
    from ddsp_svc_tpu.data import world_f0

    rng = np.random.default_rng(0)
    noise = (0.05 * rng.standard_normal(2 * SR)).astype(np.float32)
    fh = world_f0.harvest(noise, SR, HOP, 65, 800)
    assert (fh == 0).all()
    fd = world_f0.dio(noise, SR, HOP, 65, 800)
    assert (fd > 0).mean() < 0.15
