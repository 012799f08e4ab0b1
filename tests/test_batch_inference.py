"""Batched offline conversion (infer/batch.py + per-item valid_frames).

The batched path packs mixed-length segments from many files into device
batches; every result must equal the single-file path's output for the
same randomness. Three levels:
  - model level: per-item (B,) valid_frames vector == per-item
    exact-length forwards (synth and generator);
  - enhancer level: Enhancer.enhance_batch == per-item enhance;
  - end-to-end: run_inference_batch == run_inference per file, identical
    injected noise/rotations.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ddsp_svc_tpu.data.wavio import write_wav, read_wav

SR = 16000
HOP = 256


def test_synth_per_item_valid_vector():
    from ddsp_svc_tpu.models import CombSubFast

    model = CombSubFast(sampling_rate=SR, block_size=HOP, n_unit=32, n_spk=2)
    rng = np.random.default_rng(0)
    b, f = 3, 64
    lengths = [64, 41, 23]
    units = rng.standard_normal((b, f, 32)).astype(np.float32)
    f0 = (150 + 100 * rng.random((b, f, 1))).astype(np.float32)
    for i, n in enumerate(lengths):
        f0[i, n:] = f0[i, n - 1]  # per-item edge padding (as the driver)
    vol = rng.random((b, f)).astype(np.float32)
    spk = np.ones((b, 1), dtype=np.int64)
    noise = (rng.random((b, f * HOP)) * 2 - 1).astype(np.float32)
    v = model.init(
        {"params": jax.random.key(0)}, jnp.asarray(units), jnp.asarray(f0),
        jnp.asarray(vol), jnp.asarray(spk), noise=jnp.asarray(noise),
    )
    out_b = np.asarray(model.apply(
        v, jnp.asarray(units), jnp.asarray(f0), jnp.asarray(vol),
        jnp.asarray(spk), infer=True, noise=jnp.asarray(noise),
        valid_frames=jnp.asarray(lengths, jnp.int32),
    )[0])
    for i, n in enumerate(lengths):
        oi = np.asarray(model.apply(
            v, jnp.asarray(units[i:i+1, :n]), jnp.asarray(f0[i:i+1, :n]),
            jnp.asarray(vol[i:i+1, :n]), jnp.asarray(spk[i:i+1]),
            infer=True, noise=jnp.asarray(noise[i:i+1, :n*HOP]),
        )[0])[0]
        err = np.abs(out_b[i, :n*HOP] - oi).max() / (np.abs(oi).max() + 1e-9)
        assert err < 5e-5, (i, n, err)


GEN_H = dict(
    sampling_rate=SR, num_mels=16,
    upsample_rates=(4, 4, 2, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4, 4),
    upsample_initial_channel=64, resblock_kernel_sizes=(3, 7, 11),
    resblock_dilation_sizes=((1, 3, 5),) * 3,
)


def test_generator_per_item_valid_fused_trio():
    """Masked batches keep the fused Pallas trio: its per-conv boundary
    mask tightens to per-row SMEM lengths; valid outputs must match the
    plain per-item exact-length forward (both injection modes)."""
    from ddsp_svc_tpu.nn.nsf_hifigan import Generator

    rng = np.random.default_rng(2)
    b, f, upp = 3, 24, 128
    lengths = [24, 17, 9]
    mel = rng.standard_normal((b, f, 16)).astype(np.float32)
    f0 = (150.0 + 100.0 * rng.random((b, f))).astype(np.float32)
    ri = rng.uniform(0, 1, (b, 9)).astype(np.float32)
    ri[:, 0] = 0
    plain = Generator(fused_resblocks=False, **GEN_H)
    v = plain.init(jax.random.key(0), jnp.asarray(mel), jnp.asarray(f0),
                   jnp.asarray(ri))
    for inject in (True, False):
        fused = Generator(fused_resblocks="force", fused_mxu_bf16=False,
                          fused_inject=inject, **GEN_H)
        out_b = np.asarray(fused.apply(
            v, jnp.asarray(mel), jnp.asarray(f0), jnp.asarray(ri),
            valid_frames=jnp.asarray(lengths, jnp.int32),
        ))
        for i, n in enumerate(lengths):
            oi = np.asarray(plain.apply(
                v, jnp.asarray(mel[i:i+1, :n]), jnp.asarray(f0[i:i+1, :n]),
                jnp.asarray(ri[i:i+1]),
            ))[0]
            err = np.abs(out_b[i, :n*upp] - oi).max() / (np.abs(oi).max() + 1e-9)
            assert err < 1e-4, (inject, i, n, err)
            if n < f:
                assert np.abs(out_b[i, n*upp:]).max() == 0.0


@pytest.mark.parametrize("bf16_min", [0, 16])
def test_generator_per_item_valid_vector(bf16_min):
    from ddsp_svc_tpu.nn.nsf_hifigan import Generator

    model = Generator(fused_resblocks=False, bf16_min_channels=bf16_min,
                      **GEN_H)
    rng = np.random.default_rng(1)
    b, f, upp = 3, 24, 128
    lengths = [24, 17, 9]
    mel = rng.standard_normal((b, f, 16)).astype(np.float32)
    f0 = (150.0 + 100.0 * rng.random((b, f))).astype(np.float32)
    ri = rng.uniform(0, 1, (b, 9)).astype(np.float32)
    ri[:, 0] = 0
    v = model.init(jax.random.key(0), jnp.asarray(mel), jnp.asarray(f0),
                   jnp.asarray(ri))
    out_b = np.asarray(model.apply(
        v, jnp.asarray(mel), jnp.asarray(f0), jnp.asarray(ri),
        valid_frames=jnp.asarray(lengths, jnp.int32),
    ))
    for i, n in enumerate(lengths):
        oi = np.asarray(model.apply(
            v, jnp.asarray(mel[i:i+1, :n]), jnp.asarray(f0[i:i+1, :n]),
            jnp.asarray(ri[i:i+1]),
        ))[0]
        err = np.abs(out_b[i, :n*upp] - oi).max() / (np.abs(oi).max() + 1e-9)
        assert err < 1e-5, (bf16_min, i, n, err)
        # pad region is hard zero (batched resampling depends on it)
        if n < f:
            assert np.abs(out_b[i, n*upp:]).max() == 0.0


ENH_H = {
    "sampling_rate": SR, "num_mels": 16, "n_fft": 512, "win_size": 512,
    "hop_size": 128, "fmin": 40, "fmax": 8000,
    "upsample_rates": [4, 4, 2, 2, 2], "upsample_kernel_sizes": [8, 8, 4, 4, 4],
    "upsample_initial_channel": 64, "resblock": "1",
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5]] * 3,
}


@pytest.mark.parametrize("eak", [0, 3])
def test_enhance_batch_matches_single(eak):
    from ddsp_svc_tpu.infer.enhancer import Enhancer

    enh = Enhancer("nsf-hifigan", None, h=ENH_H)
    rng = np.random.default_rng(3)
    hop = 128
    lengths = [16000, 12160, 7040]
    audios, f0s, ris = [], [], []
    for i, t in enumerate(lengths):
        audios.append((rng.standard_normal((1, t)) * 0.1).astype(np.float32))
        nf = t // hop + 1
        f0s.append(np.full((1, nf, 1), 180.0 + 40 * i, np.float32))
        ri = rng.uniform(0, 1, (1, 9)).astype(np.float32)
        ri[:, 0] = 0
        ris.append(ri)
    outs_b, sr_b = enh.enhance_batch(audios, SR, f0s, hop, adaptive_key=eak,
                                     rand_ini=np.concatenate(ris, 0))
    for i in range(len(lengths)):
        ref, sr_r = enh.enhance(audios[i], SR, f0s[i], hop, adaptive_key=eak,
                                rand_ini=ris[i])
        assert sr_b == sr_r and outs_b[i].shape == ref.shape
        err = np.abs(outs_b[i] - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 1e-5, (eak, i, err)


@pytest.fixture(scope="module")
def batch_ws(tmp_path_factory):
    """Tiny trained checkpoint + two multi-segment inputs."""
    from ddsp_svc_tpu.models import CombSubFast
    from ddsp_svc_tpu.train import create_optimizer, create_train_state
    from ddsp_svc_tpu.train.saver import Saver
    from ddsp_svc_tpu.utils.config import DotDict

    root = tmp_path_factory.mktemp("batchws")
    # fabricated enhancer checkpoint (random weights + config.json) so the
    # -e true path is exercised end to end
    import json as _json
    from flax import serialization
    from ddsp_svc_tpu.infer.enhancer import NsfHifiGAN

    enh_dir = root / "enh"
    enh_dir.mkdir()
    nsf = NsfHifiGAN(None, h=ENH_H)
    with open(enh_dir / "config.json", "w") as f:
        _json.dump(ENH_H, f)
    with open(enh_dir / "model.ckpt", "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree.map(np.asarray, nsf.variables)
        ))
    args = DotDict({
        "data": {
            "f0_extractor": "dio", "f0_min": 65, "f0_max": 800,
            "sampling_rate": SR, "block_size": HOP, "duration": 1.0,
            "encoder": "hubertsoft", "encoder_sample_rate": 16000,
            "encoder_hop_size": 320, "encoder_out_channels": 256,
            "encoder_ckpt": None, "train_path": "", "valid_path": "",
        },
        "model": {"type": "CombSubFast", "n_spk": 2, "c": False},
        "enhancer": {"type": "nsf-hifigan",
                     "ckpt": str(enh_dir / "model.ckpt")},
        "loss": {"fft_min": 128, "fft_max": 512, "n_scale": 2},
        "env": {"expdir": str(root / "exp")},
        "train": {"batch_size": 2, "lr": 5e-4, "weight_decay": 0},
    })
    model = CombSubFast(sampling_rate=SR, block_size=HOP, n_unit=256, n_spk=2)
    rngk = np.random.default_rng(0)
    batch = {
        "units": rngk.standard_normal((1, 16, 256)).astype(np.float32),
        "f0": (200 * rngk.random((1, 16, 1))).astype(np.float32),
        "volume": rngk.random((1, 16)).astype(np.float32),
        "spk_id": np.ones((1, 1), dtype=np.int64),
    }
    opt = create_optimizer(5e-4)
    state = create_train_state(model, opt, batch, jax.random.key(0))
    saver = Saver(args)
    saver.save_model(
        {"params": state.params, "constants": state.constants}, postfix="2"
    )
    ckpt = os.path.join(args.env.expdir, "model_2.ckpt")
    assert os.path.isfile(ckpt)

    t = np.arange(int(SR * 1.8)) / SR
    wavs = []
    for i in range(2):
        f = 170.0 + 60 * i
        y = 0.35 * np.sin(2 * np.pi * f * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 2.0 * t))
        y[int(0.8 * SR): int(1.15 * SR)] = 0.0  # silence gap -> 2 segments
        p = str(root / f"in{i}.wav")
        write_wav(p, y.astype(np.float32), SR)
        wavs.append(p)
    return root, ckpt, wavs


def test_run_inference_batch_matches_single(batch_ws):
    from ddsp_svc_tpu.infer import run_inference
    from ddsp_svc_tpu.infer.batch import run_inference_batch

    root, ckpt, wavs = batch_ws

    def noise(file_idx, seg_idx, shape):
        return (np.random.default_rng((7, file_idx, seg_idx))
                .random(shape, np.float32) * 2 - 1)

    def enh_rand(file_idx, seg_idx):
        r = np.random.default_rng((11, file_idx, seg_idx)).random(
            (1, 9), np.float32)
        r[:, 0] = 0
        return r

    kw = dict(spk_id=2, key=2, enhance=True, pitch_extractor="dio",
              f0_min=65, f0_max=800, enhancer_adaptive_key="auto",
              sampling_rate=SR, seed=7)
    outs = run_inference_batch(
        ckpt, wavs, str(root / "batch_out"), batch_size=3,
        noise_hook=noise, enhancer_rand_hook=enh_rand,
        cache_dir=str(root / "cache"), **kw,
    )
    assert len(outs) == 2
    for fi, wav in enumerate(wavs):
        single = str(root / f"single_{fi}.wav")
        run_inference(
            ckpt, wav, single,
            noise_hook=lambda i, shape: noise(fi, i, shape),
            enhancer_rand_hook=lambda i: enh_rand(fi, i),
            cache_dir=str(root / "cache"), **kw,
        )
        got, sr_g = read_wav(outs[fi])
        ref, sr_r = read_wav(single)
        assert sr_g == sr_r
        assert len(got) == len(ref), (len(got), len(ref))
        err = np.abs(np.asarray(got) - np.asarray(ref)).max()
        scale = np.abs(ref).max() + 1e-9
        assert err / scale < 1e-3, (fi, err / scale)  # PCM16 quantization
