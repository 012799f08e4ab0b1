"""Reference-checkpoint interop: fabricate a reference-format torch
checkpoint on disk (exactly as /root/reference/logger/saver.py:83-87 writes
it), convert with tools/convert_checkpoint.py, and verify the loaded flax
model matches the executed reference forward; also drive the offline CLI
from the converted checkpoint."""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import yaml

from torch_stubs import install_stubs
from ddsp_svc_tpu.models import load_model

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

SR = 16000
BLOCK = 256


@pytest.fixture(scope="module")
def ref_vocoder():
    install_stubs()
    try:
        from ddsp import vocoder  # type: ignore
    except Exception as e:
        pytest.skip(f"reference ddsp.vocoder not importable: {e}")
    return vocoder


def _ref_config(mtype):
    cfg = {
        "data": {
            "f0_extractor": "dio", "f0_min": 65, "f0_max": 800,
            "sampling_rate": SR, "block_size": BLOCK, "duration": 1.0,
            "encoder": "hubertsoft", "encoder_sample_rate": 16000,
            "encoder_hop_size": 320, "encoder_out_channels": 256,
            "encoder_ckpt": None, "n_aunit": 0, "use_vuv": False,
        },
        "model": {"type": mtype, "n_spk": 2, "c": False},
        "enhancer": {"type": "nsf-hifigan", "ckpt": None},
        "device": "cpu",
        "env": {"expdir": "exp/test", "gpu_id": 0},
    }
    if mtype == "Sins":
        cfg["model"].update(
            n_harmonics=32, n_mag_allpass=64, n_mag_noise=64)
    elif mtype == "CombSub":
        cfg["model"].update(
            n_mag_allpass=64, n_mag_harmonic=64, n_mag_noise=64)
    return cfg


def _build_ref_model(ref_vocoder, mtype, torch):
    torch.manual_seed(7)
    if mtype == "Sins":
        return ref_vocoder.Sins(
            sampling_rate=SR, block_size=BLOCK, n_harmonics=32,
            n_mag_allpass=64, n_mag_noise=64, n_unit=256, n_spk=2)
    if mtype == "CombSub":
        return ref_vocoder.CombSub(
            sampling_rate=SR, block_size=BLOCK, n_mag_allpass=64,
            n_mag_harmonic=64, n_mag_noise=64, n_unit=256, n_spk=2)
    return ref_vocoder.CombSubFast(SR, BLOCK, n_unit=256, n_spk=2)


def _fabricate_reference_checkpoint(tmpdir, ref_model, mtype, torch, step=1234):
    """Write model_{step}.pt + config.yaml exactly as the reference's Saver
    and train loop lay them out (saver.py:33-36,83-87)."""
    pt_path = os.path.join(tmpdir, f"model_{step}.pt")
    torch.save(
        {"global_step": step, "model": ref_model.state_dict(),
         "optimizer": {}},
        pt_path,
    )
    with open(os.path.join(tmpdir, "config.yaml"), "w") as f:
        yaml.safe_dump(_ref_config(mtype), f)
    return pt_path


def _ref_forward(ref_model, inputs, noise, torch):
    units, f0, volume, spk_id = inputs
    t = tuple(map(torch.from_numpy, (units, f0, volume)))
    t_noise = torch.from_numpy(noise)
    orig = torch.rand_like
    torch.rand_like = lambda x: (
        t_noise[: x.shape[0], : x.shape[1]].to(x.dtype) + 1.0) / 2.0
    try:
        with torch.no_grad():
            sig, _, _ = ref_model(
                t[0], t[1], t[2], torch.from_numpy(spk_id), infer=True)
    finally:
        torch.rand_like = orig
    return sig.numpy()


def _inputs(seed=0, b=1, n_frames=16):
    rng = np.random.default_rng(seed)
    units = rng.standard_normal((b, n_frames, 256)).astype(np.float32)
    f0 = (120.0 + 300.0 * rng.random((b, n_frames, 1))).astype(np.float32)
    volume = rng.random((b, n_frames)).astype(np.float32)
    spk_id = np.full((b, 1), 2, dtype=np.int64)
    noise = (rng.random((b, n_frames * BLOCK)) * 2 - 1).astype(np.float32)
    return units, f0, volume, spk_id, noise


@pytest.mark.parametrize("mtype", ["Sins", "CombSub", "CombSubFast"])
def test_disk_roundtrip_parity(ref_vocoder, mtype, tmp_path):
    """torch.save(reference layout) -> convert_checkpoint CLI -> load_model
    -> forward matches the executed reference."""
    import torch
    import convert_checkpoint as cc

    ref_model = _build_ref_model(ref_vocoder, mtype, torch)
    src = tmp_path / "ref_exp"
    src.mkdir()
    pt_path = _fabricate_reference_checkpoint(str(src), ref_model, mtype, torch)

    out_dir = str(tmp_path / "converted")
    ckpt_path = cc.main(["-i", pt_path, "-o", out_dir])
    assert ckpt_path == os.path.join(out_dir, "model_1234.ckpt")
    assert os.path.isfile(ckpt_path)
    assert os.path.isfile(os.path.join(out_dir, "config.yaml"))

    units, f0, volume, spk_id, noise = _inputs()
    ref_sig = _ref_forward(ref_model, (units, f0, volume, spk_id), noise, torch)

    model, variables, args = load_model(ckpt_path)
    got, _, _ = model.apply(
        variables, jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
        jnp.asarray(spk_id), infer=True, noise=jnp.asarray(noise))
    got = np.asarray(got)
    scale = np.abs(ref_sig).max() + 1e-6
    assert got.shape == ref_sig.shape
    assert np.abs(got - ref_sig).max() / scale < 2e-3


def test_factory_loads_pt_directly(ref_vocoder, tmp_path):
    """models.factory.load_model consumes a reference .pt with no conversion
    step, matching the reference entry point (vocoder.py:343-369)."""
    import torch

    ref_model = _build_ref_model(ref_vocoder, "CombSubFast", torch)
    pt_path = _fabricate_reference_checkpoint(
        str(tmp_path), ref_model, "CombSubFast", torch)

    units, f0, volume, spk_id, noise = _inputs(1)
    ref_sig = _ref_forward(ref_model, (units, f0, volume, spk_id), noise, torch)

    model, variables, args = load_model(pt_path)
    got, _, _ = model.apply(
        variables, jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
        jnp.asarray(spk_id), infer=True, noise=jnp.asarray(noise))
    scale = np.abs(ref_sig).max() + 1e-6
    assert np.abs(np.asarray(got) - ref_sig).max() / scale < 2e-3


def test_offline_cli_from_converted_checkpoint(ref_vocoder, tmp_path):
    """The offline pipeline runs end-to-end from a converted reference
    checkpoint (random-init units encoder; enhancer off)."""
    import torch
    import convert_checkpoint as cc
    from ddsp_svc_tpu.data.wavio import write_wav, read_wav
    from ddsp_svc_tpu.infer import run_inference

    ref_model = _build_ref_model(ref_vocoder, "CombSubFast", torch)
    src = tmp_path / "ref_exp"
    src.mkdir()
    pt_path = _fabricate_reference_checkpoint(str(src), ref_model,
                                              "CombSubFast", torch)
    ckpt_path = cc.main(["-i", pt_path, "-o", str(tmp_path / "conv")])

    t = np.arange(int(1.5 * SR)) / SR
    sig = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav_in = str(tmp_path / "in.wav")
    write_wav(wav_in, sig, SR)

    out = run_inference(
        model_path=ckpt_path, input_path=wav_in,
        output_path=str(tmp_path / "out.wav"), spk_id=1, enhance=False,
        pitch_extractor="dio", f0_min=65, f0_max=800, sampling_rate=SR,
        cache_dir=str(tmp_path / "cache"))
    audio, sr = read_wav(out)
    assert sr == SR and np.isfinite(audio).all() and audio.size > SR // 2
