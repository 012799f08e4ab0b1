"""Whole-pipeline output parity: execute the reference's COMPLETE offline
path (/root/reference/main.py run as __main__ — slicer segmentation, volume
mask with 9-frame dilation, key change, per-segment unit encoding +
synthesis, zero-gap/cross-fade stitching) against infer.offline.run_inference
on the same real audio, with converted weights, a shared f0 cache, and
identical injected noise.

The reference runs every segment at its exact length; our pipeline runs
bucket-padded jit programs with `valid_frames` masking — this test is the
end-to-end proof that the two produce the same stitched waveform.
"""
import os
import runpy
import shutil
import sys

import numpy as np
import pytest
import yaml

from torch_stubs import install_pipeline_stubs

SR = 16000
BLOCK = 256
REF = "/root/reference"


@pytest.fixture(scope="module")
def ab_env(tmp_path_factory):
    """Fabricated reference-format checkpoints + shared input/f0-cache."""
    sf = install_pipeline_stubs()
    try:
        from ddsp import vocoder as ref_vocoder  # type: ignore
        from encoder.hubert.model import HubertSoft as RefHubertSoft  # type: ignore
    except Exception as e:
        pytest.skip(f"reference not importable: {e}")
    import torch

    root = tmp_path_factory.mktemp("ab")

    # --- seeded HuBERT-soft checkpoint (shared by both pipelines)
    torch.manual_seed(11)
    hubert = RefHubertSoft()
    hubert.eval()
    hubert_pt = str(root / "hubert.pt")
    torch.save(hubert.state_dict(), hubert_pt)

    # --- seeded reference CombSubFast checkpoint + config.yaml
    torch.manual_seed(7)
    ref_model = ref_vocoder.CombSubFast(SR, BLOCK, n_unit=256, n_spk=2)
    exp = root / "exp"
    exp.mkdir()
    pt_path = str(exp / "model_1000.pt")
    torch.save({"global_step": 1000, "model": ref_model.state_dict(),
                "optimizer": {}}, pt_path)
    # --- seeded reference NSF-HiFiGAN enhancer checkpoint + config.json
    # (small geometry; enhancer SR == model SR so the adaptive_key=0 case
    # skips resampling entirely and pins the mel+generator+regrid chain)
    import json

    from nsf_hifigan.models import Generator as RefNsfGenerator  # type: ignore
    from nsf_hifigan.env import AttrDict  # type: ignore

    enh_h = {
        "resblock": "1",
        "num_mels": 16,
        "n_fft": 512,
        "win_size": 512,
        "hop_size": 128,
        "sampling_rate": SR,
        "fmin": 40,
        "fmax": 8000,
        "upsample_rates": [4, 4, 2, 2, 2],
        "upsample_kernel_sizes": [8, 8, 4, 4, 4],
        "upsample_initial_channel": 64,
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    }
    torch.manual_seed(5)
    enh_gen = RefNsfGenerator(AttrDict(enh_h))
    enh_dir = root / "nsf_hifigan"
    enh_dir.mkdir()
    enh_pt = str(enh_dir / "model")
    torch.save({"generator": enh_gen.state_dict()}, enh_pt)
    with open(enh_dir / "config.json", "w") as f:
        json.dump(enh_h, f)

    cfg = {
        "data": {
            "f0_extractor": "dio", "f0_min": 65, "f0_max": 800,
            "sampling_rate": SR, "block_size": BLOCK, "duration": 1.0,
            "encoder": "hubertsoft", "encoder_sample_rate": 16000,
            "encoder_hop_size": 320, "encoder_out_channels": 256,
            "encoder_ckpt": hubert_pt, "n_aunit": 0, "use_vuv": False,
        },
        "model": {"type": "CombSubFast", "n_spk": 2, "c": False},
        "enhancer": {"type": "nsf-hifigan", "ckpt": enh_pt},
        "device": "cpu",
        "env": {"expdir": str(exp), "gpu_id": 0},
    }
    with open(exp / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    # --- input: real audio (samples/source.wav) at 16 kHz with an inserted
    # silent gap, so the slicer produces >1 segment and stitching is covered
    from ddsp_svc_tpu.data.wavio import load_audio, write_wav

    src, _ = load_audio(os.path.join(REF, "samples", "source.wav"), sr=SR)
    # two >5 s voiced stretches around a 1.2 s silent gap: the slicer's
    # min_length is 5000 ms, so this is the shortest input that exercises
    # multi-segment slicing + stitching
    audio = np.concatenate([
        src[: int(5.5 * SR)], np.zeros(int(1.2 * SR), np.float32),
        src[int(5.5 * SR): int(11.0 * SR)],
    ]).astype(np.float32)
    wav_in = str(root / "in.wav")
    write_wav(wav_in, audio, SR, subtype="FLOAT")

    # --- shared f0: computed once by OUR extractor, pre-seeded into both
    # pipelines' md5-keyed caches (f0 algorithm parity is a separate test;
    # this test pins synthesis/stitching parity)
    import hashlib
    from ddsp_svc_tpu.data.features import F0Extractor

    with open(wav_in, "rb") as f:
        md5 = hashlib.md5(f.read()).hexdigest()
    audio_loaded, _ = load_audio(wav_in, sr=SR)
    f0 = F0Extractor("dio", SR, BLOCK, 65, 800).extract(
        audio_loaded, uv_interp=True)
    for cache_dir in (root / "ref_rundir" / "cache", root / "our_cache"):
        cache_dir.mkdir(parents=True, exist_ok=True)
        np.save(str(cache_dir / f"dio_65_800_{md5}.npy"), f0,
                allow_pickle=False)

    # the reference main.py writes its f0 cache next to __file__; run a COPY
    # of it from a writable dir (the module imports still resolve to
    # /root/reference via sys.path — the reference is executed, not copied
    # into the repo)
    ref_main = str(root / "ref_rundir" / "main.py")
    shutil.copyfile(os.path.join(REF, "main.py"), ref_main)
    # reference snapshot bug (main.py:112): the response mask is computed
    # from `volume` AFTER it was converted to a torch tensor, via numpy
    # `.astype` — it crashes on any device. The intended input is plainly
    # the numpy `volume_np` from two lines above (all subsequent ops are
    # numpy); patch that one token so the reference pipeline can execute.
    with open(ref_main) as f:
        src_txt = f.read()
    fixed = src_txt.replace(
        "mask = (volume > 10 ** (float(cmd.threhold) / 20)).astype('float')",
        "mask = (volume_np > 10 ** (float(cmd.threhold) / 20)).astype('float')",
    )
    assert fixed != src_txt, "reference main.py mask line changed upstream?"
    with open(ref_main, "w") as f:
        f.write(fixed)

    return {"root": root, "pt": pt_path, "wav": wav_in, "sf": sf,
            "ref_main": ref_main, "audio": audio}


def _seg_noise(i, shape):
    rng = np.random.default_rng(900 + i)
    return (rng.random(shape) * 2.0 - 1.0).astype(np.float32)


def _enh_rand(i):
    """SineGen initial rotations per segment (models.py:150-152): uniform
    [0,1) with the fundamental's column zeroed."""
    rng = np.random.default_rng(7700 + i)
    r = rng.random((1, 9)).astype(np.float32)
    r[:, 0] = 0.0
    return r


def _run_reference(ab_env, out_path, key="0", enhance="false", eak="0"):
    """Execute the reference main.py end to end with injected noise."""
    import torch

    calls = {"n": 0}
    enh_calls = {"n": 0}
    orig = torch.rand_like
    orig_rand = torch.rand

    def fake_rand_like(x):
        noise = _seg_noise(calls["n"], tuple(x.shape))
        calls["n"] += 1
        return torch.from_numpy((noise + 1.0) / 2.0).to(x.dtype)

    def fake_rand(*shape, **kw):
        # the only torch.rand call in the -e true pipeline is SineGen's
        # initial-rotation draw, (1, 9) per segment (models.py:150)
        assert tuple(shape) == (1, 9), shape
        r = torch.from_numpy(_enh_rand(enh_calls["n"]).copy())
        enh_calls["n"] += 1
        return r

    # Reference snapshot bug #2 (CPU-only): enhancer.py:57-58 does
    # `f0_np = f0...cpu().numpy(); f0_np *= real_factor`. On the CUDA
    # device the reference was written for, .cpu() COPIES, so the scaling
    # is local; on this CPU harness .cpu() is a no-op and f0_np shares
    # memory with main.py's GLOBAL f0 tensor — adjacent slicer segments
    # overlap by a couple of frames, so one segment's in-place scaling
    # leaks into the next segment's f0 (and the synth's phase integrator
    # turns those first-frame errors into a completely different
    # waveform). Clone at the enhance boundary to restore the CUDA
    # semantics the rest of the pipeline assumes.
    import enhancer as ref_enhancer_mod  # type: ignore

    orig_enhance = ref_enhancer_mod.Enhancer.enhance

    def enhance_cuda_semantics(self, audio, sample_rate, f0, hop_size, **kw):
        return orig_enhance(self, audio, sample_rate, f0.clone(), hop_size,
                            **kw)

    argv = [
        "main.py", "-m", ab_env["pt"], "-i", ab_env["wav"], "-o", out_path,
        "-id", "2", "-k", key, "-e", enhance, "-pe", "dio",
        "-fmin", "65", "-fmax", "800", "-th", "-60", "-sr", str(SR),
        "-eak", eak,
    ]
    old_argv = sys.argv
    torch.rand_like = fake_rand_like
    torch.rand = fake_rand
    ref_enhancer_mod.Enhancer.enhance = enhance_cuda_semantics
    try:
        sys.argv = argv
        runpy.run_path(ab_env["ref_main"], run_name="__main__")
    finally:
        torch.rand_like = orig
        torch.rand = orig_rand
        ref_enhancer_mod.Enhancer.enhance = orig_enhance
        sys.argv = old_argv
    assert calls["n"] >= 2, "expected multiple slicer segments"
    if enhance == "true":
        assert enh_calls["n"] == calls["n"]
    return ab_env["sf"].soundfile_written[out_path]


def _run_ours(ab_env, out_path, key=0, compat_double_key=False,
              enhance=False, eak=0):
    from ddsp_svc_tpu.data.wavio import read_wav
    from ddsp_svc_tpu.infer import run_inference

    run_inference(
        model_path=ab_env["pt"], input_path=ab_env["wav"],
        output_path=out_path, spk_id=2, key=key, enhance=enhance,
        pitch_extractor="dio", f0_min=65, f0_max=800, threshold_db=-60,
        enhancer_adaptive_key=eak,
        sampling_rate=SR, cache_dir=str(ab_env["root"] / "our_cache"),
        compat_double_key=compat_double_key, noise_hook=_seg_noise,
        enhancer_rand_hook=_enh_rand if enhance else None,
        output_subtype="FLOAT",
    )
    got, sr = read_wav(out_path)
    assert sr == SR
    return got.reshape(-1)


def _report(got, ref):
    assert got.shape == ref.shape, (got.shape, ref.shape)
    scale = np.abs(ref).max() + 1e-9
    max_rel = float(np.abs(got - ref).max() / scale)

    from ddsp_svc_tpu.models import mel_l1

    mel = float(mel_l1(got[None, :], ref[None, :], SR))
    return max_rel, mel


def test_full_pipeline_ab(ab_env):
    ref = _run_reference(ab_env, str(ab_env["root"] / "ref_out.wav"))
    got = _run_ours(ab_env, str(ab_env["root"] / "our_out.wav"))
    max_rel, mel = _report(got, np.asarray(ref, dtype=np.float32))
    print(f"\n[full-pipeline A/B] stitched max-rel-err={max_rel:.3e} "
          f"mel-L1={mel:.3e}")
    assert max_rel < 5e-4
    assert mel < 1e-4


def test_full_pipeline_ab_enhancer(ab_env):
    """-e true, adaptive_key=0: enhancer SR == model SR, so no resampling —
    this pins the mel frontend + f0 regrid + NSF-HiFiGAN generator + repad
    glue (enhancer.py:24-78) exactly."""
    ref = _run_reference(ab_env, str(ab_env["root"] / "ref_out_e.wav"),
                         enhance="true")
    got = _run_ours(ab_env, str(ab_env["root"] / "our_out_e.wav"),
                    enhance=True)
    max_rel, mel = _report(got, np.asarray(ref, dtype=np.float32))
    print(f"\n[full-pipeline A/B +enhancer] stitched max-rel-err={max_rel:.3e} "
          f"mel-L1={mel:.3e}")
    assert max_rel < 2e-3
    assert mel < 5e-4


def test_full_pipeline_ab_enhancer_adaptive_key(ab_env):
    """-e true -eak 3: adaptive sample rate 19 kHz — covers the sinc
    resample in/out legs and the real_factor f0 regrid
    (enhancer.py:41-62,67-72)."""
    ref = _run_reference(ab_env, str(ab_env["root"] / "ref_out_e3.wav"),
                         enhance="true", eak="3")
    got = _run_ours(ab_env, str(ab_env["root"] / "our_out_e3.wav"),
                    enhance=True, eak=3)
    max_rel, mel = _report(got, np.asarray(ref, dtype=np.float32))
    print(f"\n[full-pipeline A/B +enhancer eak=3] stitched "
          f"max-rel-err={max_rel:.3e} mel-L1={mel:.3e}")
    assert max_rel < 2e-3
    assert mel < 5e-4


def test_full_pipeline_ab_enhancer_auto_key(ab_env):
    """-e true -eak auto with +12 semitones (applied twice by the reference;
    compat_double_key matches): per-segment max f0 exceeds 760 Hz, so 'auto'
    derives a nonzero adaptive key (enhancer.py:34-37)."""
    ref = _run_reference(ab_env, str(ab_env["root"] / "ref_out_ea.wav"),
                         key="6", enhance="true", eak="auto")
    got = _run_ours(ab_env, str(ab_env["root"] / "our_out_ea.wav"),
                    key=6, compat_double_key=True, enhance=True, eak="auto")
    max_rel, mel = _report(got, np.asarray(ref, dtype=np.float32))
    print(f"\n[full-pipeline A/B +enhancer auto] stitched "
          f"max-rel-err={max_rel:.3e} mel-L1={mel:.3e}")
    assert max_rel < 2e-3
    assert mel < 1e-3  # measured 6.1e-4 (two resample legs + 13-key regrid)


def test_full_pipeline_ab_key_change(ab_env):
    """Key change path: the reference applies -k twice (main.py:105+120);
    ours matches under compat_double_key=True."""
    ref = _run_reference(ab_env, str(ab_env["root"] / "ref_out_k.wav"),
                         key="5")
    got = _run_ours(ab_env, str(ab_env["root"] / "our_out_k.wav"), key=5,
                    compat_double_key=True)
    max_rel, mel = _report(got, np.asarray(ref, dtype=np.float32))
    print(f"\n[full-pipeline A/B +key] stitched max-rel-err={max_rel:.3e} "
          f"mel-L1={mel:.3e}")
    assert max_rel < 5e-4
    assert mel < 1e-4
