#!/usr/bin/env python
"""Output-parity harness: run the reference (torch) and this framework on
the SAME real-audio features and identical weights/noise, report waveform
max-error and log-mel L1 (the BASELINE.md correctness metric).

Features (units/f0/volume) are extracted by this framework's pipeline from
a real recording (default: the reference's samples/source.wav); the
reference's synthesizer runs via the test stubs for its native deps. With a
trained reference checkpoint (-c model.pt) weights are converted; otherwise
a seeded random-weight model is used (identical in both frameworks either
way).

    python tools/parity_harness.py                       # random weights
    python tools/parity_harness.py -c path/to/model.pt   # reference ckpt
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))


def main():
    # test drills force the CPU backend (the axon sitecustomize pins the
    # TPU tunnel, which plain JAX_PLATFORMS cannot override)
    if os.environ.get("DDSP_HARNESS_PLATFORM"):
        import jax

        jax.config.update(
            "jax_platforms", os.environ["DDSP_HARNESS_PLATFORM"]
        )
    p = argparse.ArgumentParser()
    p.add_argument("-i", "--input", default="/root/reference/samples/source.wav")
    p.add_argument("-c", "--checkpoint", default=None,
                   help="reference torch checkpoint (.pt) to convert")
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--reference-path", default="/root/reference")
    args = p.parse_args()

    if args.reference_path not in sys.path:
        sys.path.append(args.reference_path)
    from torch_stubs import install_stubs

    install_stubs()
    import torch
    import jax
    import jax.numpy as jnp
    from ddsp import vocoder as ref_vocoder  # type: ignore

    from ddsp_svc_tpu.data.wavio import load_audio
    from ddsp_svc_tpu.data.features import F0Extractor, VolumeExtractor, UnitsEncoder
    from ddsp_svc_tpu.models import CombSubFast, mel_l1
    from ddsp_svc_tpu.utils.convert import convert_synth_state_dict

    sr, block, n_unit, n_spk = 44100, 512, 256, 4
    audio, _ = load_audio(args.input, sr=sr, mono=True)
    audio = audio[: int(args.seconds * sr)]
    print(f"[harness] {args.input}: {len(audio) / sr:.2f}s @ {sr} Hz")

    f0 = F0Extractor("dio", sr, block, 65, 800).extract(audio, uv_interp=True)
    volume = VolumeExtractor(block).extract(audio)
    units = UnitsEncoder("hubertsoft", None).encode(audio[None, :], sr, block)
    n_frames = units.shape[1]
    f0 = f0[None, :n_frames, None].astype(np.float32)
    volume = volume[None, :n_frames].astype(np.float32)
    spk = np.asarray([[1]], dtype=np.int64)
    rng = np.random.default_rng(0)
    noise = (rng.random((1, n_frames * block)) * 2 - 1).astype(np.float32)

    torch.manual_seed(0)
    ref_model = ref_vocoder.CombSubFast(sr, block, n_unit=n_unit, n_spk=n_spk)
    if args.checkpoint:
        ckpt = torch.load(args.checkpoint, map_location="cpu")
        ref_model.load_state_dict(ckpt["model"])
    ref_model.eval()

    t_noise = torch.from_numpy(noise)
    torch.rand_like = lambda x: (t_noise[:, : x.shape[1]].to(x.dtype) + 1) / 2
    with torch.no_grad():
        ref_sig = ref_model(
            torch.from_numpy(units), torch.from_numpy(f0),
            torch.from_numpy(volume), torch.from_numpy(spk), infer=True,
        )[0].numpy()

    model = CombSubFast(sampling_rate=sr, block_size=block, n_unit=n_unit, n_spk=n_spk)
    variables = jax.tree.map(
        jnp.asarray, convert_synth_state_dict(ref_model.state_dict())
    )
    got = np.asarray(
        model.apply(
            variables, jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
            jnp.asarray(spk), infer=True, noise=jnp.asarray(noise),
        )[0]
    )

    scale = float(np.abs(ref_sig).max()) + 1e-9
    max_rel = float(np.abs(got - ref_sig).max() / scale)
    ml1 = float(mel_l1(jnp.asarray(got), jnp.asarray(ref_sig), sr=sr))
    report = {
        "seconds": round(len(audio) / sr, 2),
        "waveform_max_rel_err": round(max_rel, 6),
        "mel_l1": round(ml1, 6),
        "allclose_0.5pct": bool(max_rel < 5e-3),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
