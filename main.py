#!/usr/bin/env python
"""Offline voice-conversion CLI.

Flag parity with /root/reference/main.py:16-32:
    python main.py -m exp/model_best.ckpt -i in.wav -o out.wav \
        -id 1 -mix "None" -k 0 -e true -pe crepe -fmin 50 -fmax 1100 \
        -th -60 -eak 0 -sr 44100
Additional: --compat-double-key reproduces the reference's double key-change
bug (main.py:105,120) for bit-compat experiments.

Directory mode (beyond the reference): when -i is a DIRECTORY, every .wav
inside converts through the batched throughput path (segments from all
files packed into device batches of --batch with per-item length masking —
infer/batch.py); -o is then the output directory.
"""
import argparse
import glob
import os
from ast import literal_eval

from ddsp_svc_tpu.infer import run_inference


def parse_args(args=None):
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_path", type=str, required=True)
    p.add_argument("-i", "--input", type=str, required=True)
    p.add_argument("-o", "--output", type=str, required=True)
    p.add_argument("-id", "--spk_id", type=str, default=1)
    p.add_argument("-mix", "--spk_mix_dict", type=str, default="None")
    p.add_argument("-k", "--key", type=str, default=0)
    p.add_argument("-e", "--enhance", type=str, default="true")
    p.add_argument("-pe", "--pitch_extractor", type=str, default="crepe",
                   help="parselmouth, dio, harvest, crepe (default)")
    p.add_argument("-fmin", "--f0_min", type=str, default=50)
    p.add_argument("-fmax", "--f0_max", type=str, default=1100)
    p.add_argument("-th", "--threhold", type=str, default=-60)
    p.add_argument("-eak", "--enhancer_adaptive_key", type=str, default=0)
    p.add_argument("-sr", "--sampling_rate", type=int, default=44100)
    p.add_argument("--compat-double-key", action="store_true")
    p.add_argument("--batch", type=int, default=16,
                   help="device batch size in directory mode")
    return p.parse_args(args=args)


def main():
    cmd = parse_args()
    eak = cmd.enhancer_adaptive_key
    if os.path.isdir(cmd.input):
        from ddsp_svc_tpu.infer.batch import run_inference_batch

        inputs = sorted(glob.glob(os.path.join(cmd.input, "*.wav")))
        if not inputs:
            raise SystemExit(f" [x] no .wav files in {cmd.input}")
        outs = run_inference_batch(
            model_path=cmd.model_path,
            input_paths=inputs,
            output_dir=cmd.output,
            batch_size=cmd.batch,
            spk_id=int(cmd.spk_id),
            spk_mix_dict=literal_eval(cmd.spk_mix_dict),
            key=float(cmd.key),
            enhance=(str(cmd.enhance).lower() == "true"),
            pitch_extractor=cmd.pitch_extractor,
            f0_min=float(cmd.f0_min),
            f0_max=float(cmd.f0_max),
            threshold_db=float(cmd.threhold),
            enhancer_adaptive_key=eak if eak == "auto" else float(eak),
            sampling_rate=cmd.sampling_rate,
            compat_double_key=cmd.compat_double_key,
        )
        for o in outs:
            print(f" [*] wrote {o}")
        return
    run_inference(
        model_path=cmd.model_path,
        input_path=cmd.input,
        output_path=cmd.output,
        spk_id=int(cmd.spk_id),
        spk_mix_dict=literal_eval(cmd.spk_mix_dict),
        key=float(cmd.key),
        enhance=(str(cmd.enhance).lower() == "true"),
        pitch_extractor=cmd.pitch_extractor,
        f0_min=float(cmd.f0_min),
        f0_max=float(cmd.f0_max),
        threshold_db=float(cmd.threhold),
        enhancer_adaptive_key=eak if eak == "auto" else float(eak),
        sampling_rate=cmd.sampling_rate,
        compat_double_key=cmd.compat_double_key,
    )


if __name__ == "__main__":
    main()
