#!/usr/bin/env python
"""Measure the batched offline conversion (infer/batch.py) against the
segment-serial single-file path on the same inputs — the user-facing
throughput of `main.py -i <dir>` vs a loop of single conversions.

Synthetic workload: N equal-length files (~6 s @ 44.1 kHz) so the units
encoder compiles once for both paths; random-weight CombSubFast + a
fabricated NSF-HiFiGAN enhancer checkpoint (FLOP profile == pretrained).
F0 runs once into a shared cache before timing (host-side, identical in
both paths). Timed region: units encode + synth + enhance + stitch.

Run on TPU:  python tools/bench_batch_offline.py [--files 8] [--batch 8]

Measured (v5e through the remote relay, 8 files x 5.8 s, batch 8, -e true):
single-file loop ~400 s vs batched 46.2 s => **8.1x** user-visible speedup
(60.5 s / 6.7x before the masked fused trio kernels — the per-row SMEM
length mask keeps the VMEM-resident trios on the batched path, -24%).
Note the absolute wall times are relay-environment artifacts — each
run_inference call rebuilds its jit closures (re-trace + relay fetch per
program), which the batched path pays once per bucket group instead of per
file; on-chip steady-state throughput is bench.py's 1399x realtime.
"""
import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--files", type=int, default=8)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=5.8)
    p.add_argument("--enhance", default="true")
    p.add_argument("--repeats", type=int, default=2,
                   help="timed repetitions after the compile pass")
    args = p.parse_args()
    enhance = str(args.enhance).lower() == "true"

    import jax
    from flax import serialization

    from ddsp_svc_tpu.data.wavio import write_wav
    from ddsp_svc_tpu.models import CombSubFast
    from ddsp_svc_tpu.train import create_optimizer, create_train_state
    from ddsp_svc_tpu.train.saver import Saver
    from ddsp_svc_tpu.utils.config import DotDict
    from ddsp_svc_tpu.infer.enhancer import NsfHifiGAN
    from ddsp_svc_tpu.infer import run_inference
    from ddsp_svc_tpu.infer.batch import run_inference_batch

    sr, block = 44100, 512
    h_nsf = {
        "sampling_rate": sr, "num_mels": 128, "n_fft": 2048,
        "win_size": 2048, "hop_size": 512, "fmin": 40, "fmax": 16000,
        "upsample_rates": [8, 8, 2, 2, 2],
        "upsample_kernel_sizes": [16, 16, 4, 4, 4],
        "upsample_initial_channel": 512, "resblock": "1",
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5]] * 3,
    }
    root = tempfile.mkdtemp(prefix="bench_batch_")
    try:
        enh_dir = os.path.join(root, "enh")
        os.makedirs(enh_dir)
        nsf = NsfHifiGAN(None, h=h_nsf)
        with open(os.path.join(enh_dir, "config.json"), "w") as f:
            json.dump(h_nsf, f)
        with open(os.path.join(enh_dir, "model.ckpt"), "wb") as f:
            f.write(serialization.msgpack_serialize(
                jax.tree.map(np.asarray, nsf.variables)))

        cfg = DotDict({
            "data": {
                "f0_extractor": "dio", "f0_min": 65, "f0_max": 800,
                "sampling_rate": sr, "block_size": block, "duration": 2.0,
                "encoder": "hubertsoft", "encoder_sample_rate": 16000,
                "encoder_hop_size": 320, "encoder_out_channels": 256,
                "encoder_ckpt": None, "train_path": "", "valid_path": "",
            },
            "model": {"type": "CombSubFast", "n_spk": 2, "c": False},
            "enhancer": {"type": "nsf-hifigan",
                         "ckpt": os.path.join(enh_dir, "model.ckpt"),
                         "bf16_min_channels": 128},
            "loss": {"fft_min": 256, "fft_max": 2048, "n_scale": 2},
            "env": {"expdir": os.path.join(root, "exp")},
            "train": {"batch_size": 2, "lr": 5e-4, "weight_decay": 0},
        })
        model = CombSubFast(sampling_rate=sr, block_size=block, n_unit=256,
                            n_spk=2, bf16=True)
        rng = np.random.default_rng(0)
        ex = {
            "units": rng.standard_normal((1, 16, 256)).astype(np.float32),
            "f0": (200 * rng.random((1, 16, 1))).astype(np.float32),
            "volume": rng.random((1, 16)).astype(np.float32),
            "spk_id": np.ones((1, 1), dtype=np.int64),
        }
        opt = create_optimizer(5e-4)
        state = create_train_state(model, opt, ex, jax.random.key(0))
        saver = Saver(cfg)
        saver.save_model(
            {"params": state.params, "constants": state.constants},
            postfix="1",
        )
        ckpt = os.path.join(cfg.env.expdir, "model_1.ckpt")

        t = np.arange(int(sr * args.seconds)) / sr
        wavs = []
        for i in range(args.files):
            f = 160.0 + 15 * i
            y = 0.35 * np.sin(2 * np.pi * f * t) * (
                0.6 + 0.4 * np.sin(2 * np.pi * 2.3 * t))
            pth = os.path.join(root, f"in{i}.wav")
            write_wav(pth, y.astype(np.float32), sr)
            wavs.append(pth)

        kw = dict(spk_id=1, key=0, enhance=enhance, pitch_extractor="dio",
                  f0_min=65, f0_max=800, enhancer_adaptive_key=0,
                  sampling_rate=sr, cache_dir=os.path.join(root, "cache"))

        def run_single(tag):
            st = time.perf_counter()
            for i, w in enumerate(wavs):
                run_inference(ckpt, w, os.path.join(root, f"s_{tag}_{i}.wav"),
                              **kw)
            return time.perf_counter() - st

        def run_batch(tag):
            st = time.perf_counter()
            run_inference_batch(ckpt, wavs, os.path.join(root, f"b_{tag}"),
                                batch_size=args.batch, **kw)
            return time.perf_counter() - st

        # compile pass (not timed), then alternating timed repeats
        run_batch("warm")
        run_single("warm")
        singles, batches = [], []
        for r in range(args.repeats):
            singles.append(run_single(f"t{r}"))
            batches.append(run_batch(f"t{r}"))
        s_med = float(np.median(singles))
        b_med = float(np.median(batches))
        audio_sec = args.files * args.seconds
        print(json.dumps({
            "metric": "batched_offline_speedup",
            "files": args.files,
            "batch": args.batch,
            "enhance": enhance,
            "single_path_s": round(s_med, 2),
            "batch_path_s": round(b_med, 2),
            "speedup": round(s_med / b_med, 2),
            "single_rtf": round(audio_sec / s_med, 1),
            "batch_rtf": round(audio_sec / b_med, 1),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
