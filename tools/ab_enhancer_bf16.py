#!/usr/bin/env python
"""A/B sweep of the enhancer's staged-bf16 threshold on the full headline
program (synth + NSF-HiFiGAN), alternating calls. Lower thresholds take the
narrow tail stages through bf16 + the fused trio kernel; reports throughput
and output deviation vs the fp32-tail baseline.

Run on TPU:  python tools/ab_enhancer_bf16.py [--batch 128]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--frames", type=int, default=512)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--thresholds", type=int, nargs="+",
                   default=[128, 64, 32, 16])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import H_NSF
    from ddsp_svc_tpu.models import CombSubFast
    from ddsp_svc_tpu.infer.enhancer import NsfHifiGAN

    b, n_frames, bs, sr, n_unit = args.batch, args.frames, 512, 44100, 256
    rng = np.random.default_rng(time.time_ns() % (2**32))
    units = jnp.asarray(rng.standard_normal((b, n_frames, n_unit)).astype(np.float32))
    f0 = jnp.asarray((110.0 + 300.0 * rng.random((b, n_frames, 1))).astype(np.float32))
    volume = jnp.asarray(rng.random((b, n_frames)).astype(np.float32))
    spk_id = jnp.asarray(np.ones((b, 1), dtype=np.int64))
    noise = jnp.asarray((rng.random((b, n_frames * bs)) * 2 - 1).astype(np.float32))
    rand_ini = jnp.zeros((b, 9))

    model = CombSubFast(sampling_rate=sr, block_size=bs, n_unit=n_unit,
                        n_spk=8, bf16=True)
    variables = jax.jit(
        lambda k: model.init({"params": k}, units, f0, volume, spk_id,
                             noise=noise)
    )(jax.random.key(0))

    # shared generator params across variants (same tree)
    nsf0 = NsfHifiGAN(None, h=H_NSF, bf16_min_channels=args.thresholds[0])
    nsf_vars = nsf0.variables

    fns, outs = {}, {}
    for th in args.thresholds:
        nsf = NsfHifiGAN(None, h=H_NSF, bf16_min_channels=th,
                         variables=nsf_vars)

        def full(u, n, nsf=nsf):
            signal, _, _ = model.apply(
                variables, u, f0, volume, spk_id, infer=True, noise=n
            )
            return nsf._forward_impl(nsf.variables, signal, f0[..., 0],
                                     rand_ini)

        fn = jax.jit(lambda u, n, f=full: jnp.sum(f(u, n)))
        float(fn(units, noise))
        fns[th] = fn
        outs[th] = np.asarray(jax.jit(full)(units, noise))
        print(f"compiled threshold={th}", flush=True)

    base = outs[args.thresholds[0]]
    for th in args.thresholds[1:]:
        d = outs[th] - base
        rel = np.sqrt((d ** 2).mean()) / (np.sqrt((base ** 2).mean()) + 1e-12)
        print(f"th={th:4d} output rel-RMS vs th={args.thresholds[0]}: "
              f"{rel:.2e}", flush=True)

    times = {th: [] for th in args.thresholds}
    for i in range(1, args.iters + 1):
        for th in args.thresholds:
            u = units + 0.01 * i
            n = noise * (1 - 0.001 * i)
            st = time.perf_counter()
            float(fns[th](u, n))
            times[th].append(time.perf_counter() - st)
    audio_seconds = b * n_frames * bs / sr
    for th in args.thresholds:
        med = float(np.median(times[th]))
        print(f"th={th:4d} median {med*1e3:8.2f} ms  "
              f"rtf {audio_seconds/med:7.1f}x", flush=True)


if __name__ == "__main__":
    main()
