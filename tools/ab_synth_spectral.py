#!/usr/bin/env python
"""A/B: CombSubFast synth program with a chosen Pallas feature toggled,
alternating calls (relay latency drifts minute to minute, CLAUDE.md) at the
headline geometry. --feature spectral|attention.

Run on TPU:  python tools/ab_synth_spectral.py [--batch 128]
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
    p.add_argument("--feature", choices=("spectral", "attention"),
                   default="spectral")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.models import CombSubFast

    b, n_frames, bs, sr, n_unit = args.batch, args.frames, 512, 44100, 256
    rng = np.random.default_rng(time.time_ns() % (2**32))
    units = jnp.asarray(rng.standard_normal((b, n_frames, n_unit)).astype(np.float32))
    f0 = jnp.asarray((110.0 + 300.0 * rng.random((b, n_frames, 1))).astype(np.float32))
    volume = jnp.asarray(rng.random((b, n_frames)).astype(np.float32))
    spk_id = jnp.asarray(np.ones((b, 1), dtype=np.int64))
    noise = jnp.asarray((rng.random((b, n_frames * bs)) * 2 - 1).astype(np.float32))

    models, fns = {}, {}
    variables = None
    for name, fused in [("xla", False), ("fused", True)]:
        if args.feature == "spectral":
            kw = dict(fused_spectral=fused)
        else:
            kw = dict(fused_attention=fused)
        model = CombSubFast(sampling_rate=sr, block_size=bs, n_unit=n_unit,
                            n_spk=8, bf16=True, **kw)
        if variables is None:
            variables = jax.jit(
                lambda k, m=model: m.init({"params": k}, units, f0, volume,
                                          spk_id, noise=noise)
            )(jax.random.key(0))
        fn = jax.jit(
            lambda u, n, m=model, v=variables: jnp.sum(
                m.apply(v, u, f0, volume, spk_id, infer=True, noise=n)[0]
            )
        )
        float(fn(units, noise))  # compile
        print(f"compiled {name}", flush=True)
        models[name] = model
        fns[name] = fn

    def rel_rms(u, n):
        a = models["xla"].apply(variables, u, f0, volume, spk_id,
                                infer=True, noise=n)[0]
        b_ = models["fused"].apply(variables, u, f0, volume, spk_id,
                                   infer=True, noise=n)[0]
        return jnp.sqrt(jnp.mean((b_ - a) ** 2) / (jnp.mean(a ** 2) + 1e-12))

    rel = float(jax.jit(rel_rms)(units, noise))
    print(f"output rel-RMS fused vs xla: {rel:.2e}", flush=True)

    times = {"xla": [], "fused": []}
    for i in range(1, args.iters + 1):
        for name in ("xla", "fused"):
            u = units + 0.01 * i
            n = noise * (1 - 0.001 * i)
            st = time.perf_counter()
            float(fns[name](u, n))
            times[name].append(time.perf_counter() - st)
    for name in ("xla", "fused"):
        ms = sorted(times[name])
        print(f"{name:6s} median {np.median(ms)*1e3:8.2f} ms "
              f"(min {min(ms)*1e3:.2f})", flush=True)


if __name__ == "__main__":
    main()
