#!/usr/bin/env python
"""A/B: fused trios with vs without the folded f0-source injection conv,
on the full headline program, alternating calls.

Run on TPU:  python tools/ab_inject.py [--batch 128]
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
    nsf0 = NsfHifiGAN(None, h=H_NSF, bf16_min_channels=128)
    nsf_vars = nsf0.variables

    fns = {}
    for name, inj in (("plain", False), ("inject", True)):
        nsf = NsfHifiGAN(None, h=H_NSF, bf16_min_channels=128,
                         variables=nsf_vars)
        import dataclasses
        nsf.model = dataclasses.replace(nsf.model, fused_inject=inj)

        def full(u, n, nsf=nsf):
            signal, _, _ = model.apply(
                variables, u, f0, volume, spk_id, infer=True, noise=n
            )
            return jnp.sum(nsf._forward_impl(
                nsf.variables, signal, f0[..., 0], rand_ini
            ))

        fn = jax.jit(full)
        float(fn(units, noise))
        fns[name] = fn
        print(f"compiled {name}", flush=True)

    times = {name: [] for name in fns}
    for i in range(1, args.iters + 1):
        for name, fn in fns.items():
            u = units + 0.01 * i
            n = noise * (1 - 0.001 * i)
            st = time.perf_counter()
            float(fn(u, n))
            times[name].append(time.perf_counter() - st)
    for name in fns:
        med = float(np.median(times[name])) * 1e3
        print(f"{name:7s}: {med:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
