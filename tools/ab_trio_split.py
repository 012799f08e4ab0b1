#!/usr/bin/env python
"""Tuning sweep of the fused resblock-trio kernel at the headline stage
geometries: split (VPU/MXU overlap), mxu_bf16, tile. Alternating timing.

Run on TPU:  python tools/ab_trio_split.py [--batch 128]
"""
import argparse
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--channels", type=int, nargs="+", default=[64, 32, 16])
    p.add_argument("--splits", type=int, nargs="+", default=[1, 2])
    p.add_argument("--bf16", type=int, nargs="+", default=[0])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.ops.pallas_kernels import fused_resblocks_pallas

    rng = np.random.default_rng(time.time_ns() % (2**32))
    ks, dils = (3, 7, 11), (1, 3, 5)
    b = args.batch

    for c in args.channels:
        t = 4194304 // c  # stage geometry: C*T constant (65536*64)
        x = jnp.asarray(
            rng.standard_normal((b, t, c)).astype(np.float32) * 0.1
        )
        ws, bs = [], []
        for k in ks:
            ws.append(jnp.asarray(
                (rng.standard_normal((3, 2, k, c, c)) * (2.0 / (k * c)) ** 0.5
                 ).astype(np.float32)
            ))
            bs.append(jnp.asarray(
                (rng.standard_normal((3, 2, c)) * 0.01).astype(np.float32)
            ))
        variants = {}
        for split, mx in itertools.product(args.splits, args.bf16):
            fn = jax.jit(
                lambda xx, s=split, m=bool(mx): jnp.sum(fused_resblocks_pallas(
                    x=xx, w0=ws[0], w1=ws[1], w2=ws[2],
                    b0=bs[0], b1=bs[1], b2=bs[2],
                    kernel_sizes=ks, dilations=dils, tile=None,
                    mxu_bf16=m, interpret=False, split=s,
                ))
            )
            float(fn(x))
            variants[(split, mx)] = fn
            print(f"compiled C={c} split={split} bf16={mx}", flush=True)
        times = {key: [] for key in variants}
        for i in range(1, args.iters + 1):
            for key, fn in variants.items():
                xx = x * (1 + 1e-3 * i)
                st = time.perf_counter()
                float(fn(xx))
                times[key].append(time.perf_counter() - st)
        for key in variants:
            med = float(np.median(times[key])) * 1e3
            print(f"C={c:3d} T={t} split={key[0]} bf16={key[1]}: "
                  f"{med:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
