#!/usr/bin/env python
"""Paired-tile trio kernel A/B (`pk._PAIR_TILES`).

Two whole tiles per grid program, their 2x3 independent resblock chains
emitted conv-by-conv: unlike `split` (which halves a tile and pays
duplicated halos — measured loss), paired tiles already carry their own
halos, so the VPU/MXU overlap is VMEM-free. Iteration-interleaved timing
(relay drift immunity). Run on TPU:

    python tools/ab_trio_pair.py [--batch 128]
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
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--channels", type=int, nargs="+", default=[64, 32, 16])
    p.add_argument("--tile", type=int, default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(time.time_ns() % (2**32))
    ks, dils = (3, 7, 11), (1, 3, 5)
    b = args.batch

    for c in args.channels:
        t = 4194304 // c
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
        fns = {}
        for name, pair in [("single", False), ("paired", True)]:
            pk._PAIR_TILES = pair
            pk._PAIR_MAX_C = 32 if pair else 0  # force each arm's path
            try:
                fn = jax.jit(
                    lambda xx: jnp.sum(pk.fused_resblocks_pallas(
                        x=xx, w0=ws[0], w1=ws[1], w2=ws[2],
                        b0=bs[0], b1=bs[1], b2=bs[2],
                        kernel_sizes=ks, dilations=dils, tile=args.tile,
                        mxu_bf16=False, interpret=False,
                    ))
                )
                float(fn(x))
                fns[name] = fn
                print(f"compiled C={c} {name}", flush=True)
            except Exception as e:
                print(f"C={c} {name}: FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
            finally:
                pk._PAIR_TILES = False
                pk._PAIR_MAX_C = 32
        times = {name: [] for name in fns}
        for i in range(1, args.iters + 1):
            for name, fn in fns.items():
                xx = x * (1 + 1e-3 * i)
                st = time.perf_counter()
                float(fn(xx))
                times[name].append(time.perf_counter() - st)
        for name in fns:
            med = float(np.median(times[name])) * 1e3
            print(f"C={c:3d} {name:7s}: {med:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
