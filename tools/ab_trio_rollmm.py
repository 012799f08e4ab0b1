#!/usr/bin/env python
"""Shift-matrix MXU rolls experiment (round-5 narrow-stage-floor probe).

The trio kernels spend 17-39% of their time in pltpu.roll lane rotations
(tools/ab_trio_rollcost.py). This measures the alternative of lowering each
tap roll as an MXU dot with a (W, W) rotation matrix (pk._ROLL_MM): the VPU
relayout becomes matmul work on otherwise-idle MXU capacity — at the cost
of 2*C*W*W flops per tap (W/(C*k) times the conv's own flops, so only
plausible at small tiles; forced tile=512 here).

Arms per channel width: production (default tile, pltpu.roll),
tile512-roll (tile-size control), tile512-rollmm (the experiment).

Run on TPU:  python tools/ab_trio_rollmm.py [--batch 128]
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
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--channels", type=int, nargs="+", default=[64, 32, 16])
    p.add_argument("--tile", type=int, default=512)
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

        def build(tile, rollmm):
            pk._ROLL_MM = rollmm
            fn = jax.jit(
                lambda xx: jnp.sum(pk.fused_resblocks_pallas(
                    x=xx, w0=ws[0], w1=ws[1], w2=ws[2],
                    b0=bs[0], b1=bs[1], b2=bs[2],
                    kernel_sizes=ks, dilations=dils, tile=tile,
                    mxu_bf16=False, interpret=False,
                ))
            )
            try:
                float(fn(x))
            finally:
                pk._ROLL_MM = False
            return fn

        fns = {}
        for name, tile, rollmm in [
            ("prod-roll", None, False),
            (f"t{args.tile}-roll", args.tile, False),
            (f"t{args.tile}-rollmm", args.tile, True),
        ]:
            try:
                fns[name] = build(tile, rollmm)
                print(f"compiled C={c} {name}", flush=True)
            except Exception as e:
                print(f"C={c} {name}: FAILED to compile/run: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        times = {name: [] for name in fns}
        for i in range(1, args.iters + 1):
            for name, fn in fns.items():
                xx = x * (1 + 1e-3 * i)
                st = time.perf_counter()
                float(fn(xx))
                times[name].append(time.perf_counter() - st)
        for name in fns:
            med = float(np.median(times[name])) * 1e3
            print(f"C={c:3d} {name:14s}: {med:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
