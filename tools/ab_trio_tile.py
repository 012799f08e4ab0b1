#!/usr/bin/env python
"""Tile-size sweep of the fused trio kernel: the channel-scaled default caps
the live VMEM set (fp32 im2col concat), but every narrow stage then runs
~4096 programs x ~10 us fixed cost (~41 ms at batch 128). bf16 concat
(mxu_bf16) halves the buffer, admitting 2x tiles.

Run on TPU:  python tools/ab_trio_tile.py [--batch 128]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (channels, [(tile_or_None, mxu_bf16), ...])
GRID = {
    64: [(None, False), (2048, True), (4096, True)],
    32: [(None, False), (4096, True), (8192, True)],
    16: [(None, False), (16384, False), (16384, True)],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--channels", type=int, nargs="+", default=[64, 32, 16])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.ops.pallas_kernels import fused_resblocks_pallas

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
        for tile, mx in GRID[c]:
            try:
                fn = jax.jit(
                    lambda xx, tl=tile, m=mx: jnp.sum(fused_resblocks_pallas(
                        x=xx, w0=ws[0], w1=ws[1], w2=ws[2],
                        b0=bs[0], b1=bs[1], b2=bs[2],
                        kernel_sizes=ks, dilations=dils, tile=tl,
                        mxu_bf16=m, interpret=False,
                    ))
                )
                float(fn(x))
            except Exception as e:
                print(f"C={c} tile={tile} bf16={mx}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            fns[(tile, mx)] = fn
            print(f"compiled C={c} tile={tile} bf16={mx}", flush=True)
        times = {key: [] for key in fns}
        for i in range(1, args.iters + 1):
            for key, fn in fns.items():
                xx = x * (1 + 1e-3 * i)
                st = time.perf_counter()
                float(fn(xx))
                times[key].append(time.perf_counter() - st)
        for key in fns:
            med = float(np.median(times[key])) * 1e3
            print(f"C={c:3d} tile={str(key[0]):6s} bf16={key[1]}: "
                  f"{med:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
