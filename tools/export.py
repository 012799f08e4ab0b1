#!/usr/bin/env python
"""AOT model export: serialize the jitted synthesizer forward to a portable
StableHLO artifact (jax.export) that serving systems can load and run
without the framework's Python model code.

    python tools/export.py -m exp/model_best.ckpt -o model.stablehlo \
        --frames 512 [--spk-mix "{1:0.5,2:0.5}"]

Load side:
    from jax import export
    fn = export.deserialize(open("model.stablehlo","rb").read()).call
    signal = fn(units, f0, volume, spk_id, noise)
"""
import argparse
import os
import sys
from ast import literal_eval

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_synth(model_path: str, out_path: str, frames: int = 512,
                 batch: int = 1, spk_mix_dict=None) -> str:
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ddsp_svc_tpu.models import load_model

    model, variables, args = load_model(model_path)
    block = int(args.data.block_size)
    n_unit = int(args.data.encoder_out_channels)

    def fwd(units, f0, volume, spk_id, noise):
        signal, _, _ = model.apply(
            variables, units, f0, volume, spk_id,
            spk_mix_dict=spk_mix_dict, infer=True, noise=noise,
        )
        return signal

    shapes = (
        jax.ShapeDtypeStruct((batch, frames, n_unit), jnp.float32),
        jax.ShapeDtypeStruct((batch, frames, 1), jnp.float32),
        jax.ShapeDtypeStruct((batch, frames), jnp.float32),
        jax.ShapeDtypeStruct((batch, 1), jnp.int64),
        jax.ShapeDtypeStruct((batch, frames * block), jnp.float32),
    )
    exported = jexport.export(jax.jit(fwd))(*shapes)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    print(f"[export] {out_path}: {len(blob)} bytes, "
          f"platforms={exported.platforms}")
    return out_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-m", "--model_path", required=True)
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--frames", type=int, default=512)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--spk-mix", type=str, default="None")
    args = p.parse_args()
    export_synth(
        args.model_path, args.output, frames=args.frames, batch=args.batch,
        spk_mix_dict=literal_eval(args.spk_mix),
    )


if __name__ == "__main__":
    main()
