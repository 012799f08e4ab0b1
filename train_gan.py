#!/usr/bin/env python
"""Enhancer GAN fine-tuning CLI.

Fine-tunes the NSF-HiFiGAN enhancer adversarially on the dataset's
ground-truth audio (the reference ships the discriminators as dead code,
models.py:288-439 — here they are a drivable feature):

    python train_gan.py -c configs/combsub.yaml [--max-steps N]

Uses the `train.gan.*` config block (ddsp_svc_tpu/train/gan_solver.py for
the schema); the generator warm-starts from `enhancer.ckpt`. Checkpoints
G+D+optimizers to `<gan expdir>/gan_{step}.ckpt` (resume = rerun the same
command) and exports an Enhancer-loadable
`<gan expdir>/enhancer/model_{step|best}.ckpt` + config.json — point
`enhancer.ckpt` at it to use the fine-tuned vocoder.
"""
import argparse

from ddsp_svc_tpu.utils.config import load_config
from ddsp_svc_tpu.train.gan_solver import train_gan


def parse_args(args=None):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--max-steps", type=int, default=None,
                   help="override train.gan.max_steps")
    return p.parse_args(args)


def main(argv=None):
    cmd = parse_args(argv)
    args = load_config(cmd.config)
    state, expdir = train_gan(args, max_steps=cmd.max_steps)
    print(f" [*] GAN fine-tuning done at step {int(state.step)}; "
          f"checkpoints in {expdir}")
    return state, expdir


if __name__ == "__main__":
    main()
