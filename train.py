#!/usr/bin/env python
"""Training CLI.

Usage: python train.py -c configs/combsub.yaml
Parity with /root/reference/train.py: builds the model from `model.type`,
AdamW from config lr/weight_decay, resumes from the newest checkpoint in
`env.expdir` if present (interrupt-and-resume / finetune workflow), then runs
the solver loop.
"""
import argparse

import jax

from ddsp_svc_tpu.utils.config import load_config
from ddsp_svc_tpu.models import build_model, RSSLoss
from ddsp_svc_tpu.data.dataset import get_data_loaders
from ddsp_svc_tpu.train import (
    create_optimizer,
    create_train_state,
    latest_checkpoint,
    restore_checkpoint,
    solver,
)
from ddsp_svc_tpu.train.step import TrainState


def parse_args():
    p = argparse.ArgumentParser(description="Train a DDSP-SVC-TPU model")
    p.add_argument("-c", "--config", type=str, required=True)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--no-data-parallel", action="store_true",
                   help="disable automatic DP sharding over local devices")
    p.add_argument("--n-model", type=int, default=1,
                   help="tensor-parallel axis size (devices = data x model)")
    # multi-host (pod) flags: replaces torch's single-GPU env.gpu_id
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    return p.parse_args()


def main():
    cmd = parse_args()
    args = load_config(cmd.config)
    if cmd.num_processes > 1:
        from ddsp_svc_tpu.parallel import init_distributed

        init_distributed(cmd.coordinator, cmd.num_processes, cmd.process_id)
    print(" > config:", cmd.config)
    print(" > devices:", jax.devices())

    model = build_model(args)
    optimizer = create_optimizer(
        lr=float(args.train.lr), weight_decay=float(args.train.weight_decay or 0.0)
    )
    loader_train, dataset_valid = get_data_loaders(args)

    # init from one example batch (static shapes)
    example = next(iter(loader_train.epoch(0)))
    batch = {k: example[k] for k in ("audio", "f0", "volume", "units", "spk_id")}
    state = create_train_state(model, optimizer, batch, jax.random.key(0))

    initial_step = 0
    ckpt = latest_checkpoint(args.env.expdir)
    if ckpt is not None:
        print(" [*] restoring checkpoint:", ckpt)
        initial_step, variables, opt_state = restore_checkpoint(
            ckpt, params_template=state.params, opt_state_template=state.opt_state
        )
        state = TrainState(
            step=state.step * 0 + initial_step,
            params=variables["params"],
            constants=variables.get("constants", state.constants),
            opt_state=opt_state if opt_state is not None else state.opt_state,
        )

    # multi-device: shard the state and every batch over a (data, model) mesh
    batch_transform = None
    solver_mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1 and not cmd.no_data_parallel:
        from ddsp_svc_tpu.parallel import (
            make_mesh, shard_batch, shard_train_state,
        )

        n_model = max(1, cmd.n_model)
        n_data = n_dev // n_model
        if int(args.train.batch_size) % n_data != 0:
            raise SystemExit(
                f" [x] batch_size {args.train.batch_size} must divide by the "
                f"data-parallel axis ({n_data})"
            )
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        print(f" > mesh: data={n_data} x model={n_model}")
        state = shard_train_state(state, mesh)
        batch_transform = lambda b, **kw: shard_batch(b, mesh, **kw)  # noqa: E731
        solver_mesh = mesh

    rss = RSSLoss(
        fft_min=int(args.loss.fft_min),
        fft_max=int(args.loss.fft_max),
        n_scale=int(args.loss.n_scale),
    )
    solver.train(
        args, initial_step, model, state, optimizer, rss,
        loader_train, dataset_valid, max_steps=cmd.max_steps,
        batch_transform=batch_transform, mesh=solver_mesh,
    )


if __name__ == "__main__":
    main()
