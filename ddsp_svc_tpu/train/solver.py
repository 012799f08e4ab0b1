"""Training/validation loops.

Capability parity with /root/reference/solver.py: epoch x batch loop over the
jitted train step, interval-based logging (`interval_log`) and validation +
checkpointing (`interval_val`), best-loss tracking, and a validation pass
that reports reconstruction loss, wall-clock RTF, *and* cross-speaker VC
audio using per-speaker mean-log-f0 transposition (solver.py:45-55):
    f0_vc = exp(tgt_lfo * log(f0) / src_lfo),  tgt = (src + 1) % n_spk (1-based)
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax

from .saver import Saver
from .step import (
    TrainState, make_train_step, make_train_step_multi,
    make_train_step_pool, make_train_step_pool_multi, make_eval_step,
)


def _pad_batch_to_bucket(batch: dict, block_size: int) -> tuple:
    """Pad a whole-utterance batch to the next power-of-two frame count so
    validation shapes hit the jit cache (variable-length utterances would
    otherwise compile one program per file). Returns (padded, true_frames)."""
    n = batch["f0"].shape[1]
    bucket = 1 << (int(n) - 1).bit_length()
    pad = bucket - n
    if pad == 0:
        return batch, n
    out = dict(batch)
    out["units"] = np.pad(batch["units"], ((0, 0), (0, pad), (0, 0)))
    out["f0"] = np.pad(batch["f0"], ((0, 0), (0, pad), (0, 0)), mode="edge")
    out["volume"] = np.pad(batch["volume"], ((0, 0), (0, pad)))
    t_pad = bucket * block_size - batch["audio"].shape[1]
    out["audio"] = np.pad(batch["audio"], ((0, 0), (0, max(t_pad, 0))))[
        :, : bucket * block_size
    ]
    return out, n


def test(args, model, state: TrainState, rss, dataset_valid, saver: Saver):
    """Validation: reconstruction + VC forward per utterance; returns mean loss."""
    eval_step = make_eval_step(model, rss.mss)
    lfo_path = os.path.join(args.data.train_path, "f0_stats.npy")
    lfo_stats = (
        np.load(lfo_path, allow_pickle=True).item()
        if os.path.isfile(lfo_path)
        else None
    )

    test_loss = 0.0
    rtf_all = []
    num = len(dataset_valid)
    import random as _random

    rng_item = _random.Random(0)
    for bidx in range(num):
        data = dataset_valid.get_item(bidx, rng_item)
        name = data["name"]
        batch = {
            "audio": data["audio"][None],
            "f0": data["f0"][None],
            "volume": data["volume"][None],
            "units": data["units"][None],
            "spk_id": data["spk_id"][None],
        }
        true_len = batch["audio"].shape[1]
        batch, true_frames = _pad_batch_to_bucket(batch, int(args.data.block_size))
        # reconstruction + RTF
        st = time.time()
        signal, loss = eval_step(
            state.params, state.constants, batch, jax.random.key(42)
        )
        signal = np.asarray(signal)[:, :true_len]  # forces completion
        run_time = time.time() - st
        song_time = true_len / args.data.sampling_rate
        rtf = run_time / song_time
        saver.log_info(f"{bidx}/{num} - {name} RTF: {rtf:.4f} | {run_time:.3f} / {song_time:.3f}")
        rtf_all.append(rtf)
        test_loss += float(loss)

        audio_logs = {
            f"{name}/gt.wav": batch["audio"][0][:true_len],
            f"{name}/pred.wav": signal[0],
        }

        # VC forward with speaker mean-log-f0 transposition
        if lfo_stats is not None and args.model.n_spk and args.model.n_spk > 1:
            src_spk = int(data["spk_id"][0])
            tgt_spk = (src_spk + 1) % args.model.n_spk
            tgt_spk = 1 if tgt_spk == 0 else tgt_spk
            if str(src_spk) in lfo_stats and str(tgt_spk) in lfo_stats:
                src_lfo = float(lfo_stats[str(src_spk)])
                tgt_lfo = float(lfo_stats[str(tgt_spk)])
                f0_vc = np.exp(
                    tgt_lfo * np.log(np.maximum(batch["f0"], 1e-8)) / src_lfo
                ).astype(np.float32)
                vc_batch = dict(batch, f0=f0_vc, spk_id=np.asarray([[tgt_spk]], dtype=np.int64))
                vc_sig, _ = eval_step(
                    state.params, state.constants, vc_batch, jax.random.key(43)
                )
                audio_logs[f"{name}/vc_{src_spk}_to_{tgt_spk}.wav"] = (
                    np.asarray(vc_sig)[0][:true_len]
                )

        saver.log_audio(audio_logs)

    test_loss /= max(num, 1)
    saver.log_info(f" [test_loss] test_loss: {test_loss}")
    saver.log_info(f" Real Time Factor: {np.mean(rtf_all) if rtf_all else float('nan')}")
    return test_loss


def train(
    args,
    initial_global_step: int,
    model,
    state: TrainState,
    optimizer,
    rss,
    loader_train,
    dataset_valid,
    max_steps: Optional[int] = None,
    batch_transform=None,
    mesh=None,
):
    """Main loop (solver.py:85-143 parity). Returns final TrainState.

    batch_transform: optional per-batch hook (e.g. mesh sharding for
    data-parallel training).

    train.steps_per_dispatch (K > 1): lax.scan K optimizer steps over K
    pre-staged microbatches per compiled call — one host->device dispatch
    per K steps instead of per step (the reference's loop structure,
    solver.py:101-114, pays the dispatch latency floor every step). RNG and
    step-count semantics are identical to K=1; log/val intervals are
    honored at dispatch boundaries (quantized up to K)."""
    saver = Saver(args, initial_global_step=initial_global_step)
    k_dispatch = int(getattr(args.train, "steps_per_dispatch", None) or 1)
    use_pool = bool(getattr(args.train, "data_on_device", None) or False)
    pool = None
    if use_pool:
        # device-resident data path (data/device_pool.py): the cached
        # feature store is staged into HBM once; the jitted step gathers
        # crops on device, so per-step host->device traffic is a few index
        # bytes instead of the full batch (the measured hot-loop bottleneck
        # on remote backends — docs/KERNELS.md round-5 training profile)
        if batch_transform is not None and mesh is None:
            raise ValueError(
                "train.data_on_device under data parallelism needs the "
                "mesh (solver.train(mesh=...)) so the pool can be "
                "replicated and the crop indices sharded"
            )
        from ..data.device_pool import DevicePool

        put = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # pool arrays replicated on every chip (an SVC dataset is
            # hundreds of MB — replication beats cross-chip gathers);
            # per-step crop indices shard over 'data'
            put = lambda x: jax.device_put(x, NamedSharding(mesh, P()))  # noqa: E731

        ds = getattr(loader_train, "dataset", None)
        if ds is None:  # PrefetchIterator wraps the BatchIterator
            ds = loader_train.inner.dataset
        pool = DevicePool(ds, int(args.data.block_size), device_put=put)
        saver.log_info(
            f" [pool] {len(pool)} files, {pool.nbytes() / 1e6:.0f} MB "
            "staged in device memory"
        )
        if k_dispatch > 1:
            # pool + K-step scan: with the dataset in HBM the step runs in
            # tens of ms, so the per-dispatch overhead dominates — scanning
            # K steps per call is a ~3x multiplier here (measured: pool K=1
            # 37 ms/step -> K=32 10.1 ms/step, docs/KERNELS.md)
            train_step = make_train_step_pool_multi(
                model, rss, optimizer, pool.crop_frames, pool.block,
                remat=bool(args.train.remat),
            )
        else:
            train_step = make_train_step_pool(
                model, rss, optimizer, pool.crop_frames, pool.block,
                remat=bool(args.train.remat),
            )
    elif k_dispatch > 1:
        train_step = make_train_step_multi(
            model, rss, optimizer, remat=bool(args.train.remat)
        )
    else:
        train_step = make_train_step(
            model, rss, optimizer, remat=bool(args.train.remat)
        )
    rng = jax.random.key(int(args.train.seed or 0) if args.train else 0)

    best_loss = np.inf
    num_batches = len(loader_train)
    micro: list = []  # pending microbatches for K-step dispatch

    def pool_epoch(epoch_idx):
        """Seeded per-epoch file shuffle + host-side crop index selection
        (same randomization contract as BatchIterator + get_item)."""
        import random as _random

        rng_l = _random.Random(f"{args.train.seed}:{epoch_idx}:pool")
        order = list(range(len(pool)))
        rng_l.shuffle(order)
        bsz = int(args.train.batch_size)
        for b in range(max(1, len(pool) // bsz)):
            files = [order[(b * bsz + i) % len(order)] for i in range(bsz)]
            yield pool.sample(files, rng_l)

    if use_pool:
        num_batches = max(1, len(pool) // int(args.train.batch_size))
    saver.log_info("======= start training =======")
    for epoch in range(args.train.epochs):
        epoch_iter = pool_epoch(epoch) if use_pool else loader_train.epoch(epoch)
        for batch_idx, data in enumerate(epoch_iter):
            if use_pool:
                if k_dispatch > 1:
                    micro.append(data)
                    if len(micro) < k_dispatch:
                        continue
                    data = {
                        k: np.stack([m[k] for m in micro]) for k in micro[0]
                    }
                    micro = []
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    spec = (P(None, "data") if k_dispatch > 1 else P("data"))
                    data = {
                        k: jax.device_put(v, NamedSharding(mesh, spec))
                        for k, v in data.items()
                    }
                for _ in range(k_dispatch):
                    saver.global_step_increment()
                state, loss = train_step(state, pool.arrays, data, rng)
                if k_dispatch > 1:
                    loss = loss[-1]
            else:
                batch = {k: data[k] for k in ("audio", "f0", "volume", "units", "spk_id")}
            if use_pool:
                pass
            elif k_dispatch > 1:
                # stack K host microbatches, then shard once with the data
                # axis at position 1 (behind the scan axis)
                micro.append(batch)
                if len(micro) < k_dispatch:
                    continue
                stacked = {
                    k: np.stack([m[k] for m in micro]) for k in micro[0]
                }
                micro = []
                if batch_transform is not None:
                    stacked = batch_transform(stacked, batch_axis=1)
                for _ in range(k_dispatch):
                    saver.global_step_increment()
                state, losses = train_step(state, stacked, rng)
                loss = losses[-1]
            else:
                if batch_transform is not None:
                    batch = batch_transform(batch)
                saver.global_step_increment()
                state, loss = train_step(state, batch, rng)

            if saver.global_step % args.train.interval_log == 0:
                loss_val = float(loss)
                saver.log_info(
                    "epoch: {} | {:3d}/{:3d} | {} | batch/s: {:.2f} | loss: {:.3f} | time: {} | step: {}".format(
                        epoch,
                        batch_idx,
                        num_batches,
                        args.env.expdir,
                        args.train.interval_log / max(saver.get_interval_time(), 1e-9),
                        loss_val,
                        saver.get_total_time(),
                        saver.global_step,
                    )
                )
                saver.log_value({"train/loss": loss_val})

            if saver.global_step % args.train.interval_val == 0:
                test_loss = test(args, model, state, rss, dataset_valid, saver)
                saver.log_info(f" --- <validation> --- \nloss: {test_loss:.3f}. ")
                saver.log_value({"validation/loss": test_loss})
                variables = {"params": state.params, "constants": state.constants}
                saver.save_model(variables, state.opt_state, postfix=f"{saver.global_step}")
                if test_loss < best_loss:
                    saver.log_info(" [V] best model updated.")
                    saver.save_model(variables, state.opt_state, postfix="best")
                    best_loss = test_loss

            if max_steps is not None and saver.global_step >= initial_global_step + max_steps:
                saver.finish()
                return state, saver
    if micro:
        # epochs exhausted with a partial K-dispatch pending: drain the
        # leftover microbatches through single steps (same RNG semantics —
        # the per-step key folds in state.step either way)
        if use_pool:
            single_step = make_train_step_pool(
                model, rss, optimizer, pool.crop_frames, pool.block,
                remat=bool(args.train.remat),
            )
            for idx in micro:
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    idx = {
                        k: jax.device_put(v, NamedSharding(mesh, P("data")))
                        for k, v in idx.items()
                    }
                saver.global_step_increment()
                state, loss = single_step(state, pool.arrays, idx, rng)
        else:
            single_step = make_train_step(
                model, rss, optimizer, remat=bool(args.train.remat)
            )
            for batch in micro:
                if batch_transform is not None:
                    batch = batch_transform(batch)
                saver.global_step_increment()
                state, loss = single_step(state, batch, rng)
        saver.log_info(
            f"drained {len(micro)} pending microbatches at end of training"
        )
    saver.finish()
    return state, saver
