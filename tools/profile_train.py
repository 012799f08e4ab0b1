#!/usr/bin/env python
"""Stage-level training-step profile on the real chip.

The round-4 roofline parked the train step at 0.5% MFU with a
"dispatch-bound" diagnosis; the round-5 steps_per_dispatch A/B disproved
that (K=4 is a wash). This isolates where the ~0.35 s actually goes:

  synth-fwd      CombSubFast forward only
  fwd+loss       forward + RSS loss value
  grad           jax.value_and_grad of the above
  full-step      grad + AdamW update (donated) — the production step
  loss-only      RSS loss on fixed signals (no synth)
  pcmer-fwd/grad Unit2Control (the PCmer stack) alone

Alternating execution order per iteration so relay drift hits every arm
equally. Run:  python tools/profile_train.py [--batch 24] [--bf16]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.models import CombSubFast, RSSLoss
    from ddsp_svc_tpu.train import (
        create_optimizer, create_train_state, make_train_step,
    )

    sr, block, n_unit, b = 44100, 512, 256, args.batch
    f = int(2.0 * sr / block)
    rng = np.random.default_rng(time.time_ns() % (2**32))
    batch = {
        "audio": rng.standard_normal((b, f * block)).astype(np.float32),
        "units": rng.standard_normal((b, f, n_unit)).astype(np.float32),
        "f0": (200 * rng.random((b, f, 1))).astype(np.float32),
        "volume": rng.random((b, f)).astype(np.float32),
        "spk_id": np.ones((b, 1), dtype=np.int64),
    }
    model = CombSubFast(sampling_rate=sr, block_size=block, n_unit=n_unit,
                        n_spk=100, bf16=args.bf16)
    optimizer = create_optimizer(5e-4)
    rss = RSSLoss(256, 2048, n_scale=4, n_buckets=8)
    state = create_train_state(model, optimizer, batch, jax.random.key(0))
    # deep-copy: the full-step arm DONATES `state`, which would delete the
    # buffers the other arms read
    params = jax.tree.map(jnp.array, state.params)
    constants = state.constants
    key = jax.random.key(1)

    def fwd(params, units, f0, volume, spk_id, noise_rng):
        sig, _, _ = model.apply(
            {"params": params, "constants": constants},
            units, f0, volume, spk_id, infer=False,
            rngs={"noise": noise_rng},
        )
        return sig

    def fwd_loss(params, units, f0, volume, spk_id, audio, noise_rng, loss_rng):
        return rss(fwd(params, units, f0, volume, spk_id, noise_rng),
                   audio, loss_rng)

    arms = {}
    arms["synth-fwd"] = jax.jit(
        lambda p, bt, k1: jnp.sum(fwd(p, bt["units"], bt["f0"], bt["volume"],
                                      bt["spk_id"], k1))
    )
    arms["fwd+loss"] = jax.jit(
        lambda p, bt, k1: fwd_loss(p, bt["units"], bt["f0"], bt["volume"],
                                   bt["spk_id"], bt["audio"], k1,
                                   jax.random.fold_in(k1, 7))
    )
    grad_fn = jax.value_and_grad(fwd_loss)
    arms["grad"] = jax.jit(
        lambda p, bt, k1: grad_fn(p, bt["units"], bt["f0"], bt["volume"],
                                  bt["spk_id"], bt["audio"], k1,
                                  jax.random.fold_in(k1, 7))[0]
    )
    step_fn = make_train_step(model, rss, optimizer)

    sig0 = jnp.asarray(
        rng.standard_normal((b, f * block)).astype(np.float32) * 0.2
    )
    arms["loss-only"] = jax.jit(
        lambda p, bt, k1: rss(sig0 * jnp.mean(bt["volume"]), bt["audio"], k1)
    )

    from ddsp_svc_tpu.nn.unit2control import Unit2Control

    u2c = Unit2Control(n_unit, 100, {"a": block + 1, "b": block + 1,
                                     "c": block + 1})
    u2c_vars = jax.jit(lambda: u2c.init(
        jax.random.key(0), jnp.asarray(batch["units"]),
        jnp.asarray(batch["f0"]), jnp.asarray(batch["volume"]),
        jnp.asarray(batch["volume"]), jnp.asarray(batch["spk_id"]))
    )()

    def u2c_loss(pv, bt):
        out = u2c.apply(
            {"params": pv, **{k: v for k, v in u2c_vars.items()
                              if k != "params"}},
            bt["units"], bt["f0"], bt["volume"], bt["volume"], bt["spk_id"],
            infer=False,
        )
        return sum(jnp.sum(v * v) for v in out.values())

    arms["pcmer-fwd"] = jax.jit(lambda p, bt, k1: u2c_loss(u2c_vars["params"], bt))
    arms["pcmer-grad"] = jax.jit(
        lambda p, bt, k1: jax.value_and_grad(u2c_loss)(
            u2c_vars["params"], bt)[0]
    )

    def jbatch(i):
        out = dict(batch)
        out["volume"] = batch["volume"] + 1e-6 * i
        return {k: jnp.asarray(v) for k, v in out.items()}

    # compile
    for name, fn in arms.items():
        _ = float(jnp.sum(fn(params, jbatch(0), key)))
        print(f"compiled {name}", flush=True)
    st0 = state
    st0, loss = step_fn(st0, jbatch(0), key)
    _ = float(loss)
    print("compiled full-step", flush=True)

    times = {name: [] for name in arms}
    times["full-step"] = []
    for i in range(1, args.iters + 1):
        bt = jbatch(i)
        for name, fn in arms.items():
            st = time.perf_counter()
            _ = float(jnp.sum(fn(params, bt, key)))
            times[name].append(time.perf_counter() - st)
        st = time.perf_counter()
        st0, loss = step_fn(st0, bt, key)
        _ = float(loss)
        times["full-step"].append(time.perf_counter() - st)

    full = float(np.median(times["full-step"])) * 1e3
    for name in ("synth-fwd", "fwd+loss", "grad", "full-step", "loss-only",
                 "pcmer-fwd", "pcmer-grad"):
        med = float(np.median(times[name])) * 1e3
        print(f"{name:10s}: {med:8.2f} ms  ({med / full * 100:5.1f}% of step)",
              flush=True)


if __name__ == "__main__":
    main()
