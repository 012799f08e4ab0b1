"""Jitted training/eval steps.

The reference's hot loop (solver.py:101-114: forward, RSS loss, backward,
AdamW step) becomes a single donated, jit-compiled function — one XLA
program per step, no host round-trips. Optimizer is optax AdamW with the
reference's effective hyperparameters (train.py:41-45: lr and weight decay
forced from config on resume — automatic here since optax bakes them into
the update fn, not the state).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    constants: Any
    opt_state: Any


def create_optimizer(lr: float, weight_decay: float = 0.0) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
    )


def create_train_state(
    model, optimizer: optax.GradientTransformation, example_batch: Dict, rng
) -> TrainState:
    # init must run under jit: eager init dispatches every op separately,
    # which is pathological (and can hit op gaps) on remote backends
    @jax.jit
    def _init(rng, units, f0, volume, spk_id):
        return model.init(
            {"params": rng, "noise": jax.random.fold_in(rng, 1)},
            units, f0, volume, spk_id, infer=False,
        )

    variables = _init(
        rng,
        example_batch["units"],
        example_batch["f0"],
        example_batch["volume"],
        example_batch["spk_id"],
    )
    params = variables["params"]
    return TrainState(
        step=jnp.asarray(0, dtype=jnp.int32),
        params=params,
        constants=variables.get("constants", {}),
        opt_state=optimizer.init(params),
    )


def make_train_step(
    model,
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    remat: bool = False,
) -> Callable:
    """Returns jitted (state, batch, rng) -> (state, loss).

    remat=True rematerializes the forward during backprop (jax.checkpoint):
    trades FLOPs for HBM, enabling long-crop / large-batch training."""

    def forward(params, constants, units, f0, volume, spk_id, rng_noise):
        signal, _, _ = model.apply(
            {"params": params, "constants": constants},
            units, f0, volume, spk_id,
            infer=False,
            rngs={"noise": rng_noise},
        )
        return signal

    if remat:
        forward = jax.checkpoint(forward)

    train_step = _make_step_body(forward, loss_fn, optimizer)
    return jax.jit(train_step, donate_argnums=(0,))


def _make_step_body(forward, loss_fn, optimizer):
    def train_step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, jnp.ndarray]:
        step_rng = jax.random.fold_in(rng, state.step)
        rng_noise, rng_loss = jax.random.split(step_rng)

        def loss_of(params):
            signal = forward(
                params, state.constants, batch["units"], batch["f0"],
                batch["volume"], batch["spk_id"], rng_noise,
            )
            return loss_fn(signal, batch["audio"], rng_loss)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, loss

    return train_step


def make_train_step_multi(
    model,
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    remat: bool = False,
) -> Callable:
    """Returns jitted (state, stacked_batches, rng) -> (state, losses(K,)).

    `lax.scan` of K full optimizer steps over K pre-staged microbatches
    (every array in the batch dict carries a leading (K, ...) axis) inside
    ONE compiled XLA program. On remote/relay backends each dispatch has a
    fixed per-call latency floor (~10-25 ms measured, CLAUDE.md); the
    reference's one-step-per-loop-iteration structure (solver.py:101-114)
    pays it every step, this pays it once per K. RNG semantics match the
    single-step path exactly: the per-step key is fold_in(rng, state.step),
    and state.step increments inside the scan — so a K-step dispatch and K
    single-step dispatches draw identical noise/loss-scale randomness."""

    def forward(params, constants, units, f0, volume, spk_id, rng_noise):
        signal, _, _ = model.apply(
            {"params": params, "constants": constants},
            units, f0, volume, spk_id,
            infer=False,
            rngs={"noise": rng_noise},
        )
        return signal

    if remat:
        forward = jax.checkpoint(forward)

    step_body = _make_step_body(forward, loss_fn, optimizer)

    def multi_step(state: TrainState, batches: Dict, rng):
        def body(carry, batch):
            new_state, loss = step_body(carry, batch, rng)
            return new_state, loss

        state, losses = jax.lax.scan(body, state, batches)
        return state, losses

    return jax.jit(multi_step, donate_argnums=(0,))


def make_train_step_pool(
    model,
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    crop_frames: int,
    block: int,
    remat: bool = False,
) -> Callable:
    """Returns jitted (state, pool_arrays, idx, rng) -> (state, loss).

    Device-resident data path (data/device_pool.py): `pool_arrays` are the
    HBM-resident concatenated feature arrays (passed by reference — already
    on device, nothing is uploaded), `idx` the few-bytes crop indices from
    DevicePool.sample. The crop gather runs inside the same XLA program as
    the step, so the hot loop's host->device traffic drops from ~13 MB to
    ~200 B per step — the measured bottleneck on remote backends
    (docs/KERNELS.md round-5 training profile)."""
    from ..data.device_pool import gather_batch

    def forward(params, constants, units, f0, volume, spk_id, rng_noise):
        signal, _, _ = model.apply(
            {"params": params, "constants": constants},
            units, f0, volume, spk_id,
            infer=False,
            rngs={"noise": rng_noise},
        )
        return signal

    if remat:
        forward = jax.checkpoint(forward)

    step_body = _make_step_body(forward, loss_fn, optimizer)

    def pool_step(state: TrainState, pool_arrays, idx, rng):
        batch = gather_batch(pool_arrays, idx, crop_frames, block)
        return step_body(state, batch, rng)

    return jax.jit(pool_step, donate_argnums=(0,), static_argnames=())


def make_train_step_pool_multi(
    model,
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    crop_frames: int,
    block: int,
    remat: bool = False,
) -> Callable:
    """Pool + K-step scan combined: (state, pool_arrays, idx(K,B), rng) ->
    (state, losses(K,)).

    With the dataset resident in HBM the step runs in tens of ms, so the
    per-dispatch overhead (relay artifact ~10-25 ms/call) becomes a large
    FRACTION of wall-clock — exactly the regime where scanning K full
    optimizer steps (each gathering its own crops on device) per dispatch
    pays. Host traffic per dispatch: (K, B) index scalars. RNG/step
    semantics identical to K calls of the pool step."""
    from ..data.device_pool import gather_batch

    def forward(params, constants, units, f0, volume, spk_id, rng_noise):
        signal, _, _ = model.apply(
            {"params": params, "constants": constants},
            units, f0, volume, spk_id,
            infer=False,
            rngs={"noise": rng_noise},
        )
        return signal

    if remat:
        forward = jax.checkpoint(forward)

    step_body = _make_step_body(forward, loss_fn, optimizer)

    def pool_multi_step(state: TrainState, pool_arrays, idx, rng):
        def body(carry, idx_k):
            batch = gather_batch(pool_arrays, idx_k, crop_frames, block)
            new_state, loss = step_body(carry, batch, rng)
            return new_state, loss

        state, losses = jax.lax.scan(body, state, idx)
        return state, losses

    return jax.jit(pool_multi_step, donate_argnums=(0,))


def make_eval_step(model, mss_fn: Callable) -> Callable:
    """Returns jitted (variables, batch, rng) -> (signal, loss) for
    validation (deterministic multi-scale loss)."""

    @partial(jax.jit, static_argnames=())
    def eval_step(params, constants, batch, rng):
        signal, _, _ = model.apply(
            {"params": params, "constants": constants},
            batch["units"],
            batch["f0"],
            batch["volume"],
            batch["spk_id"],
            infer=True,
            rngs={"noise": rng},
        )
        loss = mss_fn(signal, batch["audio"])
        return signal, loss

    return eval_step
