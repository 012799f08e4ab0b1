"""End-to-end training smoke test on a tiny synthetic dataset: feature
store layout, jitted steps, loss decrease, checkpoint save/resume parity."""
import os
import random

import numpy as np
import jax
import pytest

from ddsp_svc_tpu.utils.config import DotDict
from ddsp_svc_tpu.data.wavio import write_wav
from ddsp_svc_tpu.data.dataset import get_data_loaders
from ddsp_svc_tpu.models import build_model, RSSLoss
from ddsp_svc_tpu.train import (
    create_optimizer,
    create_train_state,
    make_train_step,
    save_checkpoint,
    restore_checkpoint,
    latest_checkpoint,
)

SR = 16000
HOP = 256
N_UNIT = 64


def _make_dataset(root, n_files=3, duration_sec=3.0, n_spk=2):
    rng = np.random.default_rng(0)
    for i in range(n_files):
        spk = 1 + (i % n_spk)
        t = int(duration_sec * SR)
        n_frames = t // HOP + 1
        tt = np.arange(t) / SR
        f0_hz = 150.0 + 50.0 * (i + 1)
        audio = (0.3 * np.sin(2 * np.pi * f0_hz * tt)).astype(np.float32)
        for sub in ("audio", "units", "f0", "volume"):
            os.makedirs(os.path.join(root, sub, str(spk)), exist_ok=True)
        write_wav(os.path.join(root, "audio", str(spk), f"u{i}.wav"), audio, SR)
        np.save(
            os.path.join(root, "units", str(spk), f"u{i}.0.npy"),
            rng.standard_normal((n_frames, N_UNIT)).astype(np.float32),
        )
        np.save(
            os.path.join(root, "f0", str(spk), f"u{i}.npy"),
            np.full((n_frames,), f0_hz, dtype=np.float32),
        )
        np.save(
            os.path.join(root, "volume", str(spk), f"u{i}.npy"),
            np.full((n_frames,), 0.2, dtype=np.float32),
        )
    stats = {str(s): float(np.log(200.0 + 50 * s)) for s in range(1, n_spk + 1)}
    np.save(os.path.join(root, "f0_stats.npy"), stats, allow_pickle=True)


def _args(tmp_path):
    return DotDict(
        {
            "data": {
                "train_path": str(tmp_path / "train"),
                "valid_path": str(tmp_path / "val"),
                "duration": 1.0,
                "block_size": HOP,
                "sampling_rate": SR,
                "encoder_out_channels": N_UNIT,
                "n_aunit": 0,
            },
            "model": {"type": "CombSubFast", "n_spk": 2, "c": False},
            "loss": {"fft_min": 128, "fft_max": 512, "n_scale": 2},
            "env": {"expdir": str(tmp_path / "exp")},
            "train": {
                "batch_size": 2,
                "cache_all_data": True,
                "cache_fp16": False,
                "epochs": 1,
                "interval_log": 1,
                "interval_val": 1000,
                "lr": 1e-3,
                "weight_decay": 0.0,
                "seed": 0,
            },
        }
    )


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    _make_dataset(str(root / "train"))
    _make_dataset(str(root / "val"), n_files=1)
    return root


def test_dataset_shapes(tiny_data):
    args = _args(tiny_data)
    loader, valid = get_data_loaders(args)
    batch = next(iter(loader.epoch(0)))
    n_frames = int(1.0 * SR / HOP)
    assert batch["audio"].shape == (2, n_frames * HOP)
    assert batch["units"].shape == (2, n_frames, N_UNIT)
    assert batch["f0"].shape == (2, n_frames, 1)
    assert batch["volume"].shape == (2, n_frames)
    assert batch["spk_id"].shape == (2, 1)
    item = valid.get_item(0, random.Random(0))
    assert item["audio"].shape[0] > 0


def test_train_loss_decreases(tiny_data):
    args = _args(tiny_data)
    loader, _ = get_data_loaders(args)
    model = build_model(args)
    optimizer = create_optimizer(1e-3)
    batch = {
        k: v
        for k, v in next(iter(loader.epoch(0))).items()
        if k != "name"
    }
    state = create_train_state(model, optimizer, batch, jax.random.key(0))
    rss = RSSLoss(128, 512, n_scale=2, n_buckets=4)
    step = make_train_step(model, rss, optimizer)
    rng = jax.random.key(0)
    losses = []
    for i in range(12):
        state, loss = step(state, batch, rng)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses


def test_checkpoint_roundtrip(tiny_data, tmp_path):
    args = _args(tiny_data)
    loader, _ = get_data_loaders(args)
    model = build_model(args)
    optimizer = create_optimizer(1e-3)
    batch = {k: v for k, v in next(iter(loader.epoch(0))).items() if k != "name"}
    state = create_train_state(model, optimizer, batch, jax.random.key(0))
    rss = RSSLoss(128, 512, n_scale=2, n_buckets=4)
    step = make_train_step(model, rss, optimizer)
    state, _ = step(state, batch, jax.random.key(0))

    ckpt_path = str(tmp_path / "model_1.ckpt")
    save_checkpoint(
        ckpt_path, 1,
        {"params": state.params, "constants": state.constants},
        state.opt_state,
    )
    assert latest_checkpoint(str(tmp_path)) == ckpt_path

    state2 = create_train_state(model, optimizer, batch, jax.random.key(9))
    step_r, variables, opt_state = restore_checkpoint(
        ckpt_path, params_template=state2.params, opt_state_template=state2.opt_state
    )
    assert step_r == 1
    # params restored exactly
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # next step from restored state matches continued training bitwise
    import jax.numpy as jnp
    from ddsp_svc_tpu.train.step import TrainState
    state_rest = TrainState(
        step=jnp.asarray(step_r, jnp.int32), params=variables["params"],
        constants=variables["constants"], opt_state=opt_state,
    )
    state_cont, loss_a = step(state, batch, jax.random.key(1))
    state_rest, loss_b = step(state_rest, batch, jax.random.key(1))
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)


def test_single_batch_overfit():
    """Overfitting one batch must drive the RSS loss far down — catches
    subtle gradient/loss bugs that unit tests miss."""
    rng = np.random.default_rng(7)
    b, n_frames, block, n_unit = 2, 8, 256, 64
    t = np.arange(n_frames * block) / SR
    audio = np.stack([
        0.3 * np.sin(2 * np.pi * 220 * t),
        0.3 * np.sin(2 * np.pi * 260 * t),
    ]).astype(np.float32)
    batch = {
        "audio": audio,
        "units": rng.standard_normal((b, n_frames, n_unit)).astype(np.float32),
        "f0": np.stack([
            np.full((n_frames, 1), 220.0), np.full((n_frames, 1), 260.0)
        ]).astype(np.float32),
        "volume": np.full((b, n_frames), 0.2, dtype=np.float32),
        "spk_id": np.asarray([[1], [2]], dtype=np.int64),
    }
    from ddsp_svc_tpu.models import CombSubFast

    model = CombSubFast(sampling_rate=SR, block_size=block, n_unit=n_unit, n_spk=2)
    optimizer = create_optimizer(3e-3)
    state = create_train_state(model, optimizer, batch, jax.random.key(0))
    rss = RSSLoss(128, 512, n_scale=2, n_buckets=4)
    step = make_train_step(model, rss, optimizer)
    rng_key = jax.random.key(0)
    first = None
    for i in range(150):
        state, loss = step(state, batch, rng_key)
        if i == 0:
            first = float(loss)
    last = float(loss)
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)
    assert last < 3.5, (first, last)


def test_prefetch_iterator_equivalence(tiny_data):
    """PrefetchIterator must yield the same batches as the plain iterator."""
    from ddsp_svc_tpu.data.dataset import PrefetchIterator, get_data_loaders

    args = _args(tiny_data)
    loader, _ = get_data_loaders(args)
    pre = PrefetchIterator(loader, depth=2)
    a = list(loader.epoch(3))
    b = list(pre.epoch(3))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        for k in ("audio", "units", "f0", "volume", "spk_id"):
            np.testing.assert_array_equal(x[k], y[k])


def test_async_checkpointer_roundtrip(tmp_path):
    """AsyncCheckpointer must produce byte-identical checkpoints to the sync
    writer, survive rapid back-to-back saves, and surface worker errors."""
    from ddsp_svc_tpu.train.checkpoint import (
        AsyncCheckpointer, restore_checkpoint, save_checkpoint,
    )

    rng = np.random.default_rng(0)
    variables = {
        "params": {"w": rng.standard_normal((64, 64)).astype(np.float32),
                   "b": rng.standard_normal((64,)).astype(np.float32)},
        "constants": {"proj": rng.standard_normal((8, 8)).astype(np.float32)},
    }
    sync_path = str(tmp_path / "sync.ckpt")
    save_checkpoint(sync_path, 7, variables)

    ac = AsyncCheckpointer()
    paths = []
    for i in range(5):  # exceed max_pending to exercise back-pressure
        p = str(tmp_path / f"async_{i}.ckpt")
        ac.save(p, 7, variables)
        paths.append(p)
    ac.wait()
    with open(sync_path, "rb") as f:
        ref = f.read()
    for p in paths:
        with open(p, "rb") as f:
            assert f.read() == ref

    step, got, _ = restore_checkpoint(paths[0])
    assert step == 7
    np.testing.assert_array_equal(got["params"]["w"], variables["params"]["w"])

    # a failing write (parent path is a regular file) must raise on wait()
    (tmp_path / "blocker").write_bytes(b"")
    ac.save(str(tmp_path / "blocker" / "x.ckpt"), 1, variables)
    with pytest.raises(RuntimeError):
        ac.wait()
    ac.close()


def test_multi_step_dispatch_matches_single_steps():
    """make_train_step_multi (lax.scan of K optimizer steps per dispatch,
    train.steps_per_dispatch) must reproduce K make_train_step calls: same
    rng fold-in by state.step, same losses/params/opt-state up to XLA
    fusion-order rounding (the scan body compiles to a differently-fused
    program than the standalone step; measured drift ~2e-5 over 3 steps)."""
    from ddsp_svc_tpu.models import CombSubFast
    from ddsp_svc_tpu.train import make_train_step_multi

    rng = np.random.default_rng(11)
    k, b, n_frames, block, n_unit = 3, 2, 8, 256, 64

    def batch_at(s):
        r = np.random.default_rng(100 + s)
        return {
            "audio": (0.3 * r.standard_normal((b, n_frames * block))).astype(np.float32),
            "units": r.standard_normal((b, n_frames, n_unit)).astype(np.float32),
            "f0": (100.0 + 200.0 * r.random((b, n_frames, 1))).astype(np.float32),
            "volume": r.random((b, n_frames)).astype(np.float32),
            "spk_id": np.asarray([[1], [2]], dtype=np.int64),
        }

    model = CombSubFast(sampling_rate=SR, block_size=block, n_unit=n_unit, n_spk=2)
    optimizer = create_optimizer(1e-3)
    state0 = create_train_state(model, optimizer, batch_at(0), jax.random.key(0))
    rss = RSSLoss(128, 512, n_scale=2, n_buckets=4)
    rng_key = jax.random.key(5)

    # K single-step dispatches
    step = make_train_step(model, rss, optimizer)
    state_a = state0
    losses_a = []
    for s in range(k):
        state_a, loss = step(state_a, batch_at(s), rng_key)
        losses_a.append(float(loss))

    # one K-step dispatch over the stacked microbatches
    state0b = create_train_state(model, optimizer, batch_at(0), jax.random.key(0))
    multi = make_train_step_multi(model, rss, optimizer)
    stacked = {
        key: np.stack([batch_at(s)[key] for s in range(k)])
        for key in batch_at(0)
    }
    state_b, losses_b = multi(state0b, stacked, rng_key)

    np.testing.assert_allclose(
        np.asarray(losses_b), np.asarray(losses_a), rtol=2e-4
    )
    assert int(state_b.step) == int(state_a.step) == k
    # Adam's g/(|g|+eps) amplifies fusion-order rounding into up-to-lr
    # moves on cancellation-level elements; bound drift at the lr scale (a sign flip moves an element 2*lr per step)
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-2, atol=5e-3
        )


def test_solver_steps_per_dispatch(tiny_data):
    """solver.train with train.steps_per_dispatch=2: the K-step dispatch path
    accumulates microbatches, steps the jitted scan, and keeps the
    global-step accounting consistent with max_steps."""
    from ddsp_svc_tpu.models import build_model as _build
    from ddsp_svc_tpu.train import solver

    args = _args(tiny_data)
    # NB: args.train returns a lazily-wrapped COPY — mutate the raw dict
    args["train"]["steps_per_dispatch"] = 2
    args["train"]["remat"] = None
    args["train"]["interval_log"] = 2
    args["train"]["epochs"] = 20
    loader, valid = get_data_loaders(args)
    model = _build(args)
    optimizer = create_optimizer(1e-3)
    batch = {k: v for k, v in next(iter(loader.epoch(0))).items() if k != "name"}
    state = create_train_state(model, optimizer, batch, jax.random.key(0))
    rss = RSSLoss(128, 512, n_scale=2, n_buckets=4)
    state, saver = solver.train(
        args, 0, model, state, optimizer, rss, loader, valid, max_steps=4
    )
    assert int(state.step) == 4
    assert saver.global_step == 4


def test_solver_steps_per_dispatch_drains_remainder(tiny_data):
    """Epochs exhausted with a partial K-dispatch pending: the leftover
    microbatches must still train (single-step drain), not be dropped."""
    from ddsp_svc_tpu.models import build_model as _build
    from ddsp_svc_tpu.train import solver

    args = _args(tiny_data)
    args["train"]["steps_per_dispatch"] = 4
    args["train"]["remat"] = None
    args["train"]["epochs"] = 1  # 1 epoch -> fewer than 4 batches pending
    loader, valid = get_data_loaders(args)
    n_batches = len(loader)
    assert n_batches < 4  # precondition: remainder path is exercised
    model = _build(args)
    optimizer = create_optimizer(1e-3)
    batch = {k: v for k, v in next(iter(loader.epoch(0))).items() if k != "name"}
    state = create_train_state(model, optimizer, batch, jax.random.key(0))
    rss = RSSLoss(128, 512, n_scale=2, n_buckets=4)
    state, saver = solver.train(
        args, 0, model, state, optimizer, rss, loader, valid
    )
    assert int(state.step) == n_batches
    assert saver.global_step == n_batches


def test_device_pool_step_matches_host_batch():
    """make_train_step_pool (device-resident data, on-device crop gather)
    must produce exactly the host-batch step's result for the same crops."""
    from ddsp_svc_tpu.data.device_pool import DevicePool, gather_batch
    from ddsp_svc_tpu.models import CombSubFast
    from ddsp_svc_tpu.train import make_train_step_pool

    import jax.numpy as jnp

    class FakeDataset:
        waveform_sec = 1.0
        sample_rate = SR
        hop_size = HOP
        n_aunit = 1
        pass

    rng = np.random.default_rng(5)
    ds = FakeDataset()
    ds.paths = ["1/a", "2/b"]
    ds.data_buffer = {}
    for i, rel in enumerate(ds.paths):
        nf = 120 + 30 * i
        ds.data_buffer[rel] = {
            "duration": nf * HOP / SR,
            "f0": (150.0 + 50 * i) * np.ones((nf, 1), np.float32),
            "volume": rng.random(nf).astype(np.float32),
            "audio": (0.2 * rng.standard_normal(nf * HOP)).astype(np.float16),
            "units": [rng.standard_normal((nf, N_UNIT)).astype(np.float16)
                      for _ in range(2)],
            "spk_id": np.asarray([i + 1], dtype=np.int64),
        }
    pool = DevicePool(ds, HOP)
    assert len(pool) == 2

    import random as _random

    idx = pool.sample([0, 1], _random.Random(3))
    crop = pool.crop_frames

    # the host batch the pool gather should reproduce
    host = jax.device_get(gather_batch(pool.arrays, idx, crop, HOP))
    for fi, pos in enumerate(idx["feat_start"]):
        rel = ds.paths[fi]
        start = int(pos - pool.feat_base[fi])
        buf = ds.data_buffer[rel]
        np.testing.assert_array_equal(
            host["audio"][fi],
            buf["audio"][start * HOP:(start + crop) * HOP].astype(np.float32))
        np.testing.assert_array_equal(
            host["f0"][fi, :, 0], buf["f0"][start:start + crop, 0])
    # units crop must come from the sampled variant
    for fi, upos in enumerate(idx["unit_start"]):
        variant = int(np.where(
            np.asarray(pool.unit_base[fi]) <= upos)[0][-1])
        start = int(upos - pool.unit_base[fi][variant])
        np.testing.assert_array_equal(
            host["units"][fi],
            ds.data_buffer[ds.paths[fi]]["units"][variant]
            [start:start + crop].astype(np.float32))

    # pool step == host step on the gathered batch
    model = CombSubFast(sampling_rate=SR, block_size=HOP, n_unit=N_UNIT, n_spk=2)
    optimizer = create_optimizer(1e-3)
    state_a = create_train_state(model, optimizer, host, jax.random.key(0))
    state_b = create_train_state(model, optimizer, host, jax.random.key(0))
    rss = RSSLoss(128, 512, n_scale=2, n_buckets=4)
    key = jax.random.key(2)

    host_step = make_train_step(model, rss, optimizer)
    state_a, loss_a = host_step(state_a, host, key)

    pool_step = make_train_step_pool(model, rss, optimizer, crop, HOP)
    state_b, loss_b = pool_step(state_b, pool.arrays, idx, key)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-3, atol=2e-5)


def test_solver_data_on_device(tiny_data):
    """solver.train with train.data_on_device: the pool path stages the
    cache in device memory, trains, checkpoints, and counts steps."""
    from ddsp_svc_tpu.models import build_model as _build
    from ddsp_svc_tpu.train import solver

    args = _args(tiny_data)
    args["train"]["data_on_device"] = True
    args["train"]["remat"] = None
    args["train"]["epochs"] = 20
    loader, valid = get_data_loaders(args)
    model = _build(args)
    optimizer = create_optimizer(1e-3)
    batch = {k: v for k, v in next(iter(loader.epoch(0))).items() if k != "name"}
    state = create_train_state(model, optimizer, batch, jax.random.key(0))
    rss = RSSLoss(128, 512, n_scale=2, n_buckets=4)
    state, saver = solver.train(
        args, 0, model, state, optimizer, rss, loader, valid, max_steps=5
    )
    assert int(state.step) == 5
    assert saver.global_step == 5


def test_pool_multi_step_matches_pool_single_steps():
    """make_train_step_pool_multi (pool + K-step scan) must reproduce K
    pool-step calls up to fusion-order rounding."""
    from ddsp_svc_tpu.models import CombSubFast
    from ddsp_svc_tpu.train import (
        make_train_step_pool, make_train_step_pool_multi,
    )

    import jax.numpy as jnp

    k, b, n_frames, block, n_unit = 3, 2, 8, 256, 64
    rng = np.random.default_rng(9)
    n_pool = 30 * n_frames
    pool = {
        "units": jnp.asarray(rng.standard_normal((n_pool, n_unit)).astype(np.float16)),
        "f0": jnp.asarray((150 + 100 * rng.random(n_pool)).astype(np.float32)),
        "volume": jnp.asarray(rng.random(n_pool).astype(np.float32)),
        "audio": jnp.asarray((0.2 * rng.standard_normal(n_pool * block)).astype(np.float16)),
    }
    idx_k = {
        "feat_start": rng.integers(0, n_pool - n_frames, (k, b)).astype(np.int32),
        "unit_start": rng.integers(0, n_pool - n_frames, (k, b)).astype(np.int32),
        "spk_id": np.ones((k, b, 1), np.int64),
    }
    model = CombSubFast(sampling_rate=SR, block_size=block, n_unit=n_unit, n_spk=2)
    optimizer = create_optimizer(1e-3)
    example = {
        "audio": np.zeros((b, n_frames * block), np.float32),
        "units": np.zeros((b, n_frames, n_unit), np.float32),
        "f0": np.ones((b, n_frames, 1), np.float32),
        "volume": np.zeros((b, n_frames), np.float32),
        "spk_id": np.ones((b, 1), np.int64),
    }
    rss = RSSLoss(128, 512, n_scale=2, n_buckets=4)
    key = jax.random.key(6)

    single = make_train_step_pool(model, rss, optimizer, n_frames, block)
    state_a = create_train_state(model, optimizer, example, jax.random.key(0))
    losses_a = []
    for s in range(k):
        idx = {kk: v[s] for kk, v in idx_k.items()}
        state_a, loss = single(state_a, pool, idx, key)
        losses_a.append(float(loss))

    multi = make_train_step_pool_multi(model, rss, optimizer, n_frames, block)
    state_b = create_train_state(model, optimizer, example, jax.random.key(0))
    state_b, losses_b = multi(state_b, pool, idx_k, key)

    np.testing.assert_allclose(np.asarray(losses_b), np.asarray(losses_a),
                               rtol=2e-4)
    assert int(state_b.step) == int(state_a.step) == k
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-2, atol=5e-3)


def test_solver_data_on_device_with_k_dispatch(tiny_data):
    """solver.train with data_on_device + steps_per_dispatch=2: the combined
    pool+scan path trains and keeps step accounting consistent."""
    from ddsp_svc_tpu.models import build_model as _build
    from ddsp_svc_tpu.train import solver

    args = _args(tiny_data)
    args["train"]["data_on_device"] = True
    args["train"]["steps_per_dispatch"] = 2
    args["train"]["remat"] = None
    args["train"]["epochs"] = 30
    loader, valid = get_data_loaders(args)
    model = _build(args)
    optimizer = create_optimizer(1e-3)
    batch = {k: v for k, v in next(iter(loader.epoch(0))).items() if k != "name"}
    state = create_train_state(model, optimizer, batch, jax.random.key(0))
    rss = RSSLoss(128, 512, n_scale=2, n_buckets=4)
    state, saver = solver.train(
        args, 0, model, state, optimizer, rss, loader, valid, max_steps=6
    )
    assert int(state.step) == 6
    assert saver.global_step == 6
