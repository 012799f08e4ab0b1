"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ddsp_svc_tpu.models import CombSubFast, RSSLoss
from ddsp_svc_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_train_state,
    param_shardings,
)
from ddsp_svc_tpu.train import create_optimizer, create_train_state, make_train_step


def _batch(b=8, n_frames=8, block=256, n_unit=64):
    rng = np.random.default_rng(0)
    return {
        "audio": rng.standard_normal((b, n_frames * block)).astype(np.float32),
        "units": rng.standard_normal((b, n_frames, n_unit)).astype(np.float32),
        "f0": (200 * rng.random((b, n_frames, 1))).astype(np.float32),
        "volume": rng.random((b, n_frames)).astype(np.float32),
        "spk_id": np.ones((b, 1), dtype=np.int64),
    }


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    model = CombSubFast(sampling_rate=16000, block_size=256, n_unit=64, n_spk=4)
    optimizer = create_optimizer(1e-3)
    batch = _batch()
    state = create_train_state(model, optimizer, batch, jax.random.key(0))
    rss = RSSLoss(128, 512, n_scale=2, n_buckets=4)
    return model, optimizer, batch, state, rss


def test_dp_step_matches_single_device(setup):
    """A data-parallel step over an 8-device mesh must match 1-device math."""
    model, optimizer, batch, state0, rss = setup
    step = make_train_step(model, rss, optimizer)

    state_single = jax.tree.map(jnp.array, state0)
    state_single, loss_single = step(state_single, batch, jax.random.key(0))

    mesh = make_mesh(n_data=8, n_model=1)
    state_dp = shard_train_state(jax.tree.map(jnp.array, state0), mesh)
    batch_dp = shard_batch(batch, mesh)
    state_dp, loss_dp = step(state_dp, batch_dp, jax.random.key(0))

    np.testing.assert_allclose(float(loss_single), float(loss_dp), rtol=2e-4)
    # Adam's first step amplifies reduction-order float noise to ~2*lr on
    # near-zero-gradient entries, so compare bulk tightly and tails loosely.
    a = jax.tree.leaves(state_single.params)
    b = jax.tree.leaves(state_dp.params)
    for x, y in zip(a, b):
        diff = np.abs(np.asarray(x) - np.asarray(y))
        assert np.quantile(diff, 0.99) < 1e-4, diff.max()
        assert diff.max() < 4e-3, diff.max()


def test_tp_step_matches_single_device(setup):
    """2-way data x 4-way tensor parallel step matches 1-device math."""
    model, optimizer, batch, state0, rss = setup
    step = make_train_step(model, rss, optimizer)

    state_single = jax.tree.map(jnp.array, state0)
    state_single, loss_single = step(state_single, batch, jax.random.key(0))

    mesh = make_mesh(n_data=2, n_model=4)
    state_tp = shard_train_state(jax.tree.map(jnp.array, state0), mesh)
    batch_tp = shard_batch(batch, mesh)
    state_tp, loss_tp = step(state_tp, batch_tp, jax.random.key(0))

    np.testing.assert_allclose(float(loss_single), float(loss_tp), rtol=2e-4)


def test_tp_rules_applied(setup):
    model, optimizer, batch, state0, rss = setup
    mesh = make_mesh(n_data=2, n_model=4)
    sh = param_shardings(state0.params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    specs = {
        "/".join(str(getattr(k, "key", k)) for k in kp): s.spec for kp, s in flat
    }
    qk = [k for k in specs if k.endswith("attn/to_q/kernel")]
    assert qk and all(specs[k] == jax.sharding.PartitionSpec(None, "model") for k in qk)
    # dense_out v has 3*(block+1)=771 columns — not divisible by 4, so the
    # divisibility guard must fall back to replication.
    vk = [k for k in specs if k.endswith("dense_out/v")]
    assert vk and all(specs[k] == jax.sharding.PartitionSpec() for k in vk)


def test_time_parallel_inference_matches_single_device(setup):
    """Frame-axis sharding over 8 devices must reproduce single-device
    output (GSPMD inserts halo/prefix/moment collectives)."""
    import jax.numpy as jnp
    from ddsp_svc_tpu.parallel.timeparallel import make_time_parallel_forward

    model, optimizer, _, state0, _ = setup
    variables = {"params": state0.params, "constants": state0.constants}

    rng = np.random.default_rng(7)
    b, n_frames, block, n_unit = 1, 64, 256, 64  # 64 frames / 8 shards
    units = jnp.asarray(rng.standard_normal((b, n_frames, n_unit)).astype(np.float32))
    f0 = jnp.asarray((200 * rng.random((b, n_frames, 1)) + 80).astype(np.float32))
    volume = jnp.asarray(rng.random((b, n_frames)).astype(np.float32))
    spk = jnp.asarray(np.ones((b, 1), dtype=np.int64))
    noise = jnp.asarray((rng.random((b, n_frames * block)) * 2 - 1).astype(np.float32))

    # single-device baseline in the same FFT mode the CPU-sharded path uses
    from ddsp_svc_tpu.ops import spectral

    spectral.set_fft_mode("dft")
    try:
        ref = np.asarray(
            model.apply(variables, units, f0, volume, spk, infer=True, noise=noise)[0]
        )
        mesh = make_mesh(n_data=8, n_model=1)
        fwd = make_time_parallel_forward(model, variables, mesh, axis="data")
        got = np.asarray(fwd(units, f0, volume, spk, noise))
    finally:
        spectral.set_fft_mode("fft")
    # sharded reductions reassociate float math and the exp() filters amplify
    # it; require agreement to 0.3% of the signal amplitude
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 3e-3, np.abs(got - ref).max() / scale


def test_make_jitted_synth_with_mesh_matches_unsharded(setup):
    """make_jitted_synth(mesh=...) time-shards each bucket-padded window
    over the mesh (multi-chip streaming, infer/streaming.py SvcCore); the
    cropped output must match the unsharded forward fed the identical
    noise draw."""
    import jax.numpy as jnp
    from ddsp_svc_tpu.models.factory import make_jitted_synth
    from ddsp_svc_tpu.ops import spectral

    model, _, _, state0, _ = setup
    variables = {"params": state0.params, "constants": state0.constants}

    rng = np.random.default_rng(11)
    b, n_frames, block, n_unit = 1, 24, 256, 64  # pads to a 32-frame bucket
    units = rng.standard_normal((b, n_frames, n_unit)).astype(np.float32)
    f0 = (200 * rng.random((b, n_frames, 1)) + 80).astype(np.float32)
    volume = rng.random((b, n_frames)).astype(np.float32)
    spk = np.ones((b, 1), dtype=np.int64)
    rngkey = jax.random.key(3)

    bucket = 32
    # the mesh path draws noise over the padded window; reproduce it exactly
    noise = jax.random.uniform(rngkey, (b, bucket * block),
                               minval=-1.0, maxval=1.0)
    spectral.set_fft_mode("dft")
    try:
        ref = np.asarray(model.apply(
            variables,
            jnp.asarray(np.pad(units, ((0, 0), (0, bucket - n_frames), (0, 0)))),
            jnp.asarray(np.pad(f0, ((0, 0), (0, bucket - n_frames), (0, 0)),
                               mode="edge")),
            jnp.asarray(np.pad(volume, ((0, 0), (0, bucket - n_frames)))),
            jnp.asarray(spk), infer=True, noise=noise,
        )[0])[:, : n_frames * block]

        mesh = make_mesh(n_data=8, n_model=1)
        synth = make_jitted_synth(model, variables, mesh=mesh, mesh_axis="data")
        got = synth(units, f0, volume, spk, rngkey)
    finally:
        spectral.set_fft_mode("fft")
    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 3e-3, np.abs(got - ref).max() / scale
