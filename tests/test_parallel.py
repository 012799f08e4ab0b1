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


ENH_H = {
    "sampling_rate": 16000, "num_mels": 8, "n_fft": 128, "win_size": 128,
    "hop_size": 32, "fmin": 40, "fmax": 8000,
    "upsample_rates": [4, 4, 2], "upsample_kernel_sizes": [8, 8, 4],
    "upsample_initial_channel": 16, "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5]] * 3,
}


def test_time_parallel_enhancer_matches_unsharded():
    """The dominant-FLOPs component (NSF-HiFiGAN, models.py:257-276) time-
    sharded over the mesh must match the single-device forward
    (VERDICT r03 #2: multi-chip previously covered only the DDSP synth)."""
    import jax.numpy as jnp
    from ddsp_svc_tpu.infer.enhancer import NsfHifiGAN
    from ddsp_svc_tpu.parallel.timeparallel import make_time_parallel_enhancer

    nsf = NsfHifiGAN(None, h=ENH_H)
    rng = np.random.default_rng(0)
    f = 64
    t = f * ENH_H["hop_size"]
    audio = jnp.asarray((0.1 * rng.standard_normal((1, t))).astype(np.float32))
    f0 = jnp.asarray((200 + 50 * rng.random((1, f))).astype(np.float32))
    ri = jnp.asarray(rng.random((1, 9)).astype(np.float32)).at[:, 0].set(0.0)

    ref = np.asarray(nsf._forward(nsf.variables, audio, f0, ri))
    mesh = make_mesh(n_data=8, n_model=1)
    fwd = make_time_parallel_enhancer(nsf, mesh)
    got = np.asarray(fwd(audio, f0, ri))
    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 1e-4, (
        np.abs(got - ref).max() / scale
    )


def test_enhancer_class_with_mesh_matches_unsharded():
    """Enhancer(mesh=...) (the streaming SvcCore integration point) routes
    its forward through the time-parallel path; full enhance() chain must
    match the single-device result."""
    from ddsp_svc_tpu.infer.enhancer import Enhancer

    rng = np.random.default_rng(1)
    sr, hop = 16000, 32
    t = 64 * 256
    audio = (0.1 * rng.standard_normal((1, t))).astype(np.float32)
    n_frames = t // 256 + 1
    f0 = (220.0 + 30.0 * rng.random((1, n_frames, 1))).astype(np.float32)
    ri = rng.random((1, 9)).astype(np.float32)
    ri[:, 0] = 0.0

    enh0 = Enhancer("nsf-hifigan", None, h=ENH_H)
    ref, sr_ref = enh0.enhance(audio, sr, f0, 256, adaptive_key=0, rand_ini=ri)
    mesh = make_mesh(n_data=8, n_model=1)
    enh1 = Enhancer("nsf-hifigan", None, h=ENH_H,
                    variables=enh0.enhancer.variables, mesh=mesh)
    got, sr_got = enh1.enhance(audio, sr, f0, 256, adaptive_key=0, rand_ini=ri)
    assert sr_ref == sr_got
    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 1e-4, (
        np.abs(got - ref).max() / scale
    )


def test_gan_step_dp_matches_single_device():
    """One D step + one G step of the enhancer GAN fine-tune, data-parallel
    over the 8-device mesh, must match the unsharded math (losses and
    updated params)."""
    import jax.numpy as jnp
    from ddsp_svc_tpu.infer.enhancer import NsfHifiGAN
    from ddsp_svc_tpu.train.gan import GanTrainer
    from ddsp_svc_tpu.ops import log_mel_spectrogram

    nsf = NsfHifiGAN(None, h=ENH_H)
    rng = np.random.default_rng(2)
    b, f = 8, 8
    t = f * int(np.prod(ENH_H["upsample_rates"]))
    batch = {
        "audio": jnp.asarray(
            (0.1 * rng.standard_normal((b, t))).astype(np.float32)),
        "f0": jnp.asarray(
            (200.0 + 50.0 * rng.random((b, f))).astype(np.float32)),
    }
    batch["mel"] = jnp.swapaxes(log_mel_spectrogram(
        batch["audio"], ENH_H["sampling_rate"], ENH_H["n_fft"],
        ENH_H["hop_size"], ENH_H["win_size"], ENH_H["num_mels"],
        ENH_H["fmin"], ENH_H["fmax"]), 1, 2)

    def run(mesh):
        tr = GanTrainer(nsf.model, ENH_H, mesh=mesh)
        st = tr.create_state(jax.random.key(1), batch["mel"], batch["f0"])
        st, d_logs = tr.step_d(st, dict(batch), jax.random.key(2))
        st, g_logs = tr.step_g(st, dict(batch), jax.random.key(3))
        return st, float(d_logs["d_loss"]), float(g_logs["g_loss"])

    st0, d0, g0 = run(None)
    st1, d1, g1 = run(make_mesh(n_data=8, n_model=1))
    assert abs(d1 - d0) / (abs(d0) + 1e-9) < 1e-4, (d0, d1)
    assert abs(g1 - g0) / (abs(g0) + 1e-9) < 1e-4, (g0, g1)
    flat0 = jax.tree_util.tree_leaves(st0.g_params)
    flat1 = jax.tree_util.tree_leaves(st1.g_params)
    for a, c in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-5, rtol=1e-4)


def test_dp_pool_step_matches_single_device(setup):
    """Device-resident data pool (train.data_on_device) under data
    parallelism: pool arrays replicated, crop indices sharded over 'data' —
    must match the single-device pool step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ddsp_svc_tpu.train import make_train_step_pool

    model, optimizer, batch, state0, rss = setup
    b, n_frames, block, n_unit = 8, 8, 256, 64
    rng = np.random.default_rng(4)
    n_pool = 40 * n_frames
    pool_np = {
        "units": rng.standard_normal((n_pool, n_unit)).astype(np.float16),
        "f0": (200 * rng.random(n_pool)).astype(np.float32),
        "volume": rng.random(n_pool).astype(np.float32),
        "audio": (0.2 * rng.standard_normal(n_pool * block)).astype(np.float16),
    }
    idx_np = {
        "feat_start": rng.integers(0, n_pool - n_frames, b).astype(np.int32),
        "unit_start": rng.integers(0, n_pool - n_frames, b).astype(np.int32),
        "spk_id": np.ones((b, 1), np.int64),
    }
    step = make_train_step_pool(model, rss, optimizer, n_frames, block)

    pool_single = {k: jnp.asarray(v) for k, v in pool_np.items()}
    state_single = jax.tree.map(jnp.array, state0)
    state_single, loss_single = step(state_single, pool_single, idx_np,
                                     jax.random.key(0))

    mesh = make_mesh(n_data=8, n_model=1)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    pool_dp = {k: jax.device_put(jnp.asarray(v), repl)
               for k, v in pool_np.items()}
    idx_dp = {k: jax.device_put(v, data) for k, v in idx_np.items()}
    state_dp = shard_train_state(jax.tree.map(jnp.array, state0), mesh)
    state_dp, loss_dp = step(state_dp, pool_dp, idx_dp, jax.random.key(0))

    np.testing.assert_allclose(float(loss_single), float(loss_dp), rtol=2e-4)
    for x, y in zip(jax.tree.leaves(state_single.params),
                    jax.tree.leaves(state_dp.params)):
        diff = np.abs(np.asarray(x) - np.asarray(y))
        assert np.quantile(diff, 0.99) < 1e-4, diff.max()
        assert diff.max() < 4e-3, diff.max()
