"""Incremental streaming exactness: the state-carrying engine must
reproduce the batch forward of a causal+frame_norm CombSubFast."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ddsp_svc_tpu.models import CombSubFast
from ddsp_svc_tpu.models.incremental import IncrementalCombSubFast


@pytest.fixture(scope="module")
def setup():
    bs, n_frames, n_unit = 256, 24, 64
    model = CombSubFast(
        sampling_rate=16000, block_size=bs, n_unit=n_unit, n_spk=4,
        causal=True, frame_norm=True,
    )
    rng = np.random.default_rng(0)
    units = rng.standard_normal((1, n_frames, n_unit)).astype(np.float32)
    f0 = (150 + 100 * rng.random((1, n_frames, 1))).astype(np.float32)
    volume = rng.random((1, n_frames)).astype(np.float32)
    spk = np.asarray([[2]], dtype=np.int64)
    noise = (rng.random((1, n_frames * bs)) * 2 - 1).astype(np.float32)
    variables = model.init(
        {"params": jax.random.key(0)},
        jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
        jnp.asarray(spk), noise=jnp.asarray(noise),
    )
    return model, variables, units, f0, volume, spk, noise, bs, n_frames


def _stream_noise(noise, bs):
    """Frame j carries interval j-1's noise: shift right one block."""
    shifted = np.zeros_like(noise)
    shifted[:, bs:] = noise[:, :-bs]
    return shifted


def test_incremental_matches_batch(setup):
    model, variables, units, f0, volume, spk, noise, bs, n_frames = setup
    ref = np.asarray(
        model.apply(
            variables, jnp.asarray(units), jnp.asarray(f0),
            jnp.asarray(volume), jnp.asarray(spk), infer=True,
            noise=jnp.asarray(noise),
        )[0]
    )

    eng = IncrementalCombSubFast(model, variables)
    state = eng.init_state(spk, batch=1)
    stream_noise = _stream_noise(noise, bs)
    audio, state = eng.process(
        state,
        jnp.asarray(units),
        jnp.asarray(f0[:, :, 0]),
        jnp.asarray(volume),
        jnp.asarray(stream_noise),
    )
    tail, _ = eng.flush(
        state, noise_last=jnp.asarray(noise[:, (n_frames - 1) * bs:])
    )
    got = np.concatenate([np.asarray(audio), np.asarray(tail)], axis=-1)[:, 2 * bs:]
    assert got.shape == ref.shape, (got.shape, ref.shape)
    scale = np.abs(ref).max() + 1e-9
    err = np.abs(got - ref).max() / scale
    # incremental state accumulation reassociates float sums vs the batch
    # chunked scan; drift stays ~-60 dB relative over the clip
    assert err < 1e-3, err


def test_incremental_chunked_equals_single_pass(setup):
    """Feeding the same frames in multiple chunks must be state-equivalent."""
    model, variables, units, f0, volume, spk, noise, bs, n_frames = setup
    eng = IncrementalCombSubFast(model, variables)
    sn = _stream_noise(noise, bs)

    state = eng.init_state(spk, batch=1)
    full, _ = eng.process(
        state, jnp.asarray(units), jnp.asarray(f0[:, :, 0]),
        jnp.asarray(volume), jnp.asarray(sn),
    )

    state = eng.init_state(spk, batch=1)
    parts = []
    split = n_frames // 3
    for lo, hi in ((0, split), (split, 2 * split), (2 * split, n_frames)):
        blk, state = eng.process(
            state,
            jnp.asarray(units[:, lo:hi]),
            jnp.asarray(f0[:, lo:hi, 0]),
            jnp.asarray(volume[:, lo:hi]),
            jnp.asarray(sn[:, lo * bs: hi * bs]),
        )
        parts.append(np.asarray(blk))
    chunked = np.concatenate(parts, axis=-1)
    np.testing.assert_allclose(chunked, np.asarray(full), atol=1e-5)
