"""Incremental real-time front-end: block plumbing must be exactly
equivalent to feeding the same feature stream through the engine at once,
and a sine input must produce voiced, finite output."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ddsp_svc_tpu.models import CombSubFast
from ddsp_svc_tpu.data.features import UnitsEncoder
from ddsp_svc_tpu.infer.realtime import IncrementalSession


SR, BS, FPB = 16000, 256, 8


@pytest.fixture(scope="module")
def session_parts():
    model = CombSubFast(
        sampling_rate=SR, block_size=BS, n_unit=256, n_spk=2,
        causal=True, frame_norm=True,
    )
    rng = np.random.default_rng(0)
    units = rng.standard_normal((1, 4, 256)).astype(np.float32)
    f0 = np.full((1, 4, 1), 200.0, np.float32)
    volume = rng.random((1, 4)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.key(0)},
        jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
        jnp.asarray([[1]]), noise=jnp.zeros((1, 4 * BS)),
    )
    enc = UnitsEncoder("hubertsoft", None, 16000, 320)
    return model, variables, enc


def _make_session(model, variables, enc, **kw):
    return IncrementalSession(
        model, variables, enc,
        spk_id=1, frames_per_block=FPB, context_time=0.5,
        f0_extractor="dio", threshold_db=-80.0, seed=7, **kw,
    )


def test_block_plumbing_matches_batch_engine(session_parts):
    model, variables, enc = session_parts
    sess = _make_session(model, variables, enc, record=True)

    rng = np.random.default_rng(3)
    t = np.arange(6 * FPB * BS) / SR
    audio = (0.4 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    audio += 0.01 * rng.standard_normal(audio.shape).astype(np.float32)

    outs = [
        sess.process_block(audio[i * FPB * BS: (i + 1) * FPB * BS])
        for i in range(6)
    ]
    got = np.concatenate(outs)

    # replay the exact recorded feature/noise stream through the engine
    from ddsp_svc_tpu.models.incremental import IncrementalCombSubFast

    eng = IncrementalCombSubFast(model, variables)
    state = eng.init_state(np.asarray([[1]]), batch=1)
    raw, _ = eng.process(
        state,
        jnp.asarray(np.concatenate(sess.recorded["units"], axis=1)),
        jnp.asarray(np.concatenate(sess.recorded["f0"], axis=1)),
        jnp.asarray(np.concatenate(sess.recorded["volume"], axis=1)),
        jnp.asarray(np.concatenate(sess.recorded["noise"], axis=1)),
    )
    ref = np.asarray(raw)[0] * np.concatenate(sess.recorded["mask"])
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_sine_input_produces_voiced_output(session_parts):
    model, variables, enc = session_parts
    sess = _make_session(model, variables, enc)
    t = np.arange(8 * FPB * BS) / SR
    audio = (0.4 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    outs = [
        sess.process_block(audio[i * FPB * BS: (i + 1) * FPB * BS])
        for i in range(8)
    ]
    out = np.concatenate(outs + [sess.flush()])
    assert np.isfinite(out).all()
    # once the lookahead+pipeline delay has passed, output must be live
    warm = (sess.lookahead_frames + 2 + FPB) * BS
    assert np.abs(out[warm:]).max() > 1e-6
    assert out.shape[-1] == 8 * FPB * BS + 2 * BS
