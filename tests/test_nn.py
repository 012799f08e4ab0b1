"""Unit tests for nn building blocks and losses."""
import numpy as np
import jax
import jax.numpy as jnp

from ddsp_svc_tpu.nn import causal_linear_attention, linear_attention
from ddsp_svc_tpu.models import RSSLoss, sss_loss, CombSubFast


def _naive_causal(q, k, v, eps=1e-6):
    """O(T^2) reference for the causal linear attention contract
    (pcmer.py:170-188)."""
    b, h, t, m = q.shape
    d = v.shape[-1]
    out = np.zeros((b, h, t, d), dtype=np.float64)
    s = np.zeros((b, h, m, d), dtype=np.float64)
    ksum = np.zeros((b, h, m), dtype=np.float64)
    for i in range(t):
        s += np.einsum("bhm,bhd->bhmd", k[:, :, i], v[:, :, i])
        ksum += k[:, :, i]
        denom = np.einsum("bhm,bhm->bh", q[:, :, i], ksum + eps)
        out[:, :, i] = np.einsum("bhm,bhmd->bhd", q[:, :, i], s) / denom[..., None]
    return out


def test_causal_linear_attention_matches_naive():
    rng = np.random.default_rng(0)
    b, h, t, m, d = 1, 2, 300, 24, 16
    # positive features, as produced by the softmax kernel
    q = rng.random((b, h, t, m)).astype(np.float32) + 0.1
    k = rng.random((b, h, t, m)).astype(np.float32) + 0.1
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)
    ref = _naive_causal(q.astype(np.float64), k.astype(np.float64), v.astype(np.float64))
    got = np.asarray(
        causal_linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), chunk=64)
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_causal_prefix_property():
    """Causal attention of a prefix equals the prefix of the full output."""
    rng = np.random.default_rng(1)
    b, h, t, m, d = 1, 1, 256, 16, 8
    q = rng.random((b, h, t, m)).astype(np.float32) + 0.1
    k = rng.random((b, h, t, m)).astype(np.float32) + 0.1
    v = rng.standard_normal((b, h, t, d)).astype(np.float32)
    full = np.asarray(causal_linear_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    half = np.asarray(
        causal_linear_attention(
            jnp.asarray(q[:, :, :100]), jnp.asarray(k[:, :, :100]), jnp.asarray(v[:, :, :100])
        )
    )
    np.testing.assert_allclose(half, full[:, :, :100], atol=1e-5)


def test_rss_loss_jits_and_is_finite():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    rss = RSSLoss(256, 2048, n_scale=4, n_buckets=6)
    f = jax.jit(rss)
    v1 = f(x, y, jax.random.key(0))
    v2 = f(x, y, jax.random.key(1))
    assert np.isfinite(float(v1)) and np.isfinite(float(v2))
    assert float(rss(x, x, jax.random.key(0))) < 1e-5  # identical signals
    assert np.isfinite(float(rss.mss(x, y)))


def test_sss_loss_matches_formula():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 2048)).astype(np.float32)
    y = rng.standard_normal((1, 2048)).astype(np.float32)
    from ddsp_svc_tpu.ops import spectrogram

    st = np.asarray(spectrogram(jnp.asarray(x), 256)) + 1e-7
    sp = np.asarray(spectrogram(jnp.asarray(y), 256)) + 1e-7
    conv = np.mean(
        np.linalg.norm((st - sp).reshape(1, -1), axis=1)
        / np.linalg.norm((st + sp).reshape(1, -1), axis=1)
    )
    logt = np.mean(np.abs(np.log(st) - np.log(sp)))
    got = float(sss_loss(jnp.asarray(x), jnp.asarray(y), 256))
    np.testing.assert_allclose(got, conv + logt, rtol=1e-4)


def test_training_gradients_flow():
    """infer=False forward + RSS loss has finite gradients for all params."""
    rng = np.random.default_rng(4)
    b, n_frames, block = 2, 8, 512
    units = jnp.asarray(rng.standard_normal((b, n_frames, 256)).astype(np.float32))
    f0 = jnp.asarray((200 * rng.random((b, n_frames, 1))).astype(np.float32))
    vol = jnp.asarray(rng.random((b, n_frames)).astype(np.float32))
    spk = jnp.asarray(np.ones((b, 1), dtype=np.int64))
    audio = jnp.asarray(rng.standard_normal((b, n_frames * block)).astype(np.float32))
    noise = jnp.asarray(
        (rng.random((b, n_frames * block)) * 2 - 1).astype(np.float32)
    )

    model = CombSubFast(sampling_rate=44100, block_size=block, n_unit=256, n_spk=4)
    variables = model.init({"params": jax.random.key(0)}, units, f0, vol, spk, noise=noise)
    rss = RSSLoss(256, 2048, n_scale=2, n_buckets=4)

    def loss_fn(params):
        sig, _, _ = model.apply(
            {"params": params, "constants": variables["constants"]},
            units, f0, vol, spk, infer=False, noise=noise,
        )
        return rss(sig, audio, jax.random.key(1))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)


def test_make_jitted_synth_bucketing():
    """Bucket-padded jitted synth must match the direct forward on the
    unpadded length (padding uses edge f0, zero units/volume; the causal
    region is unaffected... for non-causal attention normalization the sums
    include pad frames, so require close, not bitwise)."""
    from ddsp_svc_tpu.models import CombSubFast
    from ddsp_svc_tpu.models.factory import make_jitted_synth

    rng = np.random.default_rng(9)
    bs, n_frames, n_unit = 256, 24, 64  # pads to 32-frame bucket
    model = CombSubFast(sampling_rate=16000, block_size=bs, n_unit=n_unit,
                        n_spk=2, causal=True, frame_norm=True)
    units = rng.standard_normal((1, n_frames, n_unit)).astype(np.float32)
    f0 = (200 * rng.random((1, n_frames, 1)) + 80).astype(np.float32)
    vol = rng.random((1, n_frames)).astype(np.float32)
    spk = np.ones((1, 1), dtype=np.int64)
    noise = (rng.random((1, n_frames * bs)) * 2 - 1).astype(np.float32)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.asarray(units), jnp.asarray(f0),
        jnp.asarray(vol), jnp.asarray(spk), noise=jnp.asarray(noise),
    )
    # direct jitted forward with the same rng stream and padding
    rngkey = jax.random.key(5)
    ref_fn = jax.jit(lambda u, f, v, s_, r: model.apply(
        variables, u, f, v, s_, infer=True, rngs={"noise": r})[0])
    ref = np.asarray(ref_fn(
        jnp.asarray(np.pad(units, ((0,0),(0,8),(0,0)))),
        jnp.asarray(np.pad(f0, ((0,0),(0,8),(0,0)), mode="edge")),
        jnp.asarray(np.pad(vol, ((0,0),(0,8)))),
        jnp.asarray(spk), rngkey,
    ))[:, : n_frames * bs]
    synth = make_jitted_synth(model, variables)
    got = synth(units, f0, vol, spk, rngkey)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_causal_linear_attention_grads_finite_with_chunk_padding():
    """Regression: T not a multiple of the scan chunk pads q/k/v with zeros;
    the padded positions' 0-denominator division must not leak NaN into the
    k/v gradients through the division VJP."""
    from ddsp_svc_tpu.nn.pcmer import causal_linear_attention

    rng = np.random.default_rng(0)
    b, h, t, m, d = 2, 4, 32, 266, 64  # t << default chunk of 128
    q = jnp.asarray(np.abs(rng.standard_normal((b, h, t, m))).astype(np.float32)) * 1e-3 + 1e-6
    k = jnp.asarray(np.abs(rng.standard_normal((b, h, t, m))).astype(np.float32)) * 1e-3 + 1e-6
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))

    grads = jax.grad(
        lambda q, k, v: jnp.sum(causal_linear_attention(q, k, v) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for name, g in zip("qkv", grads):
        assert np.isfinite(np.asarray(g)).all(), f"nonfinite grad wrt {name}"
