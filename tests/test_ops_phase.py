"""Phase accumulator tests: reference test vectors (ddsp/core.py:54-97) plus
long-sequence accuracy vs float64 ground truth."""
import numpy as np
import jax.numpy as jnp

from ddsp_svc_tpu.ops import f0_to_rot


def test_f0_to_rot_dtype():
    fo = jnp.array([[1.0, 1.0, 1.0]], dtype=jnp.float32)
    assert f0_to_rot(fo, 1, precise=False).dtype == fo.dtype
    assert f0_to_rot(fo, 1, precise=True).dtype == fo.dtype


def test_f0_to_rot_stablefo():
    fo = jnp.array([[1.0, 1.0, 1.0]])
    rot_gt = np.array([[+0.25, +0.50, -0.25]])
    np.testing.assert_allclose(f0_to_rot(fo, 4), rot_gt, atol=1e-6)


def test_f0_to_rot_fm():
    fo = jnp.array([[1.0, 2.0, 3.0]])
    rot_gt = np.array([[+0.25, -0.25, -0.50]])
    np.testing.assert_allclose(f0_to_rot(fo, 4), rot_gt, atol=1e-6)


def test_f0_to_rot_init_phase():
    fo = jnp.array([[1.0, 1.0, 1.0]])
    init = jnp.array([np.pi])
    rot_gt = np.array([[-0.25, 0.00, +0.25]])
    np.testing.assert_allclose(f0_to_rot(fo, 4, initial_phase=init), rot_gt, atol=1e-6)


def test_f0_to_rot_fm_init_batch():
    fo = jnp.array([[1.0, 1.0, 1.0], [1.0, 2.0, 3.0]])
    init = jnp.array([np.pi, 0.0])
    rot_gt = np.array([[-0.25, 0.00, +0.25], [+0.25, -0.25, -0.50]])
    got = f0_to_rot(fo, 4, initial_phase=init, precise=True)
    np.testing.assert_allclose(got, rot_gt, atol=1e-5)


def _wrap(x):
    return x - np.round(x)


def test_long_sequence_precise_accuracy():
    """precise path must track fp64 cumsum over ~10 s of audio."""
    rng = np.random.default_rng(0)
    sr = 44100
    t = sr * 10
    f0 = (220.0 + 30.0 * rng.standard_normal(t)).astype(np.float32)
    gt = _wrap(np.cumsum(f0.astype(np.float64) / sr))
    got = np.asarray(f0_to_rot(jnp.asarray(f0)[None], sr, precise=True))[0]
    # compare on the circle (distance mod 1)
    err = np.abs(_wrap(got - gt))
    assert err.max() < 1e-5, err.max()


def test_long_sequence_fast_accuracy():
    """even the non-precise wrapped scan beats a raw fp32 cumsum by far."""
    rng = np.random.default_rng(1)
    sr = 44100
    t = sr * 5
    f0 = (300.0 + 50.0 * rng.standard_normal(t)).astype(np.float32)
    gt = _wrap(np.cumsum(f0.astype(np.float64) / sr))
    got = np.asarray(f0_to_rot(jnp.asarray(f0)[None], sr, precise=False))[0]
    err = np.abs(_wrap(got - gt))
    assert err.max() < 1e-3, err.max()


def test_parity_with_reference(ref_core):
    import torch

    rng = np.random.default_rng(2)
    f0 = (200.0 + 20.0 * rng.standard_normal((2, 4000))).astype(np.float32)
    init = rng.standard_normal(2).astype(np.float32)
    ref = ref_core.fo_to_rot(
        torch.from_numpy(f0), 44100, torch.from_numpy(init), precise=True
    ).numpy()
    got = np.asarray(
        f0_to_rot(jnp.asarray(f0), 44100, jnp.asarray(init), precise=True)
    )
    err = np.abs(_wrap(got - ref))
    assert err.max() < 1e-5, err.max()


def test_f0_to_rot_upsampled_matches_composed():
    """Closed-form frame-rate accumulator == f0_to_rot(upsample_frames(...))
    (precise path) to well below audio significance, including the
    last-frame-repeated edge and initial phase."""
    import numpy as np
    import jax.numpy as jnp
    from ddsp_svc_tpu.ops.phase import f0_to_rot, f0_to_rot_upsampled
    from ddsp_svc_tpu.ops.interp import upsample_frames

    rng = np.random.default_rng(11)
    b, f, block, sr = 3, 57, 64, 16000
    f0 = jnp.asarray(
        (80.0 + 700.0 * rng.random((b, f))).astype(np.float32)
    )
    init = jnp.asarray(rng.uniform(-np.pi, np.pi, (b,)).astype(np.float32))
    ref = f0_to_rot(
        upsample_frames(f0[..., None], block)[..., 0], sr, init, precise=True
    )
    got = f0_to_rot_upsampled(f0, block, sr, init)
    # compare on the circle (both wrapped to (-0.5, 0.5])
    d = np.asarray(got - ref)
    d = np.abs(d - np.round(d))
    assert d.max() < 2e-5, d.max()
