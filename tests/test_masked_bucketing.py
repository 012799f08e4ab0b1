"""Length-masked bucket padding: a synthesizer forward on inputs padded to a
power-of-two frame bucket, with `valid_frames` set, must equal the
exact-length forward on the first valid samples (masked GroupNorm stats,
masked attention key sums, masked conv inputs, edge-replicated control tail,
zeroed excitations). This is what makes the offline pipeline's jit-bucketed
segments numerically identical to the reference's exact-length main.py run."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ddsp_svc_tpu.models import Sins, CombSub, CombSubFast

BLOCK = 256


def _model(mtype, causal=False):
    if mtype == "Sins":
        return Sins(sampling_rate=16000, block_size=BLOCK, n_harmonics=32,
                    n_mag_allpass=64, n_mag_noise=64, n_unit=256, n_spk=2,
                    causal=causal)
    if mtype == "CombSub":
        return CombSub(sampling_rate=16000, block_size=BLOCK, n_mag_allpass=64,
                       n_mag_harmonic=64, n_mag_noise=64, n_unit=256, n_spk=2,
                       causal=causal)
    return CombSubFast(sampling_rate=16000, block_size=BLOCK, n_unit=256,
                       n_spk=2, causal=causal)


@pytest.mark.parametrize("mtype,causal", [
    ("Sins", False), ("CombSub", False), ("CombSubFast", False),
    ("CombSubFast", True),
])
def test_masked_padding_matches_exact(mtype, causal):
    rng = np.random.default_rng(3)
    b, n, bucket = 1, 23, 32
    units = rng.standard_normal((b, n, 256)).astype(np.float32)
    f0 = (120 + 300 * rng.random((b, n, 1))).astype(np.float32)
    vol = rng.random((b, n)).astype(np.float32)
    spk = np.ones((b, 1), dtype=np.int64)
    noise = (rng.random((b, n * BLOCK)) * 2 - 1).astype(np.float32)

    model = _model(mtype, causal)
    variables = model.init(
        jax.random.key(0), jnp.asarray(units), jnp.asarray(f0),
        jnp.asarray(vol), jnp.asarray(spk), noise=jnp.asarray(noise))
    exact, _, _ = model.apply(
        variables, jnp.asarray(units), jnp.asarray(f0), jnp.asarray(vol),
        jnp.asarray(spk), infer=True, noise=jnp.asarray(noise))

    p = bucket - n
    got, _, _ = model.apply(
        variables,
        jnp.asarray(np.pad(units, ((0, 0), (0, p), (0, 0)))),
        jnp.asarray(np.pad(f0, ((0, 0), (0, p), (0, 0)), mode="edge")),
        jnp.asarray(np.pad(vol, ((0, 0), (0, p)))),
        jnp.asarray(spk), infer=True,
        noise=jnp.asarray(np.pad(noise, ((0, 0), (0, p * BLOCK)))),
        valid_frames=jnp.asarray(n, dtype=jnp.int32))

    got = np.asarray(got)[:, : n * BLOCK]
    ref = np.asarray(exact)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 5e-5


def test_jitted_synth_masked_bucket_matches_exact():
    """make_jitted_synth(mask_padding=True) end to end, incl. explicit
    noise injection and the pad==0 fast path."""
    from ddsp_svc_tpu.models.factory import make_jitted_synth

    rng = np.random.default_rng(5)
    model = _model("CombSubFast")
    b, n = 1, 19
    units = rng.standard_normal((b, n, 256)).astype(np.float32)
    f0 = (150 + 200 * rng.random((b, n, 1))).astype(np.float32)
    vol = rng.random((b, n)).astype(np.float32)
    spk = np.ones((b, 1), dtype=np.int64)
    noise = (rng.random((b, n * BLOCK)) * 2 - 1).astype(np.float32)
    variables = model.init(
        jax.random.key(0), jnp.asarray(units), jnp.asarray(f0),
        jnp.asarray(vol), jnp.asarray(spk), noise=jnp.asarray(noise))

    # the oracle is jitted too: jit-vs-eager float reassociation alone is
    # ~3e-4 rel with random-init exp() filters, and is not what this tests
    @jax.jit
    def exact_fwd(u, f, v, s, nz):
        sig, _, _ = model.apply(variables, u, f, v, s, infer=True, noise=nz)
        return sig

    ref = np.asarray(exact_fwd(
        jnp.asarray(units), jnp.asarray(f0), jnp.asarray(vol),
        jnp.asarray(spk), jnp.asarray(noise)))

    synth = make_jitted_synth(model, variables, mask_padding=True)
    got = synth(units, f0, vol, spk, jax.random.key(0), noise=noise)
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 5e-5

    # aligned length (pad == 0) takes the unmasked program; same contract
    n2 = 32
    units2 = rng.standard_normal((b, n2, 256)).astype(np.float32)
    f02 = (150 + 200 * rng.random((b, n2, 1))).astype(np.float32)
    vol2 = rng.random((b, n2)).astype(np.float32)
    noise2 = (rng.random((b, n2 * BLOCK)) * 2 - 1).astype(np.float32)
    ref2 = np.asarray(exact_fwd(
        jnp.asarray(units2), jnp.asarray(f02), jnp.asarray(vol2),
        jnp.asarray(spk), jnp.asarray(noise2)))
    got2 = synth(units2, f02, vol2, spk, jax.random.key(0), noise=noise2)
    assert np.abs(got2 - ref2).max() < 1e-5
