"""Pallas kernel correctness (interpret mode on CPU) vs XLA reference."""
import numpy as np
import jax
import jax.numpy as jnp

from ddsp_svc_tpu.ops.exciters import oscillator_bank
from ddsp_svc_tpu.ops.pallas_kernels import oscillator_bank_pallas


def test_oscillator_bank_pallas_matches_xla():
    rng = np.random.default_rng(0)
    b, f, h, block = 2, 6, 128, 64
    phase = jnp.asarray(
        (rng.random((b, f * block)) * 2 * np.pi - np.pi).astype(np.float32)
    )
    amps = jnp.asarray((rng.random((b, f, h)) * 0.1).astype(np.float32))
    ref = oscillator_bank(phase, amps, block)
    got = oscillator_bank_pallas(phase, amps, block, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_oscillator_bank_pallas_nonlane_harmonics():
    """h < 128 pads to the lane width; results must be unaffected."""
    rng = np.random.default_rng(1)
    b, f, h, block = 1, 4, 60, 32
    phase = jnp.asarray(
        (rng.random((b, f * block)) * 2 * np.pi - np.pi).astype(np.float32)
    )
    amps = jnp.asarray((rng.random((b, f, h)) * 0.1).astype(np.float32))
    ref = oscillator_bank(phase, amps, block)
    got = oscillator_bank_pallas(phase, amps, block, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_dft_magnitude_matches_fft():
    from ddsp_svc_tpu.ops.pallas_kernels import dft_magnitude_pallas

    rng = np.random.default_rng(2)
    for n in (256, 1024):
        frames = jnp.asarray(rng.standard_normal((37, n)).astype(np.float32))
        ref = np.abs(np.fft.rfft(np.asarray(frames), n))
        got = np.asarray(dft_magnitude_pallas(frames, n, True))
        np.testing.assert_allclose(got, ref, atol=2e-3)


def test_dft_magnitude_gradient():
    import jax
    from ddsp_svc_tpu.ops.pallas_kernels import dft_magnitude_pallas

    rng = np.random.default_rng(3)
    n = 256
    frames = jnp.asarray(rng.standard_normal((8, n)).astype(np.float32))

    def loss_pallas(fr):
        return jnp.sum(jnp.log(dft_magnitude_pallas(fr, n, True) + 1e-7))

    def loss_fft(fr):
        return jnp.sum(jnp.log(jnp.abs(jnp.fft.rfft(fr, n)) + 1e-7))

    g1 = np.asarray(jax.grad(loss_pallas)(frames))
    g2 = np.asarray(jax.grad(loss_fft)(frames))
    np.testing.assert_allclose(g1, g2, atol=2e-3)


def test_spectrogram_mxu_backend_matches():
    from ddsp_svc_tpu.ops import spectral

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))
    ref = np.asarray(spectral.spectrogram(x, 256))
    spectral.set_mag_backend("mxu")
    try:
        got = np.asarray(spectral.spectrogram(x, 256))
    finally:
        spectral.set_mag_backend("fft")
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_ltv_fir_pallas_backend_matches_xla():
    """fft_convolve's Pallas MXU DFT path (forced, interpret on CPU) must
    match the XLA FFT path through the full frequency_filter — static-Hann,
    all-pass (complex magnitudes), and dynamic-window variants — and
    produce the same gradients (custom VJP)."""
    from ddsp_svc_tpu.ops import fft_filter
    from ddsp_svc_tpu.ops.fft_filter import frequency_filter

    rng = np.random.default_rng(7)
    b, t, n_frames, n_mag = 2, 4096, 8, 65
    audio = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
    mags = jnp.asarray(rng.random((b, n_frames, n_mag)).astype(np.float32))
    phase = jnp.asarray(
        (rng.random((b, n_frames, n_mag)) - 0.5).astype(np.float32)
    )
    half_width = jnp.asarray(
        (20.0 + 50.0 * rng.random((b, n_frames, 1))).astype(np.float32)
    )
    cases = [
        dict(magnitudes=mags, hann_windowed=True),
        dict(magnitudes=jnp.exp(1j * np.pi * phase.astype(jnp.complex64)),
             hann_windowed=False),
        dict(magnitudes=mags, hann_windowed=True,
             half_width_frames=half_width),
    ]
    for kw in cases:
        ref = np.asarray(frequency_filter(audio, **kw))
        fft_filter.set_conv_backend("pallas")
        try:
            got = np.asarray(frequency_filter(audio, **kw))
        finally:
            fft_filter.set_conv_backend("auto")
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / scale < 2e-4, (
            kw.get("hann_windowed"), np.abs(got - ref).max() / scale
        )

    def loss(mags, backend):
        fft_filter.set_conv_backend(backend)
        try:
            return jnp.sum(frequency_filter(audio, magnitudes=mags) ** 2)
        finally:
            fft_filter.set_conv_backend("auto")

    g_ref = np.asarray(jax.grad(lambda m: loss(m, "xla"))(mags))
    g_got = np.asarray(jax.grad(lambda m: loss(m, "pallas"))(mags))
    scale = np.abs(g_ref).max() + 1e-9
    assert np.abs(g_got - g_ref).max() / scale < 2e-4


def _trio_params(rng, ks, dils, c):
    ws, bs = [], []
    for k in ks:
        w = rng.standard_normal((len(dils), 2, k, c, c)).astype(np.float32)
        ws.append(jnp.asarray(w * (2.0 / (k * c)) ** 0.5))
        bs.append(jnp.asarray(
            (rng.standard_normal((len(dils), 2, c)) * 0.01).astype(np.float32)
        ))
    return ws, bs


def test_fused_resblocks_matches_reference():
    from ddsp_svc_tpu.ops.pallas_kernels import (
        fused_resblocks_pallas, resblocks_reference,
    )

    rng = np.random.default_rng(4)
    ks, dils = (3, 7, 11), (1, 3, 5)
    for c, t in ((16, 700), (32, 512)):
        x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
        ws, bs = _trio_params(rng, ks, dils, c)
        ref = resblocks_reference(x, ws, bs, ks, dils)
        # fp32 MXU path: bitwise-close; tile smaller than T to cross tiles
        got = fused_resblocks_pallas(
            x, *ws, *bs, kernel_sizes=ks, dilations=dils, tile=256,
            mxu_bf16=False, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
        )


def test_fused_resblocks_matches_flax_trio():
    """The Pallas trio must equal three flax ResBlock1 modules averaged,
    with weights read from the same param tree layout the Generator uses."""
    import flax.linen as nn
    from ddsp_svc_tpu.nn.nsf_hifigan import ResBlock1
    from ddsp_svc_tpu.ops.pallas_kernels import fused_resblocks_pallas

    rng = np.random.default_rng(5)
    ks, dils, c, t = (3, 7, 11), (1, 3, 5), 16, 384
    x = jnp.asarray(rng.standard_normal((1, t, c)).astype(np.float32))

    class Trio(nn.Module):
        @nn.compact
        def __call__(self, x):
            xs = None
            for j, k in enumerate(ks):
                r = ResBlock1(c, k, dils, name=f"resblock_0_{j}")(x)
                xs = r if xs is None else xs + r
            return xs / len(ks)

    m = Trio()
    v = m.init(jax.random.key(0), x)
    ref = m.apply(v, x)

    ws, bs = [], []
    for j in range(3):
        p = v["params"][f"resblock_0_{j}"]
        ws.append(jnp.stack([
            jnp.stack([p[f"conv1_{n}"]["kernel"], p[f"conv2_{n}"]["kernel"]])
            for n in range(len(dils))
        ]))
        bs.append(jnp.stack([
            jnp.stack([p[f"conv1_{n}"]["bias"], p[f"conv2_{n}"]["bias"]])
            for n in range(len(dils))
        ]))
    got = fused_resblocks_pallas(
        x, *ws, *bs, kernel_sizes=ks, dilations=dils, tile=128,
        mxu_bf16=False, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_fused_resblocks_gradient_matches_reference():
    from ddsp_svc_tpu.ops.pallas_kernels import (
        fused_resblocks_pallas, resblocks_reference,
    )

    rng = np.random.default_rng(6)
    ks, dils, c, t = (3, 7, 11), (1, 3, 5), 16, 256
    x = jnp.asarray(rng.standard_normal((1, t, c)).astype(np.float32))
    ws, bs = _trio_params(rng, ks, dils, c)

    def loss_fused(x, ws, bs):
        y = fused_resblocks_pallas(
            x, *ws, *bs, kernel_sizes=ks, dilations=dils, tile=128,
            mxu_bf16=False, interpret=True,
        )
        return jnp.sum(y**2)

    def loss_ref(x, ws, bs):
        return jnp.sum(resblocks_reference(x, ws, bs, ks, dils) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ws, bs)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-3, rtol=3e-3
        )


def test_log_mel_mxu_backend_matches():
    """The MXU DFT mel frontend must match the jnp.fft path (log domain)."""
    from ddsp_svc_tpu.ops import spectral

    rng = np.random.default_rng(8)
    x = jnp.asarray((rng.standard_normal((2, 4096)) * 0.2).astype(np.float32))
    args = (16000, 512, 128, 512, 16, 40.0, 8000.0)
    ref = np.asarray(spectral.log_mel_spectrogram(x, *args))
    spectral.set_mag_backend("mxu")
    try:
        got = np.asarray(spectral.log_mel_spectrogram(x, *args))
    finally:
        spectral.set_mag_backend("auto")
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_fused_resblock_chain_matches_reference():
    """Single-resblock chain kernel (wide-stage path) == reference chain."""
    from ddsp_svc_tpu.ops.pallas_kernels import (
        fused_resblock_chain_pallas, resblocks_reference,
    )

    rng = np.random.default_rng(12)
    k, dils, c, t = 7, (1, 3, 5), 16, 500
    x = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((3, 2, k, c, c)).astype(np.float32)
        * (2.0 / (k * c)) ** 0.5
    )
    b = jnp.asarray((rng.standard_normal((3, 2, c)) * 0.01).astype(np.float32))
    ref = resblocks_reference(x, (w,), (b,), (k,), dils)
    got = fused_resblock_chain_pallas(
        x, w, b, k, dilations=dils, tile=256, mxu_bf16=False, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
    )


def test_harmonic_source_pallas_matches_fused():
    """Kernel (interpret) vs the XLA sine-bank formulation, rand phases."""
    from ddsp_svc_tpu.nn.nsf_hifigan import (
        _source_phase, harmonic_source_fused,
    )
    from ddsp_svc_tpu.ops.pallas_kernels import harmonic_source_pallas

    rng = np.random.default_rng(7)
    b, f, upp, sr, h = 2, 5, 128, 44100, 9
    f0 = jnp.asarray((100 + 500 * rng.random((b, f))).astype(np.float32))
    rand_ini = jnp.asarray(
        rng.random((b, h)).astype(np.float32)
    ).at[:, 0].set(0.0)
    w = jnp.asarray(rng.standard_normal(h).astype(np.float32))
    bias = jnp.float32(0.03)
    ref = harmonic_source_fused(f0, upp, sr, rand_ini, w, bias)[..., 0]

    start, rad = _source_phase(f0, upp, sr, rand_ini, h - 1)
    got = harmonic_source_pallas(start, rad, w, bias, upp, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_log_mel_mxu_bf16_tracks_fp32():
    """bf16-input MXU DFT mel (staged-bf16 inference path) stays within the
    bf16 rounding class of the fp32 transform in the log-mel domain."""
    from ddsp_svc_tpu.ops import spectral

    rng = np.random.default_rng(9)
    x = jnp.asarray((rng.standard_normal((2, 4096)) * 0.2).astype(np.float32))
    args = (16000, 512, 128, 512, 16, 40.0, 8000.0)
    ref = np.asarray(spectral.log_mel_spectrogram(x, *args))
    spectral.set_mag_backend("mxu")
    try:
        got = np.asarray(
            spectral.log_mel_spectrogram(x, *args, mxu_bf16=True)
        )
    finally:
        spectral.set_mag_backend("auto")
    # log-domain absolute error ~ relative magnitude error (~2^-8 class)
    assert float(np.max(np.abs(got - ref))) < 0.1
    assert float(np.mean(np.abs(got - ref))) < 0.01


def test_fused_stage_matches_reference():
    """Fused stage kernel (up-conv + source conv + trio) == XLA reference."""
    from ddsp_svc_tpu.ops.pallas_kernels import (
        fused_stage_pallas, stage_reference,
    )

    rng = np.random.default_rng(11)
    b, t_in, c_in, c = 2, 96, 16, 8
    u, k_up, s_src = 2, 4, 4
    p = (k_up - u) // 2
    t_out = t_in * u
    ks, dils = (3, 7, 11), (1, 3, 5)
    x_pre = jnp.asarray(rng.standard_normal((b, t_in, c_in)).astype(np.float32))
    har = jnp.asarray(
        rng.standard_normal((b, t_out * s_src, 1)).astype(np.float32) * 0.1
    )
    up_k = jnp.asarray(
        (rng.standard_normal((k_up, c_in, c)) * 0.2).astype(np.float32)
    )
    up_b = jnp.asarray((rng.standard_normal(c) * 0.05).astype(np.float32))
    nc_k = jnp.asarray(
        (rng.standard_normal((2 * s_src, 1, c)) * 0.2).astype(np.float32)
    )
    nc_b = jnp.asarray((rng.standard_normal(c) * 0.05).astype(np.float32))
    ws, bs = [], []
    for k in ks:
        ws.append(jnp.asarray(
            (rng.standard_normal((3, 2, k, c, c)) * (1.5 / (k * c)) ** 0.5
             ).astype(np.float32)
        ))
        bs.append(jnp.asarray(
            (rng.standard_normal((3, 2, c)) * 0.02).astype(np.float32)
        ))
    ref = stage_reference(x_pre, har, up_k, up_b, nc_k, nc_b, ws, bs,
                          ks, dils, u, p, s_src)
    got = fused_stage_pallas(
        x_pre, har, up_k, up_b, nc_k, nc_b, *ws, *bs,
        u, p, s_src, kernel_sizes=ks, dilations=dils, tile=128,
        mxu_bf16=False, interpret=True,
    )
    assert got.shape == ref.shape == (b, t_out, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_fused_stage_last_stage_geometry():
    """ksrc=1 / s_src=1 (final stage) and non-dividing tile tail."""
    from ddsp_svc_tpu.ops.pallas_kernels import (
        fused_stage_pallas, stage_reference,
    )

    rng = np.random.default_rng(12)
    b, t_in, c_in, c = 1, 70, 16, 8
    u, k_up, s_src = 2, 4, 1
    p = (k_up - u) // 2
    t_out = t_in * u
    ks, dils = (3, 7, 11), (1, 3, 5)
    x_pre = jnp.asarray(rng.standard_normal((b, t_in, c_in)).astype(np.float32))
    har = jnp.asarray(
        rng.standard_normal((b, t_out, 1)).astype(np.float32) * 0.1
    )
    up_k = jnp.asarray(
        (rng.standard_normal((k_up, c_in, c)) * 0.2).astype(np.float32)
    )
    up_b = jnp.asarray((rng.standard_normal(c) * 0.05).astype(np.float32))
    nc_k = jnp.asarray((rng.standard_normal((1, 1, c)) * 0.2).astype(np.float32))
    nc_b = jnp.asarray((rng.standard_normal(c) * 0.05).astype(np.float32))
    ws, bs = [], []
    for k in ks:
        ws.append(jnp.asarray(
            (rng.standard_normal((3, 2, k, c, c)) * (1.5 / (k * c)) ** 0.5
             ).astype(np.float32)
        ))
        bs.append(jnp.asarray(
            (rng.standard_normal((3, 2, c)) * 0.02).astype(np.float32)
        ))
    ref = stage_reference(x_pre, har, up_k, up_b, nc_k, nc_b, ws, bs,
                          ks, dils, u, p, s_src)
    got = fused_stage_pallas(
        x_pre, har, up_k, up_b, nc_k, nc_b, *ws, *bs,
        u, p, s_src, kernel_sizes=ks, dilations=dils, tile=128,
        mxu_bf16=False, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_combsub_spectral_kernel_matches_ref():
    """Fused CombSubFast spectral chain (interpret) vs the plain-jnp
    reference, including row/bin padding (rows not a multiple of 128)."""
    from ddsp_svc_tpu.ops.pallas_kernels import (
        combsub_spectral_pallas, _combsub_spectral_ref,
    )

    rng = np.random.default_rng(11)
    n_fft, rows = 256, 37  # bins = 129 -> one padded bin block
    bins = n_fft // 2 + 1
    tooth = jnp.asarray(rng.standard_normal((rows, n_fft)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((rows, n_fft)).astype(np.float32))
    hm = jnp.asarray((rng.standard_normal((rows, bins)) * 0.3).astype(np.float32))
    hp = jnp.asarray(rng.standard_normal((rows, bins)).astype(np.float32))
    nm = jnp.asarray((rng.standard_normal((rows, bins)) * 0.3 - 3).astype(np.float32))
    ref = np.asarray(_combsub_spectral_ref(tooth, noise, hm, hp, nm, n_fft))
    got = np.asarray(combsub_spectral_pallas(
        tooth, noise, hm, hp, nm, n_fft, False, True
    ))
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 2e-5


def test_combsub_spectral_kernel_gradient():
    """The analytic Pallas backward (interpret) must match differentiating
    the XLA reference, for every input (excitations + all three controls),
    including row/bin padding."""
    from ddsp_svc_tpu.ops.pallas_kernels import (
        combsub_spectral_pallas, _combsub_spectral_ref,
    )

    rng = np.random.default_rng(12)
    n_fft, rows = 128, 5  # rows pad 5 -> 128; bins = 65 -> one padded block
    bins = n_fft // 2 + 1
    tooth = jnp.asarray(rng.standard_normal((rows, n_fft)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((rows, n_fft)).astype(np.float32))
    hm = jnp.asarray((rng.standard_normal((rows, bins)) * 0.3).astype(np.float32))
    hp = jnp.asarray(rng.standard_normal((rows, bins)).astype(np.float32))
    nm = jnp.asarray((rng.standard_normal((rows, bins)) * 0.3 - 3).astype(np.float32))

    def loss(fn):
        return lambda a, n, m, p, q: jnp.sum(
            fn(a, n, m, p, q) ** 2
            * jnp.cos(jnp.arange(n_fft, dtype=jnp.float32))[None, :]
        )

    grads_k = jax.grad(
        loss(lambda *xs: combsub_spectral_pallas(*xs, n_fft, False, True)),
        argnums=(0, 1, 2, 3, 4),
    )(tooth, noise, hm, hp, nm)
    grads_r = jax.grad(
        loss(lambda *xs: _combsub_spectral_ref(*xs, n_fft)),
        argnums=(0, 1, 2, 3, 4),
    )(tooth, noise, hm, hp, nm)
    for name, gk, gr in zip(("tooth", "noise", "hm", "hp", "nm"),
                            grads_k, grads_r):
        gk, gr = np.asarray(gk), np.asarray(gr)
        scale = np.abs(gr).max() + 1e-9
        assert np.abs(gk - gr).max() / scale < 2e-5, (
            name, np.abs(gk - gr).max() / scale
        )


def test_performer_attention_kernel_matches_xla():
    """Fused FAVOR+ attention (interpret) vs softmax_kernel +
    linear_attention, fp32, including the m -> 384 feature padding."""
    from ddsp_svc_tpu.ops.pallas_kernels import (
        performer_attention_pallas, performer_attention_reference,
    )
    from ddsp_svc_tpu.nn.pcmer import gaussian_orthogonal_random_matrix

    rng = np.random.default_rng(21)
    b, h, t, d = 2, 3, 128, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    proj = jnp.asarray(gaussian_orthogonal_random_matrix(266, d, seed=3))
    ref = np.asarray(performer_attention_reference(q, k, v, proj))
    got = np.asarray(performer_attention_pallas(
        q, k, v, proj, mxu_bf16=False, interpret=True
    ))
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 2e-5, (
        np.abs(got - ref).max() / scale
    )


def test_performer_attention_kernel_masked():
    """valid_frames masking in the fused kernel == XLA path's key-feature
    mask; the first valid_frames output rows must agree (padded rows are
    meaningless in both)."""
    from ddsp_svc_tpu.ops.pallas_kernels import performer_attention_pallas
    from ddsp_svc_tpu.nn.pcmer import (
        gaussian_orthogonal_random_matrix, softmax_kernel, linear_attention,
    )

    rng = np.random.default_rng(23)
    b, h, t, d, n = 2, 3, 128, 64, 77
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    proj = jnp.asarray(gaussian_orthogonal_random_matrix(266, d, seed=5))
    qf = softmax_kernel(q, proj, is_query=True)
    kf = softmax_kernel(k, proj, is_query=False)
    mask = (jnp.arange(t) < n).astype(kf.dtype)
    ref = np.asarray(linear_attention(qf, kf * mask[None, None, :, None], v))
    got = np.asarray(performer_attention_pallas(
        q, k, v, proj, mxu_bf16=False, interpret=True,
        valid_frames=jnp.asarray(n, jnp.int32),
    ))
    scale = np.abs(ref[:, :, :n]).max() + 1e-9
    assert np.abs(got[:, :, :n] - ref[:, :, :n]).max() / scale < 2e-5, (
        np.abs(got[:, :, :n] - ref[:, :, :n]).max() / scale
    )
    # and full-length masking degenerates to the unmasked kernel
    full = np.asarray(performer_attention_pallas(
        q, k, v, proj, mxu_bf16=False, interpret=True,
        valid_frames=jnp.asarray(t, jnp.int32),
    ))
    unmasked = np.asarray(performer_attention_pallas(
        q, k, v, proj, mxu_bf16=False, interpret=True,
    ))
    np.testing.assert_allclose(full, unmasked, rtol=1e-6, atol=1e-6)


def test_performer_attention_kernel_masked_vector():
    """Per-item (B,) valid_frames vector: each batch row's program reads its
    own length from SMEM; rows must match per-row scalar-masked calls."""
    from ddsp_svc_tpu.ops.pallas_kernels import performer_attention_pallas
    from ddsp_svc_tpu.nn.pcmer import gaussian_orthogonal_random_matrix

    rng = np.random.default_rng(29)
    b, h, t, d = 3, 2, 128, 64
    lengths = [128, 90, 37]
    q = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, t, d)).astype(np.float32))
    proj = jnp.asarray(gaussian_orthogonal_random_matrix(266, d, seed=7))
    got = np.asarray(performer_attention_pallas(
        q, k, v, proj, interpret=True,
        valid_frames=jnp.asarray(lengths, jnp.int32),
    ))
    for i, n in enumerate(lengths):
        ref = np.asarray(performer_attention_pallas(
            q[i:i+1], k[i:i+1], v[i:i+1], proj, interpret=True,
            valid_frames=jnp.asarray(n, jnp.int32),
        ))[0]
        scale = np.abs(ref[:, :n]).max() + 1e-9
        err = np.abs(got[i, :, :n] - ref[:, :n]).max() / scale
        assert err < 1e-6, (i, n, err)


def test_pcmer_fused_attention_valid_frames_model_path():
    """PCmer fused path now accepts valid_frames: bucket-padded fused
    inference must match the XLA masked fallback on the valid prefix."""
    from ddsp_svc_tpu.nn.pcmer import PCmer

    rng = np.random.default_rng(24)
    t, n = 128, 90
    x = jnp.asarray(rng.standard_normal((2, t, 64)).astype(np.float32))
    vf = jnp.asarray(n, jnp.int32)
    ref_mod = PCmer(num_layers=2, num_heads=2, dim_model=64,
                    fused_attention=False)
    v = ref_mod.init(jax.random.key(0), x)
    ref = np.asarray(ref_mod.apply(v, x, infer=True, valid_frames=vf))
    fused_mod = PCmer(num_layers=2, num_heads=2, dim_model=64,
                      fused_attention="force")
    got = np.asarray(fused_mod.apply(v, x, infer=True, valid_frames=vf))
    scale = np.abs(ref[:, :n]).max() + 1e-9
    assert np.abs(got[:, :n] - ref[:, :n]).max() / scale < 2e-5, (
        np.abs(got[:, :n] - ref[:, :n]).max() / scale
    )


def test_pcmer_fused_attention_model_path():
    """PCmer with fused_attention='force' (interpret) must match the XLA
    path end-to-end through the module plumbing."""
    from ddsp_svc_tpu.nn.pcmer import PCmer

    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.standard_normal((2, 128, 64)).astype(np.float32))
    ref_mod = PCmer(num_layers=2, num_heads=2, dim_model=64,
                    fused_attention=False)
    v = ref_mod.init(jax.random.key(0), x)
    ref = np.asarray(ref_mod.apply(v, x, infer=True))
    fused_mod = PCmer(num_layers=2, num_heads=2, dim_model=64,
                      fused_attention="force")
    got = np.asarray(fused_mod.apply(v, x, infer=True))
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 2e-5


def test_fused_resblocks_inject_matches_reference():
    """Trio kernel with the folded f0-source injection conv (interpret) vs
    the XLA reference, for strided and kernel-1 source convs; gradients via
    the custom VJP."""
    from ddsp_svc_tpu.ops.pallas_kernels import (
        fused_resblocks_inject_pallas, resblocks_inject_reference,
    )

    rng = np.random.default_rng(30)
    ks, dils = (3, 7, 11), (1, 3, 5)
    for c, t, s_src, ksrc in ((16, 640, 4, 8), (16, 512, 1, 1)):
        x_up = jnp.asarray(rng.standard_normal((2, t, c)).astype(np.float32))
        har = jnp.asarray(
            (rng.standard_normal((2, t * s_src, 1)) * 0.1).astype(np.float32)
        )
        nc_k = jnp.asarray(
            (rng.standard_normal((ksrc, 1, c)) * 0.2).astype(np.float32)
        )
        nc_b = jnp.asarray(
            (rng.standard_normal(c) * 0.05).astype(np.float32)
        )
        ws, bs = _trio_params(rng, ks, dils, c)
        ref = resblocks_inject_reference(
            x_up, har, nc_k, nc_b, ws, bs, ks, dils, s_src
        )
        got = fused_resblocks_inject_pallas(
            x_up, har, nc_k, nc_b, *ws, *bs, s_src,
            kernel_sizes=ks, dilations=dils, tile=256,
            mxu_bf16=False, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4
        )

    g_k = jax.grad(
        lambda h: jnp.sum(fused_resblocks_inject_pallas(
            x_up, h, nc_k, nc_b, *ws, *bs, 1,
            kernel_sizes=ks, dilations=dils, tile=256,
            mxu_bf16=False, interpret=True,
        ) ** 2)
    )(har)
    g_r = jax.grad(
        lambda h: jnp.sum(resblocks_inject_reference(
            x_up, h, nc_k, nc_b, ws, bs, ks, dils, 1
        ) ** 2)
    )(har)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               atol=1e-3, rtol=1e-3)
