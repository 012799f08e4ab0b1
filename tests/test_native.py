"""Native C++ library tests: builds via make, matches numpy/JAX extractors."""
import numpy as np
import pytest

from ddsp_svc_tpu import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.ensure_built():
        pytest.skip("native toolchain unavailable")


def _tone(f0, sr, dur):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


@pytest.mark.parametrize("f0_hz", [110.0, 220.0, 440.0])
def test_native_f0_pure_tone(f0_hz):
    sr, hop = 44100, 512.0
    audio = _tone(f0_hz, sr, 1.5)
    win = 2048
    f0 = native.extract_f0_native(audio, sr, hop, 65, 800, win)
    assert f0 is not None
    assert f0.shape == (int(len(audio) // hop) + 1,)
    mid = f0[6:-6]
    voiced = mid[mid > 0]
    assert len(voiced) > 0.9 * len(mid)
    assert np.median(np.abs(voiced - f0_hz) / f0_hz) < 0.01


def test_native_f0_silence():
    sr, hop = 44100, 512.0
    audio = np.zeros(sr, dtype=np.float32)
    f0 = native.extract_f0_native(audio, sr, hop, 65, 800, 2048)
    assert (f0 == 0).all()


def test_native_volume_matches_numpy():
    from ddsp_svc_tpu.ops import extract_volume_np

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(44100).astype(np.float32)
    for hop in (512.0, 185.76):  # integer and fractional hop
        v_native = native.extract_volume_native(audio, hop)
        v_np = extract_volume_np(audio, hop)
        assert v_native is not None
        np.testing.assert_allclose(v_native, v_np, atol=1e-4)


def test_native_f0_agrees_with_jax_extractor():
    from ddsp_svc_tpu.data.features import F0Extractor

    sr, hop = 44100, 512
    t = np.arange(sr * 2) / sr
    inst = 220 * (1 + 0.02 * np.sin(2 * np.pi * 4 * t))
    audio = (0.5 * np.sin(2 * np.pi * np.cumsum(inst) / sr)).astype(np.float32)
    ext = F0Extractor("dio", sr, hop, 65, 800)
    f0_jax = ext.extract(audio)
    f0_nat = native.extract_f0_native(audio, sr, float(hop), 65, 800, ext.win)
    both = (f0_jax > 0) & (f0_nat > 0)
    assert both.mean() > 0.8
    rel = np.abs(f0_jax[both] - f0_nat[both]) / f0_jax[both]
    assert np.median(rel) < 0.02, np.median(rel)
