"""Feature extraction tests: F0 (autocorrelation), volume, units encoder."""
import numpy as np
import pytest

from ddsp_svc_tpu.data.features import F0Extractor, VolumeExtractor, UnitsEncoder


def _tone(f0, sr, dur, vibrato=0.0):
    t = np.arange(int(sr * dur)) / sr
    inst = f0 * (1 + vibrato * np.sin(2 * np.pi * 5 * t))
    phase = 2 * np.pi * np.cumsum(inst) / sr
    return (0.5 * np.sin(phase)).astype(np.float32), inst


@pytest.mark.parametrize("f0_hz", [110.0, 220.0, 440.0])
def test_autocorr_f0_pure_tone(f0_hz):
    sr, hop = 44100, 512
    audio, _ = _tone(f0_hz, sr, 2.0)
    ext = F0Extractor("dio", sr, hop, 65, 800)
    f0 = ext.extract(audio)
    assert f0.shape == (len(audio) // hop + 1,)
    mid = f0[10:-10]
    voiced = mid[mid > 0]
    assert len(voiced) > 0.9 * len(mid)
    rel_err = np.abs(voiced - f0_hz) / f0_hz
    assert np.median(rel_err) < 0.01, (f0_hz, np.median(rel_err))


def test_autocorr_f0_vibrato_tracking():
    sr, hop = 44100, 512
    audio, inst = _tone(220.0, sr, 2.0, vibrato=0.03)
    ext = F0Extractor("parselmouth", sr, hop, 65, 800)
    f0 = ext.extract(audio)
    inst_frames = inst[::hop][: len(f0)]
    mid = slice(10, len(f0) - 10)
    rel = np.abs(f0[mid] - inst_frames[mid]) / inst_frames[mid]
    assert np.median(rel) < 0.02, np.median(rel)


def test_f0_silence_is_unvoiced_and_uv_interp():
    sr, hop = 44100, 512
    tone, _ = _tone(200.0, sr, 1.0)
    silence = np.zeros(sr // 2, dtype=np.float32)
    audio = np.concatenate([silence, tone, silence])
    ext = F0Extractor("dio", sr, hop, 65, 800)
    f0 = ext.extract(audio, uv_interp=False)
    n_sil = len(silence) // hop
    assert (f0[: n_sil - 2] == 0).all()
    f0i = ext.extract(audio, uv_interp=True)
    assert (f0i >= ext.f0_min).all()


def test_f0_silence_front():
    sr, hop = 44100, 512
    tone, _ = _tone(200.0, sr, 1.0)
    audio = np.concatenate([np.zeros(sr // 2, np.float32), tone])
    ext = F0Extractor("dio", sr, hop, 65, 800)
    f0 = ext.extract(audio, silence_front=0.3)
    assert f0.shape == (len(audio) // hop + 1,)
    start_frame = int(0.3 * sr / hop)
    assert (f0[:start_frame] == 0).all()


def test_volume_extractor_contract():
    sr, hop = 44100, 512
    audio = 0.25 * np.ones(sr, dtype=np.float32)
    v = VolumeExtractor(hop).extract(audio)
    assert v.shape == (sr // hop + 1,)
    np.testing.assert_allclose(v[1:-1], 0.25, atol=1e-4)


def test_units_encoder_shapes():
    enc = UnitsEncoder("hubertsoft", None)  # random init
    sr, hop = 44100, 512
    audio = np.random.default_rng(0).standard_normal((1, sr)).astype(np.float32) * 0.1
    units = enc.encode(audio, sr, hop)
    assert units.shape == (1, sr // hop + 1, 256)
    assert np.isfinite(units).all()


def test_crepe_architecture_shapes():
    from ddsp_svc_tpu.nn.crepe import CrepeExtractor

    ext = CrepeExtractor()
    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1
    f0, pd = ext.predict(wav, batch_size=64)
    n = 1 + 16000 // 80
    assert f0.shape == (n,) and pd.shape == (n,)
    assert np.isfinite(f0).all() and (pd >= 0).all() and (pd <= 1).all()


def test_viterbi_tracking_under_noise():
    """Viterbi candidate tracking must stay octave-stable on a noisy,
    harmonically-rich tone where greedy peak-picking octave-hops."""
    sr, hop = 44100, 512
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * 2.0)) / sr
    f0_hz = 220.0
    # strong even harmonics (octave-confusable) + noise
    audio = (
        0.25 * np.sin(2 * np.pi * f0_hz * t)
        + 0.35 * np.sin(2 * np.pi * 2 * f0_hz * t)
        + 0.15 * np.sin(2 * np.pi * 3 * f0_hz * t)
        + 0.05 * rng.standard_normal(len(t))
    ).astype(np.float32)
    ext = F0Extractor("dio", sr, hop, 65, 800)
    f0 = ext.extract(audio)
    mid = f0[10:-10]
    voiced = mid[mid > 0]
    assert len(voiced) > 0.9 * len(mid)
    # no octave errors: all voiced frames near 220 (not 110/440)
    octave_err = np.abs(np.log2(voiced / f0_hz)) > 0.4
    assert octave_err.mean() < 0.05, octave_err.mean()
    rel = np.abs(voiced[~octave_err] - f0_hz) / f0_hz
    assert np.median(rel) < 0.02


def test_viterbi_voiced_unvoiced_transitions():
    sr, hop = 44100, 512
    t = np.arange(int(sr * 0.8)) / sr
    tone = (0.4 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    sil = np.zeros(int(sr * 0.4), dtype=np.float32)
    audio = np.concatenate([sil, tone, sil, tone, sil])
    ext = F0Extractor("harvest", sr, hop, 65, 800)
    f0 = ext.extract(audio)
    n_sil = len(sil) // hop
    assert (f0[: n_sil - 2] == 0).all()
    seg1 = f0[n_sil + 2 : n_sil + len(tone) // hop - 2]
    assert (seg1 > 0).mean() > 0.9
    np.testing.assert_allclose(np.median(seg1[seg1 > 0]), 200, rtol=0.02)
