"""Streaming engine tests: SOLA alignment (the reference's own debug
strategy, gui.py:391-397: randomly-shifted passthrough must splice smoothly)
and phase vocoder parity."""
import numpy as np
import jax.numpy as jnp

from ddsp_svc_tpu.infer.streaming import StreamingSession, phase_vocoder, sola_shift


class ShiftingPassthroughCore:
    """Fake SvcCore: returns the input window rolled by a random shift —
    SOLA must absorb the shifts."""

    def __init__(self, sr, seed=0):
        self.sr = sr
        self.rng = np.random.default_rng(seed)

    def infer(self, audio, sample_rate, **kw):
        shift = int(self.rng.uniform(-200, 200))
        return np.roll(audio, shift), self.sr


def test_sola_reconstructs_continuous_signal():
    sr = 16000
    core = ShiftingPassthroughCore(sr)
    sess = StreamingSession(core, samplerate=sr, block_time=0.1,
                            crossfade_time=0.02, buffer_num=1)
    t = np.arange(sr * 2) / sr
    signal = np.sin(2 * np.pi * 220 * t).astype(np.float32)

    outs = []
    bf = sess.block_frame
    for i in range(signal.shape[0] // bf):
        outs.append(sess.process_block(signal[i * bf : (i + 1) * bf]))
    out = np.concatenate(outs)

    # after warmup, the output must stay smooth at block boundaries: the
    # max jump between adjacent samples of a 220 Hz sine at 16 kHz is ~0.086
    steady = out[4 * bf :]
    jumps = np.abs(np.diff(steady))
    assert jumps.max() < 0.2, jumps.max()
    # and it should still be a 220 Hz tone: dominant FFT bin check
    spec = np.abs(np.fft.rfft(steady * np.hanning(len(steady))))
    peak_hz = np.argmax(spec) * sr / len(steady)
    assert abs(peak_hz - 220) < 5, peak_hz


def test_sola_shift_finds_known_offset():
    rng = np.random.default_rng(0)
    sola_buf = rng.standard_normal(320).astype(np.float32)
    true_shift = 57
    wav = np.concatenate(
        [rng.standard_normal(true_shift).astype(np.float32) * 0.01,
         sola_buf,
         rng.standard_normal(800).astype(np.float32)]
    )
    got = sola_shift(wav, sola_buf, search_frames=160)
    assert got == true_shift, got


def test_phase_vocoder_parity_with_torch_formula():
    import torch

    rng = np.random.default_rng(1)
    n = 256
    a = rng.standard_normal(n).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    fade_in = (np.sin(np.pi * np.arange(0, 1, 1 / n) / 2) ** 2).astype(np.float32)
    fade_out = (1 - fade_in).astype(np.float32)

    # reference formula (gui.py:14-31), executed in torch
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    fa, fb = torch.fft.rfft(ta), torch.fft.rfft(tb)
    absab = torch.abs(fa) + torch.abs(fb)
    absab[1:-1] *= 2
    phia, phib = torch.angle(fa), torch.angle(fb)
    dp = phib - phia
    dp = dp - 2 * np.pi * torch.floor(dp / 2 / np.pi + 0.5)
    w = 2 * np.pi * torch.arange(n // 2 + 1) + dp
    t = torch.arange(n).unsqueeze(-1) / n
    fo, fi = torch.from_numpy(fade_out), torch.from_numpy(fade_in)
    ref = (ta * fo**2 + tb * fi**2
           + torch.sum(absab * torch.cos(w * t + phia), -1) * fo * fi / n)

    got = np.asarray(
        phase_vocoder(jnp.asarray(a), jnp.asarray(b),
                      jnp.asarray(fade_out), jnp.asarray(fade_in))
    )
    np.testing.assert_allclose(got, ref.numpy(), atol=1e-3)


def test_phase_vocoder_endpoints():
    """At t=0 the splice must equal a, at the end approach b (fade laws)."""
    n = 128
    t = np.arange(n) / n
    a = np.sin(2 * np.pi * 5 * t).astype(np.float32)
    b = np.sin(2 * np.pi * 5 * t + 0.3).astype(np.float32)
    fade_in = (np.sin(np.pi * t / 2) ** 2).astype(np.float32)
    fade_out = 1 - fade_in
    out = np.asarray(
        phase_vocoder(jnp.asarray(a), jnp.asarray(b),
                      jnp.asarray(fade_out), jnp.asarray(fade_in))
    )
    assert abs(out[0] - a[0]) < 0.05
    assert np.isfinite(out).all()


def test_fused_window_matches_legacy_infer(tmp_path):
    """SvcCore's single-dispatch fused window program must match the legacy
    multi-dispatch path (units encode -> synth -> mask -> enhancer) exactly,
    with and without the enhancer."""
    import bench_stream
    from ddsp_svc_tpu.infer.streaming import SvcCore
    from ddsp_svc_tpu.infer.enhancer import Enhancer

    sr, block = 16000, 256
    path = bench_stream._make_ckpt(str(tmp_path), sr, block, causal=False,
                                   frame_norm=False, bf16=False)
    core = SvcCore(path)
    h = {
        "sampling_rate": sr, "num_mels": 16, "n_fft": 512, "win_size": 512,
        "hop_size": 256, "fmin": 40, "fmax": 8000,
        "upsample_rates": [8, 8, 2, 2], "upsample_kernel_sizes": [16, 16, 4, 4],
        "upsample_initial_channel": 32, "resblock": "1",
        "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3, 5]],
    }
    core.enhancer = Enhancer("nsf-hifigan", None, h=h)
    song = bench_stream._song(sr, 1.2)

    for use_enh, adaptive_key in ((False, 0), (True, 0), (True, 2)):
        core.fused_window = True
        core._step = 0
        got, sr_got = core.infer(
            song, sr, spk_id=1, use_enhancer=use_enh,
            enhancer_adaptive_key=adaptive_key, pitch_extractor_type="dio",
            safe_prefix_pad_length=0.2,
        )
        core.fused_window = False
        core._step = 0
        ref, sr_ref = core.infer(
            song, sr, spk_id=1, use_enhancer=use_enh,
            enhancer_adaptive_key=adaptive_key, pitch_extractor_type="dio",
            safe_prefix_pad_length=0.2,
        )
        assert sr_got == sr_ref
        assert got.shape == ref.shape, (use_enh, got.shape, ref.shape)
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / scale < 5e-5, (
            use_enh, adaptive_key, np.abs(got - ref).max() / scale
        )


def test_stream_config_roundtrip_and_cli_overlay(tmp_path):
    """YAML settings profiles (reference gui.py:160-171 semantics): save /
    load round-trips every field incl. the spk-mix dict's int keys; gui.py
    applies profile values unless a CLI flag was passed explicitly."""
    from ddsp_svc_tpu.infer.stream_config import StreamConfig

    cfg = StreamConfig(
        samplerate=32000, block_time=0.5, pitch_adjust=2.0, spk_id=3,
        spk_mix_dict={1: 0.25, 2: 0.75}, use_enhancer=False,
        use_phase_vocoder=True, checkpoint_path="exp/foo/model_best.ckpt",
        threshold_db=-35.0, buffer_num=4, crossfade_time=0.05,
        pitch_extractor="harvest", use_spk_mix=True,
        sounddevices=["mic", "speakers"],
    )
    path = cfg.save(str(tmp_path / "profiles"), "stage")
    assert path.endswith("stage.yaml")
    got = StreamConfig.load(str(tmp_path / "profiles"), "stage")
    assert got == cfg
    assert all(isinstance(k, int) for k in got.spk_mix_dict)
    assert StreamConfig.list_profiles(str(tmp_path / "profiles")) == ["stage"]

    kw = got.session_kwargs()
    assert kw["block_time"] == 0.5 and kw["use_spk_mix"] is True
    assert kw["pitch_extractor_type"] == "harvest"

    # gui.py overlay: loaded profile wins over defaults, explicit flags win
    # over the profile
    import gui

    class Cmd:  # argparse namespace double with everything unset
        model_path = None; spk_id = None; pitch = None; threhold = None
        samplerate = None; block_time = None; crossfade_time = None
        buffer_num = None; pitch_extractor = None; enhance = None
        phase_vocoder = None; pipeline_depth = None
        config = f"{tmp_path}/profiles:stage"
    eff = gui.effective_config(Cmd())
    assert eff.block_time == 0.5 and eff.spk_id == 3

    Cmd.block_time = 0.2
    Cmd.enhance = "true"
    eff = gui.effective_config(Cmd())
    assert eff.block_time == 0.2          # explicit flag overrides profile
    assert eff.use_enhancer is True
    assert eff.pitch_extractor == "harvest"  # untouched profile value kept


def test_pipelined_session_matches_sequential():
    """pipeline_depth=1 (double-buffered device round-trip) must produce
    exactly the sequential engine's output, delayed by one block (zeros
    while priming), with the tail recoverable via flush()."""
    sr = 16000
    t = np.arange(sr * 2) / sr
    signal = np.sin(2 * np.pi * 220 * t).astype(np.float32)

    def run(depth):
        core = ShiftingPassthroughCore(sr, seed=7)
        sess = StreamingSession(core, samplerate=sr, block_time=0.1,
                                crossfade_time=0.02, buffer_num=1,
                                pipeline_depth=depth)
        bf = sess.block_frame
        outs = [sess.process_block(signal[i * bf: (i + 1) * bf])
                for i in range(signal.shape[0] // bf)]
        outs += sess.flush()
        return outs

    plain = run(0)
    piped = run(1)
    assert len(piped) == len(plain) + 1
    assert not piped[0].any()  # priming block is silence
    for a, b in zip(plain, piped[1:]):
        np.testing.assert_array_equal(a, b)
