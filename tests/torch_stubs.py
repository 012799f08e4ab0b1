"""Test-only stubs for native/CUDA packages the reference imports.

These let parity tests import and *execute* the reference model code on CPU
torch. Each stub re-implements the public semantics of the stubbed package
(documented behavior), purely as test scaffolding:
  - extorch.Conv1dEx: Conv1d with padding='same' or causal left-padding
  - extorch.Transpose: dims-swapping module
  - fast_transformers.causal_product.CausalDotProduct: causal linear
    attention numerator out[t] = q[t] @ sum_{s<=t} k[s] v[s]^T
  - empty placeholder modules for pyworld/parselmouth/torchcrepe/resampy/
    torchaudio (only referenced inside code paths the tests never hit)
"""
import sys
import types


def install_stubs():
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    if "extorch" not in sys.modules:
        extorch = types.ModuleType("extorch")

        class Conv1dEx(tnn.Module):
            def __init__(self, in_ch, out_ch, kernel, padding="same",
                         causal=False, groups=1, stride=1, bias=True):
                super().__init__()
                self.causal = causal
                self.kernel = kernel
                self.conv = tnn.Conv1d(in_ch, out_ch, kernel, stride=stride,
                                       padding=0, groups=groups, bias=bias)

            def forward(self, x):
                k = self.kernel
                if self.causal:
                    x = F.pad(x, (k - 1, 0))
                else:
                    x = F.pad(x, ((k - 1) // 2, k // 2))
                return self.conv(x)

            # expose inner parameters under this module's own names so
            # state_dict paths match real extorch (weight/bias directly)
            def _save_to_state_dict(self, destination, prefix, keep_vars):
                destination[prefix + "weight"] = self.conv.weight
                if self.conv.bias is not None:
                    destination[prefix + "bias"] = self.conv.bias

            def _load_from_state_dict(self, state_dict, prefix, *args, **kw):
                # accept the flat names _save_to_state_dict produces
                for name in ("weight", "bias"):
                    if prefix + name in state_dict:
                        state_dict[prefix + "conv." + name] = state_dict.pop(
                            prefix + name)
                super()._load_from_state_dict(state_dict, prefix, *args, **kw)

        class Transpose(tnn.Module):
            def __init__(self, d0, d1):
                super().__init__()
                self.d0, self.d1 = d0, d1

            def forward(self, x):
                return x.transpose(self.d0, self.d1)

        extorch.Conv1dEx = Conv1dEx
        extorch.Transpose = Transpose
        sys.modules["extorch"] = extorch

    if "fast_transformers" not in sys.modules:
        ft = types.ModuleType("fast_transformers")
        cp = types.ModuleType("fast_transformers.causal_product")

        class CausalDotProduct:
            @staticmethod
            def apply(q, k, v):
                kv = torch.einsum("bhsm,bhsd->bhsmd", k, v).cumsum(dim=2)
                return torch.einsum("bhsm,bhsmd->bhsd", q, kv)

        cp.CausalDotProduct = CausalDotProduct
        ft.causal_product = cp
        sys.modules["fast_transformers"] = ft
        sys.modules["fast_transformers.causal_product"] = cp

    for name in ["pyworld", "parselmouth", "resampy"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)

    if "torchcrepe" not in sys.modules:
        # torchcrepe stub: threshold.At reproduces the documented public
        # semantics (clone pitch, set entries with periodicity < value to
        # NaN/UNVOICED); predict() is injectable per test so the reference's
        # crepe POSTPROCESSING chain (vocoder.py:89-102) executes from
        # controlled probability tensors.
        import numpy as _np

        tc = types.ModuleType("torchcrepe")
        tc.UNVOICED = float("nan")
        tc_threshold = types.ModuleType("torchcrepe.threshold")

        class At:
            def __init__(self, value):
                self.value = value

            def __call__(self, pitch, periodicity):
                pitch = torch.clone(pitch)
                pitch[periodicity < self.value] = float("nan")
                return pitch

        tc_threshold.At = At
        tc.threshold = tc_threshold
        tc._test_predict_fn = None

        def predict(audio, sample_rate, hop_length, fmin=50.0, fmax=2006.0,
                    model="full", batch_size=None, device=None, pad=True,
                    return_periodicity=False, **_):
            if tc._test_predict_fn is None:
                raise NotImplementedError(
                    "set torchcrepe._test_predict_fn in the test")
            return tc._test_predict_fn(
                audio, sample_rate, hop_length, fmin, fmax)

        tc.predict = predict
        sys.modules["torchcrepe"] = tc
        sys.modules["torchcrepe.threshold"] = tc_threshold

    if "torchaudio" not in sys.modules:
        import math

        ta = types.ModuleType("torchaudio")
        tat = types.ModuleType("torchaudio.transforms")

        class Resample(tnn.Module):
            """Faithful torchaudio.transforms.Resample (default
            'sinc_interp_hann' method, rolloff 0.99) in pure torch: gcd-
            reduced polyphase windowed-sinc kernel applied as a strided
            conv1d, identity when orig_freq == new_freq — so the reference
            enhancer's adaptive-rate chain (enhancer.py:46-52,67-72)
            EXECUTES for the whole-pipeline A/B."""

            def __init__(self, orig_freq=16000, new_freq=16000,
                         lowpass_filter_width=6, rolloff=0.99, **_):
                super().__init__()
                g = math.gcd(int(orig_freq), int(new_freq))
                self.orig = int(orig_freq) // g
                self.new = int(new_freq) // g
                if self.orig == self.new:
                    return
                base_freq = min(self.orig, self.new) * rolloff
                width = math.ceil(lowpass_filter_width * self.orig / base_freq)
                idx = torch.arange(
                    -width, width + self.orig, dtype=torch.float64
                )[None, :] / self.orig
                t = (-torch.arange(self.new, dtype=torch.float64)[:, None]
                     / self.new + idx) * base_freq
                t = t.clamp(-lowpass_filter_width, lowpass_filter_width)
                window = torch.cos(t * math.pi / lowpass_filter_width / 2) ** 2
                t = t * math.pi
                kernel = torch.where(
                    t == 0.0, torch.ones_like(t), torch.sin(t) / t)
                kernel = kernel * window * (base_freq / self.orig)
                self.width = width
                self.register_buffer(
                    "kernel", kernel.to(torch.float32)[:, None, :])

            def forward(self, waveform):
                if self.orig == self.new:
                    return waveform
                shape = waveform.shape
                length = shape[-1]
                x = waveform.reshape(-1, 1, length)
                x = F.pad(x, (self.width, self.width + self.orig))
                out = F.conv1d(x, self.kernel.to(x.dtype), stride=self.orig)
                out = out.transpose(1, 2).reshape(x.shape[0], -1)
                target = int(math.ceil(self.new * length / self.orig))
                return out[:, :target].reshape(shape[:-1] + (target,))

        class Spectrogram(tnn.Module):
            """Faithful torchaudio.transforms.Spectrogram (the subset the
            reference RSS/SSS loss uses, loss.py:14: hann window,
            win_length=n_fft, center=False, power, 'window' normalization)
            in pure torch — so the reference loss EXECUTES for A/B tests."""

            def __init__(self, n_fft=400, win_length=None, hop_length=None,
                         power=2.0, normalized=False, center=True,
                         pad=0, **_):
                super().__init__()
                self.n_fft = n_fft
                self.win_length = win_length or n_fft
                self.hop_length = hop_length or self.win_length // 2
                self.power = power
                self.normalized = normalized
                self.center = center
                self.pad = pad

            def forward(self, x):
                if self.pad:
                    x = F.pad(x, (self.pad, self.pad))
                window = torch.hann_window(self.win_length, dtype=x.dtype)
                spec = torch.stft(
                    x, self.n_fft, hop_length=self.hop_length,
                    win_length=self.win_length, window=window,
                    center=self.center, return_complex=True,
                )
                if self.normalized:
                    spec = spec / window.pow(2.0).sum().sqrt()
                if self.power is not None:
                    spec = spec.abs().pow(self.power)
                return spec

        tat.Resample = Resample
        tat.Spectrogram = Spectrogram
        ta.transforms = tat
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tat


def install_pipeline_stubs():
    """Stubs that let the reference's *whole* offline pipeline (main.py)
    execute: faithful `librosa` (load / to_mono / feature.rms — backed by
    this repo's host wav/rms code, which is itself parity-tested) and
    `soundfile` (write via the repo's wav codec, float32; the written floats
    are also captured in `soundfile_written` for float-exact comparison)."""
    install_stubs()

    import numpy as np

    from ddsp_svc_tpu.data.wavio import load_audio, write_wav
    from ddsp_svc_tpu.data.slicer import frame_rms

    librosa = sys.modules.get("librosa")
    if librosa is None or not hasattr(librosa, "load"):
        librosa = types.ModuleType("librosa")
        feature = types.ModuleType("librosa.feature")

        def load(path, sr=None, mono=True):
            y, got_sr = load_audio(path, sr=sr, mono=mono)
            return y.astype(np.float32), got_sr

        def to_mono(y):
            y = np.asarray(y)
            return y.mean(axis=0) if y.ndim > 1 else y

        def rms(y=None, frame_length=2048, hop_length=512, **_):
            return frame_rms(np.asarray(y), frame_length, hop_length)[None, :]

        librosa.load = load
        librosa.to_mono = to_mono
        feature.rms = rms
        librosa.feature = feature

        # submodules the reference's nsf_hifigan/nvSTFT.py imports
        util = types.ModuleType("librosa.util")

        def normalize(S, norm=np.inf, axis=0, **_):
            mag = np.abs(S).max(axis=axis, keepdims=True)
            return S / np.maximum(mag, np.finfo(np.float32).tiny)

        util.normalize = normalize
        filters = types.ModuleType("librosa.filters")

        def mel_fn(sr=22050, n_fft=2048, n_mels=128, fmin=0.0, fmax=None, **_):
            from ddsp_svc_tpu.ops.spectral import mel_filterbank

            return np.asarray(mel_filterbank(
                sr, n_fft, n_mels, fmin, fmax if fmax else sr / 2))

        filters.mel = mel_fn
        librosa.util = util
        librosa.filters = filters
        sys.modules["librosa"] = librosa
        sys.modules["librosa.feature"] = feature
        sys.modules["librosa.util"] = util
        sys.modules["librosa.filters"] = filters

    sf = sys.modules.get("soundfile")
    if sf is None or not hasattr(sf, "write"):
        sf = types.ModuleType("soundfile")
        sf.soundfile_written = {}

        def write(path, data, samplerate, **_):
            arr = np.asarray(data, dtype=np.float32)
            sf.soundfile_written[str(path)] = arr
            write_wav(str(path), arr, int(samplerate), subtype="FLOAT")

        sf.write = write
        sys.modules["soundfile"] = sf
    return sf
