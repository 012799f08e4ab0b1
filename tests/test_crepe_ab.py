"""CREPE extraction-chain verification (VERDICT r03 #3).

Two A/Bs against the reference:

1. Postprocessing chain: execute the reference's crepe branch
   (/root/reference/ddsp/vocoder.py:89-102 — resample to 16 kHz,
   periodicity median-pool 4, threshold 0.05 -> NaN, masked avg-pool 4,
   5 ms -> hop nearest resample, uv_interp) with a torchcrepe stub that
   returns controlled (f0, periodicity) tensors, and assert our
   F0Extractor('crepe') produces the identical f0 track from the same
   injected net outputs.

2. Net + converter: a faithful torch reimplementation of the public
   torchcrepe.Crepe('full') architecture (exact layer names/shapes, so its
   state dict is byte-compatible with a real torchcrepe checkpoint) with
   seeded weights and nontrivial BatchNorm running stats, converted by
   utils.convert.convert_crepe_state_dict, must match nn.crepe.CrepeFull's
   forward on random frames — proving the converter consumes real
   torchcrepe checkpoints correctly, BN folding included.
"""
import sys
import types

import numpy as np
import pytest

from torch_stubs import install_stubs

install_stubs()


def _ref_vocoder():
    try:
        from ddsp import vocoder  # type: ignore

        return vocoder
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")


def _controlled_predict(seed):
    """Deterministic (f0, periodicity) on the 5 ms grid, sized from the
    received audio like torchcrepe.predict(pad=True): 1 + len//hop frames.
    Includes sub-threshold periodicity stretches (unvoiced), isolated
    drop-outs (median-pool smoothing), and NaN-adjacent transitions."""

    def fn_np(n16):
        n5 = 1 + n16 // 80
        rng = np.random.default_rng(seed)
        t = np.arange(n5)
        f0 = 180.0 + 60.0 * np.sin(2 * np.pi * t / 97.0) + 5.0 * rng.random(n5)
        pd = 0.3 + 0.5 * np.sin(2 * np.pi * t / 53.0) ** 2
        # unvoiced stretch + isolated dropouts
        pd[n5 // 4: n5 // 4 + max(n5 // 10, 3)] = 0.01
        drop = rng.integers(0, n5, max(n5 // 20, 2))
        pd[drop] = 0.02
        return f0.astype(np.float32), pd.astype(np.float32)

    return fn_np


@pytest.mark.parametrize("sr,hop", [(16000, 256), (44100, 512)])
@pytest.mark.parametrize("uv_interp", [False, True])
def test_crepe_postprocessing_chain_ab(sr, hop, uv_interp):
    vocoder = _ref_vocoder()
    import torch
    import torchcrepe

    from ddsp_svc_tpu.data.features import F0Extractor

    rng = np.random.default_rng(0)
    audio = (0.3 * rng.standard_normal(int(sr * 1.7))).astype(np.float32)
    fn_np = _controlled_predict(seed=5)

    def ref_predict(wav16k, sample_rate, hop_length, fmin, fmax):
        assert sample_rate == 16000 and hop_length == 80
        f0, pd = fn_np(wav16k.shape[-1])
        return (torch.from_numpy(f0)[None, :], torch.from_numpy(pd)[None, :])

    torchcrepe._test_predict_fn = ref_predict
    try:
        ref_ext = vocoder.F0_Extractor("crepe", sr, hop, 65, 800)
        ref_f0 = ref_ext.extract(audio, uv_interp=uv_interp, device="cpu")
    finally:
        torchcrepe._test_predict_fn = None

    ext = F0Extractor("crepe", sr, hop, 65, 800)
    ext._crepe = types.SimpleNamespace(
        predict=lambda wav16k, batch_size=512: fn_np(len(wav16k))
    )
    got_f0 = ext.extract(audio, uv_interp=uv_interp)

    assert got_f0.shape == ref_f0.shape, (got_f0.shape, ref_f0.shape)
    ref_f0 = np.asarray(ref_f0, dtype=np.float32)
    # identical semantics; tolerance covers resample-length fp noise only
    np.testing.assert_allclose(got_f0, ref_f0, atol=2e-4, rtol=1e-5)
    if not uv_interp:
        # the chain must produce genuine unvoiced zeros (threshold path hit)
        assert (got_f0 == 0).any()


class _TorchCrepeFull:
    """Faithful torchcrepe.Crepe('full') (public architecture): Conv2d
    stacks with (k, 1) kernels over (B, C, T, 1), relu -> BatchNorm2d ->
    maxpool (2,1); layer names conv{i}/conv{i}_BN/classifier match the real
    torchcrepe checkpoint format exactly."""

    def build(self):
        import torch

        in_ch = [1, 1024, 128, 128, 128, 256]
        out_ch = [1024, 128, 128, 128, 256, 512]
        kernels = [(512, 1)] + [(64, 1)] * 5
        strides = [(4, 1)] + [(1, 1)] * 5

        class Net(torch.nn.Module):
            def __init__(self):
                super().__init__()
                for i in range(6):
                    setattr(self, f"conv{i + 1}", torch.nn.Conv2d(
                        in_ch[i], out_ch[i], kernels[i], strides[i]))
                    setattr(self, f"conv{i + 1}_BN",
                            torch.nn.BatchNorm2d(out_ch[i]))
                self.classifier = torch.nn.Linear(2048, 360)

            def forward(self, x):
                import torch.nn.functional as F

                x = x[:, None, :, None]
                for i in range(6):
                    pad = (0, 0, 254, 254) if i == 0 else (0, 0, 31, 32)
                    x = F.pad(x, pad)
                    x = getattr(self, f"conv{i + 1}")(x)
                    x = F.relu(x)
                    x = getattr(self, f"conv{i + 1}_BN")(x)
                    x = F.max_pool2d(x, (2, 1), (2, 1))
                x = x.permute(0, 2, 1, 3).reshape(x.shape[0], -1)
                return torch.sigmoid(self.classifier(x))

        return Net()


def test_crepe_net_converter_ab():
    import torch
    import jax
    import jax.numpy as jnp

    from ddsp_svc_tpu.nn.crepe import CrepeFull
    from ddsp_svc_tpu.utils.convert import convert_crepe_state_dict

    torch.manual_seed(3)
    net = _TorchCrepeFull().build()
    # nontrivial running stats so BN folding is actually exercised
    with torch.no_grad():
        for i in range(6):
            bn = getattr(net, f"conv{i + 1}_BN")
            bn.running_mean.normal_(0.1, 0.2)
            bn.running_var.uniform_(0.5, 2.0)
            bn.weight.normal_(1.0, 0.2)
            bn.bias.normal_(0.0, 0.2)
    net.eval()

    rng = np.random.default_rng(1)
    frames = rng.standard_normal((4, 1024)).astype(np.float32)
    frames -= frames.mean(axis=1, keepdims=True)
    frames /= np.maximum(frames.std(axis=1, keepdims=True), 1e-10)

    with torch.no_grad():
        ref = net(torch.from_numpy(frames)).numpy()

    variables = jax.tree.map(
        jnp.asarray, convert_crepe_state_dict(net.state_dict()))
    model = CrepeFull()
    got = np.asarray(model.apply(variables, jnp.asarray(frames)))
    assert got.shape == ref.shape == (4, 360)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_crepe_extractor_accepts_converted_checkpoint(tmp_path):
    """load_torch_checkpoint round-trip: a torchcrepe-format file on disk
    loads into CrepeExtractor and drives predict()."""
    import torch

    from ddsp_svc_tpu.nn.crepe import CrepeExtractor

    torch.manual_seed(4)
    net = _TorchCrepeFull().build()
    path = str(tmp_path / "full.pth")
    torch.save(net.state_dict(), path)

    ext = CrepeExtractor(65, 800)
    ext.load_torch_checkpoint(path)
    rng = np.random.default_rng(2)
    t = np.arange(16000)
    wav = (0.5 * np.sin(2 * np.pi * 220 * t / 16000)).astype(np.float32)
    f0, pd = ext.predict(wav)
    assert f0.shape == pd.shape == (1 + len(wav) // 80,)
    assert np.isfinite(f0).all() and np.isfinite(pd).all()
