"""RSS/SSS training-objective parity vs the EXECUTED reference loss
(/root/reference/ddsp/loss.py run with a faithful pure-torch
torchaudio.transforms.Spectrogram stub). Waveform parity tests can't see
training-objective drift; this closes that hole at fixed FFT sizes
(power-of-two and odd) and for the RSS average over a fixed draw."""
import numpy as np
import pytest
import jax.numpy as jnp

from torch_stubs import install_stubs
from ddsp_svc_tpu.models.losses import sss_loss, RSSLoss


@pytest.fixture(scope="module")
def ref_loss():
    install_stubs()
    try:
        from ddsp import loss  # type: ignore
    except Exception as e:
        pytest.skip(f"reference ddsp.loss not importable: {e}")
    return loss


def _signals(seed=0, b=3, t=8000):
    rng = np.random.default_rng(seed)
    x_true = rng.standard_normal((b, t)).astype(np.float32) * 0.3
    x_pred = (x_true + 0.05 * rng.standard_normal((b, t))).astype(np.float32)
    return x_true, x_pred


@pytest.mark.parametrize("n_fft", [256, 384, 511, 1024, 2047])
def test_sss_loss_matches_executed_reference(ref_loss, n_fft):
    import torch

    x_true, x_pred = _signals(n_fft)
    ref = ref_loss.SSSLoss(n_fft=n_fft)
    with torch.no_grad():
        want = float(ref(torch.from_numpy(x_true), torch.from_numpy(x_pred)))
    got = float(sss_loss(jnp.asarray(x_true), jnp.asarray(x_pred), n_fft))
    assert abs(got - want) / abs(want) < 1e-5, (got, want)


def test_rss_fixed_draw_matches_executed_reference(ref_loss):
    """RSS at a pinned set of FFT sizes: our bucketed RSS restricted to the
    same sizes equals the reference's average over that draw."""
    import torch

    x_true, x_pred = _signals(7)
    sizes = (256, 300, 700, 1500)
    ref_total = 0.0
    with torch.no_grad():
        for n in sizes:
            ref_total += float(ref_loss.SSSLoss(n_fft=n)(
                torch.from_numpy(x_true), torch.from_numpy(x_pred)))
    want = ref_total / len(sizes)

    rss = RSSLoss(256, 2048, n_scale=4, buckets=sizes)
    got = float(rss.mss(jnp.asarray(x_pred), jnp.asarray(x_true)))
    assert abs(got - want) / abs(want) < 1e-5, (got, want)
