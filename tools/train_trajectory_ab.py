#!/usr/bin/env python
"""300-step training-trajectory A/B: this framework vs the EXECUTED reference.

Both frameworks train the same CombSubFast geometry from IDENTICAL initial
weights (torch init, converted) on the same synthetic harmonic dataset with
the same per-step batch selection. Each side uses its own stochastic
random-scale loss draw and noise stream — exactly how each would train in
production (the reference draws every integer n_fft, solver.py:111-113 +
ddsp/loss.py:37-43; we draw from the 16-bucket linear set). Trajectories are
scored on a COMMON deterministic metric suite (dense-MSS over a fixed
48-size draw + log-mel L1, both computed by this framework's jax ops on both
sides' outputs).

Pass criterion: final metrics within the documented seed-to-seed noise floor
(±3.4%, docs/PARITY.md "RSS bucket experiment").

Usage: python tools/train_trajectory_ab.py [--steps 300] [--eval-every 50]
Writes a JSON summary line to stdout; docs/PARITY.md quotes the table.
"""
import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.append("/root/reference")

import numpy as np


def make_dataset(sr, block, n_unit, f):
    """Synthetic harmonic 'singing' items (same recipe as
    tools/rss_bucket_experiment.py so noise floors are comparable)."""
    rng = np.random.default_rng(0)
    n_items = 8
    t = np.arange(f * block) / sr
    audio, f0s = [], []
    for i in range(n_items):
        base = 120.0 * (1.3 ** (i % 4)) * (1 + 0.02 * np.sin(2 * np.pi * 1.7 * t))
        sig = sum(
            (0.5 ** k) * np.sin(2 * np.pi * (k + 1) * base * t) for k in range(6)
        )
        sig = (0.3 * sig * (0.6 + 0.4 * np.sin(2 * np.pi * 2.1 * t))).astype(
            np.float32
        )
        sig += 0.003 * rng.standard_normal(sig.shape).astype(np.float32)
        audio.append(sig)
        f0s.append(np.repeat(base[::block], 1)[:f].astype(np.float32))
    audio = np.stack(audio)
    f0s = np.stack(f0s)[..., None]
    units = rng.standard_normal((n_items, f, n_unit)).astype(np.float32)
    vols = np.sqrt(np.mean(audio.reshape(n_items, f, block) ** 2, axis=-1)).astype(
        np.float32
    )
    spk = np.ones((n_items, 1), dtype=np.int64)
    return audio, units, f0s, vols, spk


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--eval-every", type=int, default=50)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--only", choices=["both", "jax", "ref"], default="both")
    p.add_argument("--seed", type=int, default=1,
                   help="training-stream seed (loss draws + noise); vary to "
                        "measure each framework's own run-to-run spread")
    args = p.parse_args()

    from torch_stubs import install_stubs

    install_stubs()
    import torch

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ddsp import vocoder, loss as ref_loss_mod  # type: ignore
    from ddsp_svc_tpu.models import CombSubFast, RSSLoss
    from ddsp_svc_tpu.models.losses import mel_l1
    from ddsp_svc_tpu.train import (
        create_optimizer, create_train_state, make_train_step,
    )
    from ddsp_svc_tpu.utils.convert import convert_synth_state_dict

    sr, block, n_unit, f = 16000, 256, 64, 64
    fft_min, fft_max = 128, 1024
    b = args.batch
    audio, units, f0s, vols, spk = make_dataset(sr, block, n_unit, f)
    n_items = audio.shape[0]

    def idx_at(step):
        return np.random.default_rng(1000 + step).integers(0, n_items, b)

    # identical converted init
    torch.manual_seed(0)
    ref_model = vocoder.CombSubFast(sr, block, n_unit=n_unit, n_spk=2)
    init_variables = jax.tree.map(
        lambda x: jnp.array(np.array(x)),
        convert_synth_state_dict(ref_model.state_dict()),
    )

    # common deterministic metric suite (this framework's jax ops)
    jax_model = CombSubFast(sampling_rate=sr, block_size=block, n_unit=n_unit,
                            n_spk=2)
    dense_sizes = tuple(
        int(s) for s in np.sort(np.random.default_rng(7).choice(
            np.arange(fft_min, fft_max), size=48, replace=False))
    )
    eval_loss = RSSLoss(fft_min, fft_max, n_scale=4, buckets=dense_sizes)

    e_audio = jnp.asarray(audio)

    @jax.jit
    def _metrics(sig):
        return (
            eval_loss.mss(sig, e_audio),
            mel_l1(sig, e_audio, sr=sr, n_fft=1024, hop=256, n_mels=40),
        )

    def metrics_of(sig_np):
        m = _metrics(jnp.asarray(sig_np))
        return float(m[0]), float(m[1])

    results = {}

    # ---- this framework ----------------------------------------------------
    if args.only in ("both", "jax"):
        loss_fn = RSSLoss(fft_min, fft_max, n_scale=4)  # default linear buckets
        optimizer = create_optimizer(args.lr)
        model = jax_model
        step_fn = make_train_step(model, loss_fn, optimizer)
        state = create_train_state(
            model, optimizer,
            {
                "units": jnp.asarray(units[idx_at(0)]),
                "f0": jnp.asarray(f0s[idx_at(0)]),
                "volume": jnp.asarray(vols[idx_at(0)]),
                "spk_id": jnp.asarray(spk[idx_at(0)]),
            },
            jax.random.key(0),
        )
        state = state.replace(params=init_variables["params"],
                              constants=init_variables["constants"])

        @jax.jit
        def _synth_all(params, constants, rng):
            sig, _, _ = model.apply(
                {"params": params, "constants": constants},
                jnp.asarray(units), jnp.asarray(f0s), jnp.asarray(vols),
                jnp.asarray(spk), infer=False, rngs={"noise": rng},
            )
            return sig

        key = jax.random.key(args.seed)
        curve = []
        t0 = time.time()
        for s in range(args.steps):
            idx = idx_at(s)
            batch = {
                "audio": jnp.asarray(audio[idx]),
                "units": jnp.asarray(units[idx]),
                "f0": jnp.asarray(f0s[idx]),
                "volume": jnp.asarray(vols[idx]),
                "spk_id": jnp.asarray(spk[idx]),
            }
            state, _ = step_fn(state, batch, key)
            if (s + 1) % args.eval_every == 0 or s == 0:
                sig = _synth_all(state.params, state.constants, jax.random.key(42))
                m = metrics_of(np.asarray(sig))
                curve.append((s + 1, *m))
                print(f"[jax] step {s+1}: dense-MSS {m[0]:.4f} mel-L1 {m[1]:.4f}",
                      file=sys.stderr, flush=True)
        results["jax"] = {"curve": curve, "wall_s": time.time() - t0}

    # ---- executed reference ------------------------------------------------
    if args.only in ("both", "ref"):
        t0 = time.time()
        torch.manual_seed(args.seed)
        ref_rss = ref_loss_mod.RSSLoss(fft_min, fft_max, n_scale=4, device="cpu")
        opt = torch.optim.AdamW(ref_model.parameters())
        for g in opt.param_groups:
            g["lr"] = args.lr
            g["weight_decay"] = 0.0  # reference configs train with wd forced from config
        t_units = torch.from_numpy(units)
        t_f0 = torch.from_numpy(f0s)
        t_vol = torch.from_numpy(vols)
        t_spk = torch.from_numpy(spk)
        t_audio = torch.from_numpy(audio)
        curve = []
        for s in range(args.steps):
            idx = torch.from_numpy(idx_at(s))
            opt.zero_grad()
            signal, _, _ = ref_model(
                t_units[idx], t_f0[idx], t_vol[idx], t_spk[idx], infer=False
            )
            loss = ref_rss(signal, t_audio[idx])
            loss.backward()
            opt.step()
            if (s + 1) % args.eval_every == 0 or s == 0:
                with torch.no_grad():
                    torch.manual_seed(42)
                    sig, _, _ = ref_model(t_units, t_f0, t_vol, t_spk, infer=False)
                m = metrics_of(sig.numpy())
                curve.append((s + 1, *m))
                print(f"[ref] step {s+1}: dense-MSS {m[0]:.4f} mel-L1 {m[1]:.4f}",
                      file=sys.stderr, flush=True)
        results["ref"] = {"curve": curve, "wall_s": time.time() - t0}

    def tail_mean(curve):
        """Mean of the last 3 evals — single-eval points carry the stochastic
        draw's transient (e.g. a 1.34 dense-MSS spike mid-plateau)."""
        tail = curve[-3:]
        return (float(np.mean([c[1] for c in tail])),
                float(np.mean([c[2] for c in tail])))

    for tag in ("jax", "ref"):
        if tag in results:
            results[tag]["final_tail3"] = tail_mean(results[tag]["curve"])
    if args.only == "both":
        jm, rm = results["jax"]["final_tail3"], results["ref"]["final_tail3"]
        results["final_rel_gap"] = {
            "dense_mss": abs(jm[0] - rm[0]) / rm[0],
            "mel_l1": abs(jm[1] - rm[1]) / rm[1],
        }
        results["noise_floor"] = 0.034
        results["pass"] = (
            results["final_rel_gap"]["mel_l1"] < 2 * 0.034
            and results["final_rel_gap"]["dense_mss"] < 2 * 0.034
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
