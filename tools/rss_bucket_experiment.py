#!/usr/bin/env python
"""Bound the RSS bucket-set deviation with a real training A/B.

The reference draws each loss scale uniformly from EVERY integer n_fft in
[fft_min, fft_max) (/root/reference/ddsp/loss.py:34-43 — 1792 pre-built
Spectrogram modules). This framework deliberately redesigns that as a
static set of 16 log-spaced bucket sizes selected per step with lax.switch
(models/losses.py) so the train step stays one compiled XLA program. This
script measures what that deviation does to *training*, not just to fixed
draws:

  A: bucketed RSS (the framework default, 16 log-spaced sizes)
  B: dense-draw proxy — N_DENSE sizes drawn once uniformly from the full
     integer range (seeded), switch-selected per step; at 48 sizes this
     tracks the reference's continuous draw far more finely than the
     16-bucket grid while staying compilable

Identical model init, data, noise and draw seeds; both runs are evaluated
on a COMMON deterministic metric suite (the dense-set MSS average + log-mel
L1 vs ground truth), plus a gradient-cosine probe between the two loss
expectations at several checkpoints.

Usage:  python tools/rss_bucket_experiment.py [--steps 300] [--out PARITY-ish]
Writes a JSON summary to stdout; docs/PARITY.md quotes the result.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--n-dense", type=int, default=48)
    p.add_argument("--eval-every", type=int, default=50)
    p.add_argument("--draw-seed", type=int, default=1,
                   help="per-step loss draw PRNG seed (vary to measure the "
                        "run-to-run noise floor of the comparison)")
    p.add_argument("--only", choices=["both", "bucket", "dense"],
                   default="both")
    p.add_argument("--bucket-spacing", choices=["log", "linear"],
                   default="log")
    p.add_argument("--n-buckets", type=int, default=16)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ddsp_svc_tpu.models import CombSubFast, RSSLoss
    from ddsp_svc_tpu.models.losses import mel_l1
    from ddsp_svc_tpu.train import (
        create_optimizer, create_train_state, make_train_step,
    )

    sr, block, n_unit, f = 16000, 256, 64, 64  # 1.024 s crops
    fft_min, fft_max = 128, 1024
    b = args.batch

    # --- synthetic "singing" dataset: harmonic-rich target the synth can fit
    rng = np.random.default_rng(0)
    n_items = 8
    t = np.arange(f * block) / sr
    audio, f0s = [], []
    for i in range(n_items):
        base = 120.0 * (1.3 ** (i % 4)) * (1 + 0.02 * np.sin(2 * np.pi * 1.7 * t))
        sig = sum(
            (0.5 ** k) * np.sin(2 * np.pi * (k + 1) * base * t)
            for k in range(6)
        )
        sig = (0.3 * sig * (0.6 + 0.4 * np.sin(2 * np.pi * 2.1 * t))).astype(
            np.float32
        )
        sig += 0.003 * rng.standard_normal(sig.shape).astype(np.float32)
        audio.append(sig)
        f0s.append(np.repeat(base[:: block], 1)[:f].astype(np.float32))
    audio = np.stack(audio)
    f0s = np.stack(f0s)[..., None]
    units = rng.standard_normal((n_items, f, n_unit)).astype(np.float32)
    vols = np.sqrt(
        np.mean(audio.reshape(n_items, f, block) ** 2, axis=-1)
    ).astype(np.float32)
    spk = np.ones((n_items, 1), dtype=np.int64)

    def batch_at(step):
        idx = np.random.default_rng(1000 + step).integers(0, n_items, b)
        return {
            "audio": jnp.asarray(audio[idx]),
            "units": jnp.asarray(units[idx]),
            "f0": jnp.asarray(f0s[idx]),
            "volume": jnp.asarray(vols[idx]),
            "spk_id": jnp.asarray(spk[idx]),
        }

    dense_sizes = tuple(
        int(s)
        for s in np.sort(
            np.random.default_rng(7).choice(
                np.arange(fft_min, fft_max), size=args.n_dense, replace=False
            )
        )
    )
    if args.bucket_spacing == "linear":
        lin = tuple(int(v) for v in np.unique(np.round(
            np.linspace(fft_min, fft_max - 1, args.n_buckets)).astype(int)))
        loss_bucket = RSSLoss(fft_min, fft_max, n_scale=4, buckets=lin)
    else:
        loss_bucket = RSSLoss(fft_min, fft_max, n_scale=4,
                              n_buckets=args.n_buckets)
    loss_dense = RSSLoss(fft_min, fft_max, n_scale=4, buckets=dense_sizes)
    eval_loss = RSSLoss(fft_min, fft_max, n_scale=4, buckets=dense_sizes)

    model = CombSubFast(sampling_rate=sr, block_size=block, n_unit=n_unit,
                        n_spk=2)
    optimizer = create_optimizer(5e-4)

    def run(loss_fn, tag):
        step_fn = make_train_step(model, loss_fn, optimizer)
        state = create_train_state(model, optimizer, batch_at(0),
                                   jax.random.key(0))
        key = jax.random.key(args.draw_seed)
        curve = []
        for s in range(args.steps):
            state, _ = step_fn(state, batch_at(s), key)
            if (s + 1) % args.eval_every == 0 or s == 0:
                m = evaluate(state)
                curve.append((s + 1, *m))
                print(f"[{tag}] step {s+1}: dense-MSS {m[0]:.4f} "
                      f"mel-L1 {m[1]:.4f}", file=sys.stderr, flush=True)
        return state, curve

    eval_batch = batch_at(99999)

    @jax.jit
    def _synth(params, constants, rng):
        sig, _, _ = model.apply(
            {"params": params, "constants": constants},
            eval_batch["units"], eval_batch["f0"], eval_batch["volume"],
            eval_batch["spk_id"], infer=False, rngs={"noise": rng},
        )
        return sig

    @jax.jit
    def _metrics(sig):
        return (
            eval_loss.mss(sig, eval_batch["audio"]),
            mel_l1(sig, eval_batch["audio"], sr=sr, n_fft=1024, hop=256,
                   n_mels=40),
        )

    def evaluate(state):
        sig = _synth(state.params, state.constants, jax.random.key(42))
        m = _metrics(sig)
        return float(m[0]), float(m[1])

    # gradient-cosine probe: expectation-gradients of the two losses wrt the
    # synthesized waveform at the final states
    def grad_cos_at(state):
        return grad_cos(state)

    def grad_cos(state):
        sig = _synth(state.params, state.constants, jax.random.key(42))
        ga = jax.grad(lambda s: loss_bucket.mss(s, eval_batch["audio"]))(sig)
        gb = jax.grad(lambda s: loss_dense.mss(s, eval_batch["audio"]))(sig)
        ga, gb = np.asarray(ga).ravel(), np.asarray(gb).ravel()
        return float(
            np.dot(ga, gb) / (np.linalg.norm(ga) * np.linalg.norm(gb) + 1e-12)
        )

    t0 = time.time()
    if args.only == "bucket":
        state_a, curve_a = run(loss_bucket, f"bucket{args.n_buckets}{args.bucket_spacing}")
        print(json.dumps({"arm": f"bucket{args.n_buckets}{args.bucket_spacing}", "draw_seed": args.draw_seed,
                          "curve": curve_a,
                          "grad_cosine": grad_cos_at(state_a)}))
        return
    if args.only == "dense":
        state_b, curve_b = run(loss_dense, f"dense{args.n_dense}")
        print(json.dumps({"arm": f"dense{args.n_dense}",
                          "draw_seed": args.draw_seed, "curve": curve_b,
                          "grad_cosine": grad_cos_at(state_b)}))
        return
    state_a, curve_a = run(loss_bucket, "bucket16")
    state_b, curve_b = run(loss_dense, f"dense{args.n_dense}")

    summary = {
        "steps": args.steps,
        "bucket16_final": {"dense_mss": curve_a[-1][1], "mel_l1": curve_a[-1][2]},
        f"dense{args.n_dense}_final": {
            "dense_mss": curve_b[-1][1], "mel_l1": curve_b[-1][2],
        },
        "final_metric_rel_gap": {
            "dense_mss": abs(curve_a[-1][1] - curve_b[-1][1])
            / max(curve_b[-1][1], 1e-9),
            "mel_l1": abs(curve_a[-1][2] - curve_b[-1][2])
            / max(curve_b[-1][2], 1e-9),
        },
        "grad_cosine_bucket_vs_dense": {
            "at_bucket_trained": grad_cos(state_a),
            "at_dense_trained": grad_cos(state_b),
        },
        "curves": {"bucket16": curve_a, f"dense{args.n_dense}": curve_b},
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
