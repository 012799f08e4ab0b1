#!/usr/bin/env python
"""Print the full per-leaf gradient A/B report (jax vs executed reference)."""
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))
sys.path.append("/root/reference")

import numpy as np
from torch_stubs import install_stubs

install_stubs()
import torch

import jax

jax.config.update("jax_platforms", "cpu")

from ddsp import vocoder, loss as ref_loss  # type: ignore
from ddsp_svc_tpu.utils.convert import convert_synth_state_dict

from test_train_parity import (
    _batch, _noise, _ref_loss_fn, _torch_forward_loss, _torch_grad_dict,
    _jax_loss_and_grads, _build_pair, _flat,
)

ref_model, jax_model, variables = _build_pair(vocoder)
batch = _batch(0)
noise = _noise(100)
loss_fn = _ref_loss_fn(ref_loss, torch)
ref_model.zero_grad()
t_loss = _torch_forward_loss(ref_model, loss_fn, batch, noise, torch)
t_loss.backward()
ref_grads = convert_synth_state_dict(_torch_grad_dict(ref_model))["params"]
j_loss, j_grads = _jax_loss_and_grads(jax_model, variables, batch, noise)
print("loss:", float(j_loss), float(t_loss))

fr, fj = _flat(ref_grads), _flat(j_grads)
rows = []
for path in sorted(fr):
    a, b = np.asarray(fj[path], dtype=np.float64), fr[path].astype(np.float64)
    nb = np.linalg.norm(b)
    rel = np.linalg.norm(a - b) / (nb + 1e-12)
    cos = float(np.dot(a.ravel(), b.ravel()) / (np.linalg.norm(a) * nb + 1e-30))
    rows.append((rel, cos, nb, path))
rows.sort(reverse=True)
for rel, cos, nb, path in rows:
    print(f"{rel:10.3e}  cos={cos:+.6f}  norm={nb:10.3e}  {path}")
