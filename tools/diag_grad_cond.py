#!/usr/bin/env python
"""Diagnose whether the to_k bias gradient mismatch in the train-parity A/B
is fp32 cancellation noise: compare reference grads computed in fp32 vs fp64."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

sys.path.append("/root/reference")

import numpy as np
from torch_stubs import install_stubs

install_stubs()
import torch
from ddsp import vocoder, loss as ref_loss  # type: ignore

from test_train_parity import (
    _batch, _noise, _ref_loss_fn, _torch_forward_loss, _torch_grad_dict,
    SR, BLOCK, N_UNIT, N_SPK,
)

torch.manual_seed(0)
model32 = vocoder.CombSubFast(SR, BLOCK, n_unit=N_UNIT, n_spk=N_SPK)
batch = _batch(0)
noise = _noise(100)
loss_fn = _ref_loss_fn(ref_loss, torch)

model32.zero_grad()
_torch_forward_loss(model32, loss_fn, batch, noise, torch).backward()
g32 = _torch_grad_dict(model32)

torch.manual_seed(0)
model64 = vocoder.CombSubFast(SR, BLOCK, n_unit=N_UNIT, n_spk=N_SPK)
model64.load_state_dict(model32.state_dict())
model64.double()
torch.set_default_dtype(torch.float64)
batch64 = tuple(b.astype(np.float64) if b.dtype == np.float32 else b for b in batch)
model64.zero_grad()
_torch_forward_loss(model64, loss_fn, batch64, noise.astype(np.float64), torch).backward()
g64 = _torch_grad_dict(model64)

rows = []
for k in g32:
    a, b = np.asarray(g32[k], dtype=np.float64), np.asarray(g64[k], dtype=np.float64)
    if a.shape != b.shape or np.allclose(a, b):
        continue
    nb = np.linalg.norm(b)
    rel = np.linalg.norm(a - b) / (nb + 1e-12)
    rows.append((rel, nb, k))
rows.sort(reverse=True)
for rel, nb, k in rows[:15]:
    print(f"{rel:10.3e}  norm={nb:10.3e}  {k}")
