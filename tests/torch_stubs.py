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

    for name in ["pyworld", "parselmouth", "torchcrepe", "resampy"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)

    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        tat = types.ModuleType("torchaudio.transforms")

        class Resample:
            def __init__(self, *a, **k):
                raise NotImplementedError("stub")

        tat.Resample = Resample
        ta.transforms = tat
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tat
