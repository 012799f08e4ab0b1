from .layers import Conv1d, GroupNorm, LayerNorm, WeightNormDense, leaky_relu, glu
from .pcmer import (
    PCmer,
    PCmerLayer,
    SelfAttention,
    ConformerConvModule,
    linear_attention,
    causal_linear_attention,
    softmax_kernel,
    gaussian_orthogonal_random_matrix,
)
from .unit2control import Unit2Control, split_to_dict

__all__ = [
    "Conv1d", "GroupNorm", "LayerNorm", "WeightNormDense", "leaky_relu", "glu",
    "PCmer", "PCmerLayer", "SelfAttention", "ConformerConvModule",
    "linear_attention", "causal_linear_attention", "softmax_kernel",
    "gaussian_orthogonal_random_matrix",
    "Unit2Control", "split_to_dict",
]
