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
from .hubert import HubertSoft, HubertDiscrete, compute_mask
from .crepe import CrepeFull, CrepeExtractor
from .nsf_hifigan import Generator as NsfHifiGanGenerator, sine_source
from .discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    feature_loss,
    discriminator_loss,
    generator_loss,
)

__all__ = [
    "Conv1d", "GroupNorm", "LayerNorm", "WeightNormDense", "leaky_relu", "glu",
    "PCmer", "PCmerLayer", "SelfAttention", "ConformerConvModule",
    "linear_attention", "causal_linear_attention", "softmax_kernel",
    "gaussian_orthogonal_random_matrix",
    "Unit2Control", "split_to_dict",
    "HubertSoft", "HubertDiscrete", "compute_mask",
    "CrepeFull", "CrepeExtractor",
    "NsfHifiGanGenerator", "sine_source",
    "MultiPeriodDiscriminator", "MultiScaleDiscriminator",
    "feature_loss", "discriminator_loss", "generator_loss",
]
