from .offline import run_inference, split, cross_fade, response_mask
from .enhancer import Enhancer, NsfHifiGAN
from .realtime import IncrementalSession

__all__ = [
    "run_inference", "split", "cross_fade", "response_mask",
    "Enhancer", "NsfHifiGAN", "IncrementalSession",
]
