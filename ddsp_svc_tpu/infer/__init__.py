from .offline import run_inference, split, cross_fade, response_mask
from .enhancer import Enhancer, NsfHifiGAN

__all__ = [
    "run_inference", "split", "cross_fade", "response_mask",
    "Enhancer", "NsfHifiGAN",
]
