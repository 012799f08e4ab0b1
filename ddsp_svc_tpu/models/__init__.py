from .synths import Sins, CombSub, CombSubFast
from .losses import sss_loss, RSSLoss, mel_l1, default_buckets
from .factory import build_model, load_model, make_jitted_synth
from .incremental import IncrementalCombSubFast

__all__ = [
    "Sins", "CombSub", "CombSubFast",
    "sss_loss", "RSSLoss", "mel_l1", "default_buckets",
    "build_model", "load_model", "make_jitted_synth",
    "IncrementalCombSubFast",
]
