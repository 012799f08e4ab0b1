from .config import DotDict, load_config, save_config, deep_update
from . import convert

__all__ = ["DotDict", "load_config", "save_config", "deep_update", "convert"]
