from .wavio import read_wav, write_wav, load_audio, get_duration
from .slicer import Slicer, split_segments, frame_rms
from .dataset import AudioDataset, BatchIterator, get_data_loaders, traverse_dir
from .world_f0 import dio, harvest, stonemask

__all__ = [
    "read_wav", "write_wav", "load_audio", "get_duration",
    "Slicer", "split_segments", "frame_rms",
    "AudioDataset", "BatchIterator", "get_data_loaders", "traverse_dir",
    "dio", "harvest", "stonemask",
]
