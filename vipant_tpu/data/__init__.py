"""Host-side data pipeline: index files, decode, transforms, loaders.

Builder surface parity with `/root/reference/cvap/data/__init__.py:1-12`.
"""

from .audio_text import build_audio_text_dataloader
from .audioset import (
    build_audioset_dataloader,
    build_audioset_label_map,
    build_filter_set,
)
from .esc50 import build_xfold_dataloader_list
from .image_audio import build_image_audio_dataloader
from .image_text import build_image_text_dataloader
from .loader import DataLoader
from .wav import read_wav, write_wav

build_audioset_clf_dataloader = build_audioset_dataloader

__all__ = [
    "DataLoader",
    "build_audio_text_dataloader",
    "build_audioset_clf_dataloader",
    "build_audioset_dataloader",
    "build_audioset_label_map",
    "build_filter_set",
    "build_image_audio_dataloader",
    "build_image_text_dataloader",
    "build_xfold_dataloader_list",
    "read_wav",
    "write_wav",
]
