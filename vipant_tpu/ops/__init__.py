"""TPU-native ops: audio frontend, SpecAugment, interpolation, attention."""

from .fbank_np import FbankParams
from .fbank_np import fbank as fbank_np
from .fbank import fbank, fbank_fixed_len
from .specaugment import freq_mask, spec_augment, time_mask

__all__ = [
    "FbankParams",
    "fbank",
    "fbank_np",
    "fbank_fixed_len",
    "freq_mask",
    "time_mask",
    "spec_augment",
]
