"""Neural modules: layers, MetaHead stages, towers, loss heads."""

from .heads import (
    AUDIO_HEADS,
    IMAGE_HEADS,
    TEXT_HEADS,
    DummyHead,
    TextTower,
    VisionTower,
    build_audio_head,
    build_image_head,
    build_text_head,
    normalize,
)
from .layers import LayerNorm, MultiHeadAttention, Transformer, quick_gelu
from .stages import ENCODER_MODULES, vit_grid
from .deit import DeiTTower  # registers DeiTImageHead / NaiveDeiTAudioHead

__all__ = [
    "AUDIO_HEADS",
    "IMAGE_HEADS",
    "TEXT_HEADS",
    "ENCODER_MODULES",
    "DummyHead",
    "TextTower",
    "VisionTower",
    "build_audio_head",
    "build_image_head",
    "build_text_head",
    "normalize",
    "LayerNorm",
    "MultiHeadAttention",
    "Transformer",
    "quick_gelu",
    "vit_grid",
]
