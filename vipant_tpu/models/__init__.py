"""Task models and assembly."""

from .build import (
    build_main_model,
    example_batch,
    init_model,
    port_model_from_clip,
    siamese_ties,
    tunable_mask,
)
from .tasks import (
    MODELS,
    CVAP,
    CLAP,
    CVALP,
    CVASP,
    ASClassifier,
    CLVP,
    ESClassifier,
)

build_model = build_main_model

__all__ = [
    "MODELS",
    "CVAP",
    "CLAP",
    "CVALP",
    "CVASP",
    "ASClassifier",
    "CLVP",
    "ESClassifier",
    "build_main_model",
    "build_model",
    "example_batch",
    "init_model",
    "port_model_from_clip",
    "siamese_ties",
    "tunable_mask",
]
