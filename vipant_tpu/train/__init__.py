"""Training drivers (monitor equivalents) and the jitted step factory."""

from .state import TrainState
from .step import make_eval_step, make_train_step

__all__ = ["TrainState", "make_eval_step", "make_train_step"]
