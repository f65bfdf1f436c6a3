"""Training drivers (monitor equivalents) and the jitted step factory."""

from .state import TrainState
from .step import make_eval_step, make_train_step
from .trainer import MONITORS, Trainer, build_monitor, register_monitor
from . import monitors as _monitors  # noqa: F401  (registers task monitors)

__all__ = [
    "MONITORS",
    "TrainState",
    "Trainer",
    "build_monitor",
    "make_eval_step",
    "make_train_step",
    "register_monitor",
]
