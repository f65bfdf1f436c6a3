"""Optimizers: LARS, schedules, freeze-mask assembly."""

from .build import build_optimizer
from .lars import lars, warmup_cosine_lr, warmup_multistep_lr

__all__ = ["build_optimizer", "lars", "warmup_cosine_lr", "warmup_multistep_lr"]
