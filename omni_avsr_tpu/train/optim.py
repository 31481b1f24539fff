"""Optimizer and LR schedule.

Parity targets:
  - AdamW betas (0.9, 0.98), weight-decay 0.1, grad-clip 10.0
    (`lightning_OmniAVSR.py:152-157`, `train_OmniAVSR.py:327-331`)
  - WarmupCosineScheduler: linear warmup over warmup_epochs, then cosine to 0
    over the remaining steps, stepped per optimizer step (`utils/cosine.py:6-25`).
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig


def warmup_cosine_schedule(
    base_lr: float,
    warmup_epochs: float,
    total_epochs: int,
    steps_per_epoch: float,
) -> optax.Schedule:
    """The reference's WarmupCosineScheduler (`utils/cosine.py:6-25`):
    lr(step) = base * step/warmup_steps              (step < warmup_steps)
             = base * 0.5*(1+cos(pi * (step-warmup) / (total-warmup)))
    """
    warmup_steps = warmup_epochs * steps_per_epoch
    total_steps = total_epochs * steps_per_epoch

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = count / jnp.maximum(warmup_steps, 1.0)
        denom = jnp.maximum(total_steps - warmup_steps, 1.0)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * (count - warmup_steps) / denom))
        lr = jnp.where(count < warmup_steps, warm, cos) * base_lr
        return jnp.maximum(lr, 0.0)

    return schedule


def make_optimizer(
    cfg: TrainConfig,
    steps_per_epoch: float,
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    schedule = warmup_cosine_schedule(
        cfg.lr, cfg.warmup_epochs, cfg.max_epochs, steps_per_epoch
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=schedule,
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            weight_decay=cfg.weight_decay,
        ),
    )
    return tx, schedule
