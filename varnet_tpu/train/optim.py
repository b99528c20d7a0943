"""Optimizer construction.

TPU-native replacement for the reference's optimizer block
(reference: ``TFModel.py`` — ``tf.train.AdamOptimizer`` with an RMSProp
option and LR schedule, SURVEY.md §2.1 #2).  Built on optax so the update
is a pure pytree transform that jits into the train step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import optax


@dataclass(frozen=True)
class OptimizerConfig:
    """Optimizer + schedule selection (reference ctor kwargs equivalent).

    name:        'adam' | 'rmsprop' | 'sgd'
    lr:          base learning rate
    decay_rate:  if set, exponential decay factor applied every
                 ``decay_steps`` steps (staircase=False)
    decay_steps: period for the exponential decay
    grad_clip:   optional global-norm gradient clip
    """

    name: str = "adam"
    lr: float = 1e-3
    decay_rate: Optional[float] = None
    decay_steps: int = 10_000
    grad_clip: Optional[float] = None


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    if cfg.decay_rate is not None:
        schedule = optax.exponential_decay(
            init_value=cfg.lr,
            transition_steps=int(cfg.decay_steps),
            decay_rate=float(cfg.decay_rate),
        )
    else:
        schedule = cfg.lr
    if cfg.name == "adam":
        core = optax.adam(schedule)
    elif cfg.name == "rmsprop":
        core = optax.rmsprop(schedule)
    elif cfg.name == "sgd":
        core = optax.sgd(schedule)
    else:
        raise ValueError(f"unknown optimizer '{cfg.name}' (adam|rmsprop|sgd)")
    if cfg.grad_clip is not None:
        return optax.chain(optax.clip_by_global_norm(float(cfg.grad_clip)), core)
    return core
