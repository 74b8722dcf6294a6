"""Optimizer + LR schedule factory (optax).

Equivalent of reference engine/solver.py:5-22: sgd(momentum, wd) / adam /
rmsprop with a MultiStepLR schedule (gamma decay at epoch milestones).
"""

from __future__ import annotations

import optax

from ..config import Config


def make_lr_schedule(cfg: Config, steps_per_epoch: int):
    """MultiStepLR: lr * GAMMA**(#milestones passed), stepped per epoch
    (reference solver.py:16-19 + trainer.py:123).  Any other
    SOLVER.SCHEDULER fails loudly, exactly like the reference
    (solver.py:20-21 raises NotImplementedError)."""
    s = cfg.SOLVER
    if s.SCHEDULER != "multistep":
        raise NotImplementedError(f"SOLVER.SCHEDULER={s.SCHEDULER!r}")
    boundaries = {int(e) * steps_per_epoch: s.GAMMA for e in s.STEPS}
    return optax.piecewise_constant_schedule(s.BASE_LR, boundaries)


def make_optimizer(cfg: Config, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    s = cfg.SOLVER
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    if s.OPTIMIZER == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(s.WEIGHT_DECAY) if s.WEIGHT_DECAY else optax.identity(),
            optax.sgd(schedule, momentum=s.MOMENTUM),
        )
    elif s.OPTIMIZER == "adam":
        tx = optax.chain(
            optax.add_decayed_weights(s.WEIGHT_DECAY) if s.WEIGHT_DECAY else optax.identity(),
            optax.adam(schedule),
        )
    elif s.OPTIMIZER == "rmsprop":
        tx = optax.chain(
            optax.add_decayed_weights(s.WEIGHT_DECAY) if s.WEIGHT_DECAY else optax.identity(),
            optax.rmsprop(schedule),
        )
    else:
        raise NotImplementedError(s.OPTIMIZER)
    if s.BATCH_MUL > 1:
        # the reference defines SOLVER.BATCH_MUL but never wires it
        # (core/config.py:229); here gradient accumulation actually works
        tx = optax.MultiSteps(tx, every_k_schedule=s.BATCH_MUL)
    return tx
