"""Optimizer / LR-scheduler factory.

Equivalent of the reference's conf-driven factory (src/utils/__init__.py:15-113
and src/utils/warmup_scheduler.py) built on optax. The EMAP pipeline itself
builds Adam directly (runner_base.py:110-117) and these helpers are auxiliary,
mirroring the reference where they exist for experimentation.
"""

from __future__ import annotations

import optax


def get_scheduler(
    scheduler_type: str,
    base_lr: float,
    num_steps: int,
    *,
    decay_step: int = 0,
    decay_gamma: float = 0.1,
    lr_min: float = 0.0,
    poly_exp: float = 0.9,
    warmup_steps: int = 0,
    warmup_multiplier: float = 1.0,
):
    """Step/cosine/poly schedules with optional gradual warmup (the
    reference's GradualWarmupScheduler semantics: linear ramp from
    base_lr/multiplier to base_lr over warmup_steps)."""
    if scheduler_type == "steplr":
        main = optax.exponential_decay(
            base_lr, transition_steps=max(decay_step, 1),
            decay_rate=decay_gamma, staircase=True,
        )
    elif scheduler_type == "cosine":
        main = optax.cosine_decay_schedule(
            base_lr, decay_steps=max(num_steps - warmup_steps, 1),
            alpha=lr_min / base_lr if base_lr else 0.0,
        )
    elif scheduler_type == "poly":
        main = optax.polynomial_schedule(
            init_value=base_lr, end_value=lr_min,
            power=poly_exp, transition_steps=max(num_steps - warmup_steps, 1),
        )
    else:
        raise ValueError(f"unknown scheduler {scheduler_type!r}")

    if warmup_steps > 0:
        warmup = optax.linear_schedule(
            init_value=base_lr / max(warmup_multiplier, 1e-8),
            end_value=base_lr,
            transition_steps=warmup_steps,
        )
        return optax.join_schedules([warmup, main], [warmup_steps])
    return main


def get_optimizer(
    optimizer_type: str,
    learning_rate,
    *,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    eps: float = 1e-8,
):
    """sgd / adam / adamw / radam (the reference also offers 'ranger', which
    has no optax equivalent; radam is the closest member of that family)."""
    if optimizer_type == "sgd":
        tx = optax.sgd(learning_rate, momentum=momentum)
    elif optimizer_type == "adam":
        tx = optax.adam(learning_rate, eps=eps)
    elif optimizer_type == "adamw":
        tx = optax.adamw(learning_rate, eps=eps, weight_decay=weight_decay)
    elif optimizer_type in ("radam", "ranger"):
        tx = optax.radam(learning_rate, eps=eps)
    else:
        raise ValueError(f"unknown optimizer {optimizer_type!r}")
    if weight_decay and optimizer_type not in ("adamw",):
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx
