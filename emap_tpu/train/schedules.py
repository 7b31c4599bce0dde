"""Learning-rate and annealing schedules as pure functions of the step.

Functional equivalents of the reference's in-place optimizer mutation
(src/runner/runner_base.py:128-180). All take a traced int/float step and
return f32 scalars, so they live inside the jitted train step.
"""

from __future__ import annotations

import jax.numpy as jnp


def lr_factor(step, warm_up_end: float, end_iter: float, alpha: float):
    """Warmup then cosine decay to `alpha` (runner_base.py:128-141)."""
    step = jnp.asarray(step, jnp.float32)
    warm = step / jnp.maximum(warm_up_end, 1.0)
    progress = (step - warm_up_end) / jnp.maximum(end_iter - warm_up_end, 1.0)
    cos = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
    return jnp.where(step < warm_up_end, warm, cos)


def lr_factor_geo(
    step, fix_geo_end: float, warm_up_end: float, end_iter: float, alpha: float
):
    """Geometry-group schedule: 0 until fix_geo_end, ramp to 2x warmup, flat
    to 50% of training, then cosine decay (runner_base.py:143-160)."""
    step = jnp.asarray(step, jnp.float32)
    ramp = step / jnp.maximum(warm_up_end * 2.0, 1.0)
    progress = (step - end_iter * 0.5) / jnp.maximum(end_iter * 0.5, 1.0)
    cos = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
    return jnp.where(
        step < fix_geo_end,
        0.0,
        jnp.where(
            step < warm_up_end * 2.0,
            ramp,
            jnp.where(step < end_iter * 0.5, 1.0, cos),
        ),
    )


def cos_anneal_ratio(step, anneal_end: float):
    """min(1, step/anneal_end); 1.0 when anneal_end == 0
    (runner_base.py:162-166)."""
    if anneal_end == 0.0:
        return jnp.float32(1.0)
    return jnp.minimum(1.0, jnp.asarray(step, jnp.float32) / anneal_end)


def flip_saturation(step, end_iter: float, start: float = 10000.0, max_val: float = 0.9):
    """0 before `start`, max_val until 50% of training, then 1.0
    (runner_base.py:171-180)."""
    step = jnp.asarray(step, jnp.float32)
    return jnp.where(
        step < start,
        0.0,
        jnp.where(step < end_iter * 0.5, max_val, 1.0),
    )
