"""Adam with per-leaf learning rates and *dynamic* trainability masks.

The reference uses torch Adam with 3 param groups whose learning rates are
mutated every step and whose members' `requires_grad` flags flip at runtime
(runner_base.py:110-160, runner_udf.py:140-154). optax's masking is static, so
this is a ~40-line Adam (torch semantics: bias-corrected moments, eps outside
the sqrt) where each leaf carries its own lr and a traced 0/1 mask:

* mask == 0 -> the leaf's params, moments, AND step count are all left
  untouched, exactly like a torch param with requires_grad=False (grad None,
  Adam state frozen).
* lr is a traced scalar per leaf, so the two cosine schedules run inside jit.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: Any  # first moments, same tree as params
    nu: Any  # second moments
    count: Any  # per-leaf step counts (f32 scalars)


def adam_init(params) -> AdamState:
    zeros = lambda p: jnp.zeros_like(p)
    return AdamState(
        mu=jax.tree.map(zeros, params),
        nu=jax.tree.map(zeros, params),
        count=jax.tree.map(lambda p: jnp.zeros((), jnp.float32), params),
    )


def adam_update(
    params,
    grads,
    state: AdamState,
    lr_tree,
    mask_tree,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """Returns (new_params, new_state). lr_tree/mask_tree: trees of scalars
    (broadcastable against each leaf)."""

    def leaf(p, g, m, v, c, lr, mask):
        c_new = c + mask
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * g * g
        # guard c_new >= 1 to avoid 0/0 when the leaf has never stepped
        denom_c = jnp.maximum(c_new, 1.0)
        m_hat = m_new / (1.0 - b1**denom_c)
        v_hat = v_new / (1.0 - b2**denom_c)
        p_new = p - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        return (
            jnp.where(mask > 0, p_new, p),
            jnp.where(mask > 0, m_new, m),
            jnp.where(mask > 0, v_new, v),
            c_new,
        )

    out = jax.tree.map(leaf, params, grads, state.mu, state.nu, state.count,
                       lr_tree, mask_tree)
    # out is a tree of 4-tuples; split it
    new_params = jax.tree.map(lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree.map(lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple))
    new_nu = jax.tree.map(lambda t: t[2], out, is_leaf=lambda x: isinstance(x, tuple))
    new_count = jax.tree.map(lambda t: t[3], out, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, AdamState(new_mu, new_nu, new_count)
