"""Scalar networks: variance (inv_s) and beta/gamma/zeta.

Functional equivalents of SingleVarianceNetwork and BetaNetwork
(reference src/models/udf_model.py:212-286). Each is a tiny pytree of (1,)
parameters; trainability gating is handled by the optimizer's dynamic masks
(emap_tpu/train/optim.py), not by mutating requires_grad.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


def init_variance_params(init_val: float) -> Params:
    v = jnp.asarray([init_val], dtype=jnp.float32)
    return {"variance": v, "second_variance": v}


def inv_s_value(params: Params) -> jnp.ndarray:
    """exp(10 * variance), the NeuS inv_s (udf_model.py:227)."""
    return jnp.exp(params["variance"] * 10.0)


def init_beta_params(
    init_var_beta: float = 0.1,
    init_var_gamma: float = 0.1,
    init_var_zeta: float = 0.05,
) -> Params:
    return {
        "beta": jnp.asarray([init_var_beta], dtype=jnp.float32),
        "gamma": jnp.asarray([init_var_gamma], dtype=jnp.float32),
        "zeta": jnp.asarray([init_var_zeta], dtype=jnp.float32),
    }


def beta_gamma_zeta(params: Params, beta_min: float = 0.00005):
    """(beta, gamma, zeta) with the reference's clips (udf_model.py:259-271)."""
    beta = jnp.clip(jnp.exp(params["beta"] * 10.0), 0.0, 1.0 / beta_min)
    gamma = jnp.exp(params["gamma"] * 10.0)
    zeta = jnp.abs(params["zeta"])
    return beta, gamma, zeta
