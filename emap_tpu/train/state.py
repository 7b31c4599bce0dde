"""Functional training state.

Replaces the reference's scattered mutable training state -- iter_step on the
runner, requires_grad flags on the modules, the local `beta_flag` in the train
loop (runner_udf.py:52, :140-154) -- with one pytree the jitted step threads
through.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from emap_tpu.fields.scalars import init_beta_params, init_variance_params
from emap_tpu.fields.udf import UDFConfig, init_udf_params
from emap_tpu.train.optim import AdamState, adam_init


@dataclasses.dataclass
class TrainState:
    params: Any  # {'udf','variance','beta'}
    opt: AdamState
    step: jnp.ndarray  # int32 scalar
    key: jax.Array  # threaded PRNG key
    # epoch-permutation stream root (runner_udf.py:46, :249-250). Carried in
    # the state (a runtime input) rather than closed over in the step so the
    # compiled program is seed-independent: baking it as a trace-time
    # constant forced a full recompile of the chained train program for
    # every new train.seed. Derived as key(seed + 7919) from init_train_state
    # — the same stream as the old trace-time constant whenever the state
    # seed equals train.seed (always true through the Runner/CLI), so
    # production trajectories are bit-identical to the recorded results.
    perm_key: jax.Array
    # dynamic trainability gates (runner_udf.py:140-154)
    beta_trainable: jnp.ndarray  # bool
    gamma_trainable: jnp.ndarray  # bool
    zeta_trainable: jnp.ndarray  # bool
    variance_trainable: jnp.ndarray  # bool
    beta_gate_armed: jnp.ndarray  # bool: `beta_flag` in the reference loop


jax.tree_util.register_dataclass(
    TrainState,
    data_fields=[
        "params",
        "opt",
        "step",
        "key",
        "perm_key",
        "beta_trainable",
        "gamma_trainable",
        "zeta_trainable",
        "variance_trainable",
        "beta_gate_armed",
    ],
    meta_fields=[],
)


def init_train_state(
    seed: int,
    udf_cfg: UDFConfig,
    variance_init: float = 0.3,
    beta_init: float = 0.5,
    gamma_init: float = 0.3,
    zeta_init: float = 0.3,
    requires_grad_beta: bool = True,
    requires_grad_gamma: bool = True,
    requires_grad_zeta: bool = False,
    requires_grad_variance: bool = True,
) -> TrainState:
    key = jax.random.key(seed)
    k_init, k_loop = jax.random.split(key)
    params = {
        "udf": init_udf_params(k_init, udf_cfg),
        "variance": init_variance_params(variance_init),
        "beta": init_beta_params(beta_init, gamma_init, zeta_init),
    }
    return TrainState(
        params=params,
        opt=adam_init(params),
        step=jnp.zeros((), jnp.int32),
        key=k_loop,
        # same stream as the historical trace-time constant (seed + 7919)
        perm_key=jax.random.key(seed + 7919),
        beta_trainable=jnp.asarray(requires_grad_beta),
        gamma_trainable=jnp.asarray(requires_grad_gamma),
        zeta_trainable=jnp.asarray(requires_grad_zeta),
        variance_trainable=jnp.asarray(requires_grad_variance),
        beta_gate_armed=jnp.asarray(True),
    )
