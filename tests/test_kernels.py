"""Pallas kernel correctness vs the pure-JAX field implementation.

On CPU these run in interpret mode (same kernel code path, no TPU needed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emap_tpu.fields import (
    UDFConfig,
    init_udf_params,
    udf_gradient,
    udf_value,
)
from emap_tpu.kernels import pallas_udf_value, pallas_udf_value_and_grad

import os

# interpret-mode pallas on this 1-core host is minutes per flagship-size
# test; run the full 8x256 configuration only when RUN_SLOW=1 (it is also
# exercised on real TPU by the extraction path / bench).
_CFG_IDS = ["small"]
CFGS = [UDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4)]
if os.environ.get("RUN_SLOW"):
    CFGS.append(UDFConfig())
    _CFG_IDS.append("flagship")


@pytest.mark.parametrize("cfg", CFGS, ids=_CFG_IDS)
def test_value_matches_reference_impl(cfg):
    params = init_udf_params(jax.random.key(0), cfg)
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, size=(70, 3)),
        dtype=jnp.float32,
    )
    ours = np.asarray(
        pallas_udf_value(params, pts, cfg, tile=64, interpret=True)
    )
    ref = np.asarray(udf_value(params, pts, cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("cfg", CFGS, ids=_CFG_IDS)
def test_value_and_grad_matches_autodiff(cfg):
    params = init_udf_params(jax.random.key(1), cfg)
    pts = jnp.asarray(
        np.random.default_rng(1).uniform(-0.9, 0.9, size=(70, 3)),
        dtype=jnp.float32,
    )
    udf, grad = pallas_udf_value_and_grad(
        params, pts, cfg, tile=64, interpret=True
    )
    ref_v = np.asarray(udf_value(params, pts, cfg))
    ref_g = np.asarray(udf_gradient(params, pts, cfg))
    np.testing.assert_allclose(np.asarray(udf), ref_v, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad), ref_g, rtol=2e-4, atol=2e-5)
