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
# exactness tests pin precision="highest": the production "high" tier is a
# 3-pass bf16 decomposition (~1e-4 abs err by design, measured 9.2e-5 on the
# flagship) and gets its own toleranced test below.
_CFG_IDS = ["small"]
CFGS = [UDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4,
                  precision="highest")]
if os.environ.get("RUN_SLOW"):
    CFGS.append(UDFConfig(precision="highest"))
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


def test_high_precision_tier_within_tolerance():
    """The 'high' tier (manual 3-pass bf16 in-kernel) must stay within the
    measured error envelope vs full f32 (scripts/profile_mfu.py: 9.2e-5)."""
    cfg_hi = UDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4,
                       precision="highest")
    cfg = UDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4,
                    precision="high")
    params = init_udf_params(jax.random.key(2), cfg)
    pts = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, size=(70, 3)),
        dtype=jnp.float32,
    )
    ref = np.asarray(udf_value(params, pts, cfg_hi))
    v, g = pallas_udf_value_and_grad(params, pts, cfg, tile=64, interpret=True)
    np.testing.assert_allclose(np.asarray(v), ref, atol=3e-4)
    ref_g = np.asarray(udf_gradient(params, pts, cfg_hi))
    np.testing.assert_allclose(np.asarray(g), ref_g, atol=5e-3)
