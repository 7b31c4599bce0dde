#!/usr/bin/env python
"""Micro-benchmark: Pallas fused PE+MLP query kernels vs plain XLA, on the
flagship 8x256 UDF field (extraction workload shapes).

Prints one JSON line per variant with points/sec.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from emap_tpu.fields import (
        UDFConfig,
        init_udf_params,
        udf_value,
        udf_value_and_gradient,
    )
    from emap_tpu.kernels import pallas_udf_value, pallas_udf_value_and_grad

    cfg = UDFConfig()
    params = init_udf_params(jax.random.key(0), cfg)
    n = int(1 << 18)  # 262144 points per call (extraction chunk scale)
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, size=(n, 3)), jnp.float32
    )

    xla_value = jax.jit(lambda p: udf_value(params, p, cfg))
    xla_vg = jax.jit(lambda p: udf_value_and_gradient(params, p, cfg))
    # jit the full wrappers: production call sites (extraction chunks,
    # sampler) invoke the kernel INSIDE jit, so encode/pack fuse into the
    # same program; calling them eagerly would time per-op tunnel dispatch
    pl_value = jax.jit(lambda p: pallas_udf_value(params, p, cfg))
    pl_vg = jax.jit(lambda p: pallas_udf_value_and_grad(params, p, cfg))

    def timeit(name, fn, iters=20):
        out = fn(pts)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(pts)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(
            json.dumps(
                {
                    "metric": name,
                    "value": round(n / dt / 1e6, 2),
                    "unit": "Mpoints/s",
                    "ms_per_call": round(dt * 1e3, 2),
                },
                ),
            flush=True,
        )
        return n / dt

    v_x = timeit("xla_value", lambda p: xla_value(p))
    v_p = timeit("pallas_value", lambda p: pl_value(p))
    g_x = timeit("xla_value_and_grad", lambda p: xla_vg(p))
    g_p = timeit("pallas_value_and_grad", lambda p: pl_vg(p))
    print(
        json.dumps(
            {
                "metric": "pallas_speedup",
                "value_fwd": round(v_p / v_x, 2),
                "value_grad": round(g_p / g_x, 2),
            }
        ),
        flush=True,
    )
    bench_train_kernel()


def bench_train_kernel():
    """TRAIN-path query: second-order value_and_grad (loss differentiated
    w.r.t. params THROUGH the spatial gradient) at render_core shapes —
    the fused kernel's hand-derived backward vs XLA autodiff, plus the
    weight-grad error of each vs full-f32 XLA."""
    from emap_tpu.fields import (
        UDFConfig, init_udf_params, udf_value_and_gradient,
    )
    from emap_tpu.kernels.mlp_train import (
        pallas_udf_train_value_and_gradient,
    )

    n = 1024 * 114  # flagship step: 1024 rays x 114 samples
    cfg = UDFConfig()  # production precision tier ("high")
    cfg_hi = UDFConfig(precision="highest")
    params = init_udf_params(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    w_u = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    w_g = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)

    def make(qfn, c):
        def loss(p):
            u, g = qfn(p, pts, c)
            return (jnp.mean(w_u * u) + jnp.mean(jnp.sum(w_g * g, -1))
                    + 0.1 * jnp.mean((jnp.linalg.norm(g, -1) - 1.0) ** 2))
        return jax.jit(jax.value_and_grad(loss))

    def timegrad(fn, iters=30):
        v, g = fn(params)
        jax.block_until_ready(v)
        t0 = time.perf_counter()
        for _ in range(iters):
            v, g = fn(params)
        jax.block_until_ready(v)
        return (time.perf_counter() - t0) / iters, g

    def relerr(a, b):
        worst = 0.0
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            worst = max(worst, float(jnp.max(jnp.abs(x - y))
                        / (jnp.max(jnp.abs(y)) + 1e-12)))
        return worst

    t_x, g_x = timegrad(make(udf_value_and_gradient, cfg))
    _, g_hi = timegrad(make(udf_value_and_gradient, cfg_hi), iters=3)
    t_p, g_p = timegrad(
        make(lambda p, x, c: pallas_udf_train_value_and_gradient(p, x, c),
             cfg))
    print(json.dumps({
        "metric": "train_query_second_order",
        "xla_ms": round(t_x * 1e3, 2),
        "pallas_ms": round(t_p * 1e3, 2),
        "speedup": round(t_x / t_p, 2),
        "grad_relerr_pallas_vs_f32": relerr(g_p, g_hi),
        "grad_relerr_xla_vs_f32": relerr(g_x, g_hi),
    }), flush=True)


if __name__ == "__main__":
    main()
