#!/usr/bin/env python
"""Measure UDFConfig.cache_acts (memoized backward-kernel activations) at
the production shape — the follow-through on the serial-chain residual:
BASELINE.md's bf16-tier floor analysis leaves ~36% of the backward kernel
unexplained by MXU passes, and the high->bf16 scaling (2.63x vs the 3x pass
arithmetic) bounds the non-MXU share at ~1.4 ms/step. The z-only residual
scheme re-derives sigmoid(100z) ~6x and softplus 2x per layer per tile on
the VPU; cache_acts computes each once (bit-identical, pinned by
tests/test_kernels_train.py::test_cache_acts_bitwise_identical) at +~14 MB
VMEM/tile-1024. This times kernel fwd+bwd and the full train step, both
knob states, at the production defaults (bf16 tier, fuse_pe on).

Prints one JSON line per variant; writes CA_OUT
(parity_results/bench_cache_acts.json). Env: CA_ITERS (30).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("CA_ITERS", "30"))


def bench_kernel():
    from emap_tpu.fields import UDFConfig, init_udf_params
    from emap_tpu.kernels.mlp_train import pallas_udf_train_value_and_gradient

    n = int(os.environ.get("CA_N", str(1024 * 114)))  # smoke: CA_N=2048
    params = init_udf_params(jax.random.key(0), UDFConfig())
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    w_u = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    w_g = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)

    def make(cfg, tile_bwd):
        def loss(p):
            u, g = pallas_udf_train_value_and_gradient(
                p, pts, cfg, tile_fwd=max(1024, tile_bwd), tile_bwd=tile_bwd
            )
            return (jnp.mean(w_u * u) + jnp.mean(jnp.sum(w_g * g, -1))
                    + 0.1 * jnp.mean(
                        (jnp.linalg.norm(g, axis=-1) - 1.0) ** 2))
        return jax.jit(jax.value_and_grad(loss))

    def timegrad(fn):
        v, g = fn(params)
        float(np.asarray(v))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            v, g = fn(params)
        float(np.asarray(v))
        return (time.perf_counter() - t0) / ITERS, g

    base = UDFConfig(precision="default", fuse_pe=True)
    rows, g_ref = [], None
    for cache, tb in [(False, 1024), (True, 1024), (False, 512),
                      (True, 512), (True, 2048)]:
        cfg = dataclasses.replace(base, cache_acts=cache)
        try:
            dt, g = timegrad(make(cfg, tb))
        except Exception as e:  # Mosaic VMEM at the bigger cached tiles
            rows.append({"cache_acts": cache, "tile_bwd": tb,
                         "error": str(e)[:200]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        if g_ref is None and not cache and tb == 1024:
            g_ref = g  # production default row
        err = None
        if g_ref is not None:
            err = max(float(jnp.max(jnp.abs(x - y))
                            / (jnp.max(jnp.abs(y)) + 1e-12))
                      for x, y in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)))
        rows.append({"cache_acts": cache, "tile_bwd": tb,
                     "ms": round(dt * 1e3, 2), "grad_relerr_vs_prod": err})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def bench_full_step(cache_acts: bool):
    from emap_tpu import config
    from emap_tpu.data import RayPool, load_scene, make_synthetic_scene
    from emap_tpu.fields.udf import UDFConfig
    from emap_tpu.render.renderer import RenderConfig
    from emap_tpu.train.state import init_train_state
    from emap_tpu.train.step import TrainConfig, build_train_step

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_scene(tmp, scan="bench", n_views=16, H=256, W=256)
        conf = config.Config(
            {"data_dir": tmp, "scan": "bench", "detector": "DexiNed",
             "near": 0.05, "far": 4.5}
        )
        scene = load_scene(conf)
    pool = RayPool.from_scene(scene)
    ucfg = UDFConfig(cache_acts=cache_acts)
    rcfg = RenderConfig(field_precision="default")
    tcfg = TrainConfig(batch_size=1024, end_iter=50000,
                       near=scene.near, far=scene.far)
    state = init_train_state(42, ucfg)
    step_fn = build_train_step(tcfg, rcfg, ucfg, scene.n_images)
    state, metrics = step_fn(state, pool)
    float(np.asarray(metrics["loss"]))
    n = max(ITERS, 100)
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step_fn(state, pool)
    float(np.asarray(metrics["loss"]))
    dt = (time.perf_counter() - t0) / n
    row = {"step_cache_acts": cache_acts, "step_ms": round(dt * 1e3, 2),
           "rays_per_s": round(1024 / dt, 1)}
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    out = {"kernel": bench_kernel(), "step": []}
    if os.environ.get("CA_SKIP_STEP", "0") != "1":
        out["step"] = [bench_full_step(False), bench_full_step(True)]
    path = os.environ.get("CA_OUT", "parity_results/bench_cache_acts.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
