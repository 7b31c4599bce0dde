#!/usr/bin/env python
"""Measure chain_mode="interleave" (layer-major sub-tile scheduling in the
backward kernel) at the production shape — the "different decomposition"
named by BASELINE.md's revised floor statement.

The serial 8-layer chain's inter-pass latency is the measured residual
between the bf16-tier kernel (~6.9 ms/step) and the 4.7 ms matmul-only
floor; the sequential sub-chain experiment (chain_split, mode "seq") was
noise because whole sub-chains still issue in dependency order. Interleave
loop-interchanges to layer-major order so consecutive MXU passes are
data-independent (kernels/mlp_train.py::_train_bwd_math_interleaved).

Sweeps (chain_mode, chain_split, tile_bwd) over the fwd+bwd kernel chain at
the production step shape (116,736 pts), then times the full train step for
the best interleave variant vs the production default. Prints one JSON line
per variant; writes CM_OUT (parity_results/bench_chain_mode.json).
Env: CM_ITERS (30), CM_N (1024*114), CM_SKIP_STEP.
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

ITERS = int(os.environ.get("CM_ITERS", "30"))


def bench_kernel():
    from emap_tpu.fields import UDFConfig, init_udf_params
    from emap_tpu.kernels.mlp_train import pallas_udf_train_value_and_gradient

    n = int(os.environ.get("CM_N", str(1024 * 114)))  # smoke: CM_N=2048
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
    grid = [
        ("seq", 1, 1024),          # production default (control)
        ("interleave", 2, 1024),   # 2x512 sub-tiles, layer-major
        ("interleave", 4, 1024),   # 4x256
        ("interleave", 2, 2048),   # 2x1024 (default-tile-sized sub-chains)
        ("interleave", 4, 2048),   # 4x512
        ("interleave", 8, 2048),   # 8x256
        ("seq", 2, 1024),          # the r4 seq control at matched split
    ]
    rows, g_ref = [], None
    for mode, split, tb in grid:
        cfg = dataclasses.replace(base, chain_mode=mode, chain_split=split)
        try:
            dt, g = timegrad(make(cfg, tb))
        except Exception as e:  # Mosaic VMEM / lowering at big tiles
            rows.append({"chain_mode": mode, "chain_split": split,
                         "tile_bwd": tb, "error": str(e)[:200]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        if g_ref is None and mode == "seq" and split == 1:
            g_ref = g  # production default row
        err = None
        if g_ref is not None:
            err = max(float(jnp.max(jnp.abs(x - y))
                            / (jnp.max(jnp.abs(y)) + 1e-12))
                      for x, y in zip(jax.tree.leaves(g),
                                      jax.tree.leaves(g_ref)))
        rows.append({"chain_mode": mode, "chain_split": split,
                     "tile_bwd": tb, "ms": round(dt * 1e3, 2),
                     "grad_relerr_vs_prod": err})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def bench_full_step(chain_mode: str, chain_split: int, tile_bwd: int = 0):
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
    ucfg = UDFConfig(chain_mode=chain_mode, chain_split=chain_split,
                     tile_bwd=tile_bwd,
                     tile_fwd=max(1024, tile_bwd) if tile_bwd else 0)
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
    row = {"step_chain_mode": chain_mode, "step_chain_split": chain_split,
           "step_tile_bwd": tile_bwd, "step_ms": round(dt * 1e3, 2),
           "rays_per_s": round(1024 / dt, 1)}
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    out = {"kernel": bench_kernel(), "step": []}
    if os.environ.get("CM_SKIP_STEP", "0") != "1":
        ok = [r for r in out["kernel"]
              if r.get("ms") and r["chain_mode"] == "interleave"]
        out["step"].append(bench_full_step("seq", 1))
        if ok:
            best = min(ok, key=lambda r: r["ms"])
            out["step"].append(
                bench_full_step("interleave", best["chain_split"],
                                best["tile_bwd"]))
    path = os.environ.get("CM_OUT", "parity_results/bench_chain_mode.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
