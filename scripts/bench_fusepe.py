#!/usr/bin/env python
"""Measure the round-3 serial-chain levers (VERDICT r2 item 4): fuse_pe
(in-kernel PE encode + Jacobian) and chain_split (sub-tile pipelining
through the serial layer chain), at the production bf16 field tier and the
flagship step shape (116,736 pts, 8x256 MLP, second-order loss).

Phase 1: kernel-level fwd+bwd sweep over (fuse_pe, chain_split, tiles).
Phase 2: full train step (build_train_step) for the baseline and the best
kernel variant, via UDFConfig knobs.

Prints one JSON line per variant. Env: FP_ITERS (30), FP_PHASE (both).
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = int(os.environ.get("FP_ITERS", "30"))


def bench_kernel_variants():
    from emap_tpu.fields import UDFConfig, init_udf_params
    from emap_tpu.kernels.mlp_train import (
        pallas_udf_train_value_and_gradient,
    )

    n = 1024 * 114
    params = init_udf_params(jax.random.key(0), UDFConfig())
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    w_u = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    w_g = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)

    def make(cfg, tile_fwd, tile_bwd):
        def loss(p):
            u, g = pallas_udf_train_value_and_gradient(
                p, pts, cfg, tile_fwd=tile_fwd, tile_bwd=tile_bwd
            )
            return (jnp.mean(w_u * u) + jnp.mean(jnp.sum(w_g * g, -1))
                    + 0.1 * jnp.mean(
                        (jnp.linalg.norm(g, axis=-1) - 1.0) ** 2))
        return jax.jit(jax.value_and_grad(loss))

    def timegrad(fn):
        v, g = fn(params)
        float(np.asarray(v))  # real fetch (tunneled runtime, CLAUDE.md)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            v, g = fn(params)
        float(np.asarray(v))
        return (time.perf_counter() - t0) / ITERS, g

    def relerr(a, b):
        worst = 0.0
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            worst = max(worst, float(jnp.max(jnp.abs(x - y))
                        / (jnp.max(jnp.abs(y)) + 1e-12)))
        return worst

    # production bf16 tier (the r4 field_precision="default" flip)
    base_cfg = UDFConfig(precision="default")
    g_base = None
    rows = []
    grid = [
        # (fuse_pe, chain_split, tile_fwd, tile_bwd)
        (False, 1, 1024, 512),   # current production default
        (True, 1, 1024, 512),
        (False, 2, 1024, 512),
        (True, 2, 1024, 512),
        (False, 4, 1024, 512),
        (True, 1, 1024, 1024),
        (True, 2, 1024, 1024),
        (True, 4, 1024, 1024),
        (True, 2, 2048, 1024),
    ]
    import dataclasses

    for fuse, split, tf, tb in grid:
        cfg = dataclasses.replace(base_cfg, fuse_pe=fuse, chain_split=split)
        try:
            dt, g = timegrad(make(cfg, tf, tb))
        except Exception as e:  # Mosaic lowering / VMEM failures
            rows.append({"fuse_pe": fuse, "chain_split": split,
                         "tiles": [tf, tb], "error": str(e)[:200]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        # relerr baseline is pinned to the production-default row (the
        # first grid entry); if that row failed, a fallback baseline would
        # mislabel grad_relerr_vs_prod (ADVICE r3) — skip relerr instead.
        if g_base is None and (fuse, split, tf, tb) == grid[0]:
            g_base = g
        rows.append({
            "fuse_pe": fuse, "chain_split": split, "tiles": [tf, tb],
            "ms": round(dt * 1e3, 2),
            "grad_relerr_vs_prod": (relerr(g, g_base)
                                    if g_base is not None else None),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def bench_full_step(fuse_pe: bool, chain_split: int, label: str):
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
    ucfg = UDFConfig(fuse_pe=fuse_pe, chain_split=chain_split,
                     tile_bwd=int(os.environ.get("FP_TILE_BWD", "0")))
    rcfg = RenderConfig(field_precision="default")
    tcfg = TrainConfig(batch_size=1024, end_iter=50000,
                       near=scene.near, far=scene.far)
    state = init_train_state(42, ucfg)
    step_fn = build_train_step(tcfg, rcfg, ucfg, scene.n_images)
    state, metrics = step_fn(state, pool)
    float(np.asarray(metrics["loss"]))
    t0 = time.perf_counter()
    for _ in range(max(ITERS, 100)):
        state, metrics = step_fn(state, pool)
    float(np.asarray(metrics["loss"]))
    dt = (time.perf_counter() - t0) / max(ITERS, 100)
    row = {"step": label, "fuse_pe": fuse_pe, "chain_split": chain_split,
           "step_ms": round(dt * 1e3, 2),
           "rays_per_s": round(1024 / dt, 1)}
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    phase = os.environ.get("FP_PHASE", "both")
    out = {"kernel": [], "step": []}
    if phase in ("kernel", "both"):
        out["kernel"] = bench_kernel_variants()
    if phase in ("step", "both"):
        out["step"].append(bench_full_step(False, 1, "prod_default"))
        out["step"].append(bench_full_step(True, 1, "fuse_pe"))
        out["step"].append(bench_full_step(True, 2, "fuse_pe+split2"))
    path = os.environ.get("FP_OUT", "parity_results/bench_fusepe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
