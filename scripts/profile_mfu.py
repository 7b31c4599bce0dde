#!/usr/bin/env python
"""Roofline / MFU analysis of the flagship train step on the TPU.

Measures steady-state step time of the fully-jitted ABC train step, pulls
XLA's own FLOP estimate from compile-time cost analysis, and reports achieved
model FLOP/s vs the v5e peak, for each matmul-precision tier of the two field
query sites:

  * sampler (no-grad importance queries, RenderConfig.sampler_precision)
  * render_core + backprop (UDFConfig.precision)

On a v5e MXU, DEFAULT f32 runs one bf16 pass per matmul (fast, ~1e-3 rel
error), HIGH three passes, HIGHEST six (full f32 fidelity) -- so precision
tiering is the single biggest lever on MXU time. The quality gate for
dropping a tier is the UDF value error at the 0.02 near-surface threshold;
this script prints that error per tier so the decision is measured, not
guessed (VERDICT r1 item 4).

Writes profile trace to PROF_DIR if set. Prints one JSON line per config.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# v5e (TPU v5 lite) peak: 197 TFLOP/s bf16. Logical-FLOP MFU is computed
# against this; the f32 tiers run 3x/6x MXU passes per logical flop, so their
# *effective* MXU occupancy is ~3x/6x the printed MFU.
V5E_BF16_PEAK = 197e12


def build(batch, sampler_precision, field_precision):
    from emap_tpu import config
    from emap_tpu.data import RayPool, load_scene, make_synthetic_scene
    from emap_tpu.fields.udf import UDFConfig
    from emap_tpu.render.renderer import RenderConfig
    from emap_tpu.train.state import init_train_state
    from emap_tpu.train.step import TrainConfig, build_train_step

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_scene(tmp, scan="prof", n_views=8, H=128, W=128)
        conf = config.Config(
            {"data_dir": tmp, "scan": "prof", "detector": "DexiNed",
             "near": 0.05, "far": 4.5}
        )
        scene = load_scene(conf)

    pool = RayPool.from_scene(scene)
    ucfg = UDFConfig(precision=field_precision)
    rcfg = RenderConfig(sampler_precision=sampler_precision)
    tcfg = TrainConfig(batch_size=batch, end_iter=50000,
                       near=scene.near, far=scene.far)
    state = init_train_state(42, ucfg)
    step_fn = build_train_step(tcfg, rcfg, ucfg, scene.n_images)
    return step_fn, state, pool


def measure(step_fn, state, pool, iters=30):
    import jax

    state, metrics = step_fn(state, pool)  # compile + warmup
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, pool)
    jax.block_until_ready(metrics["loss"])
    return (time.perf_counter() - t0) / iters, state


def xla_flops(step_fn, state, pool):
    """XLA's own model-FLOP estimate for the compiled step."""
    try:
        compiled = step_fn.lower(state, pool).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return float("nan")


def field_error(precision: str) -> float:
    """Max |udf_prec - udf_highest| on random points (the quality gate)."""
    import jax.numpy as jnp
    import numpy as np

    from emap_tpu.fields.udf import UDFConfig, apply_udf, init_udf_params
    import jax

    cfg_hi = UDFConfig(precision="highest")
    cfg_lo = UDFConfig(precision=precision)
    params = init_udf_params(jax.random.key(0), cfg_hi)
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (4096, 3)), jnp.float32
    )
    hi = jax.jit(lambda p: apply_udf(params, p, cfg_hi))(pts)
    lo = jax.jit(lambda p: apply_udf(params, p, cfg_lo))(pts)
    return float(jnp.max(jnp.abs(hi - lo)))


def main():
    import jax

    batch = int(os.environ.get("PROF_BATCH", "1024"))
    iters = int(os.environ.get("PROF_ITERS", "30"))
    configs = [
        # (sampler_precision, field_precision)
        ("default", "highest"),   # current production config
        ("default", "high"),      # bf16x3 render_core
        ("default", "default"),   # single-pass everything
        ("highest", "highest"),   # round-1 pre-tiering config
    ]
    results = []
    for sp, fp in configs:
        step_fn, state, pool = build(batch, sp, fp)
        flops = xla_flops(step_fn, state, pool)
        dt, state = measure(step_fn, state, pool, iters)
        res = {
            "sampler_precision": sp,
            "field_precision": fp,
            "step_ms": round(dt * 1e3, 2),
            "rays_per_s": round(batch / dt, 1),
            "xla_gflops_per_step": round(flops / 1e9, 2),
            "model_tflops_per_s": round(flops / dt / 1e12, 2),
            "mfu_vs_bf16_peak": round(flops / dt / V5E_BF16_PEAK, 4),
            "udf_max_abs_err_vs_highest": field_error(fp),
            "backend": jax.default_backend(),
        }
        results.append(res)
        print(json.dumps(res), flush=True)

    prof_dir = os.environ.get("PROF_DIR")
    if prof_dir:
        step_fn, state, pool = build(batch, "default", "highest")
        dt, state = measure(step_fn, state, pool, 3)
        jax.profiler.start_trace(prof_dir)
        for _ in range(5):
            state, metrics = step_fn(state, pool)
        jax.block_until_ready(metrics["loss"])
        jax.profiler.stop_trace()
        print(json.dumps({"trace": prof_dir}))
    return results


if __name__ == "__main__":
    main()
