#!/usr/bin/env python
"""Benchmark: training-step throughput on the flagship ABC configuration.

Measures steady-state rays/sec of the fully-jitted train step (1024 rays x
(64+50) samples, 8x256 UDF MLP with double backprop, masked Adam) on whatever
accelerator JAX sees (the real TPU chip under the driver; CPU with
JAX_PLATFORMS=cpu).

Baseline normalization: the reference publishes no throughput numbers
(BASELINE.md); the north star is "one ABC scan (50k iters x 1024 rays) in
< 10 min on a v5e-8", i.e. 85,333 rays/s aggregate = 10,667 rays/s/chip.
vs_baseline = measured rays/s/chip / 10,667 -- 1.0 means the 8-chip fleet
meets the 10-minute target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", plus the
supporting "step_ms" and "mfu_pct" fields (VERDICT r2 item 8) so the perf
claim is self-contained}.
"""

import json
import os
import sys
import tempfile
import time

NORTH_STAR_RAYS_PER_SEC_PER_CHIP = 85333.0 / 8.0

# v5e (TPU v5 lite) bf16 peak, for the MFU column. Logical model FLOPs are
# precision-tier independent; at the production 1-pass bf16 field tier
# executed MXU passes == logical dots so this is the physical MFU too.
V5E_BF16_PEAK = 197e12

# The fused train kernel is a Pallas custom-call, invisible to XLA's
# cost_analysis, so its logical FLOPs are added analytically: the fwd +
# second-order bwd chain executes ~61 (256x256)@(256xT) dots per point tile
# at the 1-pass tier (BASELINE.md round-4 floor statement: 0.93 bf16
# TFLOP per 116,736-point step = 61 * 2 * 256^2 per point).
KERNEL_LOGICAL_DOTS = 61
KERNEL_HIDDEN = 256


def _xla_visible_flops(step_fn, state, pool):
    """XLA cost-analysis FLOPs of the compiled step (excludes the Pallas
    custom-call's interior). Returns (flops, error_repr_or_None) so a
    cost-analysis failure is surfaced in the JSON instead of silently
    zeroing the MFU (ADVICE r3)."""
    try:
        cost = step_fn.lower(state, pool).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)), None
    except Exception as exc:
        return 0.0, repr(exc)


def main() -> None:
    import jax

    from emap_tpu import config
    from emap_tpu.data import RayPool, load_scene, make_synthetic_scene
    from emap_tpu.fields.udf import UDFConfig
    from emap_tpu.render.renderer import RenderConfig
    from emap_tpu.train.state import init_train_state
    from emap_tpu.train.step import TrainConfig, build_train_step

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_scene(tmp, scan="bench", n_views=16, H=256, W=256)
        conf = config.Config(
            {
                "data_dir": tmp,
                "scan": "bench",
                "detector": "DexiNed",
                "near": 0.05,
                "far": 4.5,
            }
        )
        scene = load_scene(conf)

    pool = RayPool.from_scene(scene)
    ucfg = UDFConfig()  # flagship: 8x256, multires 10
    # 64 base + 50 importance; field_precision mirrors the conf-driven
    # production default (bf16 train-path field query, r2 flip)
    rcfg = RenderConfig(field_precision="default")
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    tcfg = TrainConfig(
        batch_size=batch, end_iter=50000, near=scene.near, far=scene.far
    )

    state = init_train_state(42, ucfg)
    step_fn = build_train_step(tcfg, rcfg, ucfg, scene.n_images)

    # warmup + compile. NOTE: on the tunneled axon runtime,
    # jax.block_until_ready can return before results are actually
    # fetchable (see CLAUDE.md) -- timings MUST close with a real host
    # fetch (np.asarray) or the loop measures dispatch, not execution.
    import numpy as np

    state, metrics = step_fn(state, pool)
    float(np.asarray(metrics["loss"]))

    # 200 iters so the single closing scalar fetch (~0.1-0.3 s tunnel
    # round-trip) is <2% of the ~2 s measured window.
    n_iters = int(os.environ.get("BENCH_ITERS", "200"))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, metrics = step_fn(state, pool)
    float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0

    rays_per_sec = batch * n_iters / dt
    step_ms = dt / n_iters * 1e3

    # MFU: XLA-visible FLOPs + the Pallas train kernel's analytic logical
    # FLOPs (batch * n_points_per_ray render_core queries). The analytic
    # term is gated on the kernel actually being in the compiled step —
    # on the XLA field path (pallas_train off / non-TPU) cost_analysis
    # already counts those dots and adding them double-counts (ADVICE r3).
    from emap_tpu.render.renderer import _use_pallas_train

    kernel_active = _use_pallas_train(ucfg)
    n_points = batch * (rcfg.n_samples + rcfg.n_importance_delivered)
    kernel_flops = (
        n_points * KERNEL_LOGICAL_DOTS * 2 * KERNEL_HIDDEN**2
        if kernel_active else 0.0
    )
    xla_flops, cost_err = _xla_visible_flops(step_fn, state, pool)
    flops_per_step = xla_flops + kernel_flops
    mfu_pct = flops_per_step / (dt / n_iters) / V5E_BF16_PEAK * 100.0

    result = {
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / NORTH_STAR_RAYS_PER_SEC_PER_CHIP, 3),
        "step_ms": round(step_ms, 2),
        "mfu_pct": round(mfu_pct, 2),
    }
    if cost_err is not None:
        result["cost_analysis_error"] = cost_err
    if not kernel_active:
        result["pallas_train_kernel"] = False
    print(json.dumps(result))


if __name__ == "__main__":
    main()
