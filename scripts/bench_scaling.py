#!/usr/bin/env python
"""Mesh-size scaling of the sharded train step on the virtual CPU mesh.

Real multi-chip hardware is unavailable here (one tunneled v5e chip), so this
measures the GSPMD-sharded step at mesh sizes 1/2/4/8 on XLA's virtual CPU
devices. On a single physical core the wall-clock CANNOT improve with mesh
size -- the point of this script is (a) the sharded program compiles and runs
at every mesh size with identical losses, and (b) the per-step collective/
partition overhead XLA inserts is visible as the delta vs mesh=1. The
wall-clock speedup claim for real chips rests on the ray batch being
embarrassingly parallel (one psum per step over ~0.55 M params = ~2.2 MB,
microseconds on ICI vs the 39 ms step).

Run: JAX_PLATFORMS=cpu handled internally; prints one JSON line per mesh size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    from emap_tpu import config
    from emap_tpu.data import RayPool, load_scene, make_synthetic_scene
    from emap_tpu.fields.udf import UDFConfig
    from emap_tpu.parallel import (
        build_sharded_train_step,
        make_mesh,
        replicate,
    )
    from emap_tpu.render.renderer import RenderConfig
    from emap_tpu.train.state import init_train_state
    from emap_tpu.train.step import TrainConfig, build_train_step

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_scene(tmp, scan="s", n_views=4, H=64, W=64)
        conf = config.Config(
            {"data_dir": tmp, "scan": "s", "detector": "DexiNed",
             "near": 0.05, "far": 4.5}
        )
        scene = load_scene(conf)

    # small net so the 1-core CPU host finishes in minutes; the sharding
    # structure (constraint + psum) is identical to the flagship's
    ucfg = UDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=4)
    rcfg = RenderConfig(n_samples=16, n_importance=10, up_sample_steps=5)
    batch = int(os.environ.get("SCALE_BATCH", "256"))
    tcfg = TrainConfig(batch_size=batch, end_iter=1000,
                       near=scene.near, far=scene.far)
    iters = int(os.environ.get("SCALE_ITERS", "10"))

    losses = {}
    for n_dev in (1, 2, 4, 8):
        pool = RayPool.from_scene(scene)
        state = init_train_state(3, ucfg)
        if n_dev == 1:
            step = build_train_step(tcfg, rcfg, ucfg, scene.n_images,
                                    donate=False)
        else:
            mesh = make_mesh(n_dev)
            pool = replicate(pool, mesh)
            state = replicate(state, mesh)
            step = build_sharded_train_step(
                tcfg, rcfg, ucfg, scene.n_images, mesh, donate=False
            )
        state, m = step(state, pool)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, pool)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        losses[n_dev] = float(m["loss"])
        print(json.dumps({
            "mesh_devices": n_dev, "step_ms": round(dt * 1e3, 1),
            "loss_after_warm+10": round(losses[n_dev], 6),
            "batch": batch, "physical_cores": os.cpu_count(),
        }), flush=True)

    ref = losses[1]
    for n_dev, l in losses.items():
        assert abs(l - ref) < 1e-3 + 1e-3 * abs(ref), (
            f"mesh={n_dev} loss {l} != single-chip {ref}"
        )
    print(json.dumps({"equivalence": "ok", "losses": losses}))


if __name__ == "__main__":
    main()
