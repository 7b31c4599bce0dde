#!/usr/bin/env python
"""Ablation timing: decompose the flagship train step's wall-clock.

The MFU roofline (scripts/profile_mfu.py, BASELINE.md) shows the step is NOT
MXU-bound (~10% logical MFU); this script measures where the other ~90% goes
by timing jitted sub-programs of the production ABC step (1024 rays,
64 base + 5x10 importance samples, 8x256 MLP, sampler=default field=high):

  full_step           the production train step
  step_no_sampler     same loss/optimizer, fixed 114 stratified z (no
                      importance rounds) -> sampler cost = full - this
  sampler_only        just importance_sample (5 rounds: query+upsample+merge)
  sampler_query_only  5 rounds of query+merge with upsampling math replaced
                      by a fixed linspace -> upsample/sample_pdf VPU cost
  render_fwd          forward render only (production sampler included)
  base_query_only     the initial 64-sample UDF query alone

Prints one JSON line per component. Run on the TPU (default env).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_inputs(batch):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.uniform(-0.1, 0.1, (batch, 3)), jnp.float32)
    d = rng.normal(size=(batch, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = jnp.asarray(d, jnp.float32)
    return rays_o, rays_d


def timeit(fn, *args, iters=30):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from emap_tpu import config
    from emap_tpu.data import RayPool, load_scene, make_synthetic_scene
    from emap_tpu.fields.udf import UDFConfig, udf_value
    from emap_tpu.render import sampling
    from emap_tpu.render.renderer import RenderConfig, render
    from emap_tpu.train.state import init_train_state
    from emap_tpu.train.step import TrainConfig, build_train_step

    batch = int(os.environ.get("ABL_BATCH", "1024"))
    iters = int(os.environ.get("ABL_ITERS", "30"))

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_scene(tmp, scan="abl", n_views=8, H=128, W=128)
        conf = config.Config(
            {"data_dir": tmp, "scan": "abl", "detector": "DexiNed",
             "near": 0.05, "far": 4.5}
        )
        scene = load_scene(conf)
    pool = RayPool.from_scene(scene)

    ucfg = UDFConfig(precision="high")
    rcfg = RenderConfig()  # sampler_precision default
    tcfg = TrainConfig(batch_size=batch, end_iter=50000,
                       near=scene.near, far=scene.far)
    state = init_train_state(42, ucfg)
    rays_o, rays_d = make_inputs(batch)
    key = jax.random.key(0)
    sample_dist = (tcfg.far - tcfg.near) / rcfg.n_samples

    results = {}

    # --- full production step
    step_fn = build_train_step(tcfg, rcfg, ucfg, scene.n_images)
    st = state
    def run_full(st_):
        s2, m = step_fn(st_, pool)
        return m["loss"]
    results["full_step"] = timeit(run_full, st, iters=iters)

    # --- step with no importance sampling, same total samples
    rcfg_flat = dataclasses.replace(rcfg, n_samples=114, n_importance=0)
    step_flat = build_train_step(tcfg, rcfg_flat, ucfg, scene.n_images)
    results["step_no_sampler_114"] = timeit(
        lambda s_: step_flat(s_, pool)[1]["loss"], state, iters=iters
    )

    # --- forward render only (includes sampler)
    fwd = jax.jit(
        lambda p, ro, rd, k: render(
            p, ro, rd, tcfg.near, tcfg.far,
            jnp.ones((batch, 1), jnp.float32), k, rcfg, ucfg,
            cos_anneal_ratio=1.0, flip_saturation=0.9,
        )["edge"]
    )
    results["render_fwd"] = timeit(fwd, state.params, rays_o, rays_d, key,
                                   iters=iters)

    # --- sampler alone
    sampler_ucfg = dataclasses.replace(ucfg, precision=rcfg.sampler_precision)

    def sampler(p, ro, rd, k):
        z = sampling.stratified_z_vals(k, batch, tcfg.near, tcfg.far,
                                       rcfg.n_samples, rcfg.perturb)
        udf_fn = lambda pts: udf_value(p["udf"], pts, sampler_ucfg)
        return sampling.importance_sample(
            udf_fn, ro, rd, z, sample_dist, rcfg.n_importance,
            rcfg.up_sample_steps,
        )

    results["sampler_only"] = timeit(
        jax.jit(sampler), state.params, rays_o, rays_d, key, iters=iters
    )

    # --- sampler rounds with upsampling math removed (query+merge only)
    def sampler_query_only(p, ro, rd, k):
        z = sampling.stratified_z_vals(k, batch, tcfg.near, tcfg.far,
                                       rcfg.n_samples, rcfg.perturb)
        udf_fn = lambda pts: udf_value(p["udf"], pts, sampler_ucfg)

        def query(zv):
            pts = ro[:, None, :] + rd[:, None, :] * zv[..., None]
            return udf_fn(pts.reshape(-1, 3)).reshape(batch, zv.shape[-1])

        udf = query(z)
        n_per = rcfg.n_importance // rcfg.up_sample_steps
        for i in range(rcfg.up_sample_steps):
            # fixed new z (depends on udf so the query isn't DCE'd)
            new_z = (
                jnp.linspace(tcfg.near, tcfg.far, n_per, dtype=z.dtype)[None]
                + 0.0 * udf[:, :1]
            )
            new_z = jnp.broadcast_to(new_z, (batch, n_per))
            last = i + 1 == rcfg.up_sample_steps
            new_udf = None if last else query(new_z)
            z, udf = sampling._merge_z_vals(z, new_z, udf, new_udf)
        return z

    results["sampler_query_merge_only"] = timeit(
        jax.jit(sampler_query_only), state.params, rays_o, rays_d, key,
        iters=iters,
    )

    # --- the initial 64-sample query alone
    def base_query(p, ro, rd, k):
        z = sampling.stratified_z_vals(k, batch, tcfg.near, tcfg.far,
                                       rcfg.n_samples, rcfg.perturb)
        pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
        return udf_value(p["udf"], pts.reshape(-1, 3), sampler_ucfg)

    results["base_query_64"] = timeit(
        jax.jit(base_query), state.params, rays_o, rays_d, key, iters=iters
    )

    derived = {
        "sampler_cost_in_step": results["full_step"]
        - results["step_no_sampler_114"],
        "upsample_math_cost": results["sampler_only"]
        - results["sampler_query_merge_only"],
        "bwd_opt_cost": results["full_step"] - results["render_fwd"],
    }
    for k, v in results.items():
        print(json.dumps({"component": k, "ms": round(v * 1e3, 2)}))
    for k, v in derived.items():
        print(json.dumps({"derived": k, "ms": round(v * 1e3, 2)}))


if __name__ == "__main__":
    main()
