#!/usr/bin/env python
"""Multi-chip correctness at the FLAGSHIP shape (VERDICT r3 item 5).

The r3 multichip evidence used a 32-wide 2-layer net with 8+5 samples —
toy dims that can hide padding / tile / sharding bugs that only appear at
production shapes. This runs the full ABC-conf program — 8x256 MLP,
multires 10, 64+50 samples, 1024 rays, the chained lax.scan dispatch —
on the 8-virtual-device CPU mesh and asserts loss/param equivalence
against the single-device run of the SAME program (GSPMD re-partitioning
is the design claim; reference has no distributed analog, SURVEY §2.4).

Phases:
  A. per-step sharded vs single-device (3 steps, XLA field path — the
     production CPU behavior, pallas auto-disables off-TPU)
  B. chained scan (chain=3) under the mesh vs phase A's single-device rows
  C. the fused Pallas train kernel's shard_map path at the flagship point
     count (116,736 pts x 8x256, second-order fwd+bwd, interpret mode —
     same code path as TPU minus Mosaic) vs its single-device call

Writes MULTICHIP_FLAGSHIP.json. Runtime: ~10-30 min on the 1-core host
(flagship CPU steps are ~3-10 s each + one-time compiles, cached).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

N_DEV = int(os.environ.get("MCF_DEVICES", "8"))
N_STEPS = int(os.environ.get("MCF_STEPS", "3"))
# phase D: sharded extraction equivalence at production resolution on a
# production checkpoint (VERDICT r4 item 5). 256 on the 1-core CPU host
# costs ~1-3 h; set MCF_EXTRACT_RES=0 to skip, or lower for a quick pass.
EXTRACT_RES = int(os.environ.get("MCF_EXTRACT_RES", "256"))
EXTRACT_CKPT = os.environ.get(
    "MCF_EXTRACT_CKPT",
    "prod_suite_r4/final_s42/exp/00000325/emap/checkpoints/ckpt_best.npz",
)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_emap_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    import tempfile

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
    from emap_tpu.train.step import (
        METRIC_KEYS,
        TrainConfig,
        build_chained_train_step,
        build_train_step,
    )

    assert len(jax.devices()) >= N_DEV

    with tempfile.TemporaryDirectory() as tmp:
        make_synthetic_scene(tmp, scan="mcf", n_views=8, H=64, W=64)
        conf = config.Config(
            {"data_dir": tmp, "scan": "mcf", "detector": "DexiNed",
             "near": 0.05, "far": 4.5}
        )
        scene = load_scene(conf)

    report: dict = {"devices": N_DEV, "steps": N_STEPS}

    # flagship configs: confs/ABC.conf values (8x256, multires 10, 64+50,
    # production bf16 train-path field tier)
    ucfg = UDFConfig()
    rcfg = RenderConfig(field_precision="default")
    tcfg = TrainConfig(batch_size=1024, end_iter=50000,
                       near=scene.near, far=scene.far)

    # ---- single-device reference trajectory -----------------------------
    t0 = time.time()
    pool = RayPool.from_scene(scene)
    state1 = init_train_state(7, ucfg)
    step1 = build_train_step(tcfg, rcfg, ucfg, scene.n_images, donate=False)
    losses1, params1 = [], None
    for _ in range(N_STEPS):
        state1, m = step1(state1, pool)
        losses1.append(float(m["loss"]))
    params1 = [np.asarray(x) for x in jax.tree.leaves(state1.params)]
    report["single_device"] = {
        "losses": losses1, "wall_s": round(time.time() - t0, 1)
    }
    print("single-device:", losses1, flush=True)

    # ---- phase A: per-step sharded -------------------------------------
    t0 = time.time()
    mesh = make_mesh(N_DEV)
    pool_s = replicate(RayPool.from_scene(scene), mesh)
    state8 = replicate(init_train_state(7, ucfg), mesh)
    step8 = build_sharded_train_step(tcfg, rcfg, ucfg, scene.n_images, mesh,
                                     donate=False)
    losses8 = []
    for _ in range(N_STEPS):
        state8, m = step8(state8, pool_s)
        losses8.append(float(m["loss"]))
    np.testing.assert_allclose(losses8, losses1, rtol=1e-4)
    worst = 0.0
    for a, b in zip(params1, jax.tree.leaves(state8.params)):
        err = float(np.max(np.abs(np.asarray(b) - a))
                    / (np.max(np.abs(a)) + 1e-12))
        worst = max(worst, err)
    assert worst < 2e-4, worst
    report["phase_a_sharded_per_step"] = {
        "losses": losses8, "max_param_relerr": worst,
        "wall_s": round(time.time() - t0, 1), "ok": True,
    }
    print("phase A ok: sharded losses", losses8,
          "param relerr", worst, flush=True)

    # ---- phase B: chained scan under the mesh ---------------------------
    t0 = time.time()
    state_c = replicate(init_train_state(7, ucfg), mesh)
    chained = build_chained_train_step(tcfg, rcfg, ucfg, scene.n_images,
                                       chain=N_STEPS, donate=False, mesh=mesh)
    state_c, rows = chained(state_c, pool_s)
    loss_idx = METRIC_KEYS.index("loss")
    chain_losses = [float(x) for x in np.asarray(rows)[:, loss_idx]]
    np.testing.assert_allclose(chain_losses, losses1, rtol=1e-4)
    worst_c = 0.0
    for a, b in zip(params1, jax.tree.leaves(state_c.params)):
        err = float(np.max(np.abs(np.asarray(b) - a))
                    / (np.max(np.abs(a)) + 1e-12))
        worst_c = max(worst_c, err)
    assert worst_c < 2e-4, worst_c
    report["phase_b_chained_under_mesh"] = {
        "losses": chain_losses, "max_param_relerr": worst_c,
        "wall_s": round(time.time() - t0, 1), "ok": True,
    }
    print("phase B ok: chained losses", chain_losses, flush=True)

    # ---- phase C: fused train kernel shard_map at flagship point count --
    # (interpret mode: same kernel code path as TPU minus Mosaic; the TPU
    # Mosaic lowering itself is exercised by the production runs)
    t0 = time.time()
    import dataclasses

    from emap_tpu.render.renderer import _query_field

    kcfg = dataclasses.replace(ucfg, pallas_train="on")
    n_pts = 1024 * (rcfg.n_samples + rcfg.n_importance_delivered)
    rng = np.random.default_rng(0)
    pts = np.asarray(rng.uniform(-1, 1, (n_pts, 3)), np.float32)
    w_u = np.asarray(rng.normal(size=(n_pts,)), np.float32)
    w_g = np.asarray(rng.normal(size=(n_pts, 3)), np.float32)
    params = init_train_state(7, kcfg).params  # _query_field reads ["udf"]

    def loss_fn(p, x, mesh_arg):
        import jax.numpy as jnp

        u, g = _query_field(p, x, kcfg, mesh=mesh_arg)
        return jnp.mean(w_u * u) + jnp.mean(jnp.sum(w_g * g, -1))

    v1, g1 = jax.jit(
        jax.value_and_grad(lambda p, x: loss_fn(p, x, None))
    )(params, pts)
    with mesh:
        v8, g8 = jax.jit(
            jax.value_and_grad(lambda p, x: loss_fn(p, x, mesh))
        )(params, pts)
    rel_v = abs(float(v8) - float(v1)) / (abs(float(v1)) + 1e-12)
    worst_k = 0.0
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        err = float(np.max(np.abs(np.asarray(b) - np.asarray(a)))
                    / (np.max(np.abs(np.asarray(a))) + 1e-12))
        worst_k = max(worst_k, err)
    assert rel_v < 1e-5 and worst_k < 1e-4, (rel_v, worst_k)
    report["phase_c_kernel_shardmap_flagship"] = {
        "n_points": n_pts, "loss_relerr": rel_v,
        "max_grad_relerr": worst_k,
        "wall_s": round(time.time() - t0, 1), "ok": True,
    }
    print("phase C ok: kernel shard_map", n_pts, "pts, grad relerr",
          worst_k, flush=True)

    # ---- phase D: sharded extraction equivalence at production res ------
    # The r4 sharded-extraction evidence stopped at grid N=24-48 (toy);
    # this runs the multi-threshold pass (the exact machinery behind the
    # production selector, extract/pointcloud.py::extract_pointcloud_multi)
    # at EXTRACT_RES^3 on a production 50k ABC checkpoint, 8-device mesh vs
    # single device, and asserts per-threshold BIT-EQUAL point sets. Line
    # directions are excluded by design: their jitter draw is keyed by
    # batch layout (documented re-roll class, pointcloud.py docstring).
    ckpt_path = os.path.join(REPO, EXTRACT_CKPT)
    if EXTRACT_RES and os.path.exists(ckpt_path):
        t0 = time.time()
        from emap_tpu.ckpt.native import load_pytree
        from emap_tpu.extract.pointcloud import extract_pointcloud_multi

        prod_params = load_pytree(ckpt_path)["params"]["udf"]
        thresholds = [0.02, 0.03, 0.04, 0.05]  # the shipped ABC menu
        kw = dict(
            resolution=EXTRACT_RES, thresholds=thresholds,
            sampling_N=50, sampling_delta=5e-3, is_pointshift=True,
            iters=2, is_linedirection=True,
        )
        single = extract_pointcloud_multi(prod_params, ucfg, **kw)
        t_single = round(time.time() - t0, 1)
        t0 = time.time()
        sharded = extract_pointcloud_multi(
            prod_params, ucfg, mesh=mesh, **kw
        )
        t_sharded = round(time.time() - t0, 1)
        counts = {}
        for t in thresholds:
            p1, _ = single[float(t)]
            p8, _ = sharded[float(t)]
            assert p1.shape == p8.shape, (t, p1.shape, p8.shape)
            np.testing.assert_array_equal(p1, p8)
            counts[str(t)] = int(len(p1))
        report["phase_d_sharded_extraction"] = {
            "resolution": EXTRACT_RES, "thresholds": thresholds,
            "checkpoint": EXTRACT_CKPT, "points_per_threshold": counts,
            "bit_equal": True, "wall_s_single": t_single,
            "wall_s_sharded": t_sharded, "ok": True,
        }
        print(f"phase D ok: {EXTRACT_RES}^3 sharded extraction bit-equal, "
              f"counts {counts}", flush=True)
    else:
        report["phase_d_sharded_extraction"] = {
            "skipped": True,
            "reason": ("MCF_EXTRACT_RES=0" if not EXTRACT_RES
                       else f"checkpoint missing: {EXTRACT_CKPT}"),
        }
        print("phase D skipped", flush=True)

    # provenance stamp (VERDICT r4 item 5: the r3 JSON was undated)
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception:  # pragma: no cover
        commit = "unknown"
    report["git_commit"] = commit
    report["date"] = time.strftime("%Y-%m-%d %H:%M:%S")

    report["ok"] = True
    with open(os.path.join(REPO, "MULTICHIP_FLAGSHIP.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
