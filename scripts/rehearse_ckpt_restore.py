#!/usr/bin/env python
"""Checkpoint-restore parity rehearsal (driver config #3; VERDICT r1 item 6).

No released reference checkpoint can be fetched here (zero egress), so this
script rehearses the full restore contract end-to-end against a checkpoint
the torch reference itself produces:

  1. ref-train : train the torch reference briefly on the synthetic cube and
                 save through ITS OWN save_checkpoint() -> ckpt_best.pth
                 (the released-artifact format, runner_udf.py:265-285).
  2. resume    : import the .pth (weights + Adam moments + iter_step) through
                 our production Runner.load_checkpoint, then run N matched
                 post-resume steps in BOTH frameworks — identical prescribed
                 ray batches (patched torch.randint/randperm on the reference
                 side; a sample_fn-injected production step on ours),
                 perturb=0 and batch_size=1 so both trajectories are fully
                 deterministic — and compare the per-step losses and the
                 final parameters leaf-wise.
  3. extract   : run our extraction + eval from the imported checkpoint
                 (the driver-config use case: released ckpt -> edges).

Usage:  python scripts/rehearse_ckpt_restore.py [all|ref-train|resume|extract]

`all` chains the stages as subprocesses (resume forces the CPU backend for a
like-for-like f32 comparison with torch-CPU; extract runs on the default
device). Env knobs: REHEARSE_OUT (default ./rehearse_run), REHEARSE_REF_STEPS
(300), REHEARSE_RESUME_STEPS (120), REHEARSE_ASSERT (1). The scene/model
sizes come from the parity harness (scripts/parity_reference.py) so the
checkpoint exercises the same geometry the parity numbers use.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

OUT = os.path.abspath(os.environ.get("REHEARSE_OUT", "./rehearse_run"))
REF_STEPS = int(os.environ.get("REHEARSE_REF_STEPS", "300"))
RESUME_STEPS = int(os.environ.get("REHEARSE_RESUME_STEPS", "120"))
ASSERT = os.environ.get("REHEARSE_ASSERT", "1") == "1"

# the parity harness supplies scene + conf (identical model/schedule shapes);
# its module-level knobs read env at import time
os.environ.setdefault("PARITY_VIEWS", "8")
os.environ.setdefault("PARITY_IMG", "96")
os.environ.setdefault("PARITY_BATCH", "64")
os.environ["PARITY_OUT"] = OUT
os.environ["PARITY_STEPS"] = str(REF_STEPS)


def _load_parity():
    spec = importlib.util.spec_from_file_location(
        "parity_reference", os.path.join(REPO, "scripts",
                                         "parity_reference.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _resume_conf(par, side: str) -> dict:
    """The matched-resume schedule: deterministic render, 1-ray batches.

    batch_size=1 because the reference renderer crashes at perturb=0 with
    batch>1 (z_vals never broadcast, udf_renderer_blending.py:718 quirk);
    perturb=0 + importance_sample=False make the only per-step randomness
    the pixel choice, which is prescribed identically on both sides.
    """
    d = par.shared_conf_dict(side)
    d["train"]["latest_model_name"] = "ckpt_best.pth"
    d["train"]["end_iter"] = REF_STEPS + RESUME_STEPS
    d["train"]["batch_size"] = 1
    d["train"]["importance_sample"] = False
    d["train"]["report_freq"] = 10**6
    d["train"]["save_freq"] = 10**6
    d["train"]["val_freq"] = 10**6
    d["model"]["udf_renderer"]["perturb"] = 0.0
    return d


def _ckpt_path(par) -> str:
    return os.path.join(OUT, "exp_ref", "cube000", "emap", "checkpoints",
                        "ckpt_best.pth")


def _prescribe(par, n_images: int, H: int, W: int):
    """The shared ray prescription: per-step (img, px, py), replicating the
    reference loop's image_perm indexing (runner_udf.py:69, :249-250)."""
    import numpy as np

    rng = np.random.default_rng(20260817)
    n_perms = RESUME_STEPS // n_images + 3
    perms = [rng.permutation(n_images) for _ in range(n_perms)]
    px = rng.integers(0, W, RESUME_STEPS)
    py = rng.integers(0, H, RESUME_STEPS)
    imgs, pi = [], 0
    perm = perms[pi]
    for t in range(RESUME_STEPS):
        it = REF_STEPS + t
        imgs.append(int(perm[it % n_images]))
        if (it + 1) % n_images == 0:
            pi += 1
            perm = perms[pi]
    return perms, np.asarray(imgs), px, py


# ---------------------------------------------------------------------------
def stage_ref_train() -> None:
    par = _load_parity()
    import numpy as np
    import torch

    par.ensure_scene()
    par._stub_missing_reference_deps()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    torch.manual_seed(par.SEED)
    np.random.seed(par.SEED)
    import random

    random.seed(par.SEED)
    import torch._dynamo  # noqa: F401  (see parity_reference.run_reference)

    from src.runner.runner_udf import Runner_UDF

    from emap_tpu import config

    conf = config.Config(par.shared_conf_dict("ref"))
    _orig_device = torch.device

    def _cpu_device(*a, **k):
        a = tuple("cpu" if isinstance(x, str) and "cuda" in x else x
                  for x in a)
        return _orig_device(*a, **k)

    torch.device = _cpu_device
    try:
        runner = Runner_UDF(conf, "train", False, None)
    finally:
        torch.device = _orig_device
    runner.train()
    # the reference's own best-loss save path writes ckpt_best.pth
    runner.best_loss = float("inf")
    runner.save_checkpoint(0.0)
    path = _ckpt_path(par)
    assert os.path.isfile(path), f"reference save_checkpoint missed {path}"
    print(json.dumps({"stage": "ref-train", "steps": REF_STEPS,
                      "ckpt": path}))


# ---------------------------------------------------------------------------
def stage_resume() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")  # torch-CPU vs jax-CPU f32
    par = _load_parity()
    import numpy as np
    import torch

    par.ensure_scene()
    par._stub_missing_reference_deps()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    from emap_tpu import config

    ckpt = _ckpt_path(par)

    # ----- shared prescription -------------------------------------------
    n_images, H, W = par.VIEWS, par.IMG, par.IMG
    perms, imgs, px, py = _prescribe(par, n_images, H, W)

    # ----- reference side: its real resumed train loop --------------------
    torch.manual_seed(par.SEED)
    np.random.seed(par.SEED)
    import torch._dynamo  # noqa: F401  (must import while torch.device is
    # the real type; the optimizer ctor lazily pulls it in otherwise)
    import src.runner.runner_udf as runner_udf_mod
    from src.runner.runner_udf import Runner_UDF

    scalars: dict[str, list] = {}

    class _Recorder:
        def __init__(self, *a, **k):
            pass

        def add_scalar(self, tag, val, step):
            scalars.setdefault(tag, []).append(float(val))

    perm_queue = [torch.from_numpy(p.copy()) for p in perms]
    # each prescribed pixel is duplicated: the reference's ray generator is
    # called at batch 2 and sliced to 1 (its squeeze() collapses batch-1
    # tensors to 1-D, dataset.py:278 — a reference bug at batch_size=1)
    pix_queue = [torch.tensor([int(v), int(v)]) for pair in zip(px, py)
                 for v in pair]
    _orig_randint, _orig_randperm = torch.randint, torch.randperm
    _orig_writer = runner_udf_mod.SummaryWriter
    _orig_device = torch.device

    def _cpu_device(*a, **k):
        a = tuple("cpu" if isinstance(x, str) and "cuda" in x else x
                  for x in a)
        return _orig_device(*a, **k)

    conf_ref = config.Config(_resume_conf(par, "ref"))
    torch.device = _cpu_device
    try:
        runner = Runner_UDF(conf_ref, "train", True, None)
    finally:
        torch.device = _orig_device

    _orig_gen = runner.dataset.gen_random_rays_patches_at

    def _gen_batch1(img_idx, batch_size, importance_sample=False):
        sample = _orig_gen(img_idx, 2, importance_sample=importance_sample)
        sample["rays"] = {k: v[:1] for k, v in sample["rays"].items()}
        for k in ("rays_ndc_uv", "rays_norm_XYZ_cam", "depth_scale"):
            sample[k] = sample[k][:1]
        return sample

    runner.dataset.gen_random_rays_patches_at = _gen_batch1
    runner_udf_mod.SummaryWriter = _Recorder
    torch.randint = lambda *a, **k: pix_queue.pop(0)
    torch.randperm = lambda n, **k: perm_queue.pop(0)
    # environment shim, not a reference fix: the reference's LR schedule
    # writes np.float64 into optimizer param_groups, so under torch>=2.6
    # (weights_only=True default) its own load_checkpoint rejects its own
    # checkpoints; released ckpts carry the same scalars. Our importer
    # already loads with weights_only=False (ckpt/pth_import.py:96).
    _orig_load = torch.load
    torch.load = lambda *a, **k: _orig_load(
        *a, **{**k, "weights_only": False}
    )
    try:
        runner.train()
    finally:
        torch.randint, torch.randperm = _orig_randint, _orig_randperm
        torch.load = _orig_load
        runner_udf_mod.SummaryWriter = _orig_writer
    ref_losses = np.asarray(scalars["Loss/loss"])
    assert len(ref_losses) == RESUME_STEPS, (
        f"captured {len(ref_losses)} reference losses, "
        f"expected {RESUME_STEPS}"
    )
    # reference params after the resumed segment, via its own ckpt format
    after = {
        "udf_network_fine": runner.udf_network_fine.state_dict(),
        "variance_network_fine": runner.variance_network_fine.state_dict(),
        "beta_network": runner.beta_network.state_dict(),
        "optimizer": runner.optimizer.state_dict(),
        "iter_step": runner.iter_step,
    }
    after_path = os.path.join(OUT, "ref_after_resume.pth")
    torch.save(after, after_path)

    # ----- our side: production restore + sample_fn-matched steps ---------
    import jax.numpy as jnp

    from emap_tpu.data.dataset import _rays_from_pixels
    from emap_tpu.train.runner import Runner
    from emap_tpu.train.step import build_train_step

    conf_ours = config.Config(_resume_conf(par, "ours_resume"))
    ours = Runner(conf_ours, mode="train")
    ours.load_checkpoint(ckpt)  # production .pth restore path
    assert int(ours.state.step) == REF_STEPS

    pool = ours.pool
    batches = {"rays_o": [], "rays_d": [], "edge": [], "depth_scale": []}
    for t in range(RESUME_STEPS):
        img = int(imgs[t])
        fx = jnp.asarray([float(px[t])], jnp.float32)
        fy = jnp.asarray([float(py[t])], jnp.float32)
        ro, rd, ds, _ = _rays_from_pixels(pool, img, fx, fy)
        flat = int(py[t]) * W + int(px[t])
        batches["rays_o"].append(ro)
        batches["rays_d"].append(rd)
        batches["depth_scale"].append(ds)
        batches["edge"].append(pool.edges[img][flat][None, None])
    stacked = {k: jnp.stack(v) for k, v in batches.items()}
    img_arr = jnp.asarray(imgs, jnp.int32)

    def sample_fn(state, pool_arg, k_rays):
        i = jnp.mod(state.step - REF_STEPS, RESUME_STEPS)
        batch = jax.tree.map(lambda x: x[i], pool_arg)
        return batch, img_arr[i]

    step_fn = build_train_step(
        ours.tcfg, ours.rcfg, ours.ucfg, n_images, donate=False,
        sample_fn=sample_fn,
    )
    state = ours.state
    our_losses = []
    for _ in range(RESUME_STEPS):
        state, m = step_fn(state, stacked)
        our_losses.append(float(m["loss"]))
    our_losses = np.asarray(our_losses)

    # ----- compare ---------------------------------------------------------
    from emap_tpu.ckpt.pth_import import import_reference_checkpoint

    ref_params = import_reference_checkpoint(after_path)["params"]
    from jax.tree_util import tree_flatten_with_path

    flat_ours = tree_flatten_with_path(state.params)[0]
    flat_ref = dict(tree_flatten_with_path(ref_params)[0])
    param_rel = 0.0
    for key, v in flat_ours:
        r = np.asarray(flat_ref[key], np.float64)
        o = np.asarray(v, np.float64)
        denom = np.maximum(np.abs(r).max(), 1e-6)
        param_rel = max(param_rel, float(np.abs(o - r).max() / denom))

    rel = np.abs(our_losses - ref_losses) / np.maximum(
        np.abs(ref_losses), 1e-8
    )
    report = {
        "stage": "resume",
        "resume_steps": RESUME_STEPS,
        "first_step_rel": float(rel[0]),
        "first10_max_rel": float(rel[:10].max()),
        "mean_rel": float(rel.mean()),
        "max_rel": float(rel.max()),
        "final_param_max_rel": param_rel,
        "ref_loss_first_last": [float(ref_losses[0]), float(ref_losses[-1])],
        "our_loss_first_last": [float(our_losses[0]), float(our_losses[-1])],
    }
    with open(os.path.join(OUT, "resume_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if ASSERT:
        assert rel[0] < 1e-3, f"first resumed step diverged: {rel[0]}"
        assert rel[:10].max() < 5e-3, (
            f"early post-resume trajectory diverged: {rel[:10].max()}"
        )
        assert rel.mean() < 2e-2, f"mean trajectory gap: {rel.mean()}"
        assert param_rel < 2e-2, f"final params diverged: {param_rel}"


# ---------------------------------------------------------------------------
def stage_extract() -> None:
    par = _load_parity()
    row = par.score_side("ref", _ckpt_path(par))
    row["stage"] = "extract-from-imported-ckpt"
    with open(os.path.join(OUT, "extract_report.json"), "w") as f:
        json.dump(row, f, indent=1)
    print(json.dumps(row))


def stage_all() -> None:
    env = dict(os.environ)
    for stage in ("ref-train", "resume", "extract"):
        print(f"=== rehearsal stage: {stage} ===", flush=True)
        rc = subprocess.call(
            [sys.executable, os.path.abspath(__file__), stage], env=env
        )
        if rc != 0:
            raise SystemExit(f"stage {stage} failed (rc={rc})")
    print("=== rehearsal complete ===")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    {
        "ref-train": stage_ref_train,
        "resume": stage_resume,
        "extract": stage_extract,
        "all": stage_all,
    }[cmd]()
