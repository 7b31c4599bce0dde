"""Training/extraction orchestration: the L4 layer.

Functional re-design of the reference Runner/Runner_UDF
(src/runner/runner_base.py:18-213, src/runner/runner_udf.py:20-587). The
public surface matches upstream -- Runner(conf, mode, is_continue) with
.train() / .extract_edge(**kw) / .validate() -- but the loop body is one jitted
XLA program per step and metrics are fetched from device only at logging
frequency (the reference syncs `.item()` every iteration).

Checkpointing: native .npz via emap_tpu.ckpt.native, with the reference's
policy -- save only when the 500-step rolling edge-loss average improves,
single ckpt_best file (runner_udf.py:239-285). Released torch `.pth`
checkpoints load through emap_tpu.ckpt.pth_import.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import math
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from emap_tpu.ckpt.native import load_pytree, save_pytree
from emap_tpu.ckpt.pth_import import import_reference_checkpoint
from emap_tpu.data.dataset import (
    RayPool,
    edge_at,
    gen_rays_at,
    load_scene,
)
from emap_tpu.extract.parametric import get_parametric_edge
from emap_tpu.extract.pointcloud import extract_pointcloud
from emap_tpu.fields.udf import UDFConfig
from emap_tpu.render.renderer import RenderConfig, render
from emap_tpu.train import schedules
from emap_tpu.train.optim import adam_init
from emap_tpu.train.state import TrainState, init_train_state
from emap_tpu.train.step import (
    TrainConfig,
    build_chained_train_step,
    build_packed_train_step,
    unpack_metrics,
)
from emap_tpu.utils.guards import assert_finite_metrics
from emap_tpu.utils.vis import visualize_depth

logger = logging.getLogger(__name__)


class Runner:
    """UDF edge-field trainer (the reference's Runner_UDF equivalent)."""

    def __init__(self, conf, mode: str = "train", is_continue: bool = False,
                 mesh=None):
        self.conf = conf
        self.mode = mode
        self.is_continue = is_continue
        self.mesh = mesh

        self.base_exp_dir = os.path.join(
            conf["general.base_exp_dir"],
            str(conf["dataset.scan"]),
            conf["general.expname"],
        )
        os.makedirs(self.base_exp_dir, exist_ok=True)

        self.scene = load_scene(conf.get_config("dataset"))
        self.near, self.far = self.scene.near, self.scene.far

        self.model_type = conf.get_string("general.model_type", "udf")
        self.ucfg = UDFConfig.from_conf(conf.get_config("model.udf_network"))
        self.rcfg = RenderConfig.from_conf(conf.get_config("model.udf_renderer"))
        if (
            "model.udf_network.precision" in conf
            and "model.udf_renderer.field_precision" not in conf
        ):
            # An explicitly pinned model tier is the one-knob f32 escape
            # hatch; it must also govern the train-path field query unless
            # the conf separately pins field_precision (whose conf-default
            # is the fast bf16 tier, RenderConfig.from_conf).
            self.rcfg = dataclasses.replace(self.rcfg, field_precision="")
        self.tcfg = TrainConfig.from_conf(conf, self.near, self.far)

        self.end_iter = conf.get_int("train.end_iter")
        self.save_freq = conf.get_int("train.save_freq")
        self.report_freq = conf.get_int("train.report_freq")
        self.val_freq = conf.get_int("train.val_freq")
        self.batch_size = conf.get_int("train.batch_size")
        self.validate_resolution_level = conf.get_int(
            "train.validate_resolution_level"
        )
        self.use_white_bkgd = conf.get_bool("train.use_white_bkgd")
        self.latest_model_name = conf.get_string(
            "train.latest_model_name", "ckpt_best.npz"
        )

        beta_conf = conf.get_config("model.beta_network")
        self.state = init_train_state(
            seed=self.tcfg.seed,
            udf_cfg=self.ucfg,
            variance_init=conf.get_float("model.variance_network.init_val"),
            beta_init=beta_conf.get_float("init_var_beta", 0.1),
            gamma_init=beta_conf.get_float("init_var_gamma", 0.1),
            zeta_init=beta_conf.get_float("init_var_zeta", 0.05),
            requires_grad_beta=beta_conf.get_bool("requires_grad_beta", True),
            requires_grad_gamma=beta_conf.get_bool("requires_grad_gamma", True),
            requires_grad_zeta=beta_conf.get_bool("requires_grad_zeta", True),
        )
        self.pool = RayPool.from_scene(self.scene)
        if self.mesh is not None:
            # params/pool replicate across the mesh; the per-step ray batch is
            # sharding-constrained inside the jitted step and XLA inserts the
            # gradient psum over ICI (emap_tpu/parallel/mesh.py)
            from emap_tpu.parallel.mesh import replicate

            self.state = replicate(self.state, self.mesh)
            self.pool = replicate(self.pool, self.mesh)
        self.best_loss = 1.0
        self.writer = None

        self._train_step = None
        self._chained_step = None
        self._render_chunk = None

    def _place(self, tree):
        """Replicate a freshly-loaded pytree onto the mesh (no-op without)."""
        if self.mesh is None:
            return tree
        from emap_tpu.parallel.mesh import replicate

        return replicate(tree, self.mesh)

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------
    def _ckpt_dir(self) -> str:
        return os.path.join(self.base_exp_dir, "checkpoints")

    def save_checkpoint(self, loss_val: float) -> None:
        """Save only when the rolling loss improves (runner_udf.py:265-285)."""
        if loss_val >= self.best_loss:
            return
        self.best_loss = loss_val
        payload = {
            "params": self.state.params,
            "opt": {
                "mu": self.state.opt.mu,
                "nu": self.state.opt.nu,
                "count": self.state.opt.count,
            },
            "iter_step": np.asarray(self.state.step),
            "flags": {
                "beta_trainable": np.asarray(self.state.beta_trainable),
                "gamma_trainable": np.asarray(self.state.gamma_trainable),
                "zeta_trainable": np.asarray(self.state.zeta_trainable),
                "variance_trainable": np.asarray(self.state.variance_trainable),
                "beta_gate_armed": np.asarray(self.state.beta_gate_armed),
            },
            "best_loss": np.asarray(self.best_loss, np.float32),
        }
        path = os.path.join(self._ckpt_dir(), "ckpt_best.npz")
        save_pytree(path, payload)
        logger.info("saved checkpoint (best loss %.4f) -> %s", loss_val, path)

    def load_checkpoint(self, name: str | None = None) -> None:
        name = name or self.latest_model_name
        path = (
            name if os.path.isabs(name) else os.path.join(self._ckpt_dir(), name)
        )
        if not os.path.exists(path) and path.endswith(".pth"):
            alt = path[:-4] + ".npz"
            if os.path.exists(alt):
                path = alt
        if path.endswith(".pth"):
            imported = import_reference_checkpoint(path)
            params = jax.tree.map(jnp.asarray, imported["params"])
            if imported.get("opt") is not None:
                from emap_tpu.train.optim import AdamState

                opt = AdamState(
                    mu=jax.tree.map(jnp.asarray, imported["opt"]["mu"]),
                    nu=jax.tree.map(jnp.asarray, imported["opt"]["nu"]),
                    count=jax.tree.map(jnp.asarray, imported["opt"]["count"]),
                )
            else:
                opt = adam_init(params)
            self.state = TrainState(
                params=params,
                opt=opt,
                step=jnp.asarray(imported["iter_step"], jnp.int32),
                key=self.state.key,
                perm_key=self.state.perm_key,
                beta_trainable=self.state.beta_trainable,
                gamma_trainable=self.state.gamma_trainable,
                zeta_trainable=self.state.zeta_trainable,
                variance_trainable=self.state.variance_trainable,
                beta_gate_armed=self.state.beta_gate_armed,
            )
        else:
            payload = load_pytree(path)
            from emap_tpu.train.optim import AdamState

            flags = payload["flags"]
            self.state = TrainState(
                params=jax.tree.map(jnp.asarray, payload["params"]),
                opt=AdamState(
                    mu=jax.tree.map(jnp.asarray, payload["opt"]["mu"]),
                    nu=jax.tree.map(jnp.asarray, payload["opt"]["nu"]),
                    count=jax.tree.map(jnp.asarray, payload["opt"]["count"]),
                ),
                step=jnp.asarray(payload["iter_step"], jnp.int32),
                key=self.state.key,
                perm_key=self.state.perm_key,
                beta_trainable=jnp.asarray(bool(flags["beta_trainable"])),
                gamma_trainable=jnp.asarray(bool(flags["gamma_trainable"])),
                zeta_trainable=jnp.asarray(bool(flags["zeta_trainable"])),
                variance_trainable=jnp.asarray(
                    bool(flags["variance_trainable"])
                ),
                beta_gate_armed=jnp.asarray(bool(flags["beta_gate_armed"])),
            )
            self.best_loss = float(payload.get("best_loss", 1.0))
        self.state = self._place(self.state)
        logger.info("loaded checkpoint %s (iter %d)", path, int(self.state.step))

    # ------------------------------------------------------------------
    # run-dir snapshot (reference file_backup, runner_base.py:182-201)
    # ------------------------------------------------------------------
    def file_backup(self) -> None:
        rec_dir = os.path.join(self.base_exp_dir, "recording")
        os.makedirs(rec_dir, exist_ok=True)
        for dir_name in self.conf.get_list("general.recording", []):
            if os.path.isdir(dir_name):
                dst = os.path.join(rec_dir, os.path.basename(dir_name.rstrip("/")))
                shutil.copytree(
                    dir_name, dst, dirs_exist_ok=True,
                    ignore=shutil.ignore_patterns("__pycache__"),
                )
        with open(os.path.join(rec_dir, "config.conf"), "w") as f:
            f.write(self.conf.to_hocon())

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------
    def train(self) -> None:
        if self.is_continue:
            self.load_checkpoint()
        if self.mode.startswith("train"):
            self.file_backup()

        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(
                log_dir=os.path.join(self.base_exp_dir, "logs")
            )
        except ImportError:
            self.writer = None

        if self._train_step is None:
            # packed metrics: one device buffer per step instead of ~25
            # (keeping a 500-step logging window of tiny buffers measurably
            # slows the loop through the tunneled runtime)
            self._train_step = build_packed_train_step(
                self.tcfg, self.rcfg, self.ucfg, self.scene.n_images,
                mesh=self.mesh,
            )

        loss_window: list = []
        loss_avg = None
        pending: list = []  # (first_step, (k, M) metric rows) fetched lazily
        t0 = time.time()
        start_step = int(self.state.step)

        # optional profiler trace (SURVEY.md §5: the reference has no tracing;
        # here a window of steps can be captured with the JAX profiler)
        profile_steps = self.conf.get_int("train.profile_steps", 0)
        profile_start = start_step + 5

        # Steps per device dispatch: the tunneled runtime costs ~0.1-0.3 s of
        # host RPC per dispatch, so chaining steps on device (lax.scan,
        # bit-identical trajectory) is worth ~2x wall-clock on a full scan.
        # The chain must divide every event cadence so checkpoints/validation
        # land exactly on their steps; profiling forces per-step dispatch.
        chain = self.conf.get_int("train.steps_per_dispatch", 0)
        aligned = math.gcd(
            math.gcd(500, self.report_freq),
            math.gcd(self.save_freq, self.val_freq),
        )
        if chain <= 0:
            chain = aligned
        elif aligned % chain != 0:
            logger.warning(
                "train.steps_per_dispatch=%d does not divide the event "
                "cadences (gcd %d); rounding down so checkpoints/validation "
                "stay on their exact steps", chain, aligned,
            )
            chain = math.gcd(chain, aligned)
        chain = max(1, min(chain, 500))
        if profile_steps:
            chain = 1
        # cache keyed on chain length: a second train() call with changed
        # report/save/val cadences recomputes `chain`, and reusing a stale-
        # length chained step would misalign checkpoints/validation
        if chain > 1 and getattr(self, "_chained_step_len", None) != chain:
            self._chained_step = build_chained_train_step(
                self.tcfg, self.rcfg, self.ucfg, self.scene.n_images,
                chain, mesh=self.mesh,
            )
            self._chained_step_len = chain

        # live progress with PSNR/loss in the description (the reference's
        # tqdm usage, runner_udf.py:57-62); optional dependency
        try:
            from tqdm import tqdm

            pbar = tqdm(
                total=self.end_iter,
                initial=start_step,
                desc="PSNR: 0.00",
                position=0,
                leave=True,
            )
        except ImportError:  # pragma: no cover
            pbar = None

        state = self.state
        it = start_step
        while it < self.end_iter:
            if profile_steps and it == profile_start:
                jax.profiler.start_trace(
                    os.path.join(self.base_exp_dir, "profile")
                )
            if profile_steps and it == profile_start + profile_steps:
                jax.profiler.stop_trace()
                logger.info(
                    "profiler trace written to %s",
                    os.path.join(self.base_exp_dir, "profile"),
                )
                profile_steps = 0

            if (
                chain > 1
                and it % chain == 0
                and it + chain <= self.end_iter
            ):
                state, rows = self._chained_step(state, self.pool)
                n_new = chain
            else:
                state, vec = self._train_step(state, self.pool)
                rows, n_new = vec[None], 1
            step = it + n_new
            it = step
            pending.append((step - n_new + 1, rows))
            if pbar is not None:
                pbar.update(n_new)

            need_fetch = (
                step % 500 == 0
                or step % self.report_freq == 0
                or step % self.save_freq == 0
                or step % self.val_freq == 0
                or step == self.end_iter
            )
            if not need_fetch:
                continue

            # fetch pending metrics (device sync happens here only)
            last = None
            for first, rows in pending:
                for i, vec in enumerate(np.asarray(rows)):
                    m = unpack_metrics(vec)
                    last = m
                    loss_window.append(m["edge_loss"])
                    if self.writer is not None:
                        for key in (
                            "loss", "edge_loss", "gradient_error", "psnr",
                            "variance", "beta",
                        ):
                            self.writer.add_scalar(
                                f"Loss/{key}"
                                if "loss" in key or "error" in key
                                else f"Sta/{key}",
                                m[key],
                                first + i,
                            )
            pending = []
            # failure detection (replaces the reference's pdb NaN tripwires)
            assert_finite_metrics(
                {k: float(last[k]) for k in ("loss", "edge_loss", "psnr")},
                step,
            )
            if pbar is not None:
                pbar.set_description(
                    "PSNR: {:.2f}, Loss: {:.2f}".format(
                        last["psnr"], last["loss"]
                    )
                )

            if step % 500 == 0 and loss_window:
                loss_avg = float(np.mean(loss_window))
                loss_window = []

            if step % self.report_freq == 0:
                rays_per_sec = (
                    self.batch_size * (step - start_step) / (time.time() - t0)
                )
                logger.info(
                    "iter %d loss=%.4f edge=%.4f eik=%.4f psnr=%.2f "
                    "s_val=%.5f beta=%.5f gamma=%.3f lr=%.2e lr_geo=%.2e "
                    "w_sum=%.3f udf_min=%.5f rays/s=%.0f",
                    step,
                    last["loss"],
                    last["edge_loss"],
                    last["gradient_error"],
                    last["psnr"],
                    last["variance"],
                    last["beta"],
                    last["gamma"],
                    last["lr"],
                    last["lr_geo"],
                    last["weight_sum"],
                    last["udf_min"],
                    rays_per_sec,
                )

            self.state = state
            if step % self.save_freq == 0 and loss_avg is not None:
                self.save_checkpoint(loss_avg)
            if step % self.val_freq == 0:
                self.validate()

        if pbar is not None:
            pbar.close()
        self.state = state

    # ------------------------------------------------------------------
    # validation (full-image render, reference runner_udf.py:287-484)
    # ------------------------------------------------------------------
    def _build_render_chunk(self, chunk: int):
        rcfg, ucfg = self.rcfg, self.ucfg
        near, far = self.near, self.far
        bg = 1.0 if self.use_white_bkgd else None
        mesh = self.mesh

        def f(params, rays_o, rays_d, depth_scale, key, anneal):
            if mesh is not None:
                # validation rays shard over the mesh like training rays
                from emap_tpu.parallel.mesh import shard_rays_constraint

                rays_o, rays_d, depth_scale = shard_rays_constraint(
                    (rays_o, rays_d, depth_scale), mesh
                )
            # flip_saturation pinned to 0.0 at validation: DELIBERATE. The
            # reference renders validation images with the renderer default
            # (udf_renderer_blending.py:689), not the train-schedule value.
            out = render(
                params, rays_o, rays_d, near, far, depth_scale, key,
                rcfg, ucfg, cos_anneal_ratio=anneal, flip_saturation=0.0,
                background_rgb=bg, mesh=mesh,
            )
            n_total = rcfg.total_samples
            normals = jnp.sum(
                out["gradients_flip"] * out["weights"][:, :n_total, None],
                axis=1,
            )
            return {
                "edge": out["edge"],
                "depth": out["depth"],
                "normals": normals,
            }

        return jax.jit(f)

    def validate(self, idx: int = -1, resolution_level: int = -1) -> None:
        if idx < 0:
            idx = np.random.randint(self.scene.n_images)
        if resolution_level < 0:
            resolution_level = self.validate_resolution_level

        rays_o, rays_d, depth_scale = gen_rays_at(
            self.scene, idx, resolution_level
        )
        h, w, _ = rays_o.shape
        flat_o = rays_o.reshape(-1, 3)
        flat_d = rays_d.reshape(-1, 3)
        flat_ds = depth_scale.reshape(-1, 1)

        chunk = self.batch_size
        if self._render_chunk is None:
            self._render_chunk = self._build_render_chunk(chunk)

        anneal = schedules.cos_anneal_ratio(
            int(self.state.step), self.tcfg.anneal_end
        )
        n = len(flat_o)
        pad = (-n) % chunk
        if pad:
            flat_o = np.concatenate([flat_o, np.zeros((pad, 3), np.float32)])
            flat_d = np.concatenate(
                [flat_d, np.tile(np.array([[0, 0, 1]], np.float32), (pad, 1))]
            )
            flat_ds = np.concatenate([flat_ds, np.ones((pad, 1), np.float32)])

        outs = {"edge": [], "depth": [], "normals": []}
        key = jax.random.key(int(self.state.step))
        # Dispatch every chunk before fetching any result so the chunks
        # pipeline on device instead of paying a host round-trip each.
        pending = [
            self._render_chunk(
                self.state.params,
                jnp.asarray(flat_o[c : c + chunk]),
                jnp.asarray(flat_d[c : c + chunk]),
                jnp.asarray(flat_ds[c : c + chunk]),
                jax.random.fold_in(key, c),
                jnp.float32(anneal),
            )
            for c in range(0, len(flat_o), chunk)
        ]
        for res in pending:
            for k in outs:
                outs[k].append(np.asarray(res[k]))

        edge = np.concatenate(outs["edge"])[:n].reshape(h, w)
        depth = np.concatenate(outs["depth"])[:n].reshape(h, w)
        normals = np.concatenate(outs["normals"])[:n]

        step = int(self.state.step)
        # edge map: rendered | ground truth side by side
        os.makedirs(os.path.join(self.base_exp_dir, "edge_maps"), exist_ok=True)
        edge_img = (edge * 255).clip(0, 255).astype(np.uint8)
        edge_rgb = np.stack([edge_img] * 3, axis=-1)
        gt = edge_at(self.scene, idx, resolution_level).astype(np.uint8)
        gt_rgb = np.stack([gt] * 3, axis=-1)
        cv2.imwrite(
            os.path.join(
                self.base_exp_dir, "edge_maps", f"{step:08d}_{idx}.png"
            ),
            np.concatenate([edge_rgb, gt_rgb]),
        )

        # normal map rotated into the camera frame (runner_udf.py:447-467)
        os.makedirs(os.path.join(self.base_exp_dir, "normals"), exist_ok=True)
        rot = np.linalg.inv(self.scene.poses[idx, :3, :3])
        normal_img = (
            (normals @ rot.T).reshape(h, w, 3) * 128 + 128
        ).clip(0, 255).astype(np.uint8)
        cv2.imwrite(
            os.path.join(self.base_exp_dir, "normals", f"{step:08d}_{idx}.png"),
            normal_img[:, :, ::-1],
        )

        # depth
        os.makedirs(os.path.join(self.base_exp_dir, "depths"), exist_ok=True)
        cv2.imwrite(
            os.path.join(self.base_exp_dir, "depths", f"{step:08d}_{idx}.png"),
            visualize_depth(depth)[:, :, ::-1],
        )

    # ------------------------------------------------------------------
    # extraction (reference runner_udf.py:486-587)
    # ------------------------------------------------------------------
    def extract_edge(
        self,
        resolution: int = 256,
        udf_threshold: float = 1.0,
        sampling_N: int = 50,
        sampling_delta: float = 5e-3,
        is_pointshift: bool = False,
        iters: int = 1,
        is_linedirection: bool = False,
        visible_checking: bool = False,
        auto_threshold: "list[float] | None" = None,
        platform: str = "",
        fit_draws: int = 1,
    ) -> dict:
        """Extract parametric edges from the trained UDF.

        fit_draws (no reference counterpart): >1 re-runs the chaotic host
        fit stage (polyline growth + RANSAC, reference
        edge_fitting/main.py:93-228 — fixed seed 42 upstream) that many
        times per threshold with distinct seeds on the SAME point cloud,
        and lets the GT-free probe scorer rank the draws exactly like
        thresholds (autothresh.select_udf_threshold fit_seeds). Hedges the
        documented ±0.1 F@5mm extraction re-roll band, which lives in the
        fit (scripts/fit_draws_diag.py: within-cloud band ±0.06, picker
        regret 0 on 4/6 committed clouds). Works with or without
        auto_threshold; only the fit+scoring cost scales with K (the dense
        grid pass is shared).

        auto_threshold (no reference counterpart): a non-empty list of
        candidate udf_thresholds switches on GT-free threshold selection —
        each candidate is extracted and scored against the observed 2D edge
        maps (extract/autothresh.py), the argmax wins, and the per-candidate
        table lands in results/threshold_selection.json. udf_threshold is
        ignored in that mode. All candidates share ONE dense grid + feature
        + shift pass (extract_pointcloud_multi — the membership tests are
        the only threshold-dependent step); measured 5.78x faster than the
        per-candidate re-runs at the DTU 256^3 protocol with K=6
        (parity_results/bench_extract_multi.json).

        platform (no reference counterpart — the reference is
        single-platform, extract_pointcloud.py:36-88): a non-empty jax
        platform name ("cpu", "tpu") pins every field query in the
        extraction to that backend via jax.default_device. The fit/merge
        stage is chaotic in its inputs — f32 backend roundoff (~3e-6 in
        udf values, ~0.4 deg in normals) re-rolls F@5mm by ~±0.1 across
        backends even though the point clouds agree to <=1.5e-3
        (diag_platform/compare_s*_cpu_tpu.json) — so cross-machine
        reproducible extraction requires a canonical backend. "" (default)
        keeps the session backend: fastest, bit-stable on any one machine.
        """
        self.load_checkpoint()
        if self.model_type != "udf":
            raise NotImplementedError(
                "model types other than 'udf' are not supported"
            )
        import contextlib

        device_pin = (
            jax.default_device(jax.devices(platform)[0])
            if platform
            else contextlib.nullcontext()
        )
        with device_pin:
            return self._extract_edge_impl(
                resolution, udf_threshold, sampling_N, sampling_delta,
                is_pointshift, iters, is_linedirection, visible_checking,
                auto_threshold, fit_draws,
            )

    def _extract_edge_impl(
        self,
        resolution: int,
        udf_threshold: float,
        sampling_N: int,
        sampling_delta: float,
        is_pointshift: bool,
        iters: int,
        is_linedirection: bool,
        visible_checking: bool,
        auto_threshold: "list[float] | None",
        fit_draws: int = 1,
    ) -> dict:

        def extract_at(thr: float):
            points, line_dirs = extract_pointcloud(
                self.state.params["udf"],
                self.ucfg,
                resolution=resolution,
                udf_threshold=thr,
                sampling_N=sampling_N,
                sampling_delta=sampling_delta,
                is_pointshift=is_pointshift,
                iters=iters,
                is_linedirection=is_linedirection,
            )
            ld_colors = (line_dirs + 1.0) / 2.0
            pred_points, edge_dict = get_parametric_edge(
                points,
                ld_colors,
                resolution,
                self.scene.detector,
                self.scene.data_dir,
                visible_checking=visible_checking,
            )
            return points, ld_colors, pred_points, edge_dict

        result_dir = os.path.join(self.base_exp_dir, "results")
        os.makedirs(result_dir, exist_ok=True)

        if auto_threshold or fit_draws > 1:
            from emap_tpu.extract.autothresh import (
                build_probe_points,
                select_udf_threshold,
            )
            from emap_tpu.extract.pointcloud import extract_pointcloud_multi

            # fit_draws>1 without auto_threshold still routes through the
            # selector machinery: one candidate threshold, K fit draws
            candidates = (list(auto_threshold) if auto_threshold
                          else [udf_threshold])
            # 42 first so draw 0 IS the reference's fixed fit
            # (edge_fitting/main.py seeds everything from 42); extra draws
            # use small deterministic seeds, same roster the measurement
            # used (scripts/fit_draws_diag.py FD_SEEDS)
            fit_seeds = ([42] + [s for s in range(int(fit_draws))
                                 if s != 42][:int(fit_draws) - 1]
                         if fit_draws > 1 else None)

            # one shared grid + feature + shift pass serves every candidate
            # (the per-point device math is threshold-independent; only the
            # membership tests differ) — 5.78x vs per-candidate re-runs at
            # the DTU 256^3 K=6 protocol. Candidate point sets are bit-equal
            # to standalone runs (tests/test_extract.py::TestExtractMulti);
            # only the line-direction jitter draw differs by batch layout,
            # the same re-roll class as the documented platform spread.
            multi = extract_pointcloud_multi(
                self.state.params["udf"],
                self.ucfg,
                resolution=resolution,
                thresholds=candidates,
                sampling_N=sampling_N,
                sampling_delta=sampling_delta,
                is_pointshift=is_pointshift,
                iters=iters,
                is_linedirection=is_linedirection,
            )

            cache: dict[tuple, tuple] = {}

            def edge_dict_at(thr: float, seed: int = 42) -> dict:
                points, line_dirs = multi[float(thr)]
                ld_colors = (line_dirs + 1.0) / 2.0
                pred_points, edge_dict = get_parametric_edge(
                    points,
                    ld_colors,
                    resolution,
                    self.scene.detector,
                    self.scene.data_dir,
                    visible_checking=visible_checking,
                    seed=seed,
                )
                cache[(thr, seed)] = (
                    points, ld_colors, pred_points, edge_dict)
                return edge_dict

            # the field's own certified zero set stands in for GT when
            # ranking candidates (autothresh.pick_candidate)
            probe = build_probe_points(
                self.state.params["udf"],
                self.ucfg,
                resolution,
                loose_threshold=max(candidates),
                sampling_N=sampling_N,
                sampling_delta=sampling_delta,
            )
            best_thr, _, rows = select_udf_threshold(
                edge_dict_at,
                candidates,
                self.scene.data_dir,
                self.scene.detector,
                # signal-free fallback anchor (pick_candidate): the conf's
                # own fixed threshold wins when neither the 3D probe nor
                # the 2D spread can rank the candidates
                default_thr=udf_threshold,
                # a field with no certified zero set (e.g. barely trained)
                # yields an empty probe; a probe under 64 points quantizes
                # recall3d in steps of 1/n so the f3d ranking is noise
                # (ADVICE r3) — both cases rank by the 2D score + conf
                # anchor instead of a noise-driven f3d argmax
                probe_points=probe if len(probe) >= 64 else None,
                fit_seeds=fit_seeds,
            )
            picked_row = next(r for r in rows if r.get("picked"))
            picked_seed = picked_row.get("fit_seed", 42)
            points, ld_colors, pred_points, edge_dict = cache[
                (best_thr, picked_seed)]
            with open(
                os.path.join(result_dir, "threshold_selection.json"), "w"
            ) as f:
                json.dump(
                    {"picked": best_thr, "picked_fit_seed": picked_seed,
                     "fit_draws": fit_draws, "candidates": rows},
                    f, indent=1,
                )
            logger.info(
                "%s picked %.3g from %s (fit seed %d, %d draws)",
                "auto_threshold" if auto_threshold
                else "fit_draws at fixed threshold",
                best_thr, candidates, picked_seed, max(fit_draws, 1),
            )
        else:
            points, ld_colors, pred_points, edge_dict = extract_at(
                udf_threshold
            )

        from emap_tpu.utils.ply import write_ply_points

        write_ply_points(
            os.path.join(result_dir, "udf_pointcloud_withdirection.ply"),
            points,
            ld_colors,
        )

        write_ply_points(
            os.path.join(result_dir, "edge_points.ply"), pred_points
        )
        with open(os.path.join(result_dir, "parametric_edges.json"), "w") as f:
            json.dump(edge_dict, f)
        logger.info(
            "extracted %d curves + %d lines -> %s",
            len(edge_dict["curves_ctl_pts"]),
            len(edge_dict["lines_end_pts"]),
            result_dir,
        )
        return edge_dict
