"""The jitted training step: ray sampling -> render -> loss -> masked Adam.

One XLA program per iteration covers what the reference spreads over host
python (runner_udf.py:63-250): image permutation, importance pixel sampling,
rendering, losses, the runtime trainability gates, and the two LR schedules.
No host<->device traffic occurs inside the loop; metrics are returned as
device scalars and fetched only at logging frequency (the reference's per-iter
`.item()` syncs are a known GPU-idle source, SURVEY.md §3.1).

Gate semantics (runner_udf.py:140-154): the gates fire using the *current*
step's rendered s_val/beta and take effect on the *next* step's update -- the
same effective timing as torch, where flipping requires_grad after the forward
doesn't change the already-built graph.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from emap_tpu.data.dataset import RayPool, sample_rays
from emap_tpu.fields.udf import UDFConfig
from emap_tpu.render.renderer import RenderConfig, render
from emap_tpu.train import schedules
from emap_tpu.train.optim import adam_update
from emap_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 1024
    end_iter: int = 50000
    learning_rate: float = 5e-4
    learning_rate_geo: float = 1e-4
    learning_rate_alpha: float = 0.05
    warm_up_end: float = 1000.0
    anneal_end: float = 10000.0
    fix_geo_end: float = 200.0
    igr_weight: float = 0.1
    igr_ns_weight: float = 0.0
    edge_weight: float = 1.0
    loss_type: str = "mse"
    importance_sample: bool = True
    same_lr: bool = False
    near: float = 0.05
    far: float = 6.0
    seed: int = 42

    @classmethod
    def from_conf(cls, conf, near: float, far: float) -> "TrainConfig":
        t = conf.get_config("train")
        return cls(
            batch_size=t.get_int("batch_size"),
            end_iter=t.get_int("end_iter"),
            learning_rate=t.get_float("learning_rate"),
            learning_rate_geo=t.get_float("learning_rate_geo"),
            learning_rate_alpha=t.get_float("learning_rate_alpha"),
            warm_up_end=t.get_float("warm_up_end", 0.0),
            anneal_end=t.get_float("anneal_end", 0.0),
            fix_geo_end=t.get_float("fix_geo_end", 200.0),
            igr_weight=t.get_float("igr_weight"),
            igr_ns_weight=t.get_float("igr_ns_weight", 0.0),
            edge_weight=conf.get_float("edge_loss.edge_weight", 0.0),
            loss_type=conf.get_string("edge_loss.loss_type", "mse"),
            importance_sample=t.get_bool("importance_sample"),
            same_lr=t.get_bool("same_lr", False),
            near=near,
            far=far,
            seed=t.get_int("seed", 42),
        )


def edge_loss_fn(pred, target, loss_type: str):
    """MSE or L1 (reference src/models/loss.py:5-17)."""
    if loss_type == "mse":
        return jnp.mean((pred - target) ** 2)
    if loss_type == "l1":
        return jnp.mean(jnp.abs(pred - target))
    raise ValueError(f"unknown loss_type {loss_type!r}")


def _label_trees(params, state: TrainState, lr_val, lr_geo_val):
    """Per-leaf lr and trainability-mask trees matching `params`."""
    ones = lambda tree, v: jax.tree.map(lambda _: v, tree)
    lr_tree = {
        "udf": ones(params["udf"], lr_geo_val),
        "variance": ones(params["variance"], lr_val),
        "beta": ones(params["beta"], lr_val),
    }
    var_mask = state.variance_trainable.astype(jnp.float32)
    mask_tree = {
        "udf": ones(params["udf"], jnp.float32(1.0)),
        "variance": ones(params["variance"], var_mask),
        "beta": {
            "beta": state.beta_trainable.astype(jnp.float32),
            "gamma": state.gamma_trainable.astype(jnp.float32),
            "zeta": state.zeta_trainable.astype(jnp.float32),
        },
    }
    return lr_tree, mask_tree


def donation_supported() -> bool:
    """Buffer donation crashes the axon (tunneled TPU) backend with
    INVALID_ARGUMENT when reading donated-step outputs; disable it there.
    The axon plugin reports platform 'tpu', so detect it via its env."""
    import os

    if os.environ.get("JAX_PLATFORMS", "") == "axon" or os.environ.get(
        "AXON_LOOPBACK_RELAY"
    ):
        return False
    return True


def _build_train_step_fn(tcfg: TrainConfig, rcfg: RenderConfig,
                         ucfg: UDFConfig, n_images: int, mesh=None,
                         axis: str = "data", sample_fn=None):
    """The raw (unjitted) step body; see build_train_step.

    `sample_fn` (tests/rehearsals only): `(state, pool, k_rays) -> (batch,
    img_idx)` overrides the in-jit ray sampling so a prescribed ray sequence
    can be fed through the otherwise-unchanged production step (used by
    scripts/rehearse_ckpt_restore.py to run matched-batch post-resume
    trajectories against the torch reference).
    """
    if mesh is not None:
        assert tcfg.batch_size % mesh.shape[axis] == 0, (
            f"batch_size {tcfg.batch_size} must divide mesh axis "
            f"{mesh.shape[axis]}"
        )

    def train_step(state: TrainState, pool: RayPool):
        key_next, k_rays, k_render = jax.random.split(state.key, 3)
        step = state.step

        if sample_fn is not None:
            batch, img_idx = sample_fn(state, pool, k_rays)
        else:
            # epoch-wise image permutation (runner_udf.py:46, :249-250)
            epoch = step // n_images
            perm = jax.random.permutation(
                jax.random.fold_in(state.perm_key, epoch), n_images
            )
            img_idx = perm[step % n_images]

            batch = sample_rays(
                pool, img_idx, k_rays, tcfg.batch_size,
                importance_sample=tcfg.importance_sample,
            )
        if mesh is not None:
            from emap_tpu.parallel.mesh import shard_rays_constraint

            batch = shard_rays_constraint(batch, mesh, axis)
        true_edge = batch["edge"]

        anneal = schedules.cos_anneal_ratio(step, tcfg.anneal_end)
        flip_sat = schedules.flip_saturation(step, float(tcfg.end_iter))

        def loss_fn(params):
            out = render(
                params,
                batch["rays_o"],
                batch["rays_d"],
                tcfg.near,
                tcfg.far,
                batch["depth_scale"],
                k_render,
                rcfg,
                ucfg,
                cos_anneal_ratio=anneal,
                flip_saturation=flip_sat,
                mesh=mesh,
                axis=axis,
            )
            e_loss = edge_loss_fn(out["edge"], true_edge, tcfg.loss_type)
            loss = (
                e_loss * tcfg.edge_weight
                + out["gradient_error_near_surface"] * tcfg.igr_ns_weight
                + out["gradient_error"] * tcfg.igr_weight
            )
            mse = jnp.mean((out["edge"] - true_edge) ** 2)
            aux = {
                "edge_loss": e_loss * tcfg.edge_weight,
                "psnr": 20.0 * jnp.log10(1.0 / jnp.sqrt(mse)),
                "gradient_error": out["gradient_error"],
                "gradient_error_near_surface": out[
                    "gradient_error_near_surface"
                ],
                "variance": jnp.mean(out["variance"]),
                "beta": jnp.reshape(out["beta"], ()),
                "gamma": jnp.reshape(out["gamma"], ()),
                "udf_min": jnp.mean(jnp.min(out["udf"], axis=-1)),
                "udf_mean": jnp.mean(out["udf"]),
                "weight_sum": jnp.mean(out["weight_sum"]),
                "weight_sum_fg_bg": jnp.mean(out["weight_sum_fg_bg"]),
                "sparse_error": out["sparse_error"],
            }
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

        # LR schedules (runner_udf.py:64-68)
        factor = schedules.lr_factor(
            step, tcfg.warm_up_end, float(tcfg.end_iter),
            tcfg.learning_rate_alpha,
        )
        lr_val = tcfg.learning_rate * factor
        if tcfg.same_lr:
            lr_geo_val = lr_val
        else:
            lr_geo_val = tcfg.learning_rate_geo * schedules.lr_factor_geo(
                step, tcfg.fix_geo_end, tcfg.warm_up_end,
                float(tcfg.end_iter), tcfg.learning_rate_alpha,
            )

        lr_tree, mask_tree = _label_trees(state.params, state, lr_val, lr_geo_val)
        new_params, new_opt = adam_update(
            state.params, grads, state.opt, lr_tree, mask_tree
        )

        # trainability gates, effective next step (runner_udf.py:140-154)
        s_val = aux["variance"]
        beta_inv = aux["beta"]
        trigger = (
            (s_val < 2.0 * beta_inv)
            & (s_val < 0.01)
            & state.beta_gate_armed
            & state.variance_trainable
        )
        new_beta_trainable = state.beta_trainable | trigger
        new_gate_armed = state.beta_gate_armed & (~trigger)
        new_variance_trainable = state.variance_trainable | (step > 20000)

        new_state = TrainState(
            params=new_params,
            opt=new_opt,
            step=step + 1,
            key=key_next,
            perm_key=state.perm_key,
            beta_trainable=new_beta_trainable,
            gamma_trainable=state.gamma_trainable,
            zeta_trainable=state.zeta_trainable,
            variance_trainable=new_variance_trainable,
            beta_gate_armed=new_gate_armed,
        )

        metrics = dict(aux)
        metrics.update(
            loss=loss,
            lr=lr_val,
            lr_geo=lr_geo_val,
            img_idx=img_idx,
            cos_anneal_ratio=anneal,
            flip_saturation=flip_sat,
            beta_trainable=new_beta_trainable,
        )
        return new_state, metrics

    return train_step


def build_train_step(tcfg: TrainConfig, rcfg: RenderConfig, ucfg: UDFConfig,
                     n_images: int, donate: bool | None = None, mesh=None,
                     axis: str = "data", sample_fn=None):
    """Returns jitted train_step(state, pool) -> (new_state, metrics dict).

    With `mesh`, the sampled ray batch is sharding-constrained along `axis`
    (params replicate, XLA partitions render/backward over rays and inserts
    the gradient psum over ICI) -- same program, 1 chip or N.

    donate=None enables state-buffer donation where the backend supports it.
    """
    if donate is None:
        donate = donation_supported()
    fn = _build_train_step_fn(tcfg, rcfg, ucfg, n_images, mesh=mesh,
                              axis=axis, sample_fn=sample_fn)
    donate_argnums = (0,) if donate else ()
    return jax.jit(fn, donate_argnums=donate_argnums)


METRIC_KEYS = (
    "loss", "edge_loss", "psnr", "gradient_error",
    "gradient_error_near_surface", "variance", "beta", "gamma", "udf_min",
    "udf_mean", "weight_sum", "weight_sum_fg_bg", "lr", "lr_geo",
)


def build_packed_train_step(tcfg, rcfg, ucfg, n_images, donate=None,
                            mesh=None, axis: str = "data"):
    """Train step returning metrics as ONE (len(METRIC_KEYS),) device vector.

    The dict-returning step materializes ~25 tiny device buffers per
    iteration; retaining a logging window of those through the tunneled
    runtime measurably slows the loop. The packed variant keeps one buffer
    per step; unpack on host with `unpack_metrics`.
    """
    base = _build_train_step_fn(tcfg, rcfg, ucfg, n_images, mesh=mesh,
                                axis=axis)

    def packed(state, pool):
        new_state, m = base(state, pool)
        vec = jnp.stack([jnp.asarray(m[k], jnp.float32) for k in METRIC_KEYS])
        return new_state, vec

    if donate is None:
        donate = donation_supported()
    donate_argnums = (0,) if donate else ()
    return jax.jit(packed, donate_argnums=donate_argnums)


def build_chained_train_step(tcfg, rcfg, ucfg, n_images, chain: int,
                             donate=None, mesh=None, axis: str = "data"):
    """`chain` train steps in ONE device dispatch via lax.scan.

    Returns jitted (state, pool) -> (state_after_chain, (chain, M) metric
    rows, one per step, same layout as build_packed_train_step).

    Rationale: through the tunneled runtime each dispatch costs ~0.1-0.3 s of
    host-side RPC regardless of compute, which caps the per-step loop at ~5x
    below the device's steady-state rate (bench.py measures the pipelined
    rate; the production loop pays the per-dispatch cost). Chaining K steps
    on device amortizes that cost K-fold. Everything the step needs is
    already functional state (RNG key, step counter, trainability gates, LR
    schedules as functions of step), so scan produces bit-identical
    trajectories to K single-step calls.

    Compile cost is length-independent (the scan body compiles once:
    measured 20.9 s single-step vs 18-26 s for chain 10/100/500 on the CPU
    backend), so there is no reason to pick a short chain; the production
    wall-clock win measured 39 -> ~11 min on the 50k-step e2e schedule.
    """
    base = _build_train_step_fn(tcfg, rcfg, ucfg, n_images, mesh=mesh,
                                axis=axis)

    def chained(state, pool):
        def body(s, _):
            ns, m = base(s, pool)
            vec = jnp.stack(
                [jnp.asarray(m[k], jnp.float32) for k in METRIC_KEYS]
            )
            return ns, vec

        new_state, vecs = jax.lax.scan(body, state, None, length=chain)
        return new_state, vecs

    if donate is None:
        donate = donation_supported()
    donate_argnums = (0,) if donate else ()
    return jax.jit(chained, donate_argnums=donate_argnums)


def unpack_metrics(vec) -> dict:
    import numpy as np

    arr = np.asarray(vec)
    return {k: float(arr[i]) for i, k in enumerate(METRIC_KEYS)}
