"""Unbiased two-sided UDF volume renderer as a pure function.

Functional re-design of UDFRendererBlending.render/render_core
(reference src/models/udf_renderer_blending.py:112-841). One call renders a
batch of rays end to end:

  stratified base samples -> 5-round importance up-sampling (stop-gradient)
  -> field query + spatial gradients at the 114 mid-points
  -> occlusion/visibility cumprod -> two-sided alpha blend -> weights
  -> edge/depth/normal integration + eikonal terms.

Everything is static-shape and jit-compatible; the renderer itself is
differentiated by jax.grad in the train step (double backprop through the
spatial gradient happens automatically).

Deviations from the reference (deliberate):
* n_outside > 0 (NeRF++ background) is not supported: the reference path is
  dead in every shipped conf and crashes if enabled (undefined
  `sampled_edge_pixel`, reference :582-591). We raise a clear error instead.
* The NaN pdb tripwires (:102-107, :346-351, :632-633) are replaced by the
  checkify-able finite-ness helpers in emap_tpu.utils.guards.
* `sparse_error` is returned (the reference computes it at :641-644 but drops
  it in `render`); it is not used by any loss, matching reference training.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from emap_tpu.fields.scalars import beta_gamma_zeta, inv_s_value
from emap_tpu.fields.udf import UDFConfig, udf_value, udf_value_and_gradient
from emap_tpu.render import sampling


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    n_samples: int = 64
    n_importance: int = 50
    n_outside: int = 0
    up_sample_steps: int = 5
    perturb: float = 1.0
    sdf2alpha_type: str = "numerical"
    upsampling_type: str = "classical"
    use_unbias_render: bool = True
    sparse_scale_factor: float = 25000.0
    use_norm_grad_for_cosine: bool = False
    near_surface: float = 0.05
    beta_min: float = 0.00005
    # matmul precision for the no-grad importance-sampling field queries.
    # They only decide *where* z-samples land (render_core re-evaluates at
    # full precision), so the TPU's fast bf16-pass matmul is quality-safe
    # and removes ~1/3 of the step's MXU work. Set to "highest" to force
    # full-precision sampling.
    sampler_precision: str = "default"
    # matmul precision for render_core's TRAIN-path field query (the fused
    # fwd+second-order-bwd kernel). "" inherits the model's `precision`
    # (which also governs extraction); a non-empty value overrides it for
    # TRAINING ONLY, leaving extraction at the model tier. Measured e2e
    # (BASELINE.md precision A/B, 8 matched seeds across cube+rings):
    # training at "default" (1-pass bf16, bwd inherits) matches the "high"
    # tier's F-scores within seed noise (mean dF@5mm +0.006) at ~1.9x step
    # throughput, so conf-driven production (from_conf) defaults to
    # "default"; the dataclass default stays "" (inherit) so directly
    # constructed configs — oracle-parity tests, extraction — keep the
    # model tier.
    field_precision: str = ""

    def __post_init__(self):
        if self.n_outside != 0:
            raise NotImplementedError(
                "n_outside > 0 (NeRF++ background) is dead/broken in the "
                "reference (udf_renderer_blending.py:582-591) and not supported."
            )
        if self.sdf2alpha_type not in ("numerical", "theorical"):
            raise ValueError(
                f"unknown sdf2alpha_type {self.sdf2alpha_type!r}"
            )

    @classmethod
    def from_conf(cls, conf) -> "RenderConfig":
        return cls(
            n_samples=conf.get_int("n_samples", 64),
            n_importance=conf.get_int("n_importance", 50),
            n_outside=conf.get_int("n_outside", 0),
            up_sample_steps=conf.get_int("up_sample_steps", 5),
            perturb=conf.get_float("perturb", 1.0),
            sdf2alpha_type=conf.get_string("sdf2alpha_type", "numerical"),
            upsampling_type=conf.get_string("upsampling_type", "classical"),
            use_unbias_render=conf.get_bool("use_unbias_render", True),
            sparse_scale_factor=conf.get_float("sparse_scale_factor", 25000.0),
            use_norm_grad_for_cosine=conf.get_bool(
                "use_norm_grad_for_cosine", False
            ),
            near_surface=conf.get_float("near_surface", 0.05),
            sampler_precision=conf.get_string("sampler_precision", "default"),
            # production default: bf16 train-path field query (quality-
            # neutral per the 8-seed e2e A/B; see the field attribute doc).
            # Pin `field_precision = ""` in the conf to restore inherit.
            field_precision=conf.get_string("field_precision", "default"),
        )

    @property
    def n_importance_delivered(self) -> int:
        """Extra samples actually produced by the up-sampler: 'classical'
        delivers steps*(n//steps); 'mix' (steps+1)*(n//(steps+1)) -- the
        reference's documented under-delivery (SURVEY.md §2.2)."""
        if self.n_importance == 0:
            return 0
        if self.upsampling_type == "mix":
            per = self.n_importance // (self.up_sample_steps + 1)
            return per * (self.up_sample_steps + 1)
        per = self.n_importance // self.up_sample_steps
        return per * self.up_sample_steps

    @property
    def total_samples(self) -> int:
        return self.n_samples + self.n_importance_delivered


def _safe_l2norm(x, axis=-1, keepdims=False):
    """L2 norm whose gradient is 0 at x == 0, matching torch.linalg.norm's
    subgradient. jnp.linalg.norm backpropagates g/||g|| = 0/0 = NaN there;
    the reference trains through torch's 0-subgradient, and the spatial
    gradient CAN be exactly zero (abs-head UDF at y0 == 0.0 makes
    d|y|/dy = sign(0) = 0 kill the whole reverse chain — observed in
    training, see tests/test_render.py::test_eikonal_at_zero_gradient)."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    nz = sq > 0
    norm = jnp.sqrt(jnp.where(nz, sq, 1.0))
    return jnp.where(nz, norm, 0.0)


def _use_pallas_train(udf_cfg: UDFConfig) -> bool:
    if udf_cfg.pallas_train == "off":
        return False
    if udf_cfg.d_out != 1:
        # The fused kernels are specialized for the scalar-UDF head (the
        # reverse chain seeds from the d_out=1 output row); feature-channel
        # nets (unused by the pipeline, like the reference's rendering net
        # inputs) take the XLA path.
        return False
    if udf_cfg.pallas_train == "on":
        return True
    if "highest" in (udf_cfg.precision, udf_cfg.bwd_precision):
        # HIGHEST through the kernel is feasible since the scoped-VMEM
        # limit was raised (kernels/mlp_train.py) but MEASURED SLOWER than
        # XLA: 45-48 ms vs 38 ms at the production step shape (the 6-pass
        # f32 emulation in-kernel loses to XLA's native f32 matmuls,
        # round-4 bench). A user pinning "highest" wants exact f32, which
        # XLA autodiff at Precision.HIGHEST provides faster. Auto mode
        # therefore routes HIGHEST through XLA; pallas_train = "on" still
        # forces the kernel for experimentation.
        return False
    from emap_tpu.kernels.mlp_query import pallas_available

    return pallas_available()


def _query_field(params, pts_flat, udf_cfg: UDFConfig, mesh=None,
                 axis: str = "data"):
    """Field value + spatial gradient at render_core's (stop-gradient)
    sample points: the fused Pallas train kernel when enabled, else XLA
    autodiff. Under a >1-device mesh the kernel is shard_mapped over the
    point axis (params replicated; their cotangent is psummed by the
    shard_map transpose) so GSPMD never sees an unpartitionable call."""
    if not _use_pallas_train(udf_cfg):
        return udf_value_and_gradient(params["udf"], pts_flat, udf_cfg)

    from emap_tpu.kernels.mlp_train import (
        pallas_udf_train_value_and_gradient,
    )

    if mesh is None or mesh.shape[axis] == 1:
        return pallas_udf_train_value_and_gradient(
            params["udf"], pts_flat, udf_cfg
        )

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    fn = shard_map(
        lambda p, x: pallas_udf_train_value_and_gradient(p, x, udf_cfg),
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return fn(params["udf"], pts_flat)


def render_core(
    params,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    sample_dist: float,
    cfg: RenderConfig,
    udf_cfg: UDFConfig,
    cos_anneal_ratio,
    flip_saturation,
    background_rgb=None,
    mesh=None,
    axis: str = "data",
):
    """The hot op (reference render_core :418-677)."""
    batch, n = z_vals.shape

    dists = z_vals[:, 1:] - z_vals[:, :-1]
    dists = jnp.concatenate(
        [dists, jnp.full((batch, 1), sample_dist, z_vals.dtype)], axis=-1
    )
    mid_z_vals = z_vals + dists * 0.5
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z_vals[..., None]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)

    pts_flat = pts.reshape(-1, 3)
    if cfg.field_precision and cfg.field_precision != udf_cfg.precision:
        # train-only precision override (see RenderConfig.field_precision);
        # bwd_precision inherits the replaced tier unless pinned.
        udf_cfg = dataclasses.replace(
            udf_cfg, precision=cfg.field_precision
        )
    udf_flat, gradients_flat = _query_field(
        params, pts_flat, udf_cfg, mesh=mesh, axis=axis
    )
    udf = udf_flat.reshape(batch, n)
    gradients = gradients_flat.reshape(batch, n, 3)

    gradients_mag = _safe_l2norm(gradients, axis=-1, keepdims=True)
    gradients_norm = gradients / (gradients_mag + 1e-5)

    inv_s = jnp.clip(inv_s_value(params["variance"])[0], 1e-6, 1e6)
    beta, gamma, _ = beta_gamma_zeta(params["beta"], cfg.beta_min)
    beta = jnp.clip(beta[0], 1e-6, 1e6)
    gamma = jnp.clip(gamma[0], 1e-6, 1e6)

    if cfg.use_unbias_render:
        grad_for_cos = (
            gradients_norm if cfg.use_norm_grad_for_cosine else gradients
        )
        true_cos = jnp.sum(dirs * grad_for_cos, axis=-1)  # (B, n)

        cos_sign = jax.lax.stop_gradient(
            jnp.sum(dirs * gradients_norm, axis=-1)
        )
        flip_sign = -jnp.sign(cos_sign)
        flip_sign = jnp.where(flip_sign == 0, 1.0, flip_sign)

        raw_occ = sampling.udf2logistic(udf, beta, 1.0, 1.0)
        alpha_occ = 1.0 - jnp.exp(-jax.nn.relu(raw_occ) * gamma * dists)

        vis_mask = (true_cos < 0.01).astype(z_vals.dtype)
        # shift one sample toward the camera
        vis_mask = jnp.concatenate(
            [vis_mask[:, 1:], jnp.ones((batch, 1), z_vals.dtype)], axis=-1
        )

        vis_prob = jnp.cumprod(
            jnp.concatenate(
                [
                    jnp.ones((batch, 1), z_vals.dtype),
                    jnp.clip(
                        1.0 - alpha_occ + flip_saturation * vis_mask, 0.0, 1.0
                    )
                    + 1e-7,
                ],
                axis=-1,
            ),
            axis=-1,
        )[:, :-1]
        vis_prob = jnp.clip(vis_prob, 0.0, 1.0)

        neg_abs_cos = -jnp.abs(true_cos)
        sdf2alpha = (
            sampling.sdf2alpha_numerical
            if cfg.sdf2alpha_type == "numerical"
            else sampling.sdf2alpha_theorical
        )
        alpha_plus = sdf2alpha(udf, neg_abs_cos, dists, inv_s, cos_anneal_ratio)
        alpha_minus = sdf2alpha(-udf, neg_abs_cos, dists, inv_s, cos_anneal_ratio)
        alpha = alpha_plus * vis_prob + alpha_minus * (1.0 - vis_prob)
    else:
        vis_prob = None
        flip_sign = None
        raw_occ = sampling.udf2logistic(udf, beta, 1.0, 1.0)
        alpha = 1.0 - jnp.exp(-jax.nn.relu(raw_occ) * gamma * dists)

    weights = alpha * jnp.cumprod(
        jnp.concatenate(
            [jnp.ones((batch, 1), z_vals.dtype), 1.0 - alpha + 1e-7], axis=-1
        ),
        axis=-1,
    )[:, :-1]
    weights_sum = jnp.sum(weights, axis=-1, keepdims=True)

    # edge "appearance" is constant 1 => rendered edge = sum of weights
    edge = weights_sum
    depth = jnp.sum(mid_z_vals * weights, axis=-1, keepdims=True)
    if background_rgb is not None:
        edge = edge + background_rgb * (1.0 - weights_sum)

    pts_norm = jnp.linalg.norm(pts, axis=-1)
    relax_inside_sphere = jax.lax.stop_gradient(
        (pts_norm < 2.4).astype(z_vals.dtype)
    )
    inside_sphere = jax.lax.stop_gradient((pts_norm < 2.0).astype(z_vals.dtype))
    near_surface = jax.lax.stop_gradient(
        (udf < cfg.near_surface).astype(z_vals.dtype)
    )

    gradient_error_pt = (_safe_l2norm(gradients, axis=-1) - 1.0) ** 2
    gradient_error = jnp.sum(relax_inside_sphere * gradient_error_pt) / (
        jnp.sum(relax_inside_sphere) + 1e-5
    )
    gradient_error_near_surface = jnp.sum(near_surface * gradient_error_pt) / (
        jnp.sum(near_surface) + 1e-5
    )

    if flip_sign is not None:
        gradients_flip = flip_sign[..., None] * gradients
    else:
        gradients_flip = gradients

    sparse_error = jnp.mean(
        jnp.sum(jnp.exp(-cfg.sparse_scale_factor * udf), axis=-1)
    )

    normals = jnp.sum(gradients_flip * weights[..., None], axis=1)

    return {
        "udf": udf,
        "edge": edge,
        "weights": weights,
        "s_val": 1.0 / inv_s,
        "beta": 1.0 / beta,
        "gamma": gamma,
        "depth": depth,
        "gradient_error": gradient_error,
        "gradient_error_near_surface": gradient_error_near_surface,
        "normals": normals,
        "gradients": gradients,
        "gradients_flip": gradients_flip,
        "inside_sphere": inside_sphere,
        "gradient_mag": gradients_mag.reshape(batch, n),
        "alpha": alpha,
        "mid_z_vals": mid_z_vals,
        "dists": dists,
        "sparse_error": sparse_error,
    }


def render(
    params,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    near: float,
    far: float,
    depth_scale: jnp.ndarray,
    key: jax.Array,
    cfg: RenderConfig,
    udf_cfg: UDFConfig,
    cos_anneal_ratio=1.0,
    flip_saturation=0.0,
    perturb_overwrite: float = -1.0,
    background_rgb=None,
    mesh=None,
    axis: str = "data",
):
    """Render a batch of rays (reference render :679-800).

    params: {'udf': ..., 'variance': ..., 'beta': ...} pytrees.
    depth_scale: (B, 1) camera-z component of the unit ray (dataset-provided).
    Returns the same output surface as the reference's `render` dict.
    """
    batch = rays_o.shape[0]
    sample_dist = (far - near) / cfg.n_samples

    perturb = cfg.perturb if perturb_overwrite < 0 else perturb_overwrite
    z_vals = sampling.stratified_z_vals(
        key, batch, near, far, cfg.n_samples, perturb
    )

    if cfg.n_importance > 0:
        sampler_ucfg = dataclasses.replace(
            udf_cfg, precision=cfg.sampler_precision
        )
        udf_fn = lambda p: udf_value(params["udf"], p, sampler_ucfg)  # noqa: E731
        if cfg.upsampling_type == "classical":
            z_vals = sampling.importance_sample(
                udf_fn, rays_o, rays_d, z_vals, sample_dist,
                cfg.n_importance, cfg.up_sample_steps,
                use_unbias=cfg.use_unbias_render,
            )
        elif cfg.upsampling_type == "mix":
            from emap_tpu.fields.scalars import beta_gamma_zeta

            beta_m, gamma_m, _ = beta_gamma_zeta(params["beta"], cfg.beta_min)
            z_vals = sampling.importance_sample_mix(
                udf_fn, rays_o, rays_d, z_vals, sample_dist,
                cfg.n_importance, cfg.up_sample_steps,
                jnp.clip(beta_m[0], 1e-6, 1e6),
                jnp.clip(gamma_m[0], 1e-6, 1e6),
            )
        else:
            raise NotImplementedError(
                f"unknown upsampling_type {cfg.upsampling_type!r}"
            )

    ret = render_core(
        params,
        rays_o,
        rays_d,
        z_vals,
        sample_dist,
        cfg,
        udf_cfg,
        cos_anneal_ratio,
        flip_saturation,
        background_rgb=background_rgb,
        mesh=mesh,
        axis=axis,
    )

    n_total = cfg.total_samples
    return {
        "udf": ret["udf"],
        "edge": ret["edge"],
        "weight_sum": jnp.sum(ret["weights"][:, :n_total], axis=-1, keepdims=True),
        "weight_sum_fg_bg": jnp.sum(ret["weights"], axis=-1, keepdims=True),
        "depth": ret["depth"] * depth_scale,
        "variance": ret["s_val"],
        "beta": ret["beta"],
        "gamma": ret["gamma"],
        "normals": ret["normals"],
        "gradients": ret["gradients"],
        "gradients_flip": ret["gradients_flip"],
        "weights": ret["weights"],
        "gradient_error": ret["gradient_error"],
        "gradient_error_near_surface": ret["gradient_error_near_surface"],
        "inside_sphere": ret["inside_sphere"],
        "gradient_mag": ret["gradient_mag"],
        "mid_z_vals": ret["mid_z_vals"],
        "dists": ret["dists"],
        "sparse_error": ret["sparse_error"],
    }
