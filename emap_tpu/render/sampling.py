"""Ray sampling: stratified base samples, deterministic inverse-CDF PDF
sampling, and the UDF-aware hierarchical up-sampling.

Functional, static-shape re-design of the reference sampling stack
(src/models/udf_renderer_blending.py):

* `sample_pdf_det`   <- sample_pdf (:69-109), det=True path only (the pipeline
  never uses the stochastic path: both up-samplers call det=True).
* `udf2logistic`     <- :155-170
* `sdf2alpha_numerical` <- :379-416 ("numerical" type; all shipped confs)
* `up_sample_unbias` <- :228-353
* `up_sample_no_occ_aware` <- :920-975
* `importance_sample`<- :802-841 — 5 statically-unrolled rounds with the
  escalating inv_s/beta/gamma schedule; shapes grow 64 -> 114 deterministically
  so everything jits with static shapes.

TPU notes: searchsorted is done as a broadcasted compare-and-sum over the bin
axis — O(n_bins * n_samples) VPU work on tiny arrays, no data-dependent
control flow. The per-ray cumprods stay along the local sample axis (never
sharded). The whole importance pass runs under stop_gradient (the reference
runs it under torch.no_grad, :802).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def stratified_z_vals(
    key: jax.Array,
    batch: int,
    near: float,
    far: float,
    n_samples: int,
    perturb: float,
) -> jnp.ndarray:
    """Base z values: linspace(near, far) with a per-ray jitter of
    +-1/n_samples of the range (reference :704-720)."""
    z = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    z_vals = near + (far - near) * z[None, :]
    z_vals = jnp.broadcast_to(z_vals, (batch, n_samples))
    if perturb > 0:
        t_rand = jax.random.uniform(key, (batch, 1)) - 0.5
        z_vals = z_vals + t_rand * 2.0 / n_samples
    return z_vals


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    det: bool = True,
    key: jax.Array | None = None,
    u: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling (NeRF sample_pdf, reference :69-109).

    bins: (B, M) sorted sample positions; weights: (B, M-1).
    det=True (the only mode the pipeline uses) takes midpoints of a uniform
    grid on [0,1]; det=False draws uniforms from `key`. `u` (tests only)
    injects the uniforms directly so the inverse-CDF math can be oracle-
    compared against the reference under identical randomness.

    NOTE: det=False output is monotone in `u`, i.e. UNSORTED for random u —
    it is incompatible with `_merge_z_vals` (which requires both inputs
    individually sorted); sort stochastic samples before merging. The
    pipeline only ever merges det=True output (sorted: u is a linspace).
    Returns (B, n_samples).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (B, M)

    if u is not None:
        u = jnp.broadcast_to(
            jnp.asarray(u, bins.dtype), (bins.shape[0], n_samples)
        )
    elif det:
        u = jnp.linspace(
            0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples, dtype=bins.dtype
        )  # (n,)
        u = jnp.broadcast_to(u[None, :], (bins.shape[0], n_samples))
    else:
        if key is None:
            raise ValueError("stochastic sample_pdf needs a PRNG key")
        u = jax.random.uniform(
            key, (bins.shape[0], n_samples), dtype=bins.dtype
        )

    # searchsorted right: count of cdf entries <= u. (B, n, M) compare is tiny.
    inds = jnp.sum(cdf[:, None, :] <= u[:, :, None], axis=-1)  # (B, n)
    m = cdf.shape[-1]
    below = jnp.clip(inds - 1, 0, m - 1)
    above = jnp.clip(inds, 0, m - 1)

    # Gather cdf/bins at below/above via one-hot matmuls instead of
    # take_along_axis: lane-axis gathers are slow on TPU, while the MXU does
    # the same selection ~1.5x faster (scripts/bench_merge.py). Exact under
    # HIGH precision: one-hots are bf16-exact and the 3-pass split
    # reconstructs the f32 operand exactly.
    k = jnp.arange(m)
    oh_below = (below[:, :, None] == k).astype(bins.dtype)  # (B, n, M)
    oh_above = (above[:, :, None] == k).astype(bins.dtype)
    _sel = lambda oh, vals: jnp.einsum(
        "bnk,bk->bn", oh, vals, precision=jax.lax.Precision.HIGH
    )
    cdf_below = _sel(oh_below, cdf)
    cdf_above = _sel(oh_above, cdf)
    bins_below = _sel(oh_below, bins)
    bins_above = _sel(oh_above, bins)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def sample_pdf_det(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Deterministic inverse-CDF sampling (the pipeline's only mode)."""
    return sample_pdf(bins, weights, n_samples, det=True)


def udf2logistic(udf, inv_s, gamma=1.0, abs_cos_val=1.0):
    """Logistic-density bump at udf=0 (reference :155-170, no anneal path)."""
    e = jnp.exp(-inv_s * udf)
    return abs_cos_val * inv_s * e / (1.0 + e) ** 2 * gamma


def _anneal_cos(true_cos, cos_anneal_ratio):
    if cos_anneal_ratio is None:
        return true_cos
    return -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )


def sdf2alpha_numerical(sdf, true_cos, dists, inv_s, cos_anneal_ratio=None):
    """NeuS section-integral alpha (reference :379-416, "numerical").

    cos_anneal_ratio=None reproduces the no-anneal call sites (upsampling);
    a traced scalar reproduces render_core's annealed path.
    """
    iter_cos = _anneal_cos(true_cos, cos_anneal_ratio)
    est_next = sdf + iter_cos * dists * 0.5
    est_prev = sdf - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    p = prev_cdf - next_cdf
    c = prev_cdf
    return jnp.clip((p + 1e-5) / (c + 1e-5), 0.0, 1.0)


def sdf2alpha_theorical(sdf, true_cos, dists, inv_s, cos_anneal_ratio=None):
    """The reference's unused "theorical" alternative (:412-414):
    alpha = 1 - exp(-relu(|cos| * inv_s * (1 - sigmoid(sdf*inv_s))) * dist)."""
    iter_cos = _anneal_cos(true_cos, cos_anneal_ratio)
    raw = jnp.abs(iter_cos) * inv_s * (1.0 - jax.nn.sigmoid(sdf * inv_s))
    return 1.0 - jnp.exp(-jax.nn.relu(raw) * dists)


def _pad_dists(z_vals: jnp.ndarray, sample_dist: float) -> jnp.ndarray:
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    pad = jnp.full_like(dists[..., :1], sample_dist)
    return jnp.concatenate([dists, pad], axis=-1)


def up_sample_unbias(
    rays_o, rays_d, z_vals, udf, sample_dist, n_importance, inv_s, beta, gamma
):
    """Occlusion-aware first-intersection up-sampler (reference :228-353)."""
    batch, n = z_vals.shape
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    radius = jnp.linalg.norm(pts, axis=-1)
    inside_sphere = ((radius[:, :-1] < 1.0) | (radius[:, 1:] < 1.0)).astype(
        z_vals.dtype
    )

    dists_raw = _pad_dists(z_vals, sample_dist)

    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    prev_udf, next_udf = udf[:, :-1], udf[:, 1:]
    mid_udf = (prev_udf + next_udf) * 0.5
    dists = next_z - prev_z

    # fake SDF = UDF; finite-difference cos, clipped non-positive
    true_cos = (next_udf - prev_udf) / (next_z - prev_z + 1e-5)
    cos_val = -jnp.abs(true_cos)
    prev_cos_val = jnp.concatenate(
        [jnp.zeros((batch, 1), z_vals.dtype), cos_val[:, :-1]], axis=-1
    )
    cos_val = jnp.minimum(prev_cos_val, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere

    vis_mask = (true_cos < 0.05).astype(z_vals.dtype)
    vis_mask = jnp.concatenate(
        [jnp.ones((batch, 1), z_vals.dtype), vis_mask], axis=-1
    )  # (B, n)

    raw_occ = udf2logistic(udf, beta, 1.0, 1.0)
    alpha_occ = 1.0 - jnp.exp(-jax.nn.relu(raw_occ) * gamma * dists_raw)

    vis_prob = jnp.cumprod(
        jnp.concatenate(
            [
                jnp.ones((batch, 1), z_vals.dtype),
                jnp.clip(1.0 - alpha_occ + vis_mask, 0.0, 1.0) + 1e-7,
            ],
            axis=-1,
        ),
        axis=-1,
    )[:, :-1]

    signs_prob = vis_prob[:, :-1]
    alpha_plus = sdf2alpha_numerical(mid_udf, cos_val, dists, inv_s)
    alpha_minus = sdf2alpha_numerical(-mid_udf, cos_val, dists, inv_s)
    alpha = alpha_plus * signs_prob + alpha_minus * (1.0 - signs_prob)

    weights = alpha * jnp.cumprod(
        jnp.concatenate(
            [jnp.ones((batch, 1), z_vals.dtype), 1.0 - alpha + 1e-7], axis=-1
        ),
        axis=-1,
    )[:, :-1]

    return sample_pdf_det(z_vals, weights, n_importance)


def up_sample_no_occ_aware(
    rays_o, rays_d, z_vals, udf, sample_dist, n_importance, inv_s, beta, gamma
):
    """Samples at *all* near-zero UDF regions (reference :920-975)."""
    dists = _pad_dists(z_vals, sample_dist)
    raw_occ = udf2logistic(udf, beta, 1.0, 1.0)
    alpha_occ = 1.0 - jnp.exp(-jax.nn.relu(raw_occ) * gamma * dists)
    return sample_pdf_det(z_vals, alpha_occ[:, :-1], n_importance)


def _merge_z_vals(z_vals, new_z_vals, udf, new_udf):
    """Sort-merge z values and (optionally) their udf values
    (reference cat_z_vals :355-377).

    Both inputs are individually sorted (base z is a linspace + per-ray shift;
    sample_pdf output is monotone in u), so instead of an argsort (XLA bitonic
    sort + lane gathers, ~2.5 ms at these shapes) we compute stable merge
    ranks by counting and scatter through one-hot matmuls on the MXU
    (~0.8 ms, scripts/bench_merge.py). Bit-exact vs the argsort path: ranks
    are a permutation and the HIGH-precision one-hot product reconstructs f32
    exactly.
    """
    n = z_vals.shape[-1]
    m = new_z_vals.shape[-1]
    # stable ranks matching argsort of [z | new]: ties put z first
    rank_z = jnp.arange(n) + jnp.sum(
        new_z_vals[:, None, :] < z_vals[:, :, None], axis=-1
    )
    rank_new = jnp.arange(m) + jnp.sum(
        z_vals[:, None, :] <= new_z_vals[:, :, None], axis=-1
    )
    k = jnp.arange(n + m)
    p_z = (rank_z[:, :, None] == k).astype(z_vals.dtype)  # (B, n, n+m)
    p_new = (rank_new[:, :, None] == k).astype(z_vals.dtype)
    _scat = lambda a, b, pa, pb: (
        jnp.einsum("bi,bik->bk", a, pa, precision=jax.lax.Precision.HIGH)
        + jnp.einsum("bj,bjk->bk", b, pb, precision=jax.lax.Precision.HIGH)
    )
    z_sorted = _scat(z_vals, new_z_vals, p_z, p_new)
    if new_udf is None:
        return z_sorted, None
    udf_sorted = _scat(udf, new_udf, p_z, p_new)
    return z_sorted, udf_sorted


def importance_sample(
    udf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    sample_dist: float,
    n_importance: int,
    up_sample_steps: int,
    use_unbias: bool = True,
) -> jnp.ndarray:
    """Hierarchical importance sampling (reference :802-841).

    udf_fn: (N, 3) pts -> (N,) udf values. Runs fully under stop_gradient;
    round i uses inv_s = 64*2^i, beta = 64*2^(i+1),
    gamma = clip(20*2^(steps-i), 20, 320).
    """
    up_sample = up_sample_unbias if use_unbias else up_sample_no_occ_aware
    batch = rays_o.shape[0]
    n_per_step = n_importance // up_sample_steps

    def query(z):
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        return udf_fn(pts.reshape(-1, 3)).reshape(batch, z.shape[-1])

    udf = query(z_vals)
    for i in range(up_sample_steps):
        new_z = up_sample(
            rays_o,
            rays_d,
            z_vals,
            udf,
            sample_dist,
            n_per_step,
            64 * 2**i,
            64 * 2 ** (i + 1),
            float(np.clip(20 * 2 ** (up_sample_steps - i), 20, 320)),
        )
        last = i + 1 == up_sample_steps
        new_udf = None if last else query(new_z)
        z_vals, udf = _merge_z_vals(z_vals, new_z, udf, new_udf)

    return jax.lax.stop_gradient(z_vals)


def importance_sample_mix(
    udf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    sample_dist: float,
    n_importance: int,
    up_sample_steps: int,
    beta,
    gamma,
) -> jnp.ndarray:
    """"mix" strategy (reference :843-918): `up_sample_steps` rounds of
    non-occlusion-aware sampling with the learned beta/gamma, then one
    unbiased round. Delivers (steps+1) * (n_importance // (steps+1)) extra
    samples -- fewer than n_importance, faithfully reproducing the
    reference's under-delivery (SURVEY.md bug note)."""
    batch = rays_o.shape[0]
    n_per = n_importance // (up_sample_steps + 1)

    def query(z):
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        return udf_fn(pts.reshape(-1, 3)).reshape(batch, z.shape[-1])

    udf = query(z_vals)
    for i in range(up_sample_steps):
        new_z = up_sample_no_occ_aware(
            rays_o, rays_d, z_vals, udf, sample_dist, n_per,
            64 * 2**i, 64 * 2 ** (i + 1), gamma,
        )
        z_vals, udf = _merge_z_vals(z_vals, new_z, udf, query(new_z))

    i = up_sample_steps - 1
    new_z = up_sample_unbias(
        rays_o, rays_d, z_vals, udf, sample_dist, n_per,
        64 * 2**i, 64 * 2 ** (i + 1), 20.0 if i < 4 else 10.0,
    )
    z_vals, _ = _merge_z_vals(z_vals, new_z, udf, None)
    return jax.lax.stop_gradient(z_vals)
