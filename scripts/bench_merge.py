#!/usr/bin/env python
"""Micro-benchmark: merging two already-sorted z-value arrays per ray.

The importance sampler's `_merge_z_vals` runs 5x per step. Both inputs are
sorted (base z is a linspace; sample_pdf_det output is monotone in u), so a
full argsort (XLA bitonic sort + 2 lane gathers) is overkill. Candidates:

  argsort    current: argsort + 2x take_along_axis
  laxsort    jax.lax.sort variadic (z as key, udf carried) - no gathers
  rankmerge  counting-rank merge + one-hot matmul scatter (MXU does the
             permutation; exact under HIGH precision since one-hots are
             bf16-exact and z splits exactly into hi+lo)

Also benchmarks sample_pdf's 4 take_along_axis gathers vs a one-hot-matmul
gather formulation. Run on the TPU.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def merge_argsort(z, new_z, udf, new_udf):
    z_cat = jnp.concatenate([z, new_z], axis=-1)
    order = jnp.argsort(z_cat, axis=-1)
    z_sorted = jnp.take_along_axis(z_cat, order, axis=-1)
    udf_cat = jnp.concatenate([udf, new_udf], axis=-1)
    return z_sorted, jnp.take_along_axis(udf_cat, order, axis=-1)


def merge_laxsort(z, new_z, udf, new_udf):
    z_cat = jnp.concatenate([z, new_z], axis=-1)
    udf_cat = jnp.concatenate([udf, new_udf], axis=-1)
    z_sorted, udf_sorted = jax.lax.sort(
        (z_cat, udf_cat), dimension=-1, num_keys=1, is_stable=True
    )
    return z_sorted, udf_sorted


def merge_rank(z, new_z, udf, new_udf):
    n = z.shape[-1]
    m = new_z.shape[-1]
    # stable ranks matching argsort of [z | new_z]: ties -> z first
    rank_z = jnp.arange(n) + jnp.sum(
        new_z[:, None, :] < z[:, :, None], axis=-1
    )
    rank_new = jnp.arange(m) + jnp.sum(
        z[:, None, :] <= new_z[:, :, None], axis=-1
    )
    k = jnp.arange(n + m)
    p_z = (rank_z[:, :, None] == k).astype(z.dtype)
    p_new = (rank_new[:, :, None] == k).astype(z.dtype)
    dot = functools.partial(jnp.einsum, "bi,bik->bk",
                            precision=jax.lax.Precision.HIGH)
    z_sorted = dot(z, p_z) + dot(new_z, p_new)
    udf_sorted = dot(udf, p_z) + dot(new_udf, p_new)
    return z_sorted, udf_sorted


def sample_pdf_gather_take(bins, weights, n_samples):
    from emap_tpu.render.sampling import sample_pdf

    return sample_pdf(bins, weights, n_samples, det=True)


def sample_pdf_gather_onehot(bins, weights, n_samples):
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
    u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples,
                     dtype=bins.dtype)
    u = jnp.broadcast_to(u[None, :], (bins.shape[0], n_samples))
    inds = jnp.sum(cdf[:, None, :] <= u[:, :, None], axis=-1)
    m = cdf.shape[-1]
    below = jnp.clip(inds - 1, 0, m - 1)
    above = jnp.clip(inds, 0, m - 1)
    k = jnp.arange(m)
    oh_b = (below[:, :, None] == k).astype(bins.dtype)
    oh_a = (above[:, :, None] == k).astype(bins.dtype)
    dot = functools.partial(jnp.einsum, "bnk,bk->bn",
                            precision=jax.lax.Precision.HIGH)
    cdf_below, cdf_above = dot(oh_b, cdf), dot(oh_a, cdf)
    bins_below = dot(oh_b, bins)
    bins_above = dot(oh_a, bins)
    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def main():
    B = int(os.environ.get("MB_BATCH", "1024"))
    rng = np.random.default_rng(0)
    results = []
    for n in (64, 74, 84, 94, 104):
        z = jnp.asarray(np.sort(rng.uniform(0, 6, (B, n)), axis=-1),
                        jnp.float32)
        new = jnp.asarray(np.sort(rng.uniform(0, 6, (B, 10)), axis=-1),
                          jnp.float32)
        udf = jnp.asarray(rng.uniform(0, 1, (B, n)), jnp.float32)
        nudf = jnp.asarray(rng.uniform(0, 1, (B, 10)), jnp.float32)

        fns = {
            "argsort": jax.jit(merge_argsort),
            "laxsort": jax.jit(merge_laxsort),
            "rankmerge": jax.jit(merge_rank),
        }
        ref = fns["argsort"](z, new, udf, nudf)
        row = {"n": n}
        for name, fn in fns.items():
            out = fn(z, new, udf, nudf)
            err = max(
                float(jnp.max(jnp.abs(out[0] - ref[0]))),
                float(jnp.max(jnp.abs(out[1] - ref[1]))),
            )
            row[name + "_ms"] = round(timeit(fn, z, new, udf, nudf) * 1e3, 3)
            row[name + "_err"] = err
        results.append(row)
        print(json.dumps(row), flush=True)

    # sample_pdf gather variants (weights width = bins-1)
    for n in (74, 114):
        bins = jnp.asarray(np.sort(rng.uniform(0, 6, (B, n)), axis=-1),
                           jnp.float32)
        w = jnp.asarray(rng.uniform(0, 1, (B, n - 1)), jnp.float32)
        f_take = jax.jit(functools.partial(sample_pdf_gather_take,
                                           n_samples=10))
        f_oh = jax.jit(functools.partial(sample_pdf_gather_onehot,
                                         n_samples=10))
        a, b = f_take(bins, w), f_oh(bins, w)
        row = {
            "pdf_bins": n,
            "take_ms": round(timeit(f_take, bins, w) * 1e3, 3),
            "onehot_ms": round(timeit(f_oh, bins, w) * 1e3, 3),
            "err": float(jnp.max(jnp.abs(a - b))),
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
