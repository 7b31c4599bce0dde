"""Pallas TPU kernel: the TRAINING field query — fused UDF value + spatial
gradient with a hand-derived second-order backward pass.

render_core (emap_tpu/render/renderer.py, reference
src/models/udf_renderer_blending.py:418-677) queries the UDF MLP at
1024x114 points per step and needs BOTH the value and the spatial gradient
(for the eikonal terms), and the train loss is then differentiated w.r.t.
parameters THROUGH that spatial gradient (double backprop; reference uses
torch.autograd.grad(create_graph=True), udf_model.py:121-135). XLA handles
this correctly but round-trips every layer activation of the forward, the
gradient reverse pass, and their outer backward through HBM.

This module keeps the whole second-order chain in VMEM:

* forward  = `_pallas_value_and_grad` from kernels/mlp_query.py (value +
  spatial gradient, feature-major, packed weights), exposed here through a
  `jax.custom_vjp`;
* backward = `_pallas_train_bwd`: given cotangents (u_bar, g_bar) w.r.t.
  (udf, d udf/d PE-input), produce packed weight/bias gradients in ONE
  kernel per point-tile, accumulated across the grid.

The adjoint equations (validated against jax.vjp to f32 roundoff,
tests/test_kernels_train.py):

  forward      z_l = W_l u_l + b_l,  a_l = softplus(100 z)/100,
               s_l = sigmoid(100 z_l);  u_l = [a_{l-1}; x]/sqrt(2) at skips
  grad chain   r_{L-1} = dy;  q_l = W_l^T r_l;  r_{l-1} = carry_l * s_{l-1}
               (carry = non-x rows of q, scaled), g = x-rows accumulated
  ascend       q_hat built from (carryhat, g_bar);  Wbar_l += r_l q_hat^T;
               r_hat_l = W_l q_hat;  s_hat_l += r_hat_l * carry_{l+1};
               carryhat_{l+1} = r_hat_l * s_l
  descend      z_hat_{L-1} = u_bar * dy  (+ 2/scale * r_hat_{L-1} for the
               square head);  z_hat_l = a_hat_l * s_l
               + s_hat_l * 100 s_l (1 - s_l);
               Wbar_l += z_hat_l u_l^T;  bbar_l += sum_T z_hat_l;
               a_hat_{l-1} = non-x rows of W_l^T z_hat_l (scaled at skips)

Cotangents w.r.t. the POINTS are intentionally NOT computed (returned as
zeros): in render_core the query points are functions of stop-gradient
z-values and non-differentiated rays only, so XLA discards that cotangent.
Do not reuse this primitive somewhere the points require gradients.

Weight-norm stays outside: the kernel produces grads w.r.t. the FOLDED
packed weights, and JAX transposes pack_weights/fold_weights (g,v -> w)
automatically, so Adam sees the same (g, v, b) parameterization as torch.

Falls back to interpret mode off-TPU so tests exercise the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from emap_tpu.fields.udf import UDFConfig
from emap_tpu.kernels.mlp_query import (
    _encode_fused,
    _encode_host,
    _kernel_dot,
    _layer_dims,
    _pad_pts,
    _pallas_value_and_grad,
    _pe_jacT_fused,
    _pe_jacobian_host,
    pack_weights,
    pallas_available,
)

_INV_SQRT2 = np.float32(1.0 / np.sqrt(2.0))


def _dy_of_y0(y0, udf_type: str, scale: float):
    """d udf / d y0 given the head (mirrors mlp_query._head / scale)."""
    if udf_type == "abs":
        return jnp.sign(y0) / scale
    if udf_type == "square":
        return 2.0 * y0 / scale
    return jnp.full_like(y0, 1.0 / scale)  # sdf


def _train_bwd_math(x, w_ref, b_ref, ubar, gbar, cfg: UDFConfig):
    """Shared fwd-recompute + adjoint math, feature-major on one tile.

    x (d0_pad, T), ubar (1, T), gbar (d0_pad, T); w_ref/b_ref packed refs
    (or arrays in interpret/reference use). Returns (wbar (row_max, sum_in),
    bbar (row_max, L)) for this tile.
    """
    dims = _layer_dims(cfg)
    L = len(dims)
    d0 = cfg.dims[0]
    row_max = max(o for _, o in dims)
    offs = np.concatenate([[0], np.cumsum([i for i, _ in dims])])
    prec = cfg.precision
    # Adjoint-side dots may run at a lower tier than the primal recompute:
    # the primal chain (us/ss/rs) reconstructs values the forward produced
    # at `precision`, while the cotangent products only need gradient-noise
    # accuracy (see UDFConfig.bwd_precision).
    prec_b = cfg.bwd_precision or cfg.precision

    def W(l):
        return w_ref[:, int(offs[l]) : int(offs[l]) + dims[l][0]]

    def dotT(l, v, p=prec):
        # W_l^T @ v contracting the out-feature axis; slice the packed
        # block's zero-padded rows down to out_l to match v.
        return _kernel_dot(
            W(l)[: dims[l][1]], v, p,
            dimension_numbers=(((0,), (0,)), ((), ())),
        )

    def pad_rows(a, rows):
        if a.shape[0] == rows:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((rows - a.shape[0], a.shape[1]), a.dtype)], axis=0
        )

    # ---- forward recompute: store ONLY the f32 pre-activations z_l.
    # Layer inputs u_l and sigmoids s_l are re-derived from z on demand
    # (softplus/sigmoid are cheap VPU transcendentals next to the tile's
    # ~140 MXU passes, and recomputing from the same stored f32 z is
    # bit-identical to storing the results). Storing z instead of both
    # (u, s) halves the residual footprint (see the carries handoff
    # below). bf16 residuals were measured and rejected: they
    # multiply into every adjoint chain and push the weight-grad error to
    # ~1e-2 rel; f32 z keeps it at the dot tier.
    #
    # cfg.cache_acts revisits the trade at the raised 100 MiB VMEM
    # ceiling: sigmoid(100 z_l) is consumed ~6x per layer across the four
    # phases and u_l twice; the caches below compute each ONCE and reuse
    # the value (bit-identical — the identical expression on the identical
    # stored z). Whether Mosaic already CSEs the repeats is unobservable
    # from the jaxpr, so the knob exists to measure, not to assume.
    zs = []
    u_cache: dict = {}
    s_cache: dict = {}
    h = x
    for l in range(L):
        in_l, out_l = dims[l]
        if l in cfg.skip_in:
            h = jnp.concatenate([h, x[:d0, :]], axis=0) * _INV_SQRT2
        if cfg.cache_acts:
            u_cache[l] = h
        z = _kernel_dot(W(l), h, prec)[:out_l] + b_ref[:out_l, l : l + 1]
        if l < L - 1:
            zs.append(z)
            h = jax.nn.softplus(100.0 * z) / 100.0
        else:
            y0 = z[:1, :]
    dy = _dy_of_y0(y0, cfg.udf_type, cfg.scale)  # (1, T)

    def s32(l):
        if l not in s_cache:
            s = jax.nn.sigmoid(100.0 * zs[l])
            if not cfg.cache_acts:
                return s
            s_cache[l] = s
        return s_cache[l]

    def u_of(l):
        """Layer l's input, re-derived: x for l=0, else act(z_{l-1})
        (+ skip concat), exactly as the forward chain built it."""
        if l in u_cache:
            return u_cache[l]
        if l == 0:
            return x
        a = jax.nn.softplus(100.0 * zs[l - 1]) / 100.0
        if l in cfg.skip_in:
            a = jnp.concatenate([a, x[:d0, :]], axis=0) * _INV_SQRT2
        return a

    # ---- spatial-gradient reverse chain, keeping only carry_l.
    # rs[l] (= carries[l+1] * s_l, rs[L-1] = dy) is NOT materialized as a
    # list: phase 3 re-derives each rs[l] from the stored carries with the
    # identical expression, so only ONE of {carries[l], s_hat[l]} is live
    # per layer at any point in phase 3 (carries die as s_hat is built).
    # Together with the z-only residuals this halves the backward's peak
    # VMEM liveness (large tiles / f32 variants fit comfortably under the
    # raised vmem_limit_bytes below); values are bit-identical (same dots,
    # same operands, same order).
    carries = [None] * L  # carries[l]: the value elementwise-multiplied
    r = dy                # into s_{l-1} to form r_{l-1}
    for l in reversed(range(1, L)):
        q = dotT(l, r)  # (in_l, T)
        if l in cfg.skip_in:
            carry = q[:-d0, :] * _INV_SQRT2
        else:
            carry = q
        carries[l] = carry
        r = carry * s32(l - 1)

    def r_of(l):
        return dy if l == L - 1 else carries[l + 1] * s32(l)

    # ---- phase 3: ascend the reverse chain
    w_contrib = [None] * L  # (out_l, in_l) per layer
    b_contrib = [None] * L
    s_hat = [None] * (L - 1)
    carryhat = None
    r_hat_last = None
    for l in range(L):
        if l == 0:
            q_hat = gbar
        elif l in cfg.skip_in:
            q_hat = jnp.concatenate(
                [carryhat * _INV_SQRT2, gbar[:d0, :] * _INV_SQRT2], axis=0
            )
        else:
            q_hat = carryhat
        # Wbar_l += r_l q_hat^T : contract the T axis (axis 1 of both)
        w_contrib[l] = _kernel_dot(
            r_of(l), q_hat, prec_b,
            dimension_numbers=(((1,), (1,)), ((), ())),
        )
        r_hat = _kernel_dot(W(l), q_hat, prec_b)[: dims[l][1]]
        if l < L - 1:
            s_hat[l] = r_hat * carries[l + 1]
            carries[l + 1] = None  # last use: liveness handoff to s_hat[l]
            carryhat = r_hat * s32(l)
        else:
            r_hat_last = r_hat  # (1, T); used by the square head only

    # ---- phase 4: unified descending delta chain
    a_hat = None
    for l in reversed(range(L)):
        if l == L - 1:
            z_hat = ubar * dy
            if cfg.udf_type == "square":
                z_hat = z_hat + r_hat_last * (2.0 / cfg.scale)
        else:
            z_hat = a_hat * s32(l) + s_hat[l] * (
                100.0 * s32(l) * (1.0 - s32(l))
            )
        w_contrib[l] = w_contrib[l] + _kernel_dot(
            z_hat, u_of(l), prec_b,
            dimension_numbers=(((1,), (1,)), ((), ())),
        )
        b_contrib[l] = jnp.sum(z_hat, axis=1, keepdims=True)
        if l == 0:
            break
        u_hat = dotT(l, z_hat, prec_b)  # (in_l, T)
        if l in cfg.skip_in:
            a_hat = u_hat[:-d0, :] * _INV_SQRT2
        else:
            a_hat = u_hat

    wbar = jnp.concatenate(
        [pad_rows(w, row_max) for w in w_contrib], axis=1
    )
    bbar = jnp.concatenate(
        [pad_rows(b, row_max) for b in b_contrib], axis=1
    )
    return wbar, bbar


def _train_bwd_math_interleaved(xs, w_ref, b_ref, ubars, gbars,
                                cfg: UDFConfig):
    """K independent sub-tiles through the SAME four-phase adjoint, with
    every per-layer loop interchanged to layer-major order: for each layer,
    the K sub-tiles' dots issue back-to-back. Consecutive MXU passes are
    then data-independent (sub-tile k+1's layer-l dot does not consume
    sub-tile k's layer-l result), which is the one scheduling freedom the
    "seq" sub-chain experiment (chain_split, r2/r4 — measured noise) never
    gave the Mosaic scheduler. Same dots, same operands, same per-dot
    precision as `_train_bwd_math`; only issue/accumulation order differs,
    so results agree to f32 accumulation roundoff (pinned in
    tests/test_kernels_train.py).

    xs/ubars/gbars: K-lists of (d0_pad, T/K) / (1, T/K) / (d0_pad, T/K).
    Returns the summed (wbar, bbar) over all K sub-tiles.
    """
    K = len(xs)
    dims = _layer_dims(cfg)
    L = len(dims)
    d0 = cfg.dims[0]
    row_max = max(o for _, o in dims)
    offs = np.concatenate([[0], np.cumsum([i for i, _ in dims])])
    prec = cfg.precision
    prec_b = cfg.bwd_precision or cfg.precision

    def W(l):
        return w_ref[:, int(offs[l]) : int(offs[l]) + dims[l][0]]

    def dotT(l, v, p=prec):
        return _kernel_dot(
            W(l)[: dims[l][1]], v, p,
            dimension_numbers=(((0,), (0,)), ((), ())),
        )

    def pad_rows(a, rows):
        if a.shape[0] == rows:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((rows - a.shape[0], a.shape[1]), a.dtype)], axis=0
        )

    # ---- forward recompute (layer-major): z-only residuals per sub-tile
    zs = [[] for _ in range(K)]
    u_cache = [dict() for _ in range(K)]
    s_cache = [dict() for _ in range(K)]
    hs = list(xs)
    dy = [None] * K
    for l in range(L):
        out_l = dims[l][1]
        for k in range(K):
            h = hs[k]
            if l in cfg.skip_in:
                h = jnp.concatenate([h, xs[k][:d0, :]], axis=0) * _INV_SQRT2
            if cfg.cache_acts:
                u_cache[k][l] = h
            z = _kernel_dot(W(l), h, prec)[:out_l] + b_ref[:out_l, l : l + 1]
            if l < L - 1:
                zs[k].append(z)
                hs[k] = jax.nn.softplus(100.0 * z) / 100.0
            else:
                dy[k] = _dy_of_y0(z[:1, :], cfg.udf_type, cfg.scale)

    def s32(k, l):
        if l not in s_cache[k]:
            s = jax.nn.sigmoid(100.0 * zs[k][l])
            if not cfg.cache_acts:
                return s
            s_cache[k][l] = s
        return s_cache[k][l]

    def u_of(k, l):
        if l in u_cache[k]:
            return u_cache[k][l]
        if l == 0:
            return xs[k]
        a = jax.nn.softplus(100.0 * zs[k][l - 1]) / 100.0
        if l in cfg.skip_in:
            a = jnp.concatenate([a, xs[k][:d0, :]], axis=0) * _INV_SQRT2
        return a

    # ---- spatial-gradient reverse chain, carries only
    carries = [[None] * L for _ in range(K)]
    r = list(dy)
    for l in reversed(range(1, L)):
        for k in range(K):
            q = dotT(l, r[k])
            carry = q[:-d0, :] * _INV_SQRT2 if l in cfg.skip_in else q
            carries[k][l] = carry
            r[k] = carry * s32(k, l - 1)

    def r_of(k, l):
        return dy[k] if l == L - 1 else carries[k][l + 1] * s32(k, l)

    # ---- phase 3: ascend
    w_contrib = [None] * L
    b_contrib = [None] * L
    s_hat = [[None] * (L - 1) for _ in range(K)]
    carryhat = [None] * K
    r_hat_last = [None] * K
    for l in range(L):
        for k in range(K):
            if l == 0:
                q_hat = gbars[k]
            elif l in cfg.skip_in:
                q_hat = jnp.concatenate(
                    [carryhat[k] * _INV_SQRT2, gbars[k][:d0, :] * _INV_SQRT2],
                    axis=0,
                )
            else:
                q_hat = carryhat[k]
            wc = _kernel_dot(
                r_of(k, l), q_hat, prec_b,
                dimension_numbers=(((1,), (1,)), ((), ())),
            )
            w_contrib[l] = wc if w_contrib[l] is None else w_contrib[l] + wc
            r_hat = _kernel_dot(W(l), q_hat, prec_b)[: dims[l][1]]
            if l < L - 1:
                s_hat[k][l] = r_hat * carries[k][l + 1]
                carries[k][l + 1] = None  # liveness handoff, as in seq
                carryhat[k] = r_hat * s32(k, l)
            else:
                r_hat_last[k] = r_hat

    # ---- phase 4: descend
    a_hat = [None] * K
    for l in reversed(range(L)):
        for k in range(K):
            if l == L - 1:
                z_hat = ubars[k] * dy[k]
                if cfg.udf_type == "square":
                    z_hat = z_hat + r_hat_last[k] * (2.0 / cfg.scale)
            else:
                z_hat = a_hat[k] * s32(k, l) + s_hat[k][l] * (
                    100.0 * s32(k, l) * (1.0 - s32(k, l))
                )
            w_contrib[l] = w_contrib[l] + _kernel_dot(
                z_hat, u_of(k, l), prec_b,
                dimension_numbers=(((1,), (1,)), ((), ())),
            )
            bc = jnp.sum(z_hat, axis=1, keepdims=True)
            b_contrib[l] = bc if b_contrib[l] is None else b_contrib[l] + bc
            if l > 0:
                u_hat = dotT(l, z_hat, prec_b)
                a_hat[k] = (
                    u_hat[:-d0, :] * _INV_SQRT2 if l in cfg.skip_in else u_hat
                )

    wbar = jnp.concatenate(
        [pad_rows(w, row_max) for w in w_contrib], axis=1
    )
    bbar = jnp.concatenate(
        [pad_rows(b, row_max) for b in b_contrib], axis=1
    )
    return wbar, bbar


@functools.partial(jax.jit, static_argnames=(
    "cfg", "tile", "interpret", "fuse_pe", "chain_split"))
def _pallas_train_bwd(x_T, w_pack, b_pack, ubar, gbar, cfg: UDFConfig,
                      tile: int, interpret: bool, fuse_pe: bool = False,
                      chain_split: int = 1):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    in_rows, n = x_T.shape  # (8, n) raw points when fuse_pe, else (d0_pad, n)
    dims = _layer_dims(cfg)
    row_max = max(o for _, o in dims)
    sum_in = sum(i for i, _ in dims)
    L = len(dims)
    gb_rows = 8 if fuse_pe else in_rows

    def _tile_math(x_blk, w_ref, b_ref, ub_blk, gb_blk):
        if fuse_pe:
            x_blk, uf = _encode_fused(x_blk, cfg)
            gb_blk = _pe_jacT_fused(uf, gb_blk, cfg)
        return _train_bwd_math(x_blk, w_ref, b_ref, ub_blk, gb_blk, cfg)

    def kernel(x_ref, w_ref, b_ref, ub_ref, gb_ref, wbar_ref, bbar_ref):
        if chain_split == 1:
            wbar, bbar = _tile_math(
                x_ref[...], w_ref, b_ref, ub_ref[...], gb_ref[...]
            )
        elif cfg.chain_mode == "interleave":
            # layer-major interchange: per layer, the K sub-tiles' dots
            # issue back-to-back (data-independent consecutive MXU passes);
            # see _train_bwd_math_interleaved
            sub = tile // chain_split
            xs, ubs, gbs = [], [], []
            for k in range(chain_split):
                sl = slice(k * sub, (k + 1) * sub)
                xk, gk = x_ref[:, sl], gb_ref[:, sl]
                if fuse_pe:
                    xk, uf = _encode_fused(xk, cfg)
                    gk = _pe_jacT_fused(uf, gk, cfg)
                xs.append(xk)
                ubs.append(ub_ref[:, sl])
                gbs.append(gk)
            wbar, bbar = _train_bwd_math_interleaved(
                xs, w_ref, b_ref, ubs, gbs, cfg
            )
        else:
            # cross-pass pipelining experiment: carve the tile into
            # chain_split independent sub-chains so the scheduler can
            # overlap sub-chain k+1's early dots with sub-chain k's deeper
            # layers (the serial 8-layer chain's inter-pass latency is the
            # measured residual vs the matmul-only floor, BASELINE.md)
            sub = tile // chain_split
            wbar = bbar = None
            for k in range(chain_split):
                sl = slice(k * sub, (k + 1) * sub)
                w_k, b_k = _tile_math(
                    x_ref[:, sl], w_ref, b_ref, ub_ref[:, sl], gb_ref[:, sl]
                )
                wbar = w_k if wbar is None else wbar + w_k
                bbar = b_k if bbar is None else bbar + b_k

        @pl.when(pl.program_id(0) == 0)
        def _init():
            wbar_ref[...] = jnp.zeros_like(wbar_ref)
            bbar_ref[...] = jnp.zeros_like(bbar_ref)

        wbar_ref[...] += wbar
        bbar_ref[...] += bbar

    in_specs = [
        pl.BlockSpec((in_rows, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((gb_rows, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((row_max, sum_in), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((row_max, L), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    )
    wbar, bbar = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((row_max, sum_in), jnp.float32),
            jax.ShapeDtypeStruct((row_max, L), jnp.float32),
        ),
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        # Mosaic's DEFAULT scoped-VMEM stack budget is 16 MiB — a compiler
        # default, not the hardware (v5e has 128 MiB VMEM). The raised
        # limit is what admits tile_bwd=512 (bigger MXU tiles) and the
        # 6-pass f32 HIGHEST adjoint that previously VMEM-OOMed at AOT
        # compile and had to be routed around the kernel.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x_T, w_pack, b_pack, ubar, gbar)
    return wbar, bbar


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _train_query(x_T, w_pack, b_pack, cfg: UDFConfig, tile_fwd: int,
                 tile_bwd: int, interpret: bool, fuse_pe: bool = False,
                 chain_split: int = 1):
    """(x_T, packed weights) -> (udf (N,), g_inputs (d0_pad, N)); with
    fuse_pe, x_T is the RAW points (8, N) and the second output is the
    spatial gradient du (8, N) (PE encode + Jacobian run in-kernel).

    Differentiable w.r.t. w_pack/b_pack only (x cotangent is zeros —
    query points are stop-gradient in render_core).
    """
    return _pallas_value_and_grad(x_T, w_pack, b_pack, cfg, tile_fwd,
                                  interpret, f32_residuals=True,
                                  fuse_pe=fuse_pe)


def _train_query_fwd(x_T, w_pack, b_pack, cfg, tile_fwd, tile_bwd,
                     interpret, fuse_pe, chain_split):
    out = _pallas_value_and_grad(x_T, w_pack, b_pack, cfg, tile_fwd,
                                 interpret, f32_residuals=True,
                                 fuse_pe=fuse_pe)
    return out, (x_T, w_pack, b_pack)


def _train_query_bwd(cfg, tile_fwd, tile_bwd, interpret, fuse_pe,
                     chain_split, res, cots):
    x_T, w_pack, b_pack = res
    ubar, gbar = cots
    wbar, bbar = _pallas_train_bwd(
        x_T, w_pack, b_pack,
        jnp.asarray(ubar, jnp.float32)[None, :],
        jnp.asarray(gbar, jnp.float32),
        cfg, tile_bwd, interpret, fuse_pe=fuse_pe, chain_split=chain_split,
    )
    return jnp.zeros_like(x_T), wbar, bbar


_train_query.defvjp(_train_query_fwd, _train_query_bwd)


def pallas_udf_train_value_and_gradient(
    params, pts, cfg: UDFConfig, tile_fwd: int | None = None,
    tile_bwd: int | None = None, interpret: bool | None = None,
    fuse_pe: bool | None = None, chain_split: int | None = None,
):
    """Training-path fused value + spatial gradient; pts (N, 3) ->
    ((N,), (N, 3)), differentiable w.r.t. `params` (second order: the outer
    loss gradient flows through the returned spatial gradient).

    Drop-in for fields.udf.udf_value_and_gradient inside render_core when
    the query points carry no gradient (they are stop-gradient z-values).
    `pts` is stop-gradiented HERE, by construction: the custom_vjp's x
    cotangent is zero, so a caller whose points carried parameter
    dependence (e.g. differentiable sampling) would otherwise get silently
    wrong point gradients through the PE-Jacobian side path. With the
    explicit stop_gradient the semantics are enforced, not just documented.
    Weight-norm folding and the PE Jacobian run in XLA outside the kernel
    and are differentiated by JAX automatically. The backward kernel keeps
    ~3x the forward's per-tile state in VMEM (layer inputs, sigmoids, the
    gradient chain's r/carry buffers), hence the smaller default tile.

    Tile defaults (1024, min(512, tile_fwd)): at the production bf16 field
    tier
    (precision="default") the fwd+bwd chain at the 116,736-pt step shape
    measures 8.69 ms with tile_bwd=512 vs 9.78 ms at 256 (+11%; larger
    tiles amortize inter-pass latency of the serial layer chain, which
    dominates once each bf16 pass is 3x shorter than at "high"). At the
    "high" tier the sweep is flat within noise (r4: 28.0/28.9/27.3 ms for
    256/512/1024), so 512 is safe for both; weight grads agree across
    tiles to 2.1e-7 rel. Requires the raised scoped-VMEM ceiling
    (CompilerParams above) -- 512 VMEM-OOMs under Mosaic's 16M default.
    """
    if interpret is None:
        interpret = not pallas_available()
    if fuse_pe is None:
        fuse_pe = cfg.fuse_pe
    fuse_pe = fuse_pe and cfg.multires > 0 and cfg.d_in == 3
    if tile_fwd is None:
        tile_fwd = cfg.tile_fwd or 1024
    if tile_bwd is None and cfg.tile_bwd:
        tile_bwd = cfg.tile_bwd
    if tile_bwd is None:
        # default: 512 (bf16-tier sweep winner), clamped so small explicit
        # tile_fwd values (e.g. 256) stay valid without also passing
        # tile_bwd; under fuse_pe the (1024, 1024) pair measured fastest
        # (7.50 vs 7.62 ms kernel fwd+bwd, scripts/bench_fusepe.py r5)
        tile_bwd = min(1024 if fuse_pe else 512, tile_fwd)
    if tile_fwd % tile_bwd:
        raise ValueError("tile_bwd must divide tile_fwd (shared padding)")
    if chain_split is None:
        chain_split = cfg.chain_split
    if tile_bwd % (chain_split * 128):
        raise ValueError(
            "chain_split must divide tile_bwd into 128-lane multiples"
        )
    tile = max(tile_fwd, tile_bwd)
    pts = jax.lax.stop_gradient(pts)
    w_pack, b_pack = pack_weights(params, cfg, fuse_pe=fuse_pe)
    padded, n = _pad_pts(jnp.asarray(pts, jnp.float32), tile)
    if fuse_pe:
        # raw feature-major points, 3 live rows zero-padded to the 8-row
        # sublane minimum; the kernels encode + apply the PE Jacobian
        # in-VMEM (one 8-row HBM stream each way instead of d0_pad rows,
        # and no XLA-side PE fusions in the step's tail)
        x_T = jnp.pad((padded * 1.0).T, ((0, 8 - padded.shape[1]), (0, 0)))
        udf, du8 = _train_query(
            x_T, w_pack, b_pack, cfg, tile_fwd, tile_bwd, interpret,
            True, chain_split,
        )
        return udf[:n], du8[:3, :n].T
    x_T = _encode_host(padded, cfg)
    udf, g_inputs = _train_query(
        x_T, w_pack, b_pack, cfg, tile_fwd, tile_bwd, interpret,
        False, chain_split,
    )
    grad = _pe_jacobian_host(padded, g_inputs, cfg)
    return udf[:n], grad[:n]
