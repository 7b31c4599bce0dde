"""Pallas TPU kernel: fused UDF-MLP query, feature-major layout.

The UDF field query chain is PE -> 9 matmuls with softplus -> abs head
(reference src/models/udf_model.py:90-135). XLA lowers this well per-matmul
but cannot fuse THROUGH matmuls: every layer round-trips its (N, 256)
activation through HBM (~18 KB/point/pass), which makes the big extraction
queries HBM-bound. This kernel keeps the whole chain in VMEM per point-tile:
weights resident (~2.2 MB), one HBM read of the encoded inputs, one write of
the outputs.

LAYOUT (the round-2 redesign): everything is FEATURE-MAJOR -- arrays are
(features, points) with the point axis on the 128-wide lanes. Round 1's
point-major kernel put 3- and 63-wide feature dims on the lanes and measured
0.11x vs XLA; feature-major runs every VPU op at full lane width and every
matmul as (256, 256) x (256, T) on the MXU.

STATUS (measured on v5e, scripts/bench_kernels.py, 262k-point extraction
shapes, production "high" tier): **1.19x fwd / 1.48x fwd+grad vs XLA** --
ON by default for the extraction paths on TPU (extract/pointcloud.py).
Two more lessons encoded here: (a) weights are packed into TWO buffers
(19 per-grid-step input DMAs cost more than the matmuls; see pack_weights),
(b) the kernel must be invoked INSIDE an enclosing jit -- eager invocation
times per-op tunnel dispatch, not the kernel.

The positional encoding and its Jacobian stay OUTSIDE the kernel in XLA: they
are single-pass elementwise ops that XLA fuses anyway, and doing them in-kernel
would reintroduce lane-width-3 vector work.

Two entry points (API unchanged from round 1):
* `pallas_udf_value(params, pts, cfg)`          -> (N,) udf
* `pallas_udf_value_and_grad(params, pts, cfg)` -> ((N,), (N, 3)) with the
  spatial gradient computed by an in-kernel hand-derived backward pass
  (reverse through the folded weights and softplus' = sigmoid(100 z)), plus
  the analytic PE Jacobian applied outside.

These kernels serve the inference/extraction and no-grad sampler paths; the
training render_core keeps JAX autodiff (the eikonal double-backprop would
need custom second-order rules through a kernel). Weight norm is folded to
effective weights outside the kernel.

Falls back to interpret mode off-TPU so tests validate the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from emap_tpu.fields.embedder import positional_encoding
from emap_tpu.fields.udf import UDFConfig, _effective_weight


def pallas_available() -> bool:
    """True when jitted computation will land on a TPU — i.e. the effective
    default device is one. Respects a `jax.default_device(...)` context (the
    extraction backend pin, train/runner.py extract_edge platform=), which
    redirects placement without changing jax.devices() order."""
    try:
        dd = jax.config.jax_default_device
        if dd is not None:
            return getattr(dd, "platform", str(dd)) == "tpu"
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pe_perm(cfg: UDFConfig) -> np.ndarray:
    """Column permutation mapping the embedder's interleaved PE layout
    [x, sin(f0 x), cos(f0 x), sin(f1 x), ...] to the kernel-friendly
    blocked layout [x, sin(F x), cos(F x)] used by the fused-PE kernels
    (three big contiguous blocks instead of 2*multires 3-row slivers)."""
    d, m = cfg.d_in, cfg.multires
    sin_cols, cos_cols = [], []
    for k in range(m):
        base = d + 2 * d * k
        sin_cols += list(range(base, base + d))
        cos_cols += list(range(base + d, base + 2 * d))
    return np.array(list(range(d)) + sin_cols + cos_cols)


def fold_weights(params, cfg: UDFConfig, fuse_pe: bool = False):
    """Fold weight-norm (g, v) -> w; returns [(w (out,in), b (out,1)), ...].

    lin0's input dim is zero-padded up to a sublane multiple so the kernel's
    encoded-input block can be padded to match (zero rows x zero cols = 0).

    fuse_pe permutes the encoded-input columns (lin0 and the x-block of
    every skip layer) to the blocked PE layout the in-kernel encode
    produces (_pe_perm); the permutation is a gather on folded weights,
    transposed to a scatter by JAX automatically, so parameter gradients
    stay exact.
    """
    layers = []
    n_linear = len(cfg.dims) - 1
    d0 = cfg.dims[0]
    d0_pad = _round_up(d0, 8)
    perm = _pe_perm(cfg) if fuse_pe else None
    for l in range(n_linear):
        layer = params[f"lin{l}"]
        w = _effective_weight(layer).astype(jnp.float32)
        if perm is not None:
            if l == 0:
                w = w[:, perm]
            elif l in cfg.skip_in:
                w = jnp.concatenate(
                    [w[:, :-d0], w[:, -d0:][:, perm]], axis=1
                )
        if l == 0 and d0_pad != d0:
            w = jnp.pad(w, ((0, 0), (0, d0_pad - d0)))
        b = layer["b"].astype(jnp.float32)[:, None]
        layers.append((w, b))
    return layers


def _layer_dims(cfg: UDFConfig):
    """[(in_dim_padded, out_dim)] per linear, with lin0's input padded."""
    d0_pad = _round_up(cfg.dims[0], 8)
    dims = []
    for l, in_dim, out_dim in cfg.layer_shapes():
        dims.append((d0_pad if l == 0 else in_dim, out_dim))
    return dims


def pack_weights(params, cfg: UDFConfig, fuse_pe: bool = False):
    """Pack all layers into TWO buffers so the kernel has 3 input DMAs per
    grid step instead of 19 (the round-1 kernel's dominant overhead:
    ~2 us DMA-issue latency x 19 buffers x hundreds of grid steps).

    W_pack: (row_max, sum_in) with layer l's (out_l, in_l) block at column
    offset off_l, zero-padded rows above out_l. B_pack: (row_max, n_linear).
    """
    layers = fold_weights(params, cfg, fuse_pe)
    dims = _layer_dims(cfg)
    row_max = max(o for _, o in dims)
    blocks, biases = [], []
    for (w, b), (in_d, out_d) in zip(layers, dims):
        blocks.append(jnp.pad(w, ((0, row_max - out_d), (0, 0))))
        biases.append(jnp.pad(b, ((0, row_max - out_d), (0, 0))))
    return jnp.concatenate(blocks, axis=1), jnp.concatenate(biases, axis=1)


def _pe_freqs(cfg: UDFConfig) -> np.ndarray:
    return 2.0 ** np.linspace(0.0, cfg.multires - 1, cfg.multires)


def _encode_host(pts: jnp.ndarray, cfg: UDFConfig) -> jnp.ndarray:
    """(N, 3) -> (d0_pad, N) feature-major encoded inputs (XLA-side)."""
    u = pts * cfg.scale
    inputs = positional_encoding(u, cfg.multires) if cfg.multires > 0 else u
    d0 = inputs.shape[-1]
    d0_pad = _round_up(d0, 8)
    if d0_pad != d0:
        inputs = jnp.pad(inputs, ((0, 0), (0, d0_pad - d0)))
    return inputs.T


def _pe_jacobian_host(pts, g_inputs_T, cfg: UDFConfig) -> jnp.ndarray:
    """Apply d(PE(x*scale))/dx to g_inputs ((d0_pad, N) feature-major).

    Mirrors embedder layout [u, sin(f0 u), cos(f0 u), ...] with u = x*scale.
    """
    g = g_inputs_T.T  # (N, d0_pad)
    du = g[:, :3]
    if cfg.multires > 0:
        u = pts * cfg.scale
        for k, f in enumerate(_pe_freqs(cfg)):
            s_part = g[:, 3 + 6 * k : 6 + 6 * k]
            c_part = g[:, 6 + 6 * k : 9 + 6 * k]
            uf = u * f
            du = du + f * (jnp.cos(uf) * s_part - jnp.sin(uf) * c_part)
    return du * cfg.scale


def _encode_fused(p, cfg: UDFConfig):
    """In-kernel PE encode: p (8, T) raw feature-major points (3 live rows)
    -> (x (d0_pad, T) in the BLOCKED layout [u, sin(F u), cos(F u)], and
    uf (3*multires, T) reused by the Jacobian helpers).

    Feature-major keeps every transcendental at full 128-lane width; the
    blocked layout (see _pe_perm) makes the encode three big concats
    instead of 2*multires 3-row slivers.
    """
    u = p[: cfg.d_in, :] * np.float32(cfg.scale)
    uf = jnp.concatenate(
        [u * np.float32(f) for f in _pe_freqs(cfg)], axis=0
    )
    x = jnp.concatenate([u, jnp.sin(uf), jnp.cos(uf)], axis=0)
    d0 = cfg.dims[0]
    d0_pad = _round_up(d0, 8)
    if d0_pad != d0:
        x = jnp.concatenate(
            [x, jnp.zeros((d0_pad - d0, x.shape[1]), x.dtype)], axis=0
        )
    return x, uf


def _pe_jac_fused(uf, g, cfg: UDFConfig):
    """du = (dPE/dx)^T g, blocked layout: g (d0_pad, T) encoded-space
    spatial gradient -> (8, T) with the first d_in rows live.

    Per-frequency scalar multiplies (no captured constant arrays — Pallas
    kernels must not close over non-scalar constants).
    """
    d, m = cfg.d_in, cfg.multires
    cos_uf, sin_uf = jnp.cos(uf), jnp.sin(uf)
    du = g[:d, :]
    for k, f in enumerate(_pe_freqs(cfg)):
        sl = slice(d * k, d * (k + 1))
        gs = g[d + d * k : d + d * (k + 1), :]
        gc = g[d + d * m + d * k : d + d * m + d * (k + 1), :]
        du = du + np.float32(f) * (cos_uf[sl] * gs - sin_uf[sl] * gc)
    du = du * np.float32(cfg.scale)
    return jnp.concatenate(
        [du, jnp.zeros((8 - d, du.shape[1]), du.dtype)], axis=0
    )


def _pe_jacT_fused(uf, t8, cfg: UDFConfig):
    """Transpose of _pe_jac_fused: spatial cotangent t8 (8, T; first d_in
    rows live) -> encoded-space cotangent (d0_pad, T), blocked layout."""
    d, m = cfg.d_in, cfg.multires
    t = t8[:d, :] * np.float32(cfg.scale)
    cos_uf, sin_uf = jnp.cos(uf), jnp.sin(uf)
    sin_rows = [
        np.float32(f) * cos_uf[d * k : d * (k + 1), :] * t
        for k, f in enumerate(_pe_freqs(cfg))
    ]
    cos_rows = [
        -np.float32(f) * sin_uf[d * k : d * (k + 1), :] * t
        for k, f in enumerate(_pe_freqs(cfg))
    ]
    out = jnp.concatenate([t] + sin_rows + cos_rows, axis=0)
    d0 = cfg.dims[0]
    d0_pad = _round_up(d0, 8)
    if d0_pad != d0:
        out = jnp.concatenate(
            [out, jnp.zeros((d0_pad - d0, out.shape[1]), out.dtype)], axis=0
        )
    return out


def _kernel_dot(a, b, precision: str, dimension_numbers=None):
    """Matmul with software precision tiers inside a Pallas kernel.

    Mosaic only lowers DEFAULT and HIGHEST dot precisions; the production
    default is HIGH (3-pass bf16), so emulate it explicitly: split each f32
    operand into bf16 hi + bf16 lo and accumulate the three significant
    cross-products at full bf16 MXU rate (the lo*lo term is below f32 noise).
    """
    dn = dimension_numbers or (((a.ndim - 1,), (0,)), ((), ()))

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )

    if precision == "highest":
        return jax.lax.dot_general(
            a, b, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if precision == "high":
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return dot(a_hi, b_hi) + dot(a_hi, b_lo) + dot(a_lo, b_hi)
    # default: one bf16 pass
    return dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))


def _head(y0, udf_type: str):
    if udf_type == "abs":
        return jnp.abs(y0), jnp.sign(y0)
    if udf_type == "square":
        return y0**2, 2.0 * y0
    return y0, jnp.ones_like(y0)


def _kernel_forward(x, w_ref, b_ref, cfg: UDFConfig, keep_preacts: bool,
                    f32_residuals: bool = False):
    """Feature-major forward: x (d0_pad, T) -> (y (d_out, T), sigmoids).

    w_ref/b_ref are the packed buffers from pack_weights; every per-layer
    access is a static slice of a VMEM-resident ref.
    """
    dims = _layer_dims(cfg)
    n_linear = len(dims)
    h = x
    sigmoids = []
    off = 0
    for l, (in_d, out_d) in enumerate(dims):
        if l in cfg.skip_in:
            # lin(l-1) out is (d_hidden - d0) rows; re-attach the encoded
            # input rows (first d0 of the padded block) -> d_hidden rows
            h = jnp.concatenate(
                [h, x[: cfg.dims[0], :]], axis=0
            ) * np.float32(1.0 / np.sqrt(2.0))
        w = w_ref[:, off : off + in_d]
        z = _kernel_dot(w, h, cfg.precision)[:out_d] + b_ref[:out_d, l : l + 1]
        off += in_d
        if l < n_linear - 1:
            if keep_preacts:
                # bf16 residuals on the fast tiers: 8 x (256, T) f32 would
                # blow the 16 MB VMEM at tile 2048; softplus' in bf16
                # perturbs grads well inside those tiers' error envelopes.
                # "highest" keeps f32 residuals (bit-exactness contract).
                s = jax.nn.sigmoid(100.0 * z)
                if cfg.precision != "highest" and not f32_residuals:
                    s = s.astype(jnp.bfloat16)
                sigmoids.append(s)
            h = jax.nn.softplus(100.0 * z) / 100.0
        else:
            h = z
    return h, sigmoids


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret"))
def _pallas_value(x_T, w_pack, b_pack, cfg: UDFConfig, tile: int,
                  interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d0_pad, n = x_T.shape

    def kernel(x_ref, w_ref, b_ref, out_ref):
        y, _ = _kernel_forward(x_ref[...], w_ref, b_ref, cfg, False)
        udf, _ = _head(y[:1, :], cfg.udf_type)
        out_ref[...] = udf / cfg.scale

    in_specs = [
        pl.BlockSpec((d0_pad, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x_T, w_pack, b_pack)
    return out[0]


@functools.partial(jax.jit, static_argnames=(
    "cfg", "tile", "interpret", "f32_residuals", "fuse_pe"))
def _pallas_value_and_grad(x_T, w_pack, b_pack, cfg: UDFConfig, tile: int,
                           interpret: bool, f32_residuals: bool = False,
                           fuse_pe: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    in_rows, n = x_T.shape  # (8, n) raw points when fuse_pe, else (d0_pad, n)
    d0 = cfg.dims[0]
    d0_pad = _round_up(d0, 8)
    dims = _layer_dims(cfg)
    row_max = max(o for _, o in dims)
    offs = np.concatenate([[0], np.cumsum([i for i, _ in dims])])
    g_rows = 8 if fuse_pe else d0_pad  # spatial-gradient output rows

    def pad_rows(a, rows):
        if a.shape[0] == rows:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((rows - a.shape[0], a.shape[1]), a.dtype)], axis=0
        )

    def kernel(x_ref, w_ref, b_ref, udf_ref, gin_ref):
        if fuse_pe:
            # in-kernel PE: one HBM read of 8 raw rows instead of d0_pad
            # encoded rows, and the blocked-layout weights (pack_weights
            # fuse_pe) see the matching encode
            x, uf = _encode_fused(x_ref[...], cfg)
        else:
            x = x_ref[...]
        y, sigmoids = _kernel_forward(x, w_ref, b_ref, cfg, True,
                                      f32_residuals)
        udf, dy = _head(y[:1, :], cfg.udf_type)
        udf_ref[...] = udf / cfg.scale
        dy = dy / cfg.scale

        # reverse pass wrt the encoded inputs, still feature-major:
        # g = W^T @ g == dot_general contracting the out-feature axis. The
        # packed W's zero rows above out_l make padded g rows harmless.
        g = dy  # (out_last, T)
        g_inputs = jnp.zeros((d0_pad, x.shape[1]), x.dtype)
        for l in reversed(range(len(dims))):
            in_l, _ = dims[l]
            w = w_ref[:, int(offs[l]) : int(offs[l]) + in_l]
            g = _kernel_dot(
                w, pad_rows(g, row_max), cfg.precision,
                dimension_numbers=(((0,), (0,)), ((), ())),
            )  # (in_l, T)
            if l in cfg.skip_in:
                scale = np.float32(1.0 / np.sqrt(2.0))
                # pad+add instead of .at[:d0].add -- Mosaic has no scatter-add
                g_inputs = g_inputs + pad_rows(g[-d0:, :] * scale, d0_pad)
                g = g[:-d0, :] * scale
            elif l == 0:
                g_inputs = g_inputs + g  # lin0 input IS the padded encoding
                continue
            g = g * sigmoids[l - 1].astype(jnp.float32)
        if fuse_pe:
            # apply the PE Jacobian in-kernel: 8 output rows instead of
            # d0_pad, and no XLA-side jacobian fusion or HBM round-trip
            gin_ref[...] = _pe_jac_fused(uf, g_inputs, cfg)
        else:
            gin_ref[...] = g_inputs

    in_specs = [
        pl.BlockSpec((in_rows, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out_specs = (
        pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (g_rows, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    )
    udf, g_inputs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((g_rows, n), jnp.float32),
        ),
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        # Mosaic's default scoped-VMEM budget is 16 MiB (a compiler
        # default, not the v5e's 128 MiB); raise it so large tiles and
        # f32-residual variants fit (see kernels/mlp_train.py).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x_T, w_pack, b_pack)
    return udf[0], g_inputs


def _pad_pts(pts: jnp.ndarray, tile: int):
    n = pts.shape[0]
    pad = (-n) % tile
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)], axis=0)
    return pts, n


def pallas_udf_value(params, pts, cfg: UDFConfig, tile: int = 2048,
                     interpret: bool | None = None):
    """Fused MLP UDF query; pts (N, 3) -> (N,)."""
    if interpret is None:
        interpret = not pallas_available()
    w_pack, b_pack = pack_weights(params, cfg)
    padded, n = _pad_pts(jnp.asarray(pts, jnp.float32), tile)
    x_T = _encode_host(padded, cfg)
    out = _pallas_value(x_T, w_pack, b_pack, cfg, tile, interpret)
    return out[:n]


def pallas_udf_value_and_grad(params, pts, cfg: UDFConfig, tile: int = 1024,
                              interpret: bool | None = None):
    """Fused MLP value + spatial gradient; pts (N, 3) -> ((N,), (N, 3))."""
    if interpret is None:
        interpret = not pallas_available()
    w_pack, b_pack = pack_weights(params, cfg)
    padded, n = _pad_pts(jnp.asarray(pts, jnp.float32), tile)
    x_T = _encode_host(padded, cfg)
    udf, g_inputs = _pallas_value_and_grad(
        x_T, w_pack, b_pack, cfg, tile, interpret
    )
    grad = _pe_jacobian_host(padded, g_inputs, cfg)
    return udf[:n], grad[:n]
