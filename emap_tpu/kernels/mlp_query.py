"""Pallas TPU kernel: fused positional-encoding + UDF-MLP query.

The UDF field query chain is PE -> 9 matmuls with softplus -> abs head.
This kernel keeps the whole chain in VMEM per point-tile: one HBM read of the
3-coordinate inputs, one write of the outputs, weights resident in VMEM
(~2 MB for the flagship 8x256 net).

STATUS (measured on v5e, scripts/bench_kernels.py): the current point-major
layout ((tile, 3)/(tile, 63) blocks with lane-unaligned feature dims and
in-kernel transposes in the backward) is SLOWER than XLA's own lowering
(0.11x fwd, 0.34x fwd+grad) -- XLA fuses this chain well at these shapes.
The kernels are therefore OFF by default (`use_pallas=False` throughout) and
kept as a correctness-validated base for a feature-major (lane = point)
redesign. Do not enable in production paths until the micro-benchmark shows
a win.

Two entry points:
* `pallas_udf_value(params, pts, cfg)`          -> (N,) udf
* `pallas_udf_value_and_grad(params, pts, cfg)` -> ((N,), (N, 3)) with the
  spatial gradient computed by an in-kernel hand-derived backward pass
  (reverse through the folded weights, softplus' = sigmoid(100 z), the skip
  split, and the analytic PE Jacobian) -- no autograd graph, so the
  extraction path (stop-gradient by nature) gets value+grad in one fused pass.

These kernels serve the inference/extraction paths (emap_tpu/extract); the
training step keeps JAX autodiff (the eikonal double-backprop would need
custom second-order rules through a kernel). Weight norm is folded to
effective weights outside the kernel (inference-time params are fixed).

Falls back to interpret mode off-TPU so tests validate the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from emap_tpu.fields.udf import UDFConfig, _effective_weight


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def fold_weights(params, cfg: UDFConfig):
    """Fold weight-norm (g, v) -> w and return ((wT, b), ...) per layer with
    wT already transposed for x @ wT layouts."""
    layers = []
    n_linear = len(cfg.dims) - 1
    for l in range(n_linear):
        layer = params[f"lin{l}"]
        w = _effective_weight(layer)
        layers.append((w.T.astype(jnp.float32), layer["b"].astype(jnp.float32)))
    return layers


def _pe_freqs(cfg: UDFConfig) -> np.ndarray:
    return 2.0 ** np.linspace(0.0, cfg.multires - 1, cfg.multires)


def _encode(x, freqs):
    """In-kernel PE matching fields.embedder layout:
    [x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]."""
    parts = [x]
    for f in freqs:
        xf = x * f
        parts.append(jnp.sin(xf))
        parts.append(jnp.cos(xf))
    return jnp.concatenate(parts, axis=-1)


def _forward_in_kernel(x, weight_refs, cfg: UDFConfig, freqs,
                       keep_preacts: bool):
    """Shared forward: returns (y_raw, inputs_pe, preact_sigmoids)."""
    n_linear = len(cfg.dims) - 1
    inputs = x * cfg.scale
    if cfg.multires > 0:
        inputs = _encode(inputs, freqs)
    h = inputs
    sigmoids = []
    for l in range(n_linear):
        wT, b = weight_refs[l]
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inputs], axis=-1) * np.float32(
                1.0 / np.sqrt(2.0)
            )
        z = (
            jnp.dot(h, wT[...], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            + b[...]
        )
        if l < n_linear - 1:
            s = jax.nn.sigmoid(100.0 * z)
            if keep_preacts:
                sigmoids.append(s)
            h = jax.nn.softplus(100.0 * z) / 100.0
        else:
            h = z
    return h, inputs, sigmoids


def _make_specs(cfg: UDFConfig, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_linear = len(cfg.dims) - 1
    in_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for _ in range(n_linear):
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # wT
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # b
    return in_specs


def _flatten_weights(layers):
    flat = []
    for wT, b in layers:
        flat.extend([wT, b])
    return flat


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret"))
def _pallas_value(pts, cfg: UDFConfig, tile: int, interpret: bool, *flat_w):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts.shape[0]
    n_tiles = n // tile
    freqs = _pe_freqs(cfg)
    n_linear = len(cfg.dims) - 1

    def kernel(pts_ref, *refs):
        weight_refs = [
            (refs[2 * l], refs[2 * l + 1]) for l in range(n_linear)
        ]
        out_ref = refs[2 * n_linear]
        x = pts_ref[...]
        y, _, _ = _forward_in_kernel(x, weight_refs, cfg, freqs, False)
        udf = jnp.abs(y[:, :1]) if cfg.udf_type == "abs" else (
            y[:, :1] ** 2 if cfg.udf_type == "square" else y[:, :1]
        )
        out_ref[...] = udf / cfg.scale

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid=(n_tiles,),
        in_specs=_make_specs(cfg, tile),
        out_specs=pl.BlockSpec(
            (tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(pts, *flat_w)
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret"))
def _pallas_value_and_grad(pts, cfg: UDFConfig, tile: int, interpret: bool,
                           *flat_w):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts.shape[0]
    n_tiles = n // tile
    freqs = _pe_freqs(cfg)
    n_linear = len(cfg.dims) - 1
    d0 = cfg.dims[0]

    def kernel(pts_ref, *refs):
        weight_refs = [
            (refs[2 * l], refs[2 * l + 1]) for l in range(n_linear)
        ]
        udf_ref = refs[2 * n_linear]
        grad_ref = refs[2 * n_linear + 1]

        x = pts_ref[...]
        y, inputs, sigmoids = _forward_in_kernel(
            x, weight_refs, cfg, freqs, True
        )
        y0 = y[:, :1]
        if cfg.udf_type == "abs":
            udf = jnp.abs(y0)
            dy = jnp.sign(y0)
        elif cfg.udf_type == "square":
            udf = y0**2
            dy = 2.0 * y0
        else:
            udf = y0
            dy = jnp.ones_like(y0)
        udf_ref[...] = udf / cfg.scale
        dy = dy / cfg.scale

        # ---- hand-derived reverse pass wrt the input coordinates ----
        # g starts as d(udf)/d(y) padded across d_out (only channel 0 flows)
        g = jnp.concatenate(
            [dy, jnp.zeros((dy.shape[0], cfg.dims[-1] - 1), dy.dtype)],
            axis=-1,
        ) if cfg.dims[-1] > 1 else dy
        g_inputs = jnp.zeros_like(inputs)
        for l in reversed(range(n_linear)):
            wT, _ = weight_refs[l]
            g = jnp.dot(
                g, wT[...].T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # d wrt layer-l input
            if l in cfg.skip_in:
                scale = np.float32(1.0 / np.sqrt(2.0))
                g_inputs = g_inputs + g[:, -d0:] * scale
                g = g[:, :-d0] * scale
            if l > 0:
                g = g * sigmoids[l - 1]
        g_inputs = g_inputs + g

        # PE Jacobian: inputs = [u, sin(f u), cos(f u), ...], u = x*scale
        du = g_inputs[:, :3]
        if cfg.multires > 0:
            u = x * cfg.scale
            for k, f in enumerate(freqs):
                s_part = g_inputs[:, 3 + 6 * k : 6 + 6 * k]
                c_part = g_inputs[:, 6 + 6 * k : 9 + 6 * k]
                uf = u * f
                du = du + f * (jnp.cos(uf) * s_part - jnp.sin(uf) * c_part)
        grad_ref[...] = du * cfg.scale

    out_shape = (
        jax.ShapeDtypeStruct((n, 1), jnp.float32),
        jax.ShapeDtypeStruct((n, 3), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    udf, grad = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_tiles,),
        in_specs=_make_specs(cfg, tile),
        out_specs=out_specs,
        interpret=interpret,
    )(pts, *flat_w)
    return udf[:, 0], grad


def _pad_to_tile(pts: jnp.ndarray, tile: int):
    n = pts.shape[0]
    pad = (-n) % tile
    if pad:
        pts = jnp.concatenate(
            [pts, jnp.zeros((pad, 3), pts.dtype)], axis=0
        )
    return pts, n


def pallas_udf_value(params, pts, cfg: UDFConfig, tile: int = 512,
                     interpret: bool | None = None):
    """Fused PE+MLP UDF query; pts (N, 3) -> (N,)."""
    if interpret is None:
        interpret = not pallas_available()
    layers = fold_weights(params, cfg)
    padded, n = _pad_to_tile(jnp.asarray(pts, jnp.float32), tile)
    out = _pallas_value(padded, cfg, tile, interpret, *_flatten_weights(layers))
    return out[:n]


def pallas_udf_value_and_grad(params, pts, cfg: UDFConfig, tile: int = 512,
                              interpret: bool | None = None):
    """Fused PE+MLP value + spatial gradient; pts (N, 3) -> ((N,), (N, 3))."""
    if interpret is None:
        interpret = not pallas_available()
    layers = fold_weights(params, cfg)
    padded, n = _pad_to_tile(jnp.asarray(pts, jnp.float32), tile)
    udf, grad = _pallas_value_and_grad(
        padded, cfg, tile, interpret, *_flatten_weights(layers)
    )
    return udf[:n], grad[:n]
