"""UDF field: an 8x256 MLP over positional-encoded points, as pure functions
on a parameter pytree.

Functional re-design of the reference UDFNetwork (src/models/udf_model.py:7-135):

* geometric (SAL-style) initialization — last layer ~N(sqrt(pi)/sqrt(d), 1e-4)
  with bias -`bias`; PE-frequency input columns zeroed at the first and skip
  layers (udf_model.py:47-71),
* weight normalization kept as explicit (g, v) parameters with
  w = g * v / ||v||_row computed in the forward pass, so Adam sees the same
  parameterization as torch's weight_norm (udf_model.py:73-74) and released
  `.pth` checkpoints (parametrizations.weight.original0/1) map 1:1,
* Softplus(beta=100) activations, skip concat at layer 4 scaled by 1/sqrt(2),
  `abs`/`square`/`sdf` output head (udf_model.py:78-110),
* spatial gradients via a single batched reverse pass (grad of sum) instead of
  torch.autograd.grad with create_graph (udf_model.py:121-135) — outputs are
  per-point exact because each output depends only on its own input, and the
  outer loss gradient double-backprops through it under jax.grad.

TPU notes: all math is (N, 256) x (256, 256) matmuls — MXU-shaped; the PE and
softplus fuse into the matmul producers under XLA.  Matmul precision defaults
to HIGH (3-pass bf16): measured max |udf| error vs full f32 is 9.2e-5
(scripts/profile_mfu.py), noise at the 0.005-0.03 near-surface thresholds,
for +11% step throughput; conf key model.udf_network.precision overrides.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from emap_tpu.fields.embedder import pe_dim, positional_encoding

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UDFConfig:
    d_in: int = 3
    d_out: int = 1
    d_hidden: int = 256
    n_layers: int = 8
    skip_in: tuple = (4,)
    multires: int = 10
    bias: float = 0.5
    scale: float = 1.0
    geometric_init: bool = True
    weight_norm: bool = True
    udf_type: str = "abs"
    # jax-side extras (not in the reference config surface).
    # Matmul precision for field queries: "high" = 3-pass bf16 on the TPU
    # MXU, max |udf| error 9.2e-5 vs full f32 (scripts/profile_mfu.py) --
    # noise at the 0.005-0.03 near-surface decision thresholds -- and +11%
    # train-step throughput vs "highest". Set precision = "highest" in the
    # conf for bit-level f32.
    precision: str = "high"
    # Fused Pallas train-path field query (kernels/mlp_train.py): "auto"
    # enables it on real TPU devices (measured 1.32x vs XLA at the same
    # tier AND 5.6x lower weight-grad error, scripts/bench_kernels.py);
    # "on" forces it (interpret mode off-TPU, for tests); "off" keeps the
    # pure-XLA autodiff path.
    pallas_train: str = "auto"
    # Matmul tier for the ADJOINT dots of the fused train kernel's backward
    # (kernels/mlp_train.py). "" inherits `precision`. The primal-recompute
    # dots (layer inputs / spatial-gradient chain) always run at `precision`;
    # only the cotangent-side products use this tier. Gradient noise
    # tolerance differs from primal tolerance, so this can be dropped to
    # "default" (1-pass bf16) independently if measurement supports it.
    bwd_precision: str = ""
    # Fold the PE encode + its Jacobian INTO the fused train kernels
    # (kernels/mlp_train.py): the HBM streams shrink from d0_pad rows to 8
    # raw-point rows each way and the step's XLA-side PE fusions disappear.
    # Bit-compatible with the host path up to f32 sin/cos rounding.
    # Default ON per measurement (parity_results/bench_fusepe.json): the
    # production step drops 9.41 -> 8.75 ms (+7% rays/s), weight-grad
    # relerr vs XLA autodiff 1.3e-5, 12k-cube e2e F@5mm inside the 5-seed
    # band. No-ops (auto-gated off) unless multires > 0 and d_in == 3.
    fuse_pe: bool = True
    # Carve each backward tile into this many independent sub-chains so the
    # Mosaic scheduler can overlap one sub-chain's early dots with
    # another's deeper layers (the serial-layer-chain latency experiment,
    # VERDICT r2 item 4). 1 = off. split-2 measured 8.69 vs 8.75 ms under
    # fuse_pe — inside run-to-run noise, so the default stays off.
    chain_split: int = 1
    # HOW the chain_split sub-chains are scheduled inside the kernel body:
    # "seq" runs each sub-chain to completion before the next (the r2/r4
    # experiment — measured noise, the scheduler does not overlap whole
    # chains), "interleave" loop-interchanges to layer-major order (for
    # every layer, issue all K sub-tiles' dots back-to-back) so consecutive
    # MXU passes are data-INDEPENDENT and the serial layer chain's
    # inter-pass latency — the measured residual vs the matmul-only floor
    # (BASELINE.md floor statement) — can hide behind real work. No-op at
    # chain_split=1. Numerics: the same dots on the same operands, only
    # issue/accumulation order changes, so weight grads agree with "seq"
    # to f32 accumulation roundoff (tested).
    chain_mode: str = "seq"
    # Memoize the backward kernel's re-derived activations (sigmoid(100 z)
    # is consumed ~6x and softplus(100 z) 2x per layer per tile; the z-only
    # residual scheme re-derives them on demand, a VMEM-for-VPU trade made
    # under Mosaic's old 16 MiB scoped-VMEM default). With the raised
    # 100 MiB ceiling the cached copies fit (+~14 MB at tile 1024), values
    # are bit-identical (same expression, computed once), and only the
    # VPU-vs-VMEM balance can move. Measured on the TPU before flipping.
    cache_acts: bool = False
    # Pallas train-kernel point-tile sizes; 0 = auto (1024 fwd,
    # min(512, tile_fwd) bwd — or 1024 bwd under fuse_pe, where the
    # (fuse_pe, tile_bwd=1024) pair measured fastest; see the kernel
    # docstring's sweep numbers). Conf-settable for per-shape retuning.
    tile_fwd: int = 0
    tile_bwd: int = 0

    @classmethod
    def from_conf(cls, conf) -> "UDFConfig":
        return cls(
            precision=conf.get_string("precision", "high"),
            bwd_precision=conf.get_string("bwd_precision", ""),
            pallas_train=conf.get_string("pallas_train", "auto"),
            fuse_pe=conf.get_bool("fuse_pe", True),
            chain_split=conf.get_int("chain_split", 1),
            chain_mode=conf.get_string("chain_mode", "seq"),
            cache_acts=conf.get_bool("cache_acts", False),
            tile_fwd=conf.get_int("tile_fwd", 0),
            tile_bwd=conf.get_int("tile_bwd", 0),
            d_in=conf.get_int("d_in", 3),
            d_out=conf.get_int("d_out", 1),
            d_hidden=conf.get_int("d_hidden", 256),
            n_layers=conf.get_int("n_layers", 8),
            skip_in=tuple(conf.get_list("skip_in", [4])),
            multires=conf.get_int("multires", 0),
            bias=conf.get_float("bias", 0.5),
            scale=conf.get_float("scale", 1.0),
            geometric_init=conf.get_bool("geometric_init", True),
            weight_norm=conf.get_bool("weight_norm", True),
            udf_type=conf.get_string("udf_type", "abs"),
        )

    @property
    def dims(self) -> tuple:
        d0 = pe_dim(self.multires, self.d_in) if self.multires > 0 else self.d_in
        return (d0,) + (self.d_hidden,) * self.n_layers + (self.d_out,)

    def layer_shapes(self):
        """Yield (layer_index, in_dim, out_dim) honoring skip shrinkage."""
        dims = self.dims
        for l in range(len(dims) - 1):
            out_dim = dims[l + 1]
            if (l + 1) in self.skip_in:
                out_dim -= dims[0]
            yield l, dims[l], out_dim


def init_udf_params(key: jax.Array, cfg: UDFConfig) -> Params:
    """Geometric initialization (reference udf_model.py:47-71)."""
    dims = cfg.dims
    d0 = dims[0]
    n_linear = len(dims) - 1
    params: Params = {}
    keys = jax.random.split(key, n_linear)
    for (l, in_dim, out_dim), k in zip(cfg.layer_shapes(), keys):
        if cfg.geometric_init:
            if l == n_linear - 1:  # last layer
                w = jnp.sqrt(jnp.pi) / jnp.sqrt(in_dim) + 1e-4 * jax.random.normal(
                    k, (out_dim, in_dim)
                )
                b = jnp.full((out_dim,), -cfg.bias)
            elif cfg.multires > 0 and l == 0:
                w3 = jax.random.normal(k, (out_dim, 3)) * (
                    jnp.sqrt(2.0) / jnp.sqrt(out_dim)
                )
                w = jnp.concatenate(
                    [w3, jnp.zeros((out_dim, in_dim - 3))], axis=1
                )
                b = jnp.zeros((out_dim,))
            elif cfg.multires > 0 and l in cfg.skip_in:
                w = jax.random.normal(k, (out_dim, in_dim)) * (
                    jnp.sqrt(2.0) / jnp.sqrt(out_dim)
                )
                # zero the PE-frequency part of the concatenated skip input
                w = w.at[:, -(d0 - 3) :].set(0.0)
                b = jnp.zeros((out_dim,))
            else:
                w = jax.random.normal(k, (out_dim, in_dim)) * (
                    jnp.sqrt(2.0) / jnp.sqrt(out_dim)
                )
                b = jnp.zeros((out_dim,))
        else:
            # torch nn.Linear default init (kaiming-uniform)
            bound = 1.0 / np.sqrt(in_dim)
            kw, kb = jax.random.split(k)
            w = jax.random.uniform(
                kw, (out_dim, in_dim), minval=-np.sqrt(6.0 / in_dim) / np.sqrt(2.0),
                maxval=np.sqrt(6.0 / in_dim) / np.sqrt(2.0),
            )
            b = jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound)

        layer: Params = {"b": b.astype(jnp.float32)}
        if cfg.weight_norm:
            g = jnp.linalg.norm(w, axis=1)  # per-row norm, torch weight_norm dim=0
            layer["g"] = g.astype(jnp.float32)
            layer["v"] = w.astype(jnp.float32)
        else:
            layer["w"] = w.astype(jnp.float32)
        params[f"lin{l}"] = layer
    return params


def _effective_weight(layer: Params) -> jnp.ndarray:
    if "g" in layer:
        v = layer["v"]
        vn = jnp.linalg.norm(v, axis=1, keepdims=True)
        return layer["g"][:, None] * v / vn
    return layer["w"]


def _softplus100(x: jnp.ndarray) -> jnp.ndarray:
    # Softplus with beta=100 (reference udf_model.py:78), numerically stable.
    return jax.nn.softplus(x * 100.0) / 100.0


def _udf_head(x: jnp.ndarray, udf_type: str) -> jnp.ndarray:
    if udf_type == "abs":
        return jnp.abs(x)
    if udf_type == "square":
        return x**2
    if udf_type == "sdf":
        return x
    raise ValueError(f"unknown udf_type {udf_type!r}")


def apply_udf(
    params: Params, pts: jnp.ndarray, cfg: UDFConfig
) -> jnp.ndarray:
    """pts: (..., 3) -> (..., d_out) where channel 0 is the UDF value.

    Mirrors UDFNetwork.forward (reference udf_model.py:90-110).
    """
    prec = jax.lax.Precision(cfg.precision)
    inputs = pts * cfg.scale
    if cfg.multires > 0:
        inputs = positional_encoding(inputs, cfg.multires)
    x = inputs
    n_linear = len(cfg.dims) - 1
    for l in range(n_linear):
        if l in cfg.skip_in:
            x = jnp.concatenate([x, inputs], axis=-1) / jnp.sqrt(2.0).astype(
                x.dtype
            )
        layer = params[f"lin{l}"]
        w = _effective_weight(layer)
        x = (
            jnp.dot(x, w.T, precision=prec)
            + layer["b"]
        )
        if l < n_linear - 1:
            x = _softplus100(x)
    head = _udf_head(x[..., :1], cfg.udf_type) / cfg.scale
    return jnp.concatenate([head, x[..., 1:]], axis=-1)


def udf_value(params: Params, pts: jnp.ndarray, cfg: UDFConfig) -> jnp.ndarray:
    """pts: (..., 3) -> (...,) UDF values."""
    return apply_udf(params, pts, cfg)[..., 0]


def udf_gradient(params: Params, pts: jnp.ndarray, cfg: UDFConfig) -> jnp.ndarray:
    """Per-point spatial gradient d udf / d pts, shape (..., 3).

    Single batched reverse pass via grad-of-sum (outputs are independent per
    point), replacing torch.autograd.grad(create_graph=True)
    (reference udf_model.py:121-135). jax.grad differentiates through this for
    the eikonal term's double backprop.
    """
    return jax.grad(lambda p: udf_value(params, p, cfg).sum())(pts)


def udf_value_and_gradient(
    params: Params, pts: jnp.ndarray, cfg: UDFConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused value+gradient: one forward, one reverse."""
    vals, vjp_fn = jax.vjp(lambda p: udf_value(params, p, cfg), pts)
    (grads,) = vjp_fn(jnp.ones_like(vals))
    return vals, grads
