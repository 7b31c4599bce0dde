"""IDR-style rendering (color) network.

Functional equivalent of the reference RenderingNetwork
(src/models/udf_model.py:138-209). The EMAP pipeline never instantiates it --
edge "appearance" is the constant 1 (SURVEY.md §2.1) -- but it is part of the
model surface (confs carry `model.rendering_network`), so it is provided for
API completeness and future appearance modeling.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from emap_tpu.fields.embedder import pe_dim, positional_encoding


@dataclasses.dataclass(frozen=True)
class RenderingNetConfig:
    d_feature: int = 256
    mode: str = "idr"  # idr | no_view_dir | no_normal
    d_in: int = 9
    d_out: int = 3
    d_hidden: int = 256
    n_layers: int = 4
    weight_norm: bool = True
    multires_view: int = 0
    squeeze_out: bool = True

    @classmethod
    def from_conf(cls, conf) -> "RenderingNetConfig":
        return cls(
            d_feature=conf.get_int("d_feature", 256),
            mode=conf.get_string("mode", "idr"),
            d_in=conf.get_int("d_in", 9),
            d_out=conf.get_int("d_out", 3),
            d_hidden=conf.get_int("d_hidden", 256),
            n_layers=conf.get_int("n_layers", 4),
            weight_norm=conf.get_bool("weight_norm", True),
            multires_view=conf.get_int("multires_view", 0),
            squeeze_out=conf.get_bool("squeeze_out", True),
        )

    @property
    def dims(self) -> tuple:
        d0 = self.d_in + self.d_feature
        if self.multires_view > 0 and self.mode != "no_view_dir":
            d0 += pe_dim(self.multires_view, 3) - 3
        return (d0,) + (self.d_hidden,) * self.n_layers + (self.d_out,)


def init_rendering_params(key: jax.Array, cfg: RenderingNetConfig) -> Dict:
    """torch nn.Linear default init (kaiming uniform) + weight-norm split."""
    dims = cfg.dims
    params: Dict = {}
    keys = jax.random.split(key, len(dims) - 1)
    for l, k in enumerate(keys):
        in_dim, out_dim = dims[l], dims[l + 1]
        kw, kb = jax.random.split(k)
        bound_w = np.sqrt(6.0 / in_dim) / np.sqrt(2.0)
        w = jax.random.uniform(kw, (out_dim, in_dim), minval=-bound_w, maxval=bound_w)
        b = jax.random.uniform(
            kb, (out_dim,), minval=-1 / np.sqrt(in_dim), maxval=1 / np.sqrt(in_dim)
        )
        layer = {"b": b.astype(jnp.float32)}
        if cfg.weight_norm:
            layer["g"] = jnp.linalg.norm(w, axis=1).astype(jnp.float32)
            layer["v"] = w.astype(jnp.float32)
        else:
            layer["w"] = w.astype(jnp.float32)
        params[f"lin{l}"] = layer
    return params


def apply_rendering_net(
    params: Dict,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    view_dirs: jnp.ndarray,
    feature_vectors: jnp.ndarray,
    cfg: RenderingNetConfig,
) -> jnp.ndarray:
    if cfg.multires_view > 0 and cfg.mode != "no_view_dir":
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)
    normals = jax.lax.stop_gradient(normals)

    if cfg.mode == "idr":
        x = jnp.concatenate(
            [points, view_dirs, normals, -normals, feature_vectors], axis=-1
        )
    elif cfg.mode == "no_view_dir":
        x = jnp.concatenate([points, normals, -normals, feature_vectors], axis=-1)
    elif cfg.mode == "no_normal":
        x = jnp.concatenate([points, view_dirs, feature_vectors], axis=-1)
    else:
        raise ValueError(f"unknown rendering mode {cfg.mode!r}")

    n_linear = len(cfg.dims) - 1
    for l in range(n_linear):
        layer = params[f"lin{l}"]
        if "g" in layer:
            v = layer["v"]
            w = layer["g"][:, None] * v / jnp.linalg.norm(v, axis=1, keepdims=True)
        else:
            w = layer["w"]
        x = x @ w.T + layer["b"]
        if l < n_linear - 1:
            x = jax.nn.relu(x)

    color = x[..., : cfg.d_out]
    if cfg.squeeze_out:
        color = jax.nn.sigmoid(color)
    return color
