"""Oracle parity for fields/rendering_net.py vs the reference
RenderingNetwork (src/models/udf_model.py:138-209) — VERDICT r2 item 7.

The EMAP pipeline never instantiates this net (edge appearance is the
constant 1), but it is part of the model surface, so it gets the same
torch-oracle treatment as the UDF field: identical weights must produce
matching colors in every mode.

Note the reference's "idr" mode concatenates [points, view_dirs, normals,
-normals, features] (12 + d_feature inputs), which is inconsistent with the
shipped conf's `d_in = 9` — instantiating it with d_in=9 would crash. The
oracle tests therefore use dimension-consistent d_in per mode (12 / 9 / 6);
our implementation reproduces the same concatenation so the latent
inconsistency is shared, not fixed.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emap_tpu.fields.rendering_net import (
    RenderingNetConfig,
    apply_rendering_net,
    init_rendering_params,
)


def _reference_cls():
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch unavailable")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from src.models.udf_model import RenderingNetwork
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference import failed: {exc}")
    return RenderingNetwork


def _torch_params_to_pytree(net, cfg: RenderingNetConfig) -> dict:
    """Map torch weight-norm parametrization (original0=g[:,1], original1=v)
    onto our {g, v, b} pytree layout."""
    params = {}
    for l in range(len(cfg.dims) - 1):
        lin = getattr(net, f"lin{l}")
        layer = {"b": jnp.asarray(lin.bias.detach().numpy())}
        if cfg.weight_norm:
            layer["g"] = jnp.asarray(
                lin.parametrizations.weight.original0.detach().numpy()[:, 0]
            )
            layer["v"] = jnp.asarray(
                lin.parametrizations.weight.original1.detach().numpy()
            )
        else:
            layer["w"] = jnp.asarray(lin.weight.detach().numpy())
        params[f"lin{l}"] = layer
    return params


CASES = [
    # (mode, d_in, multires_view, weight_norm, squeeze_out)
    ("idr", 12, 0, True, True),
    ("idr", 12, 4, True, False),
    ("no_view_dir", 9, 0, True, True),
    ("no_normal", 6, 4, False, True),
]


class TestRenderingNetOracle:
    @pytest.mark.parametrize(
        "mode,d_in,multires_view,weight_norm,squeeze_out", CASES
    )
    def test_matches_reference(
        self, rng, mode, d_in, multires_view, weight_norm, squeeze_out
    ):
        import torch

        RenderingNetwork = _reference_cls()
        cfg = RenderingNetConfig(
            d_feature=32,
            mode=mode,
            d_in=d_in,
            d_out=3,
            d_hidden=48,
            n_layers=3,
            weight_norm=weight_norm,
            multires_view=multires_view,
            squeeze_out=squeeze_out,
        )
        torch.manual_seed(0)
        net = RenderingNetwork(
            d_feature=cfg.d_feature,
            mode=mode,
            d_in=d_in,
            d_out=3,
            d_hidden=48,
            n_layers=3,
            weight_norm=weight_norm,
            multires_view=multires_view,
            squeeze_out=squeeze_out,
        )
        params = _torch_params_to_pytree(net, cfg)

        n = 64
        points = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        normals = rng.standard_normal((n, 3)).astype(np.float32)
        view_dirs = rng.standard_normal((n, 3)).astype(np.float32)
        feats = rng.standard_normal((n, cfg.d_feature)).astype(np.float32)

        with torch.no_grad():
            theirs = net(
                torch.tensor(points),
                torch.tensor(normals),
                torch.tensor(view_dirs),
                torch.tensor(feats),
            ).numpy()
        ours = np.asarray(
            jax.jit(
                lambda p, a, b, c, d: apply_rendering_net(p, a, b, c, d, cfg)
            )(params, jnp.asarray(points), jnp.asarray(normals),
              jnp.asarray(view_dirs), jnp.asarray(feats))
        )
        np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)

    def test_normals_stop_gradient_matches_detach(self, rng):
        """The reference detaches normals (udf_model.py:183); gradients
        w.r.t. normals must be exactly zero through our apply too."""
        cfg = RenderingNetConfig(
            d_feature=8, mode="idr", d_in=12, d_hidden=16, n_layers=2
        )
        params = init_rendering_params(jax.random.key(0), cfg)
        n = 4
        pts = jnp.asarray(rng.uniform(-1, 1, size=(n, 3)).astype(np.float32))
        nrm = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
        vd = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
        ft = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))

        g = jax.jit(
            jax.grad(
                lambda nr: apply_rendering_net(params, pts, nr, vd, ft, cfg)
                .sum()
            )
        )(nrm)
        assert float(jnp.abs(g).max()) == 0.0

    def test_init_shapes_and_forward_range(self, rng):
        """init_rendering_params produces the declared dims and a sigmoid
        output in (0,1) when squeeze_out is on."""
        cfg = RenderingNetConfig(
            d_feature=16, mode="no_view_dir", d_in=9, d_hidden=32, n_layers=2
        )
        params = init_rendering_params(jax.random.key(1), cfg)
        dims = cfg.dims
        assert dims[0] == 9 + 16
        for l in range(len(dims) - 1):
            assert params[f"lin{l}"]["v"].shape == (dims[l + 1], dims[l])
        out = apply_rendering_net(
            params,
            jnp.zeros((5, 3)),
            jnp.ones((5, 3)),
            jnp.ones((5, 3)),
            jnp.zeros((5, 16)),
            cfg,
        )
        assert out.shape == (5, 3)
        assert float(out.min()) > 0.0 and float(out.max()) < 1.0
