"""Checkpoint importer tests, including the torch-free zip+pickle reader."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from emap_tpu.ckpt import pth_import  # noqa: E402


@pytest.fixture
def reference_style_ckpt(tmp_path):
    """A checkpoint shaped exactly like the reference's save_checkpoint
    (runner_udf.py:265-285), built from torch modules."""
    lin = torch.nn.Linear(4, 2)
    lin = torch.nn.utils.parametrizations.weight_norm(lin)
    udf_sd = {f"lin0.{k}": v for k, v in lin.state_dict().items()}
    ckpt = {
        "udf_network_fine": udf_sd,
        "variance_network_fine": {
            "variance": torch.tensor([0.3]),
            "second_variance": torch.tensor([0.3]),
        },
        "beta_network": {
            "beta": torch.tensor([0.5]),
            "gamma": torch.tensor([0.3]),
            "zeta": torch.tensor([0.3]),
        },
        "optimizer": {},
        "iter_step": 777,
    }
    path = str(tmp_path / "ckpt_best.pth")
    torch.save(ckpt, path)
    expected_w = lin.weight.detach().numpy()
    return path, expected_w


def _check(imported, expected_w):
    assert imported["iter_step"] == 777
    udf = imported["params"]["udf"]["lin0"]
    g, v = udf["g"], udf["v"]
    w = g[:, None] * v / np.linalg.norm(v, axis=1, keepdims=True)
    np.testing.assert_allclose(w, expected_w, rtol=1e-6)
    assert imported["params"]["variance"]["variance"].shape == (1,)
    assert float(imported["params"]["beta"]["gamma"][0]) == pytest.approx(0.3)


def test_import_with_torch(reference_style_ckpt):
    path, expected_w = reference_style_ckpt
    _check(pth_import.import_reference_checkpoint(path), expected_w)


def test_optimizer_state_roundtrip(tmp_path):
    """One resumed Adam update must match torch's post-resume update.

    Builds the reference's exact model/optimizer construction
    (runner_base.py:96-117: 3 param groups, weight-norm UDF net), steps torch
    Adam a few times so the moments are non-trivial, saves the reference
    checkpoint format, imports it, then applies ONE more update with identical
    gradients on both sides and compares every parameter leaf.
    """
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        from src.models.udf_model import (
            BetaNetwork,
            SingleVarianceNetwork,
            UDFNetwork,
        )
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"reference import failed: {exc}")

    import jax
    import jax.numpy as jnp

    from emap_tpu.train.optim import AdamState, adam_update

    torch.manual_seed(0)
    udf = UDFNetwork(
        d_out=1, d_in=3, d_hidden=16, n_layers=2, skip_in=[1], multires=2,
        bias=0.5, scale=1.0, geometric_init=True, weight_norm=True,
        udf_type="abs",
    )
    var = SingleVarianceNetwork(0.3)
    beta = BetaNetwork()
    lr, lr_geo = 5e-4, 1e-4
    opt = torch.optim.Adam(
        [
            {"params": list(udf.parameters()), "lr": lr_geo},
            {"params": list(var.parameters()) + list(beta.parameters())},
            {"params": []},
        ],
        lr=lr,
    )

    all_params = list(udf.parameters()) + list(var.parameters()) + list(
        beta.parameters()
    )
    gen = np.random.default_rng(7)
    grad_sets = [
        [gen.normal(size=p.shape).astype(np.float32) * 0.1 for p in all_params]
        for _ in range(4)
    ]
    for grads in grad_sets[:3]:
        opt.zero_grad()
        for p, g in zip(all_params, grads):
            p.grad = torch.from_numpy(g)
        opt.step()

    ckpt = {
        "udf_network_fine": udf.state_dict(),
        "variance_network_fine": var.state_dict(),
        "beta_network": beta.state_dict(),
        "optimizer": opt.state_dict(),
        "iter_step": 3,
    }
    path = str(tmp_path / "ckpt_best.pth")
    torch.save(ckpt, path)

    imported = pth_import.import_reference_checkpoint(path)
    assert imported["opt"] is not None
    params = jax.tree.map(jnp.asarray, imported["params"])
    state = AdamState(
        mu=jax.tree.map(jnp.asarray, imported["opt"]["mu"]),
        nu=jax.tree.map(jnp.asarray, imported["opt"]["nu"]),
        count=jax.tree.map(jnp.asarray, imported["opt"]["count"]),
    )
    # every leaf must have stepped 3 times
    for c in jax.tree.leaves(state.count):
        assert float(c) == 3.0

    # one more identical-gradient step on both sides
    grads4 = grad_sets[3]
    opt.zero_grad()
    for p, g in zip(all_params, grads4):
        p.grad = torch.from_numpy(g)
    opt.step()

    # map the flat torch grads onto our pytree (same order the importer uses)
    order = pth_import._param_index_order(ckpt["udf_network_fine"])
    grads_tree = jax.tree.map(jnp.zeros_like, params)
    grads_tree = jax.tree.map(lambda x: np.asarray(x), grads_tree)
    for g, pth in zip(grads4, order):
        node = grads_tree
        for p in pth[:-1]:
            node = node[p]
        node[pth[-1]] = g.reshape(node[pth[-1]].shape)
    grads_tree = jax.tree.map(jnp.asarray, grads_tree)
    lr_tree = {
        "udf": jax.tree.map(lambda _: lr_geo, params["udf"]),
        "variance": jax.tree.map(lambda _: lr, params["variance"]),
        "beta": jax.tree.map(lambda _: lr, params["beta"]),
    }
    mask_tree = jax.tree.map(lambda _: jnp.float32(1.0), params)
    new_params, _ = adam_update(params, grads_tree, state, lr_tree, mask_tree)

    torch_after = {
        "udf_network_fine": udf.state_dict(),
        "variance_network_fine": var.state_dict(),
        "beta_network": beta.state_dict(),
        "optimizer": opt.state_dict(),
        "iter_step": 4,
    }
    path2 = str(tmp_path / "after.pth")
    torch.save(torch_after, path2)
    expected = pth_import.import_reference_checkpoint(path2)["params"]

    from jax.tree_util import tree_flatten_with_path

    flat_ours, _ = tree_flatten_with_path(new_params)
    flat_ref = dict(
        tree_flatten_with_path(jax.tree.map(jnp.asarray, expected))[0]
    )
    for key, ours in flat_ours:
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(flat_ref[key]), rtol=1e-5, atol=1e-7,
            err_msg=f"leaf {key} diverged after resumed update",
        )


def test_import_torch_free_reader(reference_style_ckpt):
    """The pure zipfile+pickle fallback must parse torch's zip format."""
    path, expected_w = reference_style_ckpt
    raw = pth_import._torch_free_load(path)
    udf = pth_import._convert_udf_state(raw["udf_network_fine"])
    g, v = udf["lin0"]["g"], udf["lin0"]["v"]
    w = g[:, None] * v / np.linalg.norm(v, axis=1, keepdims=True)
    np.testing.assert_allclose(w, expected_w, rtol=1e-6)
    assert int(raw["iter_step"]) == 777
