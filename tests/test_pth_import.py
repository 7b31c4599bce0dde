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


def test_import_torch_free_reader(reference_style_ckpt):
    """The pure zipfile+pickle fallback must parse torch's zip format."""
    path, expected_w = reference_style_ckpt
    raw = pth_import._torch_free_load(path)
    udf = pth_import._convert_udf_state(raw["udf_network_fine"])
    g, v = udf["lin0"]["g"], udf["lin0"]["v"]
    w = g[:, None] * v / np.linalg.norm(v, axis=1, keepdims=True)
    np.testing.assert_allclose(w, expected_w, rtol=1e-6)
    assert int(raw["iter_step"]) == 777
