"""Runner orchestration integration test: train a few steps through the full
Runner surface, validate images, checkpoint round-trip, and extraction
artifacts -- all on a tiny synthetic scene/net."""

import json
import os

import numpy as np
import pytest

from emap_tpu import config
from emap_tpu.data import make_synthetic_scene


@pytest.fixture(scope="module")
def runner_conf(tmp_path_factory):
    root = tmp_path_factory.mktemp("runner")
    data_dir = str(root / "data")
    make_synthetic_scene(data_dir, scan="cube000", n_views=3, H=32, W=32)
    return config.Config(
        {
            "general": {
                "base_exp_dir": str(root / "exp"),
                "expname": "emap",
                "model_type": "udf",
                "recording": [],
            },
            "dataset": {
                "data_dir": data_dir,
                "scan": "cube000",
                "dataset_name": "NEF",
                "detector": "DexiNed",
                "near": 0.05,
                "far": 4.5,
            },
            "train": {
                "latest_model_name": "ckpt_best.npz",
                "importance_sample": True,
                "learning_rate": 5e-4,
                "learning_rate_geo": 1e-4,
                "learning_rate_alpha": 0.05,
                "end_iter": 10,
                "batch_size": 32,
                "validate_resolution_level": 2,
                "warm_up_end": 2,
                "anneal_end": 5,
                "use_white_bkgd": False,
                "save_freq": 5,
                "val_freq": 5,
                "report_freq": 5,
                "igr_weight": 0.1,
                "igr_ns_weight": 0.0,
            },
            "edge_loss": {"edge_weight": 1.0, "loss_type": "mse"},
            "model": {
                "udf_network": {
                    "d_out": 1, "d_in": 3, "d_hidden": 32, "n_layers": 2,
                    "skip_in": [1], "multires": 2, "bias": 0.5, "scale": 1.0,
                    "geometric_init": True, "weight_norm": True,
                    "udf_type": "abs",
                },
                "variance_network": {"init_val": 0.3},
                "beta_network": {
                    "init_var_beta": 0.5, "init_var_gamma": 0.3,
                    "init_var_zeta": 0.3, "beta_min": 0.00005,
                    "requires_grad_beta": True, "requires_grad_gamma": True,
                    "requires_grad_zeta": False,
                },
                "udf_renderer": {
                    "n_samples": 8, "n_importance": 5, "n_outside": 0,
                    "up_sample_steps": 5, "perturb": 1.0,
                    "sdf2alpha_type": "numerical",
                    "upsampling_type": "classical",
                    "use_unbias_render": True,
                },
            },
            "edge_extraction": {
                "is_pointshift": True, "iters": 1, "is_linedirection": True,
                "udf_threshold": 0.3, "resolution": 16,
                "sampling_delta": 0.01, "sampling_N": 8,
                "visible_checking": False,
            },
        }
    )


def test_runner_train_validate_checkpoint_extract(runner_conf):
    from emap_tpu.train.runner import Runner

    runner = Runner(runner_conf, mode="train")
    runner.train()
    assert int(runner.state.step) == 10

    exp = runner.base_exp_dir
    # validation artifacts
    assert len(os.listdir(os.path.join(exp, "edge_maps"))) >= 1
    assert len(os.listdir(os.path.join(exp, "normals"))) >= 1
    assert len(os.listdir(os.path.join(exp, "depths"))) >= 1
    # checkpoint saved (loss_avg computed only at 500-step cadence in the
    # reference; our runner keeps the policy, so force one here)
    runner.save_checkpoint(0.0)
    assert os.path.exists(os.path.join(exp, "checkpoints", "ckpt_best.npz"))

    # fresh runner resumes from the checkpoint
    runner2 = Runner(runner_conf, mode="train", is_continue=True)
    runner2.load_checkpoint()
    assert int(runner2.state.step) == 10

    # resumed training continues through the chained dispatch (chain=5 from
    # the 5-step cadences): 10->20 chained, then a 3-step single-step tail
    # for the non-multiple end_iter
    runner2.end_iter = 23
    runner2.train()
    assert int(runner2.state.step) == 23

    # extraction writes the reference's artifact set
    edge_dict = runner2.extract_edge(
        resolution=16, udf_threshold=0.3, sampling_N=8, sampling_delta=0.01,
        is_pointshift=True, iters=1, is_linedirection=True,
        visible_checking=False,
    )
    results = os.path.join(exp, "results")
    assert os.path.exists(
        os.path.join(results, "udf_pointcloud_withdirection.ply")
    )
    assert os.path.exists(os.path.join(results, "edge_points.ply"))
    json_path = os.path.join(results, "parametric_edges.json")
    with open(json_path) as f:
        data = json.load(f)
    assert set(data.keys()) == {"curves_ctl_pts", "lines_end_pts"}


def test_cli_trains_multidevice(runner_conf, tmp_path):
    """Production CLI path: main() must build a mesh over all 8 virtual CPU
    devices and train ray-sharded (VERDICT r1 item 2 -- previously the CLI
    constructed Runner without a mesh and could never use >1 chip)."""
    from emap_tpu import cli, config

    conf = config.Config(json.loads(json.dumps(runner_conf.as_dict())))
    conf["general"]["base_exp_dir"] = str(tmp_path / "exp_cli")
    # 10 steps with report_freq 5 -> the 5-step chained dispatch engages
    # twice UNDER the mesh (scan-of-sharded-steps is the production shape)
    conf["train"]["end_iter"] = 10
    conf["train"]["val_freq"] = 100  # skip validation for speed
    conf["train"]["save_freq"] = 100
    conf_path = tmp_path / "cli.conf"
    conf_path.write_text(conf.to_hocon())

    mesh = cli.build_mesh_from_conf(conf, conf.get_int("train.batch_size"))
    assert mesh is not None and mesh.size == 8

    cli.main(["--conf", str(conf_path), "--mode", "train"])
    exp = os.path.join(str(tmp_path / "exp_cli"), "cube000", "emap")
    assert os.path.isdir(exp)

    # conf knob disables the mesh
    conf["train"]["multi_device"] = False
    assert cli.build_mesh_from_conf(conf, 32) is None
    # batch not divisible by anything >1 -> trimmed; 30 % 8 != 0 but 30 % 6 == 0
    conf["train"]["multi_device"] = True
    m = cli.build_mesh_from_conf(conf, 30)
    assert m is not None and m.size == 6


def test_runner_validate_sharded_matches_single(runner_conf, tmp_path):
    """Validation renders identically with and without the mesh (GSPMD only
    re-partitions; numerics must not change)."""
    from emap_tpu import config
    from emap_tpu.parallel import make_mesh
    from emap_tpu.train.runner import Runner

    conf = config.Config(json.loads(json.dumps(runner_conf.as_dict())))
    conf["general"]["base_exp_dir"] = str(tmp_path / "exp_val")
    runner_s = Runner(conf, mode="validate")
    runner_m = Runner(conf, mode="validate", mesh=make_mesh(8))
    runner_s.validate(idx=0, resolution_level=2)
    runner_m.validate(idx=0, resolution_level=2)
    import cv2

    exp = runner_s.base_exp_dir
    imgs = sorted(os.listdir(os.path.join(exp, "edge_maps")))
    a = cv2.imread(os.path.join(exp, "edge_maps", imgs[0]))
    # both runners share exp dir/step/idx -> same filename; the second write
    # overwrote the first, so compare against a fresh single-device render
    runner_s.validate(idx=0, resolution_level=2)
    b = cv2.imread(os.path.join(exp, "edge_maps", imgs[0]))
    np.testing.assert_array_equal(a, b)


def test_visibility_checking_path(runner_conf):
    """visible_checking=True exercises get_edge_maps + compute_visibility."""
    import numpy as np

    from emap_tpu.extract.parametric import (
        compute_visibility,
        get_edge_maps,
        sample_primitives,
    )

    scan_dir = os.path.join(
        runner_conf["dataset.data_dir"], runner_conf["dataset.scan"]
    )
    edges, intrinsics, camtoworld, h, w = get_edge_maps(scan_dir, "DexiNed")
    assert edges.shape == (3, 32, 32)
    # a line crossing the cube should be visible; a far-away line not
    lines = np.array(
        [[-0.5, -0.5, -0.5, 0.5, -0.5, -0.5], [30, 30, 30, 31, 30, 30.0]]
    )
    _, per_curve, per_line = sample_primitives(np.zeros((0, 12)), lines)
    # NOTE: DexiNed maps are inverted inside get_edge_maps (reference quirk,
    # extract_parametric_edge.py:55-58), so visibility is checked against
    # inverted maps here -- test only that the far line is never visible.
    vis = compute_visibility(
        per_curve + per_line, edges, intrinsics, camtoworld, h, w, 0.5, 1
    )
    assert not vis[1]


def test_extract_edge_auto_threshold(runner_conf, tmp_path):
    """auto_threshold extracts every candidate, scores each against the 2D
    edge maps, writes the per-candidate table, and keeps the argmax's
    artifacts (extract/autothresh.py; no reference counterpart)."""
    from emap_tpu.train.runner import Runner

    conf = config.Config(json.loads(json.dumps(runner_conf.as_dict())))
    conf["general"]["base_exp_dir"] = str(tmp_path / "exp_auto")
    runner = Runner(conf, mode="train")
    runner.save_checkpoint(0.0)  # geometric-init field: a sphere-ish UDF

    candidates = [0.2, 0.3]
    edge_dict = runner.extract_edge(
        resolution=16, udf_threshold=99.0, sampling_N=8, sampling_delta=0.01,
        is_pointshift=True, iters=1, is_linedirection=True,
        visible_checking=False, auto_threshold=candidates,
    )
    results = os.path.join(runner.base_exp_dir, "results")
    with open(os.path.join(results, "threshold_selection.json")) as f:
        sel = json.load(f)
    assert sel["picked"] in candidates
    rows = sel["candidates"]
    assert [r["udf_threshold"] for r in rows] == candidates
    assert all(0.0 <= r["f2d"] <= 1.0 for r in rows)
    picked_row = next(r for r in rows if r["udf_threshold"] == sel["picked"])
    assert picked_row["f2d"] == max(r["f2d"] for r in rows)
    # the written parametric_edges.json is the picked candidate's
    with open(os.path.join(results, "parametric_edges.json")) as f:
        assert json.load(f) == edge_dict
    assert (
        len(edge_dict["curves_ctl_pts"]) == picked_row["n_curves"]
        and len(edge_dict["lines_end_pts"]) == picked_row["n_lines"]
    )


def test_extract_edge_fit_draws(runner_conf, tmp_path):
    """fit_draws=K re-rolls the chaotic host fit K times per threshold and
    the probe scorer picks a draw (runner.extract_edge fit_draws; measured
    basis scripts/fit_draws_diag.py). Covers both the auto_threshold x
    draws grid and the fixed-threshold best-of-K path."""
    from emap_tpu.train.runner import Runner

    conf = config.Config(json.loads(json.dumps(runner_conf.as_dict())))
    conf["general"]["base_exp_dir"] = str(tmp_path / "exp_draws")
    runner = Runner(conf, mode="train")
    runner.save_checkpoint(0.0)

    # grid mode: 2 thresholds x 2 draws
    edge_dict = runner.extract_edge(
        resolution=16, udf_threshold=0.2, sampling_N=8, sampling_delta=0.01,
        is_pointshift=True, iters=1, is_linedirection=True,
        visible_checking=False, auto_threshold=[0.2, 0.3], fit_draws=2,
    )
    results = os.path.join(runner.base_exp_dir, "results")
    with open(os.path.join(results, "threshold_selection.json")) as f:
        sel = json.load(f)
    rows = sel["candidates"]
    assert [(r["udf_threshold"], r["fit_seed"]) for r in rows] == [
        (0.2, 42), (0.2, 0), (0.3, 42), (0.3, 0)]
    assert sel["fit_draws"] == 2 and sel["picked_fit_seed"] in (42, 0)
    picked = [r for r in rows if r.get("picked")]
    assert len(picked) == 1
    assert picked[0]["udf_threshold"] == sel["picked"]
    assert picked[0]["fit_seed"] == sel["picked_fit_seed"]
    with open(os.path.join(results, "parametric_edges.json")) as f:
        assert json.load(f) == edge_dict

    # fixed-threshold mode: no auto_threshold, still best-of-K
    conf2 = config.Config(json.loads(json.dumps(runner_conf.as_dict())))
    conf2["general"]["base_exp_dir"] = str(tmp_path / "exp_draws_fixed")
    runner2 = Runner(conf2, mode="train")
    runner2.save_checkpoint(0.0)
    edge_dict2 = runner2.extract_edge(
        resolution=16, udf_threshold=0.2, sampling_N=8, sampling_delta=0.01,
        is_pointshift=True, iters=1, is_linedirection=True,
        visible_checking=False, auto_threshold=None, fit_draws=2,
    )
    with open(os.path.join(
            runner2.base_exp_dir, "results", "threshold_selection.json")
            ) as f:
        sel2 = json.load(f)
    assert [(r["udf_threshold"], r["fit_seed"])
            for r in sel2["candidates"]] == [(0.2, 42), (0.2, 0)]
    assert sel2["picked"] == 0.2
    with open(os.path.join(
            runner2.base_exp_dir, "results", "parametric_edges.json")) as f:
        assert json.load(f) == edge_dict2


def test_extract_edge_auto_threshold_half_trained(runner_conf, tmp_path):
    """Adversarial selector stress (VERDICT r2 item 5): a half-trained field
    (10 steps — far from converged, zero set still sphere-dominated) must
    flow through the full selector path end-to-end: every candidate
    extracted and scored, the table written, and the picked candidate's
    artifacts kept. This is the CLI reality the conf-default flip exposes."""
    from emap_tpu.train.runner import Runner

    conf = config.Config(json.loads(json.dumps(runner_conf.as_dict())))
    conf["general"]["base_exp_dir"] = str(tmp_path / "exp_auto_half")
    runner = Runner(conf, mode="train")
    runner.train()  # end_iter = 10
    runner.best_loss = 1.0
    runner.save_checkpoint(0.0)

    candidates = [0.1, 0.2, 0.3]
    edge_dict = runner.extract_edge(
        resolution=16, udf_threshold=99.0, sampling_N=8, sampling_delta=0.01,
        is_pointshift=True, iters=1, is_linedirection=True,
        visible_checking=False, auto_threshold=candidates,
    )
    results = os.path.join(runner.base_exp_dir, "results")
    with open(os.path.join(results, "threshold_selection.json")) as f:
        sel = json.load(f)
    assert sel["picked"] in candidates
    assert [r["udf_threshold"] for r in sel["candidates"]] == candidates
    picked_row = next(
        r for r in sel["candidates"] if r["udf_threshold"] == sel["picked"]
    )
    assert (
        len(edge_dict["curves_ctl_pts"]) == picked_row["n_curves"]
        and len(edge_dict["lines_end_pts"]) == picked_row["n_lines"]
    )


def test_extract_edge_auto_threshold_empty_probe(runner_conf, tmp_path,
                                                 monkeypatch):
    """A field with no certified zero set (empty probe) must fall back to
    2D-only ranking instead of a degenerate all-zero f3d tie."""
    import numpy as np

    from emap_tpu.extract import autothresh
    from emap_tpu.train.runner import Runner

    conf = config.Config(json.loads(json.dumps(runner_conf.as_dict())))
    conf["general"]["base_exp_dir"] = str(tmp_path / "exp_auto_noprobe")
    runner = Runner(conf, mode="train")
    runner.save_checkpoint(0.0)

    monkeypatch.setattr(
        autothresh, "build_probe_points",
        lambda *a, **k: np.zeros((0, 3), np.float32),
    )
    runner.extract_edge(
        resolution=16, udf_threshold=99.0, sampling_N=8, sampling_delta=0.01,
        is_pointshift=True, iters=1, is_linedirection=True,
        auto_threshold=[0.2, 0.3],
    )
    results = os.path.join(runner.base_exp_dir, "results")
    with open(os.path.join(results, "threshold_selection.json")) as f:
        sel = json.load(f)
    assert sel["picked"] in (0.2, 0.3)
    assert all("f3d" not in r for r in sel["candidates"])


def test_pinned_model_precision_governs_train_field_tier(runner_conf):
    """An explicitly pinned model.udf_network.precision is the one-knob f32
    escape hatch: it must override the conf-default bf16 train-path
    field_precision unless the conf pins field_precision itself."""
    import copy

    from emap_tpu.train.runner import Runner

    # no precision keys anywhere -> conf-driven production default (bf16)
    runner = Runner(runner_conf, mode="validate")
    assert runner.rcfg.field_precision == "default"

    # pinned model tier, no field_precision -> inherit the pinned tier
    conf = copy.deepcopy(runner_conf)
    conf["model.udf_network.precision"] = "highest"
    runner = Runner(conf, mode="validate")
    assert runner.rcfg.field_precision == ""
    assert runner.ucfg.precision == "highest"

    # both pinned -> field_precision wins for the train path
    conf["model.udf_renderer.field_precision"] = "default"
    runner = Runner(conf, mode="validate")
    assert runner.rcfg.field_precision == "default"


def test_extract_edge_platform_pin(runner_conf, tmp_path):
    """edge_extraction.platform pins every extraction field query to a
    canonical jax backend via jax.default_device (no reference counterpart
    — the reference is single-platform, extract_pointcloud.py:36-88).
    Measured on the axon TPU session: platform="cpu" reproduces a pure-CPU
    process bitwise (BASELINE.md cross-platform section); here (CPU test
    env) we pin the wiring: same artifacts, and pallas_available() must
    report the EFFECTIVE default device inside the context."""
    import jax

    from emap_tpu.kernels.mlp_query import pallas_available
    from emap_tpu.train.runner import Runner

    conf = config.Config(json.loads(json.dumps(runner_conf.as_dict())))
    conf["general"]["base_exp_dir"] = str(tmp_path / "exp_pin")
    runner = Runner(conf, mode="train")
    runner.save_checkpoint(0.0)  # geometric-init field: a sphere-ish UDF

    kwargs = dict(
        resolution=16, udf_threshold=0.3, sampling_N=8, sampling_delta=0.01,
        is_pointshift=True, iters=1, is_linedirection=True,
        visible_checking=False,
    )
    ref = runner.extract_edge(**kwargs)
    pinned = runner.extract_edge(**kwargs, platform="cpu")
    assert pinned == ref  # CPU session: pin is the identity, end to end

    with jax.default_device(jax.devices("cpu")[0]):
        assert pallas_available() is False

    with pytest.raises(RuntimeError):
        runner.extract_edge(**kwargs, platform="nonexistent-backend")
