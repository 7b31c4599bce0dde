#!/usr/bin/env python
"""End-to-end pipeline validation on the synthetic cube-wireframe scene:
train the UDF edge field -> extract parametric edges -> score F@5/10/20mm
against the analytic wireframe GT.

This is the minimum end-to-end slice of SURVEY.md §7 (driver config #1
analog) runnable without the Google-Drive datasets. On the TPU the default
settings take a few minutes; on CPU use E2E_STEPS=300 E2E_BATCH=128.

Env knobs: E2E_STEPS (default 12000), E2E_BATCH (512), E2E_RES (96, grid
resolution for extraction), E2E_OUT (exp dir), E2E_VIEWS (24), E2E_IMG (128).

`build_conf` / `score_extraction` are importable so other drivers (e.g.
scripts/diagnose_seeds.py) run the identical schedule and protocol.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def build_conf(
    out_dir: str,
    steps: int = 12000,
    batch: int = 512,
    seed: int = 42,
    obj: str = "cube",
    n_views: int = 24,
    img: int = 128,
    thresh: float = 0.03,
    res: int = 96,
    pallas_train: str = "auto",
):
    """The production-shaped e2e conf on the synthetic scene (ABC.conf
    model/renderer dims, schedule scaled by `steps`). Builds the scene if
    missing."""
    from emap_tpu import config
    from emap_tpu.data.synthetic import make_synthetic_scene

    data_dir = os.path.join(out_dir, "data")
    make_synthetic_scene(data_dir, scan="cube000", n_views=n_views, H=img,
                         W=img, obj=obj)
    return config.Config(
        {
            "general": {
                "base_exp_dir": os.path.join(out_dir, "exp"),
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
                "end_iter": steps,
                "batch_size": batch,
                "validate_resolution_level": 2,
                "warm_up_end": min(1000, steps // 10),
                "anneal_end": min(10000, steps // 2),
                "use_white_bkgd": False,
                "save_freq": max(500, steps // 10),
                "val_freq": max(500, steps // 4),
                "report_freq": 500,
                "igr_weight": 0.1,
                "igr_ns_weight": 0.0,
                "seed": seed,
            },
            "edge_loss": {"edge_weight": 1.0, "loss_type": "mse"},
            "model": {
                "udf_network": {
                    "d_out": 1, "d_in": 3, "d_hidden": 256, "n_layers": 8,
                    "skip_in": [4], "multires": 10, "bias": 0.5, "scale": 1.0,
                    "geometric_init": True, "weight_norm": True,
                    "udf_type": "abs",
                    "pallas_train": pallas_train,
                    # In-kernel PE encode/Jacobian (kernels/mlp_train.py
                    # fuse_pe — the r5 step lever). Default matches the
                    # shipped production default (ON); E2E_FUSE_PE=0
                    # restores the pre-flip XLA-side PE path.
                    "fuse_pe": os.environ.get("E2E_FUSE_PE", "1") == "1",
                    # Sub-chain scheduling knobs (kernels/mlp_train.py);
                    # defaults match production (split off).
                    "chain_split": int(os.environ.get("E2E_CHAIN_SPLIT",
                                                      "1")),
                    "chain_mode": os.environ.get("E2E_CHAIN_MODE", "seq"),
                },
                "variance_network": {"init_val": 0.3},
                "beta_network": {
                    "init_var_beta": 0.5, "init_var_gamma": 0.3,
                    "init_var_zeta": 0.3, "beta_min": 0.00005,
                    "requires_grad_beta": True, "requires_grad_gamma": True,
                    "requires_grad_zeta": False,
                },
                "udf_renderer": {
                    "n_samples": 64, "n_importance": 50, "n_outside": 0,
                    "up_sample_steps": 5, "perturb": 1.0,
                    "sdf2alpha_type": "numerical",
                    "upsampling_type": "classical",
                    "use_unbias_render": True,
                    # E2E_FIELD_PREC: "" (default) reproduces the recorded
                    # 5-seed e2e rows bit-exactly (train query at the model
                    # tier, pre-r4-flip); set "default" to run the r4
                    # production tier (bf16 train-path query).
                    "field_precision": os.environ.get("E2E_FIELD_PREC", ""),
                },
            },
            "edge_extraction": {
                "is_pointshift": True, "iters": 2, "is_linedirection": True,
                "udf_threshold": thresh, "resolution": res,
                "sampling_delta": 0.005, "sampling_N": 50,
                "visible_checking": False,
            },
        }
    )


def score_extraction(base_exp_dir: str, edge_dict: dict, obj: str) -> dict:
    """Score a finished extraction against the analytic wireframe GT with
    the unchanged ABC protocol (sample-every-5mm + 256^3 downsample)."""
    from emap_tpu.data.synthetic import (
        sample_cube_edge_points,
        sample_ring_edge_points,
    )
    from emap_tpu.eval.metrics import (
        chamfer_distance,
        compute_precision_recall_iou,
        downsample_point_cloud_average,
        get_pred_points_and_directions,
    )

    json_path = os.path.join(base_exp_dir, "results",
                             "parametric_edges.json")
    curve_pts, line_pts, _, _ = get_pred_points_and_directions(json_path)
    pred = np.concatenate(
        [np.asarray(curve_pts).reshape(-1, 3),
         np.asarray(line_pts).reshape(-1, 3)]
    )
    pred = downsample_point_cloud_average(
        pred.astype(np.float32), 256, [-1, -1, -1], [1, 1, 1]
    )
    gt = (sample_ring_edge_points(0.5, spacing=0.005) if obj == "rings"
          else sample_cube_edge_points(0.5, spacing=0.005))
    metrics = {
        f"{name}_{t}": []
        for name in ("precision", "recall", "fscore", "IOU")
        for t in (0.005, 0.01, 0.02)
    }
    chamfer, acc, comp = chamfer_distance(pred, gt)
    compute_precision_recall_iou(pred, gt, metrics, [0.005, 0.01, 0.02],
                                 "all")
    return {
        "chamfer": round(chamfer, 5),
        "acc": round(acc, 5),
        "comp": round(comp, 5),
        **{k: round(v[0], 4) for k, v in metrics.items()},
        "n_lines": len(edge_dict["lines_end_pts"]),
        "n_curves": len(edge_dict["curves_ctl_pts"]),
    }


def main() -> dict:
    import logging

    logging.basicConfig(
        level=logging.INFO,
        format="[%(filename)s:%(lineno)s] %(message)s",
    )
    from emap_tpu.train.runner import Runner

    steps = int(os.environ.get("E2E_STEPS", "12000"))
    batch = int(os.environ.get("E2E_BATCH", "512"))
    res = int(os.environ.get("E2E_RES", "96"))
    thresh = float(os.environ.get("E2E_THRESH", "0.03"))
    n_views = int(os.environ.get("E2E_VIEWS", "24"))
    img = int(os.environ.get("E2E_IMG", "128"))
    obj = os.environ.get("E2E_OBJ", "cube")
    out_dir = os.environ.get("E2E_OUT", tempfile.mkdtemp(prefix="emap_e2e_"))

    conf = build_conf(
        out_dir, steps=steps, batch=batch,
        seed=int(os.environ.get("E2E_SEED", "42")), obj=obj,
        n_views=n_views, img=img, thresh=thresh, res=res,
        pallas_train=os.environ.get("E2E_PALLAS_TRAIN", "auto"),
    )

    runner = Runner(conf, mode="train")
    runner.train()
    runner.save_checkpoint(0.0)  # force-save final weights for extraction
    runner.best_loss = 1.0

    # E2E_AUTO_THRESH="0.02 0.03 0.04 0.05" switches on the GT-free
    # threshold selector (extract/autothresh.py); empty (default) keeps the
    # recorded fixed-threshold protocol.
    auto = [float(t) for t in os.environ.get("E2E_AUTO_THRESH", "").split()]
    edge_dict = runner.extract_edge(
        resolution=res,
        udf_threshold=thresh,
        sampling_N=50,
        sampling_delta=0.005,
        is_pointshift=True,
        iters=2,
        is_linedirection=True,
        visible_checking=False,
        auto_threshold=auto,
    )

    result = {
        **score_extraction(runner.base_exp_dir, edge_dict, obj),
        "out_dir": out_dir,
        "steps": steps,
    }
    if auto:
        with open(os.path.join(runner.base_exp_dir, "results",
                               "threshold_selection.json")) as f:
            result["picked_threshold"] = json.load(f)["picked"]
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
