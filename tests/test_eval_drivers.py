"""Eval driver integration: run eval_abc / eval_dtu over synthetic
predictions + ground-truth directory layouts matching the real datasets."""

import json
import os

import numpy as np
import pytest

from emap_tpu.eval import eval_abc, eval_dtu
from emap_tpu.utils.ply import write_ply_points


@pytest.fixture
def abc_layout(tmp_path):
    """Mini ABC-NEF layout: exp dir with parametric_edges.json + groundtruth
    dir with obj / chunk_0000_feats.json / chunk_0000_stats.json."""
    scan = "00000042"
    # --- prediction: one unit line, in the normalized [0,1]-ish frame ---
    exp_dir = tmp_path / "exp" / scan / "emap" / "results"
    exp_dir.mkdir(parents=True)
    pred = {
        "curves_ctl_pts": [],
        # the GT edge below normalizes to (0,0.5,0.5)-(1,0.5,0.5)
        "lines_end_pts": [[0.0, 0.5, 0.5, 1.0, 0.5, 0.5]],
    }
    (exp_dir / "parametric_edges.json").write_text(json.dumps(pred))

    # --- ground truth: CAD bbox [0,2]^1 x [0,2] x [0,2], one sharp line ---
    gt_dir = tmp_path / "dataset" / "groundtruth"
    (gt_dir / "obj").mkdir(parents=True)
    obj_lines = ["v 0 1 1", "v 2 1 1"]
    (gt_dir / "obj" / f"{scan}_model.obj").write_text("\n".join(obj_lines))
    feats = {
        scan: [
            {"type": "Line", "sharp": True, "vert_indices": [0, 1]},
        ]
    }
    (gt_dir / "chunk_0000_feats.json").write_text(json.dumps(feats))
    stats = {scan: {"bbox": [0, 0, 0, 2, 2, 2, 2, 2, 2]}}
    (gt_dir / "chunk_0000_stats.json").write_text(json.dumps(stats))

    scan_list = tmp_path / "scans.txt"
    scan_list.write_text(scan + "\n")
    return tmp_path, scan_list


def test_eval_abc_driver(abc_layout, capsys):
    root, scan_list = abc_layout
    metrics, totals = eval_abc.main(
        base_dir=str(root / "exp"),
        dataset_dir=str(root / "dataset"),
        exp_name="emap",
        scan_list=str(scan_list),
    )
    # prediction coincides with GT: near-zero chamfer, perfect scores
    assert metrics["chamfer"] < 0.01
    assert metrics["fscore_0.01"] == pytest.approx(1.0)
    assert metrics["precision_0.005"] > 0.95
    assert totals["line"]["num_gt_total"] > 0
    out = capsys.readouterr().out
    assert "F-Score @ 5 mm" in out


def test_eval_dtu_driver(tmp_path, capsys):
    scan = "scan999"
    exp_dir = tmp_path / "exp" / scan / "emap" / "results"
    exp_dir.mkdir(parents=True)
    pred = {
        "curves_ctl_pts": [],
        "lines_end_pts": [[0.0, 0.0, 0.0, 0.1, 0.0, 0.0]],
    }
    (exp_dir / "parametric_edges.json").write_text(json.dumps(pred))

    data_dir = tmp_path / "dataset" / "data" / scan
    data_dir.mkdir(parents=True)
    # worldtogt scales world units into "mm"
    w2g = np.diag([100.0, 100.0, 100.0, 1.0])
    (data_dir / "meta_data.json").write_text(
        json.dumps({"worldtogt": w2g.tolist()})
    )

    gt_dir = tmp_path / "dataset" / "groundtruth" / "edge_points" / scan
    gt_dir.mkdir(parents=True)
    t = np.linspace(0, 10.0, 50)[:, None]
    gt_pts = np.concatenate([t, np.zeros((50, 2))], axis=1)
    write_ply_points(str(gt_dir / "edge_points.ply"), gt_pts)

    scan_list = tmp_path / "scans.txt"
    scan_list.write_text(scan + "\n")

    precision, recall = eval_dtu.main(
        base_dir=str(tmp_path / "exp"),
        dataset_dir=str(tmp_path / "dataset"),
        exp_name="emap",
        threshold=5.0,
        scan_list=str(scan_list),
    )
    assert precision[0] == pytest.approx(1.0)
    assert recall[0] > 0.9
