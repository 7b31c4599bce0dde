#!/usr/bin/env python
"""DTU-conf over-extraction control: torch reference vs this rebuild
(VERDICT r2 item 2b).

The full 200k DTU-conf run on the synthetic stand-in scored F@5mm 0.326
with 395 lines + 246 curves over-extracted, attributed to a conf-vs-scene
mismatch (the DTU-tuned extraction hyperparams applied to a scene the ABC
conf scores 0.762 on). That claim had no reference-side control. This
script trains the TORCH REFERENCE (and optionally our side) on the same
stand-in with a DTU-flavored schedule, then scores BOTH through the DTU
conf's own extraction protocol (/root/reference/confs/DTU.conf:119-127:
resolution 256, udf_threshold 0.015, pointshift iters 1,
visible_checking true; PidiNet detector, igr_weight 0.01
/root/reference/confs/DTU.conf:47) — if the reference over-extracts the
same way, the mismatch is a property of the conf, not of the rebuild.

Training is the parity-scaled harness (8k iters x 256 rays, 64x4 MLP,
multires 6 — scripts/parity_reference.py rationale: the torch reference
manages ~2.6 rays/s at the full config on this 1-core CPU host), with the
DTU deltas applied on top: igr_weight 0.01 + PidiNet edges. Only the
extraction protocol is DTU-verbatim, which is the hyperparam set the
over-extraction claim is about.

Usage:
    python scripts/dtu_control.py ref          # train torch ref (CPU, ~1 h)
    python scripts/dtu_control.py ours         # train our side
    python scripts/dtu_control.py score ref    # DTU-protocol extract+score
    python scripts/dtu_control.py score ours

Env: DTUC_OUT (./dtu_control), PARITY_SEED (42), DTUC_THRESHOLDS
("" = fixed 0.015 only; else a list to also run the selector, e.g.
"0.01 0.015 0.02 0.03").
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.abspath(os.environ.get("DTUC_OUT", "./dtu_control"))
# parity-scaled schedule, set BEFORE importing parity_reference (it reads
# env at import)
os.environ.setdefault("PARITY_OUT", OUT)
os.environ.setdefault("PARITY_STEPS", "8000")
os.environ.setdefault("PARITY_BATCH", "256")
os.environ.setdefault("PARITY_IMG", "128")
os.environ.setdefault("PARITY_VIEWS", "24")

import parity_reference as pr  # noqa: E402

# DTU extraction protocol (confs/DTU.conf:119-127)
DTU_EXTRACTION = {
    "resolution": 256,
    "udf_threshold": 0.015,
    "iters": 1,
    "visible_checking": True,
}


def _dtu_conf(side: str) -> dict:
    d = _orig_shared_conf(side)
    d["dataset"]["detector"] = "PidiNet"
    d["train"]["igr_weight"] = 0.01  # confs/DTU.conf:47
    d["edge_extraction"].update(DTU_EXTRACTION)
    return d


_orig_shared_conf = pr.shared_conf_dict
pr.shared_conf_dict = _dtu_conf


def ensure_scene() -> None:
    from emap_tpu.data.synthetic import make_synthetic_scene

    scan_dir = os.path.join(OUT, "data", "cube000")
    if not os.path.isfile(os.path.join(scan_dir, "meta_data.json")):
        make_synthetic_scene(
            os.path.join(OUT, "data"), scan="cube000", n_views=24,
            H=128, W=128, detector="PidiNet",
        )


pr.ensure_scene = ensure_scene


def score_side_dtu(side: str) -> dict:
    """Extract through the DTU conf's own protocol and score vs cube GT."""
    import numpy as np

    from emap_tpu import config
    from emap_tpu.data.synthetic import sample_cube_edge_points
    from emap_tpu.eval.metrics import (
        chamfer_distance,
        compute_precision_recall_iou,
        downsample_point_cloud_average,
        get_pred_points_and_directions,
    )
    from emap_tpu.train.runner import Runner

    ckpt = (os.path.join(OUT, "ref_final.pth") if side == "ref"
            else "ckpt_best.npz")
    conf = config.Config(pr.shared_conf_dict(side))
    conf["train.latest_model_name"] = ckpt
    runner = Runner(conf, mode="extract_edge")
    thresholds = [float(t) for t in
                  os.environ.get("DTUC_THRESHOLDS", "").split()]
    edge_dict = runner.extract_edge(
        udf_threshold=DTU_EXTRACTION["udf_threshold"],
        resolution=DTU_EXTRACTION["resolution"],
        iters=DTU_EXTRACTION["iters"],
        visible_checking=DTU_EXTRACTION["visible_checking"],
        sampling_N=50, sampling_delta=0.005,
        is_pointshift=True, is_linedirection=True,
        auto_threshold=thresholds or None,
    )
    json_path = os.path.join(
        runner.base_exp_dir, "results", "parametric_edges.json"
    )
    curve_pts, line_pts, _, _ = get_pred_points_and_directions(json_path)
    pred = np.concatenate(
        [np.asarray(curve_pts).reshape(-1, 3),
         np.asarray(line_pts).reshape(-1, 3)]
    )
    pred = downsample_point_cloud_average(
        pred.astype(np.float32), 256, [-1, -1, -1], [1, 1, 1]
    )
    gt = sample_cube_edge_points(0.5, spacing=0.005)
    metrics = {
        f"{name}_{t}": []
        for name in ("precision", "recall", "fscore", "IOU")
        for t in (0.005, 0.01, 0.02)
    }
    chamfer, acc, comp = chamfer_distance(pred, gt)
    compute_precision_recall_iou(pred, gt, metrics, [0.005, 0.01, 0.02],
                                 "all")
    row = {
        "side": side,
        "protocol": DTU_EXTRACTION,
        "auto_threshold": thresholds,
        "chamfer": round(chamfer, 5),
        **{k: round(v[0], 4) for k, v in metrics.items()},
        "n_lines": len(edge_dict["lines_end_pts"]),
        "n_curves": len(edge_dict["curves_ctl_pts"]),
        "seed": pr.SEED,
    }
    out_path = os.path.join(OUT, f"score_dtu_{side}.json")
    with open(out_path, "w") as f:
        json.dump(row, f, indent=1)
    print(json.dumps(row))
    return row


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "ref"
    os.makedirs(OUT, exist_ok=True)
    if cmd == "ref":
        pr.run_reference()
    elif cmd == "ours":
        pr.run_ours()
    elif cmd == "score":
        score_side_dtu(sys.argv[2] if len(sys.argv) > 2 else "ref")
    else:
        raise SystemExit(f"unknown command {cmd!r}")
