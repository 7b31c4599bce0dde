"""GT-free extraction-threshold selection via multi-view 2D edge consistency.

The weak-seed tail of the e2e F@5mm distribution is extraction-side: F@5mm
swings +-0.15-0.2 within a single trained checkpoint as
`edge_extraction.udf_threshold` moves one notch, while the field itself is
equally good at the GT edges for every seed (BASELINE.md "Weak-seed tail
diagnosis"; the reference pins the threshold per dataset and inherits the
same fragility, reference confs + extract_parametric_edge.py:229-237).

This module removes the fragility without ground truth: extract at a few
candidate thresholds, score each candidate's fitted parametric edges purely
against the *observed 2D edge maps* (the same maps training consumed), and
keep the argmax. The score is a 2D pseudo-F:

  precision2d : fraction of projected edge-sample pixels that land within
                `match_px` of a confident 2D edge pixel — penalizes spurious
                primitives (too-loose threshold -> noise points -> phantom
                lines).
  recall2d    : fraction of confident 2D edge pixels within `match_px` of a
                projected pixel — penalizes dropped primitives (too-tight
                threshold -> holes in the point cloud -> missing edges).
  f2d         : their harmonic mean, averaged over frames.

Distance fields come from cv2.distanceTransform, so a frame costs O(HW).
Occluded 3D edges project onto non-edge pixels and depress precision2d
uniformly across candidates (the fitted geometry is near-identical up to the
fragile tail primitives), so the argmax is unaffected; points behind the
camera are excluded (the reference's visibility pass, :137-188, ignores the
z sign — here it matters, so we check it).

No reference counterpart: the reference hard-codes one threshold per dataset
(ABC 0.02, DTU 0.04, Replica 0.02). Validated on the three diagnosed 50k
checkpoints (scripts/validate_autothresh.py; table in BASELINE.md).
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from emap_tpu.data.dataset import edge_map_path, load_meta
from emap_tpu.extract.parametric import sample_primitives

EDGE_CONFIDENT = 0.5  # same "confident edge" bar as compute_visibility


def _load_edge_maps_training_convention(data_dir: str, detector: str):
    """Edge maps in the TRAINING convention (high = edge, dataset.py:111),
    NOT via parametric.get_edge_maps — that path inverts DexiNed maps to
    reproduce the reference's visibility-path inconsistency (CLAUDE.md
    quirks), which would turn this scorer's "confident edge" mask into the
    background. The scorer measures consistency with the supervision signal,
    so it must read the maps the way training did."""
    meta = load_meta(data_dir)
    h, w = int(meta["height"]), int(meta["width"])
    edges, intrinsics, camtoworld = [], [], []
    for frame in meta["frames"]:
        path = edge_map_path(data_dir, frame["rgb_path"], detector)
        edges.append(cv2.imread(path, 0).astype(np.float64) / 255.0)
        intrinsics.append(np.asarray(frame["intrinsics"], np.float64))
        camtoworld.append(np.asarray(frame["camtoworld"], np.float64)[:4, :4])
    return np.stack(edges), np.stack(intrinsics), np.stack(camtoworld), h, w


def score_edges_2d(
    edge_dict: dict,
    data_dir: str,
    detector: str,
    match_px: float = 3.0,
    sample_resolution: float = 0.005,
) -> dict:
    """2D pseudo-F of fitted parametric edges against the scene's edge maps.

    edge_dict carries 'curves_ctl_pts' / 'lines_end_pts' as produced by
    get_parametric_edge. Returns {"precision2d", "recall2d", "f2d",
    "n_frames", "n_points"} (all-zero scores for empty extractions).
    """
    edges, intrinsics, camtoworld, h, w = _load_edge_maps_training_convention(
        data_dir, detector
    )
    curves = np.asarray(edge_dict["curves_ctl_pts"], np.float64).reshape(-1, 12)
    lines = np.asarray(edge_dict["lines_end_pts"], np.float64).reshape(-1, 6)
    points, _, _ = sample_primitives(
        curves, lines, sample_resolution=sample_resolution
    )
    if len(points) == 0:
        return {
            "precision2d": 0.0, "recall2d": 0.0, "f2d": 0.0,
            "n_frames": int(len(edges)), "n_points": 0,
        }

    pts = points.astype(np.float64)
    precisions, recalls = [], []
    for edge_map, K, c2w in zip(edges, intrinsics, camtoworld):
        w2c = np.linalg.inv(c2w)
        cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
        uvz = cam @ K[:3, :3].T
        valid = uvz[:, 2] > 1e-6
        uv = np.round(uvz[valid, :2] / uvz[valid, 2:3]).astype(np.int64)
        inside = (
            (uv[:, 0] >= 0) & (uv[:, 0] < w) & (uv[:, 1] >= 0) & (uv[:, 1] < h)
        )
        uv = uv[inside]

        gt_mask = edge_map > EDGE_CONFIDENT
        if not gt_mask.any() or len(uv) == 0:
            # a frame with no confident edges or no projected points carries
            # no evidence either way
            continue
        pred_mask = np.zeros((h, w), bool)
        pred_mask[uv[:, 1], uv[:, 0]] = True

        dt_gt = cv2.distanceTransform(
            (~gt_mask).astype(np.uint8), cv2.DIST_L2, 3
        )
        dt_pred = cv2.distanceTransform(
            (~pred_mask).astype(np.uint8), cv2.DIST_L2, 3
        )
        precisions.append(float((dt_gt[pred_mask] <= match_px).mean()))
        recalls.append(float((dt_pred[gt_mask] <= match_px).mean()))

    if not precisions:
        return {
            "precision2d": 0.0, "recall2d": 0.0, "f2d": 0.0,
            "n_frames": int(len(edges)), "n_points": int(len(points)),
        }
    p, r = float(np.mean(precisions)), float(np.mean(recalls))
    f = 2.0 * p * r / (p + r) if (p + r) > 0 else 0.0
    return {
        "precision2d": round(p, 4), "recall2d": round(r, 4),
        "f2d": round(f, 4), "n_frames": len(precisions),
        "n_points": int(len(points)),
    }


def select_udf_threshold(
    extract_at: Callable[[float], dict],
    candidates: Sequence[float],
    data_dir: str,
    detector: str,
    match_px: float = 3.0,
) -> tuple[float, dict, list[dict]]:
    """Run `extract_at(thr)` for every candidate, score each with
    score_edges_2d, and return (best_thr, best_edge_dict, rows) where rows
    is the per-candidate score table (ties break toward the smaller
    threshold, i.e. the first argmax)."""
    rows, dicts = [], []
    for thr in candidates:
        edge_dict = extract_at(float(thr))
        score = score_edges_2d(edge_dict, data_dir, detector, match_px)
        rows.append({
            "udf_threshold": float(thr),
            "n_curves": len(edge_dict["curves_ctl_pts"]),
            "n_lines": len(edge_dict["lines_end_pts"]),
            **score,
        })
        dicts.append(edge_dict)
    best = int(np.argmax([r["f2d"] for r in rows]))
    return float(candidates[best]), dicts[best], rows
