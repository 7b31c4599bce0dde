"""GT-free 2D edge-consistency scorer (extract/autothresh.py).

The scorer has no reference counterpart (the reference pins one
udf_threshold per dataset); these tests pin its geometry instead: on a
synthetic cube scene the analytic wireframe must score near-perfect 2D
pseudo-F, while displaced / partial / padded wireframes must score strictly
lower on the side (precision/recall) their defect predicts — which is
exactly the discrimination select_udf_threshold relies on.
"""

import numpy as np
import pytest

from emap_tpu.data.synthetic import cube_edges, make_synthetic_scene
from emap_tpu.extract.autothresh import score_edges_2d, select_udf_threshold


def _edge_dict(lines_end_pts: np.ndarray) -> dict:
    return {
        "curves_ctl_pts": np.zeros((0, 12)).tolist(),
        "lines_end_pts": np.asarray(lines_end_pts, np.float64)
        .reshape(-1, 6)
        .tolist(),
    }


@pytest.fixture(scope="module")
def cube_scene(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("autothresh_scene"))
    make_synthetic_scene(data_dir, scan="cube000", n_views=6, H=96, W=96)
    return data_dir + "/cube000"


def test_true_wireframe_scores_high(cube_scene):
    gt = _edge_dict(cube_edges(0.5))
    s = score_edges_2d(gt, cube_scene, "DexiNed")
    assert s["f2d"] > 0.8, s
    assert s["n_frames"] == 6 and s["n_points"] > 0


def test_displaced_wireframe_scores_lower(cube_scene):
    gt = _edge_dict(cube_edges(0.5))
    off = _edge_dict(cube_edges(0.5) + np.array([0.15, 0.1, -0.12]))
    s_gt = score_edges_2d(gt, cube_scene, "DexiNed")
    s_off = score_edges_2d(off, cube_scene, "DexiNed")
    assert s_off["f2d"] < s_gt["f2d"] - 0.15, (s_gt, s_off)


def test_partial_wireframe_loses_recall(cube_scene):
    full = _edge_dict(cube_edges(0.5))
    partial = _edge_dict(cube_edges(0.5)[:4])  # drop 8 of 12 edges
    s_full = score_edges_2d(full, cube_scene, "DexiNed")
    s_part = score_edges_2d(partial, cube_scene, "DexiNed")
    assert s_part["recall2d"] < s_full["recall2d"] - 0.1
    assert s_part["precision2d"] >= s_full["precision2d"] - 0.05


def test_spurious_lines_lose_precision(cube_scene):
    full = cube_edges(0.5)
    phantom = np.array(
        [[[-0.3, -0.25, 0.1], [0.35, 0.2, -0.15]],
         [[0.1, -0.3, -0.3], [-0.2, 0.3, 0.25]]]
    )
    s_full = score_edges_2d(_edge_dict(full), cube_scene, "DexiNed")
    s_pad = score_edges_2d(
        _edge_dict(np.concatenate([full, phantom])), cube_scene, "DexiNed"
    )
    assert s_pad["precision2d"] < s_full["precision2d"] - 0.05
    assert s_pad["recall2d"] >= s_full["recall2d"] - 0.01


def test_empty_extraction_scores_zero(cube_scene):
    s = score_edges_2d(_edge_dict(np.zeros((0, 6))), cube_scene, "DexiNed")
    assert s == {
        "precision2d": 0.0, "recall2d": 0.0, "f2d": 0.0,
        "n_frames": 6, "n_points": 0,
    }


def test_selector_picks_true_wireframe(cube_scene):
    candidates = {
        0.02: _edge_dict(cube_edges(0.5)[:4]),                 # holes
        0.03: _edge_dict(cube_edges(0.5)),                     # truth
        0.04: _edge_dict(cube_edges(0.5) + 0.12),              # displaced
    }
    thr, best, rows = select_udf_threshold(
        lambda t: candidates[round(t, 2)],
        [0.02, 0.03, 0.04],
        cube_scene,
        "DexiNed",
    )
    assert thr == 0.03
    assert best is candidates[0.03]
    assert [r["udf_threshold"] for r in rows] == [0.02, 0.03, 0.04]
    assert max(rows, key=lambda r: r["f2d"])["udf_threshold"] == 0.03
