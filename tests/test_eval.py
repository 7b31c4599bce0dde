import json

import numpy as np
import pytest

from emap_tpu.data.synthetic import sample_cube_edge_points
from emap_tpu.eval.metrics import (
    bezier_curve_length,
    chamfer_distance,
    compute_precision_recall_iou,
    downsample_point_cloud_average,
    f_score,
    get_pred_points_and_directions,
)
from emap_tpu.utils.ply import read_ply_points, write_ply_points


class TestMetrics:
    def test_chamfer_identity(self, rng):
        pts = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
        chamfer, acc, comp = chamfer_distance(pts, pts)
        assert chamfer == pytest.approx(0.0, abs=1e-6)

    def test_chamfer_shift(self):
        x = np.zeros((10, 3), np.float32)
        y = np.zeros((10, 3), np.float32)
        y[:, 0] = 0.1
        chamfer, acc, comp = chamfer_distance(x, y)
        assert acc == pytest.approx(0.1, abs=1e-6)
        assert comp == pytest.approx(0.1, abs=1e-6)

    def test_precision_recall(self, rng):
        gt = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
        pred = np.concatenate([gt[:250], gt[:250] + 5.0])
        metrics = {
            f"{name}_{t}": []
            for name in ("precision", "recall", "fscore", "IOU")
            for t in (0.01,)
        }
        compute_precision_recall_iou(pred, gt, metrics, [0.01], "all")
        assert metrics["precision_0.01"][0] == pytest.approx(0.5)
        assert metrics["recall_0.01"][0] == pytest.approx(0.5)
        assert metrics["fscore_0.01"][0] == pytest.approx(0.5)

    def test_fscore(self):
        assert f_score(1.0, 0.5) == pytest.approx(2 / 3)
        assert f_score(0.0, 0.0) == 0.0  # degenerate field, no crash

    def test_empty_pred_zero_metrics(self, rng):
        """An empty prediction (nothing extracted on a short schedule)
        yields all-zero rows instead of a division crash."""
        gt = rng.uniform(-1, 1, size=(100, 3)).astype(np.float32)
        metrics = {
            f"{name}_{t}": []
            for name in ("precision", "recall", "fscore", "IOU")
            for t in (0.01,)
        }
        compute_precision_recall_iou(
            np.zeros((0, 3), np.float32), gt, metrics, [0.01], "all"
        )
        for k in metrics:
            assert metrics[k] == [0.0]
        cg, ngt, cp, npred, acc, comp = compute_precision_recall_iou(
            np.zeros((0, 3), np.float32), gt, None, [0.01], "line"
        )
        assert cg == [0] and cp == [0] and ngt == 100 and npred == 0


class TestDownsample:
    def test_average_downsample(self):
        pts = np.array([[0, 0, 0], [0.001, 0.001, 0.001], [0.9, 0.9, 0.9]])
        out = downsample_point_cloud_average(
            pts, num_voxels_per_axis=2, min_bound=[0, 0, 0],
            max_bound=[1, 1, 1],
        )
        assert len(out) == 2
        first = out[np.argmin(out[:, 0])]
        np.testing.assert_allclose(first, [0.0005, 0.0005, 0.0005], atol=1e-6)


class TestBezierLength:
    def test_straight_line_length(self):
        ctl = np.array([[0, 0, 0], [1 / 3, 0, 0], [2 / 3, 0, 0], [1, 0, 0.0]])
        assert bezier_curve_length(ctl, 20) == pytest.approx(1.0, rel=1e-3)


class TestPredSampling:
    def test_sampling_from_json(self, tmp_path):
        data = {
            "curves_ctl_pts": [],
            "lines_end_pts": [[0, 0, 0, 1, 0, 0]],
        }
        path = tmp_path / "parametric_edges.json"
        path.write_text(json.dumps(data))
        curve_pts, line_pts, _, line_dirs = get_pred_points_and_directions(
            str(path)
        )
        assert len(curve_pts) == 0
        # 1.0 // 0.005 -> 199 or 200 depending on fp rounding (reference
        # uses the same floor-div, eval_util.py:393)
        assert len(line_pts) in (199, 200)
        np.testing.assert_allclose(line_dirs[0], [1, 0, 0], atol=1e-5)


class TestPly:
    @pytest.mark.parametrize("ascii_format", [True, False])
    def test_roundtrip(self, tmp_path, rng, ascii_format):
        pts = rng.uniform(-1, 1, size=(50, 3))
        cols = rng.uniform(0, 1, size=(50, 3))
        path = str(tmp_path / "test.ply")
        write_ply_points(path, pts, cols, ascii_format=ascii_format)
        pts2, cols2 = read_ply_points(path)
        np.testing.assert_allclose(pts2, pts, atol=1e-6)
        np.testing.assert_allclose(cols2, cols, atol=1 / 255.0)

    def test_no_colors(self, tmp_path, rng):
        pts = rng.uniform(-1, 1, size=(10, 3))
        path = str(tmp_path / "p.ply")
        write_ply_points(path, pts)
        pts2, cols2 = read_ply_points(path)
        np.testing.assert_allclose(pts2, pts, atol=1e-6)
        assert cols2 is None


class TestSyntheticGT:
    def test_cube_edge_points(self):
        pts = sample_cube_edge_points(0.5, spacing=0.01)
        assert len(pts) > 1000
        # all points on the cube surface: exactly two coords at +-0.5
        at_face = np.isclose(np.abs(pts), 0.5, atol=1e-6).sum(axis=1)
        assert (at_face >= 2).all()
