"""Extraction-stack tests: fitting primitives on synthetic data, merging,
and UDF point extraction from a field regressed onto an analytic UDF."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emap_tpu.extract.fitting import (
    bezier_fit,
    bezier_points,
    connect_points,
    edge_fit,
    fit_line_ransac_3d,
    line_fitting,
    voxel_downsample_with_colors,
)
from emap_tpu.extract.merging import (
    merge,
    merge_endpoints,
    merge_line_segments,
    pairwise_segment_distances,
)


class TestBezier:
    def test_fit_recovers_curve(self, rng):
        ctl = rng.uniform(-1, 1, size=(4, 3))
        t = np.linspace(0, 1, 50)
        pts = bezier_points(ctl, t)
        p = bezier_fit(pts, error_threshold=1e-6)
        assert p is not None
        np.testing.assert_allclose(
            bezier_points(p, t), pts, atol=1e-8
        )

    def test_fit_rejects_bad(self, rng):
        pts = rng.uniform(-1, 1, size=(50, 3))  # random noise, not a curve
        assert bezier_fit(pts, error_threshold=1e-4) is None


class TestLineFitting:
    def test_total_lsq_line(self, rng):
        a, b = np.array([0, 0, 0.0]), np.array([1, 2, 3.0])
        t = np.linspace(0, 1, 30)[:, None]
        pts = a + t * (b - a) + rng.normal(scale=1e-4, size=(30, 3))
        seg, lam = line_fitting(pts)
        assert lam > 0.99
        ends = np.stack([seg[:3], seg[3:]])
        d0 = min(np.linalg.norm(ends - a, axis=1))
        d1 = min(np.linalg.norm(ends - b, axis=1))
        assert d0 < 1e-3 and d1 < 1e-3

    def test_ransac_two_lines(self, rng):
        t = np.linspace(0, 1, 40)[:, None]
        l1 = np.array([0, 0, 0.0]) + t * np.array([1, 0, 0.0])
        l2 = np.array([0, 0, 0.5]) + t * np.array([0, 1, 0.0])
        pts = np.concatenate([l1, l2]) + rng.normal(scale=5e-4, size=(80, 3))
        wld = np.concatenate([pts, np.zeros_like(pts)], axis=1)
        segs, splits, curves = fit_line_ransac_3d(
            wld, voxel_size=256, min_inliers=5, max_lines=3, max_curves=2,
            rng=rng,
        )
        assert len(segs) == 2
        lengths = sorted(np.linalg.norm(s[3:] - s[:3]) for s in segs)
        assert all(0.9 < L < 1.1 for L in lengths)


class TestConnectPoints:
    def test_single_line_connects(self, rng):
        n = 40
        t = np.linspace(0, 1, n)[:, None]
        xyz = np.array([0, 0, 0.0]) + t * np.array([1, 0, 0.0])
        ld = np.tile(np.array([1.0, 0, 0]), (n, 1))
        pts = np.concatenate([xyz, ld], axis=1)
        polys = connect_points(
            pts, distance_threshold=0.08, angle_threshold=0.05,
            nms_factor=0.95, keep_short_lines=True, rng=rng,
        )
        # NMS suppresses near-collinear competitors (on exact collinear data
        # up to 2 of every 3 points -- reference behavior), so assert the
        # geometric property instead: few polylines whose longest spans most
        # of the segment.
        assert 1 <= len(polys) <= 3
        spans = [
            xyz[p][:, 0].max() - xyz[p][:, 0].min() for p in polys
        ]
        assert max(spans) > 0.8


class TestVoxelDownsample:
    def test_averages_per_voxel(self):
        pts = np.array([[0, 0, 0], [0.01, 0, 0], [1, 1, 1.0]])
        cols = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
        p, c = voxel_downsample_with_colors(pts, cols, voxel_size=0.1)
        assert len(p) == 2
        i = int(np.argmin(p[:, 0]))
        np.testing.assert_allclose(p[i], [0.005, 0, 0])
        np.testing.assert_allclose(c[i], [0.5, 0.5, 0])


class TestMerging:
    def test_pairwise_distances(self):
        segs = np.array(
            [[0, 0, 0, 1, 0, 0], [2, 0, 0, 3, 0, 0], [0, 5, 0, 1, 5, 0.0]]
        )
        d = pairwise_segment_distances(segs)
        assert d[0, 1] == pytest.approx(1.0)
        assert d[0, 2] == pytest.approx(5.0)
        assert np.allclose(d, d.T)

    def test_merge_collinear(self):
        segs = np.array([[0, 0, 0, 1, 0, 0], [1.005, 0, 0, 2, 0, 0.0]])
        raw = [s.reshape(2, 3).tolist() for s in segs]
        merged = merge_line_segments(segs, raw, 0.05, 0.98)
        assert len(merged) == 1
        length = np.linalg.norm(merged[0][3:] - merged[0][:3])
        assert length == pytest.approx(2.0, abs=0.02)

    def test_merge_endpoints_snaps(self):
        segs = np.array([[0, 0, 0, 1, 0, 0], [1.01, 0, 0, 2, 0, 0.0]])
        curves = np.zeros((0, 12))
        out_lines, _ = merge_endpoints(segs, curves, 0.05)
        np.testing.assert_allclose(out_lines[0][3:], out_lines[1][:3])

    def test_merge_orchestrator(self):
        fitted = {
            "resolution": 128,
            "lines_end_pts": [[0, 0, 0, 1, 0, 0], [1.005, 0, 0, 2, 0, 0.0]],
            "raw_points_on_lines": [
                [[0, 0, 0], [1, 0, 0]],
                [[1.005, 0, 0], [2, 0, 0]],
            ],
            "curves_ctl_pts": [],
            "raw_points_on_curves": [],
        }
        merged = merge(fitted)
        assert len(merged["lines_end_pts"]) == 1


@pytest.fixture(scope="module")
def circle_field():
    """Tiny MLP regressed onto the analytic UDF of a circle (radius 0.5 in
    the z=0 plane) -- gives a realistic field for extraction tests without a
    full renderer training run."""
    from emap_tpu.fields import UDFConfig, apply_udf, init_udf_params
    from emap_tpu.train.optim import adam_init, adam_update

    ucfg = UDFConfig(d_hidden=64, n_layers=4, skip_in=(2,), multires=6)
    params = init_udf_params(jax.random.key(0), ucfg)
    opt = adam_init(params)
    lr = jax.tree.map(lambda _: jnp.float32(1e-3), params)
    mask = jax.tree.map(lambda _: jnp.float32(1.0), params)

    def target_udf(p):
        r = jnp.sqrt(p[:, 0] ** 2 + p[:, 1] ** 2)
        return jnp.sqrt((r - 0.5) ** 2 + p[:, 2] ** 2)

    @jax.jit
    def reg_step(params, opt, key):
        pts = jax.random.uniform(key, (512, 3), minval=-1, maxval=1)
        def loss_fn(p):
            pred = apply_udf(p, pts, ucfg)[:, 0]
            return jnp.mean((pred - target_udf(pts)) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt = adam_update(params, grads, opt, lr, mask)
        return params, opt, loss

    key = jax.random.key(1)
    for i in range(800):
        key, k = jax.random.split(key)
        params, opt, loss = reg_step(params, opt, k)
    assert float(loss) < 5e-4
    return params, ucfg


class TestGridMaskChunk:
    def test_packed_mask_matches_value_threshold(self, circle_field):
        """The packed-bitmask grid fetch selects exactly the voxels the
        fetched-values path would (clip-to-0 then <= thresh semantics)."""
        from emap_tpu.extract.pointcloud import (
            _grid_mask_chunk,
            _grid_udf_chunk,
        )

        params, ucfg = circle_field
        N, chunk, thresh = 24, 4608, 0.05
        total = N**3
        ref_bits, got_bits = [], []
        for start in range(0, total, chunk):
            vals = np.asarray(
                _grid_udf_chunk(params, jnp.int32(start), chunk, N, ucfg)
            )
            ref_bits.append(np.maximum(vals, 0.0) <= thresh)
            packed = np.asarray(_grid_mask_chunk(
                params, jnp.int32(start), jnp.float32(thresh), chunk, N, ucfg
            ))
            got_bits.append(np.unpackbits(packed, count=chunk).astype(bool))
        ref = np.concatenate(ref_bits)[:total]
        got = np.concatenate(got_bits)[:total]
        assert ref.sum() > 0  # the near-surface shell is non-empty
        np.testing.assert_array_equal(got, ref)


class TestExtractPointcloud:
    def test_extracts_circle(self, circle_field):
        from emap_tpu.extract import extract_pointcloud

        params, ucfg = circle_field
        pts, dirs = extract_pointcloud(
            params, ucfg, resolution=48, udf_threshold=0.03,
            sampling_N=20, sampling_delta=0.01,
            is_pointshift=True, iters=1, is_linedirection=True,
            grid_chunk=110592, point_batch=2048,
        )
        assert len(pts) > 50
        # points should lie near the circle
        r = np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2)
        d = np.sqrt((r - 0.5) ** 2 + pts[:, 2] ** 2)
        assert np.median(d) < 0.05
        # line directions should be tangent: perpendicular to radial dir
        # and to z
        radial = np.stack(
            [pts[:, 0] / (r + 1e-9), pts[:, 1] / (r + 1e-9), np.zeros(len(pts))],
            axis=1,
        )
        cos_radial = np.abs(np.sum(dirs * radial, axis=1))
        assert np.median(cos_radial) < 0.3
        assert np.median(np.abs(dirs[:, 2])) < 0.3


class TestExtractMulti:
    """extract_pointcloud_multi: K candidate thresholds from ONE shared
    grid + feature + shift pass (VERDICT r3 item 6)."""

    KW = dict(sampling_N=20, sampling_delta=0.01, is_pointshift=True,
              iters=2, is_linedirection=True, grid_chunk=110592,
              point_batch=2048)

    def test_single_threshold_bitexact(self, circle_field):
        """K=1 must reproduce extract_pointcloud exactly (same grid bits,
        same batch layout, same jitter draws -> bit-equal xyz AND dirs)."""
        from emap_tpu.extract import (
            extract_pointcloud,
            extract_pointcloud_multi,
        )

        params, ucfg = circle_field
        pts, dirs = extract_pointcloud(
            params, ucfg, resolution=48, udf_threshold=0.03, **self.KW
        )
        out = extract_pointcloud_multi(
            params, ucfg, resolution=48, thresholds=[0.03], **self.KW
        )
        np.testing.assert_array_equal(out[0.03][0], pts)
        np.testing.assert_array_equal(out[0.03][1], dirs)

    def test_multi_matches_standalone_points(self, circle_field):
        """Each candidate's POINT SET must equal its standalone extraction
        bit-for-bit (positions/keeps are per-point deterministic; only the
        line-direction jitter draw differs by batch layout)."""
        from emap_tpu.extract import (
            extract_pointcloud,
            extract_pointcloud_multi,
        )

        params, ucfg = circle_field
        thresholds = [0.015, 0.03, 0.05]
        out = extract_pointcloud_multi(
            params, ucfg, resolution=48, thresholds=thresholds, **self.KW
        )
        for t in thresholds:
            pts_t, dirs_t = extract_pointcloud(
                params, ucfg, resolution=48, udf_threshold=t, **self.KW
            )
            np.testing.assert_array_equal(
                out[t][0], pts_t, err_msg=f"thr={t}"
            )
            # dirs: different jitter draw, same geometry - unit and tangent
            norms = np.linalg.norm(out[t][1], axis=1)
            np.testing.assert_allclose(norms, 1.0, atol=1e-3)
        # monotone nesting: smaller threshold -> subset of points
        n = [len(out[t][0]) for t in thresholds]
        assert n[0] <= n[1] <= n[2]

    def test_sharded_extraction_bitexact(self, circle_field):
        """The mesh-sharded grid/feature sweeps must be bit-equal to the
        single-device run (row-wise math only; the jitter is generated
        unsharded and split over the mesh)."""
        from emap_tpu.extract import (
            extract_pointcloud,
            extract_pointcloud_multi,
        )
        from emap_tpu.parallel import make_mesh

        params, ucfg = circle_field
        mesh = make_mesh(8)
        pts, dirs = extract_pointcloud(
            params, ucfg, resolution=48, udf_threshold=0.03, **self.KW
        )
        pts_s, dirs_s = extract_pointcloud(
            params, ucfg, resolution=48, udf_threshold=0.03, mesh=mesh,
            **self.KW
        )
        np.testing.assert_array_equal(pts_s, pts)
        np.testing.assert_array_equal(dirs_s, dirs)

        out = extract_pointcloud_multi(
            params, ucfg, resolution=48, thresholds=[0.03, 0.05], **self.KW
        )
        out_s = extract_pointcloud_multi(
            params, ucfg, resolution=48, thresholds=[0.03, 0.05], mesh=mesh,
            **self.KW
        )
        for t in (0.03, 0.05):
            np.testing.assert_array_equal(out_s[t][0], out[t][0])
            np.testing.assert_array_equal(out_s[t][1], out[t][1])
