"""Native C++ connect_points vs the numpy implementation (property parity:
the RNG seed-order differs, so compare polyline statistics and geometry, not
exact index sequences)."""

import numpy as np
import pytest

from emap_tpu.extract.fitting import connect_points

native = pytest.importorskip("emap_tpu.native")

if not native.native_available():  # pragma: no cover
    pytest.skip("no C++ toolchain available", allow_module_level=True)


def _square_loop(n_side=50, noise=2e-4, rng=None):
    """Oriented points along the 4 sides of a unit square in z=0."""
    rng = rng or np.random.default_rng(0)
    t = np.linspace(0, 1, n_side, endpoint=False)[:, None]
    sides = []
    corners = [
        (np.array([0, 0, 0.0]), np.array([1, 0, 0.0])),
        (np.array([1, 0, 0.0]), np.array([0, 1, 0.0])),
        (np.array([1, 1, 0.0]), np.array([-1, 0, 0.0])),
        (np.array([0, 1, 0.0]), np.array([0, -1, 0.0])),
    ]
    for start, d in corners:
        xyz = start + t * d + rng.normal(scale=noise, size=(n_side, 3))
        ld = np.tile(d, (n_side, 1))
        sides.append(np.concatenate([xyz, ld], axis=1))
    return np.concatenate(sides)


def test_native_matches_numpy_statistics():
    pts = _square_loop()
    kwargs = dict(
        distance_threshold=0.06,
        angle_threshold=0.05,
        nms_factor=0.95,
        keep_short_lines=True,
    )
    np_polys = connect_points(pts, rng=np.random.default_rng(1), **kwargs)
    nat_polys = native.connect_points_native(pts, seed=1, **kwargs)

    def span(polys):
        return sum(
            np.linalg.norm(
                pts[p[-1], :3] - pts[p[0], :3]
            )
            for p in polys
            if len(p) > 1
        )

    # both should cover the square's perimeter with a few long polylines
    assert 0.5 * span(np_polys) < span(nat_polys) < 2.0 * span(np_polys)
    n_np = sum(len(p) for p in np_polys)
    n_nat = sum(len(p) for p in nat_polys)
    assert 0.5 * n_np < n_nat < 2.0 * n_np
    # every returned index valid and unique within a polyline
    for p in nat_polys:
        assert len(set(p)) == len(p)
        assert max(p) < len(pts) and min(p) >= 0


def test_native_consecutive_points_are_close():
    pts = _square_loop()
    polys = native.connect_points_native(
        pts, distance_threshold=0.06, angle_threshold=0.05,
        nms_factor=0.95, keep_short_lines=True, seed=3,
    )
    for p in polys:
        xyz = pts[p, :3]
        gaps = np.linalg.norm(np.diff(xyz, axis=0), axis=1)
        assert (gaps < 0.06 + 1e-9).all()


def test_native_large_n_properties():
    """Correctness properties at realistic scale (VERDICT r1 #8): ~100k
    points along many noisy segments (the 256^3 extraction regime). The
    numpy fallback is O(N^2)-ish and takes ~a minute here, so the native
    path is checked on its own invariants plus coverage statistics."""
    rng = np.random.default_rng(0)
    segs = []
    n_seg, per = 200, 500
    for _ in range(n_seg):
        a, b = rng.uniform(-1, 1, (2, 3))
        d = (b - a) / np.linalg.norm(b - a)
        t = np.sort(rng.uniform(0, 1, per))[:, None]
        xyz = a + t * (b - a) + rng.normal(scale=1e-3, size=(per, 3))
        segs.append(np.concatenate([xyz, np.tile(d, (per, 1))], axis=1))
    pts = np.concatenate(segs)

    dist_th = 10.0 / 256.0
    polys = native.connect_points_native(
        pts, dist_th, 0.03, 0.9, True, seed=42
    )
    # invariants: valid unique indices within a polyline, bounded
    # cross-polyline duplication (the stop rule appends the disagreeing
    # point but leaves it unvisited -- reference edge_fitting semantics --
    # so only polyline ENDPOINTS may reappear elsewhere), and consecutive
    # gaps below the threshold
    seen = set()
    dupes = 0
    covered = 0
    for p in polys:
        assert len(set(p)) == len(p)
        dupes += len(set(p) & seen)
        seen.update(p)
        assert 0 <= min(p) and max(p) < len(pts)
        xyz = pts[p, :3]
        gaps = np.linalg.norm(np.diff(xyz, axis=0), axis=1)
        assert (gaps < dist_th + 1e-9).all()
        covered += len(p)
    assert dupes <= 2 * len(polys)
    # NMS deliberately subsamples points, so the invariant is GEOMETRIC
    # coverage: total polyline arc length must recover a healthy fraction
    # of the true total segment length (200 segments, |b-a| ~ 1.63 avg)
    arc = sum(
        float(np.linalg.norm(np.diff(pts[p, :3], axis=0), axis=1).sum())
        for p in polys
        if len(p) > 1
    )
    total = 200 * 1.4  # conservative lower bound on summed segment lengths
    assert arc > 0.5 * total, f"arc {arc:.1f} vs total >= {total:.1f}"
    # each input segment is a straight line: some polylines must be long
    lengths = sorted((len(p) for p in polys), reverse=True)
    assert lengths[0] > 20
