#!/usr/bin/env python
"""Wall-clock benchmark of the DTU-scale extraction workload (VERDICT r1 #8).

Times the heaviest inference path the reference ships
(confs/DTU.conf:119-129: 256^3 grid = 16.8M UDF queries, then 50 jittered
gradient samples per near-surface candidate, point shift, and polyline
growth), on the flagship 8x256 field with geometric init (a sphere-like UDF,
so the candidate shell is realistically sized).

Phases reported (one JSON line each):
  grid      -- dense 256^3 UDF query (device, fixed-shape chunks)
  features  -- per-candidate udf/normal/line-direction batches (50x grads)
  shift     -- one point-shift round + re-featurize (DTU iters=1)
  connect   -- polyline growth at >=100k points, native C++ vs numpy

Env: EXT_RES (256), EXT_THRESH (0.015), EXT_PALLAS (0/1), EXT_CONNECT_N.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def bench_field_phases(res: int, thresh: float, use_pallas: bool):
    import jax
    import jax.numpy as jnp

    from emap_tpu.extract import pointcloud as pc
    from emap_tpu.fields import UDFConfig, init_udf_params

    ucfg = UDFConfig()
    params = {"udf": init_udf_params(jax.random.key(0), ucfg)}["udf"]

    N, total, chunk = res, res**3, int(os.environ.get("EXT_CHUNK", str(1 << 22)))
    chunk += (-chunk) % 8
    key = jax.random.key(42)
    th = jnp.float32(thresh)

    # warm the compiles outside the timed regions
    _ = np.asarray(
        pc._grid_mask_chunk(params, jnp.int32(0), th, chunk, N, ucfg,
                            use_pallas)
    )

    t0 = time.perf_counter()
    starts = list(range(0, total, chunk))
    pending = [
        pc._grid_mask_chunk(params, jnp.int32(s), th, chunk, N, ucfg,
                            use_pallas)
        for s in starts
    ]
    mask = np.concatenate([np.asarray(p) for p in pending])
    near = np.unpackbits(mask, count=total).astype(bool)
    t_grid = time.perf_counter() - t0

    cand_idx = np.nonzero(near)[0]
    voxel = 2.0 / (N - 1)
    xyz = np.stack(
        [(cand_idx // (N * N)) % N, (cand_idx // N) % N, cand_idx % N],
        axis=-1,
    ).astype(np.float32) * voxel - 1.0

    print(json.dumps({
        "phase": "grid", "resolution": N, "queries": total,
        "seconds": round(t_grid, 2),
        "mqueries_per_s": round(total / t_grid / 1e6, 2),
        "candidates": int(len(xyz)), "use_pallas": use_pallas,
    }), flush=True)

    t0 = time.perf_counter()
    df, normals, _ = pc._run_point_batches(
        params, ucfg, xyz, jax.random.fold_in(key, 0), 50, 0.005,
        False, int(os.environ.get("EXT_PBATCH", "65536")), use_pallas,
    )
    t_feat0 = time.perf_counter() - t0

    t0 = time.perf_counter()
    df = np.maximum(df, 0.0)
    xyz2 = xyz + df[:, None] * normals
    df3, normals3, ld = pc._run_point_batches(
        params, ucfg, xyz2, jax.random.fold_in(key, 1), 50, 0.005,
        True, int(os.environ.get("EXT_PBATCH", "65536")), use_pallas,
    )
    t_shift = time.perf_counter() - t0
    grad_queries = len(xyz2) * 51  # 50 jittered + 1 center
    print(json.dumps({
        "phase": "features+shift", "points": int(len(xyz)),
        "feature_s": round(t_feat0, 2), "shift_s": round(t_shift, 2),
        "grad_mqueries_per_s": round(grad_queries / t_shift / 1e6, 2),
        "use_pallas": use_pallas,
    }), flush=True)
    keep = df3 <= thresh
    return xyz2[keep], ld[keep]


def bench_connect(n_points: int):
    from emap_tpu.extract.fitting import connect_points
    from emap_tpu.native import connect_points_native, native_available

    # realistic input: [xyz, line-direction] points strung along many noisy
    # 3D segments (the shape edge_fit feeds connect_points after voxel
    # downsampling, fitting.py:420-449); production thresholds.
    rng = np.random.default_rng(0)
    n_seg = max(n_points // 500, 1)
    pts = []
    for _ in range(n_seg):
        a, b = rng.uniform(-1, 1, (2, 3))
        d = (b - a) / np.linalg.norm(b - a)
        t = np.sort(rng.uniform(0, 1, 500))[:, None]
        xyz = a + t * (b - a) + rng.normal(scale=1e-3, size=(500, 3))
        pts.append(np.concatenate([xyz, np.tile(d, (500, 1))], axis=1))
    pts = np.concatenate(pts)[:n_points].astype(np.float64)
    dist_th, angle_th, nms, keep_short = 10.0 / 256.0, 0.03, 0.9, True

    t0 = time.perf_counter()
    if native_available():
        out_native = connect_points_native(
            pts, dist_th, angle_th, nms, keep_short, seed=42
        )
        t_native = time.perf_counter() - t0
    else:
        out_native, t_native = None, float("nan")

    t0 = time.perf_counter()
    out_py = connect_points(
        pts, dist_th, angle_th, nms, keep_short,
        rng=np.random.default_rng(42),
    )
    t_py = time.perf_counter() - t0

    rec = {
        "phase": "connect_points", "points": int(len(pts)),
        "native_s": round(t_native, 3), "numpy_s": round(t_py, 3),
        "speedup": round(t_py / t_native, 1) if out_native is not None else None,
        "n_polylines_native": len(out_native) if out_native is not None else None,
        "n_polylines_numpy": len(out_py),
    }
    print(json.dumps(rec), flush=True)


def main():
    res = int(os.environ.get("EXT_RES", "256"))
    thresh = float(os.environ.get("EXT_THRESH", "0.015"))
    use_pallas = os.environ.get("EXT_PALLAS", "0") == "1"
    bench_field_phases(res, thresh, use_pallas)
    bench_connect(int(os.environ.get("EXT_CONNECT_N", "100000")))


if __name__ == "__main__":
    main()
