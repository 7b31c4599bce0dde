#!/usr/bin/env python
"""Cross-platform extraction divergence diagnosis (VERDICT r2 item 6).

The same checkpoint re-extracted on CPU vs TPU re-rolls F@5mm by ~±0.1
(BASELINE.md weak-seed section). This script pins down WHERE the divergence
enters by dumping every extraction stage on each platform and diffing:

  stage 1  near-surface grid mask        (candidate set)
  stage 2  first feature sweep           (udf, normals at candidates)
  stage 3  point shift + line directions (final cloud fed to the fit)
  stage 4  host fit + merge              (deterministic given its inputs)
  stage 5  F-score vs analytic GT

Commands:
  python scripts/diag_platform.py stage OUT.npz   # run stages 1-3, dump
  python scripts/diag_platform.py fit DUMP.npz    # stages 4-5 from a dump
  python scripts/diag_platform.py compare A.npz B.npz  # per-stage diffs +
      cross-attribution (each cloud through the same host fit)

Env: DP_CKPT (checkpoint .npz path), DP_DATA (scan data dir, for scoring
only), DP_OBJ (cube|rings), DP_RES (96), DP_THRESH (0.03), DP_PREC
("" = checkpoint tier; "highest" pins extraction queries to the f32 tier —
the candidate mitigation), DP_QUANT (0 = off; e.g. 1e-4 snaps final point
coords to a lattice so sub-roundoff platform noise cannot reach the
chaotic fit), DP_PLATFORM (force jax platform, e.g. cpu).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_PLATFORM = os.environ.get("DP_PLATFORM", "")
if _PLATFORM:
    import jax

    jax.config.update("jax_platforms", _PLATFORM)

import numpy as np  # noqa: E402

RES = int(os.environ.get("DP_RES", "96"))
THRESH = float(os.environ.get("DP_THRESH", "0.03"))
OBJ = os.environ.get("DP_OBJ", "cube")
PREC = os.environ.get("DP_PREC", "")
QUANT = float(os.environ.get("DP_QUANT", "0"))
SAMPLING_N = 50
SAMPLING_DELTA = 5e-3
ITERS = 2


def _load():
    import jax

    from emap_tpu.ckpt.native import load_pytree
    from emap_tpu.fields.udf import UDFConfig

    ckpt = load_pytree(os.environ["DP_CKPT"])
    params = ckpt["params"]["udf"] if "params" in ckpt else ckpt["udf"]
    ucfg = UDFConfig()
    if PREC:
        ucfg = dataclasses.replace(ucfg, precision=PREC)
    return jax.device_put(params), ucfg


def run_stages(out_path: str) -> None:
    import jax

    from emap_tpu.extract import pointcloud as pc

    params, ucfg = _load()
    backend = jax.default_backend()
    use_pallas = backend == "tpu"
    key = jax.random.key(42)
    N, total = RES, RES**3
    chunk = min(1 << 22, total)
    chunk += (-chunk) % 8

    pending = [
        pc._grid_mask_chunk(params, np.int32(s), np.float32(THRESH),
                            chunk, N, ucfg, use_pallas)
        for s in range(0, total, chunk)
    ]
    mask = np.concatenate([np.asarray(p) for p in pending])
    near = np.unpackbits(mask, count=total).astype(bool)
    cand_idx = np.nonzero(near)[0]
    voxel = 2.0 / (N - 1)
    xyz0 = np.stack(
        [(cand_idx // (N * N)) % N, (cand_idx // N) % N, cand_idx % N],
        axis=-1,
    ).astype(np.float32) * voxel - 1.0

    batch = 65536 if use_pallas else 4096
    df0, nrm0, _ = pc._run_point_batches(
        params, ucfg, xyz0, jax.random.fold_in(key, 0), SAMPLING_N,
        SAMPLING_DELTA, False, batch, use_pallas,
    )
    df0 = np.maximum(df0, 0.0)

    xyz, df, normals = xyz0, df0, nrm0
    line_dirs = np.zeros_like(xyz)
    for it in range(ITERS):
        xyz = xyz + df[:, None] * normals
        last = it == ITERS - 1
        df, normals, line_dirs = pc._run_point_batches(
            params, ucfg, xyz, jax.random.fold_in(key, it + 1),
            SAMPLING_N, SAMPLING_DELTA, last, batch, use_pallas,
        )
        keep = df <= THRESH
        xyz, df, normals, line_dirs = (
            xyz[keep], df[keep], normals[keep], line_dirs[keep],
        )

    if QUANT > 0:
        xyz = np.round(xyz / QUANT) * QUANT

    np.savez_compressed(
        out_path, backend=backend, prec=PREC or "model", quant=QUANT,
        cand_idx=cand_idx, df0=df0, nrm0=nrm0,
        xyz=xyz.astype(np.float32), line_dirs=line_dirs.astype(np.float32),
        final_df=df,
    )
    print(json.dumps({
        "backend": backend, "prec": PREC or "model",
        "n_candidates": len(cand_idx), "n_final": len(xyz),
        "dump": out_path,
    }))


def fit_and_score(dump_path: str, tag: str = "") -> dict:
    """Stages 4-5: host fit from a dumped cloud, scored vs the analytic GT.

    The fit is pure host numpy (seeded), so any F difference between two
    dumps is attributable to the dumped cloud, not the fit.

    DP_QUANT / DP_DIRQUANT > 0 snap point coords / line directions to a
    lattice post-hoc (mitigation probe: does coarsening the fit's inputs
    absorb the sub-roundoff platform noise before the chaotic fit sees it?)."""
    from emap_tpu.extract.parametric import get_parametric_edge

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from e2e_synthetic import score_extraction

    d = np.load(dump_path)
    xyz, line_dirs = d["xyz"], d["line_dirs"]
    if QUANT > 0:
        xyz = np.round(xyz / QUANT) * QUANT
    dq = float(os.environ.get("DP_DIRQUANT", "0"))
    if dq > 0:
        line_dirs = np.round(line_dirs / dq) * dq
        n = np.linalg.norm(line_dirs, axis=-1, keepdims=True)
        line_dirs = line_dirs / np.maximum(n, 1e-12)
    ld_colors = (line_dirs + 1.0) / 2.0
    _, edge_dict = get_parametric_edge(
        xyz, ld_colors, RES, "DexiNed",
        os.environ.get("DP_DATA", ""), visible_checking=False,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        os.makedirs(os.path.join(tmp, "results"), exist_ok=True)
        with open(os.path.join(tmp, "results",
                               "parametric_edges.json"), "w") as f:
            json.dump(edge_dict, f)
        score = score_extraction(tmp, edge_dict, OBJ)
    row = {
        "dump": dump_path, "tag": tag,
        "backend": str(d["backend"]), "n_points": len(xyz),
        "n_lines": len(edge_dict["lines_end_pts"]),
        "n_curves": len(edge_dict["curves_ctl_pts"]),
        "f5": score["fscore_0.005"], "f10": score["fscore_0.01"],
        "chamfer": score["chamfer"],
    }
    print(json.dumps(row))
    return row


def compare(path_a: str, path_b: str) -> None:
    from scipy.spatial import cKDTree

    a, b = np.load(path_a), np.load(path_b)
    ia, ib = a["cand_idx"], b["cand_idx"]
    common, ca, cb = np.intersect1d(ia, ib, return_indices=True)
    mask_flips = len(ia) + len(ib) - 2 * len(common)
    d_udf = np.abs(a["df0"][ca] - b["df0"][cb])
    cosang = np.abs(np.sum(a["nrm0"][ca] * b["nrm0"][cb], axis=-1))

    ta = cKDTree(a["xyz"])
    tb = cKDTree(b["xyz"])
    d_ab = tb.query(a["xyz"])[0]
    d_ba = ta.query(b["xyz"])[0]

    report = {
        "stage1_mask": {
            "n_a": len(ia), "n_b": len(ib), "flips": int(mask_flips),
            "flip_frac": round(mask_flips / max(len(ia), 1), 5),
        },
        "stage2_udf": {
            "max_abs_diff": float(d_udf.max()) if len(d_udf) else 0.0,
            "p99_abs_diff": float(np.percentile(d_udf, 99)),
            "mean_normal_angle_deg": float(
                np.degrees(np.arccos(np.clip(cosang, 0, 1))).mean()
            ),
        },
        "stage3_cloud": {
            "n_a": len(a["xyz"]), "n_b": len(b["xyz"]),
            "mean_nn_dist_ab": float(d_ab.mean()),
            "p99_nn_dist_ab": float(np.percentile(d_ab, 99)),
            "max_nn_dist": float(max(d_ab.max(), d_ba.max())),
        },
    }
    print(json.dumps(report, indent=1))
    rows = [fit_and_score(path_a, "cloud_a"), fit_and_score(path_b, "cloud_b")]
    report["stage5_scores"] = rows
    report["delta_f5"] = round(abs(rows[0]["f5"] - rows[1]["f5"]), 4)
    out = os.environ.get("DP_OUT", "")
    if out:
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps({"delta_f5": report["delta_f5"]}))


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "stage":
        run_stages(sys.argv[2])
    elif cmd == "fit":
        fit_and_score(sys.argv[2])
    elif cmd == "compare":
        compare(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(f"unknown command {cmd!r}")
