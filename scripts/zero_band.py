#!/usr/bin/env python
"""Direct measurement of the near-edge zero-band vs training schedule
(VERDICT r3 item 2).

Round 3 explained two quality residuals with OPPOSITE unmeasured mechanisms:
rings-50k under-performance as "50k fields grow WIDER near-zero bands on a
scene they saturate by ~8k" (selector optimum moved UP 0.03->0.04), and
DTU/Replica-200k over-extraction as the field "keeps NARROWING its zero
band" (optimum moved DOWN 0.015->0.005). This measures the band itself, per
checkpoint:

  * |udf| vs true distance r to the analytic GT edge set: sample points at
    controlled offsets from GT edge samples, bin by exact KD-tree distance,
    report median/quartile |udf| per r-bin. The "band halfwidth at tau" is
    the r where median |udf| crosses tau — i.e. how far from the true edge
    the extraction's udf<tau mask reaches (what the point-cloud density and
    the fit consume).
  * near-surface candidate counts: grid voxels with udf<tau at the conf's
    own extraction resolution, per tau — the direct input-size knob of the
    fragile fit stage.

Checkpoint registry is CLI-driven: each arg is  label=kind:path  where kind
chooses the conf reconstruction (e2e = e2e_synthetic build_conf dirs,
standin = a written *_standin.conf). Defaults cover the r3 artifacts.

Env: ZB_OUT (parity_results/zero_band.json), ZB_TAUS, ZB_OFFSETS.
Run on the TPU (field evals at 256-conf scale are seconds there); numerics
are f32 and the metric is a median over 20k+ points, so platform re-rolls
are irrelevant at the precision quoted.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

if os.environ.get("ZB_PLATFORM"):  # e.g. cpu — must win over sitecustomize
    import jax

    jax.config.update("jax_platforms", os.environ["ZB_PLATFORM"])

import numpy as np  # noqa: E402

TAUS = [float(t) for t in os.environ.get(
    "ZB_TAUS", "0.005 0.01 0.02 0.03 0.04 0.05").split()]
OFFSETS = [float(t) for t in os.environ.get(
    "ZB_OFFSETS", "0.0 0.0025 0.005 0.01 0.015 0.02 0.03 0.04 0.05 0.07"
).split()]
OUT = os.environ.get("ZB_OUT", "parity_results/zero_band.json")

def default_registry():
    """(label, kind, path, obj, grid_res) for every schedule-comparison
    checkpoint on disk: rings 8k vs 50k, cube 50k (production suite) vs
    200k (DTU/Replica confs), plus the long-schedule torch reference."""
    reg = []
    for seed in (42, 7, 99, 3, 1234):
        if os.path.isdir(f"e2e_rings8k/s{seed}"):
            reg.append((f"rings8k_s{seed}", "e2e", f"e2e_rings8k/s{seed}",
                        "rings", 96))
        if os.path.isdir(f"e2e_rings50k/s{seed}"):
            reg.append((f"rings50k_s{seed}", "e2e", f"e2e_rings50k/s{seed}",
                        "rings", 96))
        if os.path.isfile(f"prod_suite_r4/s{seed}/report.json"):
            reg.append((f"cube50k_prod_s{seed}", "prod",
                        f"prod_suite_r4/s{seed}", "cube", 128))
    for label, conf in (
        ("cube200k_dtu", "e2e_dtu200k_r3/DTU_standin.conf"),
        ("cube200k_dtu_s7", "e2e_dtu200k_s7/DTU_standin.conf"),
        ("cube200k_replica", "e2e_replica200k/Replica_standin.conf"),
        ("cube200k_replica_s7", "e2e_replica200k_s7/Replica_standin.conf"),
    ):
        if os.path.isfile(conf):
            reg.append((label, "standin", conf, "cube", 256))
    for steps in (16000, 24000):
        p = f"parity_ref_runs/rings{steps}_s42"
        if os.path.isfile(os.path.join(p, "ref_final.pth")):
            reg.append((f"rings{steps}_ref_s42", "parity", p, "rings", 96))
    return reg


def load_runner(kind: str, path: str, obj: str):
    from emap_tpu import config
    from emap_tpu.train.runner import Runner

    if kind == "e2e":
        from e2e_synthetic import build_conf

        conf = build_conf(os.path.abspath(path), steps=50000, batch=512,
                          seed=0, obj=obj, res=96)
    elif kind == "standin":
        conf = config.parse_file(path)
    elif kind == "prod":
        # a run_production.py output dir: <path>/<CONF>_standin.conf
        cands = [f for f in os.listdir(path) if f.endswith("_standin.conf")]
        conf = config.parse_file(os.path.join(path, cands[0]))
    elif kind == "parity":
        # a parity_reference.py OUT dir holding the torch reference's
        # ref_final.pth (64x4 net, multires 6 — the parity harness dims);
        # the .pth loads through ckpt/pth_import via the Runner
        os.environ["PARITY_OUT"] = os.path.abspath(path)
        os.environ.setdefault("PARITY_OBJ", obj)
        import importlib

        import parity_reference

        importlib.reload(parity_reference)  # re-bind OUT to this path
        conf = config.Config(parity_reference.shared_conf_dict("ref"))
        conf["train.latest_model_name"] = os.path.join(
            os.path.abspath(path), "ref_final.pth"
        )
    else:
        raise ValueError(kind)
    runner = Runner(conf, mode="extract_edge")
    runner.load_checkpoint()
    return runner


def gt_points(obj: str, spacing: float = 0.001) -> np.ndarray:
    from emap_tpu.data.synthetic import (
        sample_cube_edge_points,
        sample_ring_edge_points,
    )

    return (sample_ring_edge_points(0.5, spacing=spacing) if obj == "rings"
            else sample_cube_edge_points(0.5, spacing=spacing))


def eval_udf(runner, pts: np.ndarray) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from emap_tpu.fields.udf import udf_value

    fn = jax.jit(lambda p, x: jnp.abs(udf_value(p, x, runner.ucfg)))
    chunk = 1 << 16  # tunneled-backend row cap (autothresh.py note)
    pad = (-len(pts)) % chunk
    padded = np.concatenate(
        [pts.astype(np.float32), np.zeros((pad, 3), np.float32)]
    )
    outs = [fn(runner.state.params["udf"], jnp.asarray(padded[i:i + chunk]))
            for i in range(0, len(padded), chunk)]  # dispatch all ...
    return np.concatenate([np.asarray(o) for o in outs])[: len(pts)]


def band_profile(runner, obj: str, rng) -> dict:
    """|udf| binned by exact distance-to-edge; halfwidths per tau."""
    from scipy.spatial import cKDTree

    dense_gt = gt_points(obj, spacing=0.001)
    tree = cKDTree(dense_gt)
    base = gt_points(obj, spacing=0.005)
    probes = [base]  # offset 0
    for d in OFFSETS[1:]:
        dirs = rng.normal(size=base.shape)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        probes.append(base + d * dirs)
    probes = np.concatenate(probes)
    r_true = tree.query(probes, k=1)[0]
    vals = eval_udf(runner, probes)

    edges = np.array([0.0, 0.00125, 0.00375, 0.0075, 0.0125, 0.0175,
                      0.025, 0.035, 0.045, 0.06, 0.08])
    bins = []
    for lo, hi in zip(edges[:-1], edges[1:]):
        m = (r_true >= lo) & (r_true < hi)
        if m.sum() < 50:
            continue
        bins.append({
            "r_mid": round(float((lo + hi) / 2), 5),
            "n": int(m.sum()),
            "udf_q25": round(float(np.percentile(vals[m], 25)), 5),
            "udf_median": round(float(np.median(vals[m])), 5),
            "udf_q75": round(float(np.percentile(vals[m], 75)), 5),
        })
    # halfwidth(tau): largest r_mid whose median |udf| <= tau, linearly
    # interpolated between the crossing bins (monotonic in practice)
    r_mids = np.array([b["r_mid"] for b in bins])
    medians = np.array([b["udf_median"] for b in bins])
    halfwidths = {}
    for tau in TAUS:
        below = medians <= tau
        if not below.any():
            halfwidths[str(tau)] = 0.0
            continue
        if below.all():
            halfwidths[str(tau)] = float(r_mids[-1])
            continue
        i = int(np.where(below)[0][-1])
        if i + 1 < len(bins):
            r0, r1 = r_mids[i], r_mids[i + 1]
            m0, m1 = medians[i], medians[i + 1]
            t = (tau - m0) / (m1 - m0) if m1 != m0 else 0.0
            halfwidths[str(tau)] = round(float(r0 + t * (r1 - r0)), 5)
        else:
            halfwidths[str(tau)] = float(r_mids[i])
    return {"bins": bins, "band_halfwidth": halfwidths}


def candidate_counts(runner, res: int) -> dict:
    """Grid voxels with udf < tau at the conf's extraction resolution."""
    xs = np.linspace(-1, 1, res, dtype=np.float32)
    counts = {str(t): 0 for t in TAUS}
    # slab the grid to keep each eval <= 1<<16-aligned chunks
    for z in xs:
        g = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
        g = np.concatenate(
            [g, np.full((len(g), 1), z, np.float32)], 1
        ).astype(np.float32)  # (x, y) slab + z -> (x, y, z)
        vals = eval_udf(runner, g)
        for t in TAUS:
            counts[str(t)] += int((vals < t).sum())
    return counts


def main() -> None:
    registry = []
    for arg in sys.argv[1:]:
        label, rest = arg.split("=", 1)
        kind, path = rest.split(":", 1)
        obj = "rings" if "rings" in label else "cube"
        res = int(os.environ.get("ZB_RES", "96"))
        registry.append((label, kind, path, obj, res))
    if not registry:
        registry = default_registry()

    rng = np.random.default_rng(0)
    report = {"taus": TAUS, "offsets": OFFSETS, "checkpoints": {}}
    for label, kind, path, obj, res in registry:
        if not os.path.exists(path):
            print(json.dumps({"skip": label, "missing": path}), flush=True)
            continue
        runner = load_runner(kind, path, obj)
        row = {"obj": obj, "grid_res": res, **band_profile(runner, obj, rng)}
        if os.environ.get("ZB_COUNTS", "1") == "1":
            row["candidate_counts"] = candidate_counts(runner, res)
        report["checkpoints"][label] = row
        print(json.dumps({label: row["band_halfwidth"]}), flush=True)

    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"out": OUT, "n": len(report["checkpoints"])}))


if __name__ == "__main__":
    main()
