#!/usr/bin/env python
"""Full 200,000-iteration DTU-conf run on the synthetic stand-in scene
(VERDICT r1 item 4).

The reference's contract includes DTU/Replica at 200k iters
(/root/reference/confs/DTU.conf:29); the real DTU scans cannot be fetched
here (zero egress), so this drives the PRODUCTION CLI (main.py) with
confs/DTU.conf verbatim — only data_dir / scan path / far are overridden to
the synthetic stand-in, exactly like the full-ABC baseline row — through
train AND the 256^3 visible_checking=True extraction, then scores against
the analytic wireframe GT and reports the >50k-regime schedule behavior
(beta gate, variance re-enable at 20k, flip_saturation transitions) from
the checkpoint flags and metric history.

Env: DTU200K_OUT (./e2e_dtu200k), DTU200K_ITERS (200000 — override only for
smokes), DTU200K_OBJ (cube), DTU200K_CONF ("DTU"; set "Replica" to drive
confs/Replica.conf verbatim instead — same 200k contract,
/root/reference/confs/Replica.conf:29 — with its own scan name "room0"),
DTU200K_SEED (0 = conf verbatim, i.e. the reference's fixed 42 — set for
fresh-seed validation of the extended selector menus, VERDICT r3 item 4).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

OUT = os.path.abspath(os.environ.get("DTU200K_OUT", "./e2e_dtu200k"))
ITERS = int(os.environ.get("DTU200K_ITERS", "200000"))
OBJ = os.environ.get("DTU200K_OBJ", "cube")
CONF = os.environ.get("DTU200K_CONF", "DTU")
SCAN = {"DTU": "scan105", "Replica": "room0"}[CONF]
SEED = int(os.environ.get("DTU200K_SEED", "0"))  # 0 = conf verbatim (42)


def main() -> None:
    from emap_tpu import config
    from emap_tpu.cli import main as cli_main
    from emap_tpu.data.synthetic import make_synthetic_scene

    os.makedirs(OUT, exist_ok=True)
    data_dir = os.path.join(OUT, "data")
    make_synthetic_scene(data_dir, scan=SCAN, n_views=24, H=128, W=128,
                         detector="PidiNet", far=4.5, obj=OBJ)

    conf = config.parse_file(os.path.join(REPO, "confs", f"{CONF}.conf"))
    conf["general.base_exp_dir"] = os.path.join(OUT, "exp")
    conf["general.recording"] = []
    conf["dataset.data_dir"] = data_dir
    conf["dataset.far"] = 4.5  # synthetic cameras orbit at r=2.2
    conf["train.latest_model_name"] = "ckpt_best.npz"  # native ckpt format
    if SEED:  # fresh-seed menu validation only; production runs verbatim
        conf["train.seed"] = SEED
    if ITERS != 200000:  # smoke override only; production runs verbatim
        conf["train.end_iter"] = ITERS
        # the conf's 5k save cadence never fires on a short smoke
        conf["train.save_freq"] = min(5000, max(500, ITERS // 2))
        conf["train.val_freq"] = conf["train.save_freq"]
    if os.environ.get("DTU200K_RES"):  # smoke override only
        conf["edge_extraction.resolution"] = int(os.environ["DTU200K_RES"])
    conf_path = os.path.join(OUT, f"{CONF}_standin.conf")
    with open(conf_path, "w") as f:
        f.write(conf.to_hocon())

    # DTU200K_SKIP_TRAIN=1: resume from an already-completed checkpoint
    # (e.g. the train finished but the host died before extraction); the
    # extract_edge mode loads ckpt_best.npz itself. DTU200K_TRAIN_WALL
    # carries the original train wall-clock into the report.
    t0 = time.time()
    if os.environ.get("DTU200K_SKIP_TRAIN", "") != "1":
        cli_main(["--conf", conf_path, "--mode", "train"])
        train_wall = time.time() - t0
    else:
        train_wall = float(os.environ.get("DTU200K_TRAIN_WALL", "0"))

    t1 = time.time()
    cli_main(["--conf", conf_path, "--mode", "extract_edge"])
    extract_wall = time.time() - t1

    # ---- schedule-behavior confirmation from the final checkpoint --------
    from emap_tpu.ckpt.native import load_pytree
    from emap_tpu.train import schedules

    exp_dir = os.path.join(OUT, "exp", SCAN, "emap")
    ckpt = load_pytree(os.path.join(exp_dir, "checkpoints", "ckpt_best.npz"))
    flags = {k: bool(v) for k, v in ckpt["flags"].items()}
    gates = {
        "iter_step": int(ckpt["iter_step"]),
        **flags,
        "flip_saturation_at_0": float(schedules.flip_saturation(0, ITERS)),
        "flip_saturation_mid": float(
            schedules.flip_saturation(ITERS // 2, ITERS)
        ),
        "flip_saturation_end": float(
            schedules.flip_saturation(ITERS - 1, ITERS)
        ),
    }

    # ---- score vs the analytic wireframe (ABC protocol) ------------------
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from e2e_synthetic import score_extraction

    with open(os.path.join(exp_dir, "results", "parametric_edges.json")) as f:
        edges = json.load(f)
    edge_dict = {
        "lines_end_pts": edges.get("lines_end_pts", []),
        "curves_ctl_pts": edges.get("curves_ctl_pts", []),
    }
    score = score_extraction(exp_dir, edge_dict, OBJ)

    report = {
        "conf": f"confs/{CONF}.conf (data_dir/scan/far overridden)",
        "seed": SEED or 42,
        "iters": ITERS,
        "train_wall_s": round(train_wall, 1),
        "extract_wall_s": round(extract_wall, 1),
        "gates": gates,
        "score": score,
    }
    sel_path = os.path.join(exp_dir, "results", "threshold_selection.json")
    if os.path.isfile(sel_path):
        with open(sel_path) as f:
            report["threshold_selection"] = json.load(f)

    # ---- optional GT-oracle table over fixed thresholds (VERDICT r2
    # item 2a): re-extract at each candidate with the selector OFF, at the
    # conf's own protocol, and score each against the analytic GT. Shows
    # where the selector's pick lands relative to the (production-invisible)
    # oracle. DTU200K_ORACLE="0.005 0.0075 0.01 0.015 0.02 0.03" to enable.
    oracle_thrs = [float(t) for t in
                   os.environ.get("DTU200K_ORACLE", "").split()]
    try:
        _oracle_pass(report, oracle_thrs, conf, exp_dir, score_extraction)
    except Exception as exc:  # never lose the 46-min train to a score bug
        report["oracle_error"] = repr(exc)

    with open(os.path.join(OUT, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


def _oracle_pass(report, oracle_thrs, conf, exp_dir, score_extraction):
    if oracle_thrs:
        import shutil

        from emap_tpu.train.runner import Runner

        res_dir = os.path.join(exp_dir, "results")
        snapshot = os.path.join(OUT, "results_selector_snapshot")
        shutil.rmtree(snapshot, ignore_errors=True)
        shutil.copytree(res_dir, snapshot)
        econf = conf  # the stand-in conf written above
        runner = Runner(econf, mode="extract_edge")
        ee = econf["edge_extraction"]
        rows = []
        try:
            for thr in oracle_thrs:
                ed = runner.extract_edge(
                    resolution=ee["resolution"],
                    udf_threshold=thr,
                    sampling_N=ee["sampling_N"],
                    sampling_delta=ee["sampling_delta"],
                    is_pointshift=ee["is_pointshift"],
                    iters=ee["iters"],
                    is_linedirection=ee["is_linedirection"],
                    visible_checking=ee["visible_checking"],
                    auto_threshold=None,
                )
                s = score_extraction(exp_dir, ed, OBJ)
                rows.append({"thr": thr, "fscore_0.005": s["fscore_0.005"],
                             "fscore_0.01": s["fscore_0.01"],
                             "n_lines": s["n_lines"],
                             "n_curves": s["n_curves"],
                             "chamfer": s["chamfer"]})
                print(json.dumps(rows[-1]), flush=True)
        finally:
            # restore the selector's production artifacts even when an
            # oracle extraction throws mid-loop — otherwise results/ would
            # silently hold the last candidate's output (ADVICE r3)
            shutil.rmtree(res_dir, ignore_errors=True)
            shutil.copytree(snapshot, res_dir)
            shutil.rmtree(snapshot, ignore_errors=True)
        report["oracle_thresholds"] = rows


if __name__ == "__main__":
    main()
