"""Bench-regression tripwire (VERDICT r4 item 7).

The perf file is closed (BENCH_r04: 120,542 rays/s/chip, 61.8% MFU); this
guard keeps it closed while quality work continues. Every CI run replays
the recorded driver artifacts: the LATEST BENCH_rN must hold >= 0.95x the
best recorded throughput, and the latest MULTICHIP_rN must be ok. A new
BENCH_rN lands only at round end, so a regression trips on the first CI
run of the following round — one round of latency, zero TPU cost.

scripts/check_bench_regression.py runs the same check plus an optional
fresh bench.py run for a zero-latency answer on the real chip.
"""

import glob
import json
import os

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _bench_rows():
    rows = []
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        parsed = data.get("parsed") or {}
        if parsed.get("metric") == "train_rays_per_sec_per_chip":
            rows.append((os.path.basename(path), float(parsed["value"])))
    return rows


def test_latest_bench_holds_best():
    rows = _bench_rows()
    assert rows, "no BENCH_r*.json artifacts found"
    latest_name, latest = rows[-1]
    best = max(v for _, v in rows)
    assert latest >= 0.95 * best, (
        f"bench regression: {latest_name} = {latest:.0f} rays/s is below "
        f"0.95 x best recorded ({best:.0f}); a perf-neutral change "
        f"regressed the closed perf file"
    )


def test_latest_multichip_ok():
    paths = sorted(glob.glob(os.path.join(REPO, "MULTICHIP_r*.json")))
    assert paths, "no MULTICHIP_r*.json artifacts found"
    with open(paths[-1]) as f:
        data = json.load(f)
    assert data.get("ok") is True and not data.get("skipped"), (
        f"latest multichip dryrun not ok: {paths[-1]}"
    )
