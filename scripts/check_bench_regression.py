#!/usr/bin/env python
"""Bench-regression tripwire, runnable form (VERDICT r4 item 7).

Replays the recorded BENCH_r*.json / MULTICHIP_r*.json artifacts (same
rule as tests/test_bench_guard.py: latest >= 0.95 x best, multichip ok)
and, with CHECK_BENCH_LIVE=1, additionally runs bench.py on the real chip
and holds the LIVE number to the same bar — the zero-latency answer
before shipping a perf-sensitive change.

Exit 0 = no regression; exit 1 = regression (loud, with numbers).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
TOLERANCE = 0.95


def main() -> int:
    rows = []
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        parsed = data.get("parsed") or {}
        if parsed.get("metric") == "train_rays_per_sec_per_chip":
            rows.append((os.path.basename(path), float(parsed["value"])))
    if not rows:
        print("no BENCH_r*.json artifacts; nothing to guard")
        return 0
    best = max(v for _, v in rows)
    latest_name, latest = rows[-1]
    ok = latest >= TOLERANCE * best
    print(f"recorded: latest {latest_name}={latest:.0f} rays/s, "
          f"best={best:.0f}, floor={TOLERANCE * best:.0f} -> "
          f"{'ok' if ok else 'REGRESSION'}")

    mc = sorted(glob.glob(os.path.join(REPO, "MULTICHIP_r*.json")))
    if mc:
        with open(mc[-1]) as f:
            m = json.load(f)
        mc_ok = m.get("ok") is True and not m.get("skipped")
        print(f"multichip: {os.path.basename(mc[-1])} -> "
              f"{'ok' if mc_ok else 'NOT OK'}")
        ok = ok and mc_ok

    if os.environ.get("CHECK_BENCH_LIVE") == "1":
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, timeout=1800,
        )
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")][-1]
        live = float(json.loads(line)["value"])
        live_ok = live >= TOLERANCE * best
        print(f"live: {live:.0f} rays/s, floor={TOLERANCE * best:.0f} -> "
              f"{'ok' if live_ok else 'REGRESSION'}")
        ok = ok and live_ok

    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
