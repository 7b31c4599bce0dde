"""Failure detection: finite-value guards.

The reference relies on NaN tripwires that drop into pdb
(udf_renderer_blending.py:102-107, :346-351, :632-633) -- unusable in
production and incompatible with jit. Here divergence is detected on the
host at metric-fetch cadence (no extra device sync) and aborts with a
diagnostic instead of hanging a fleet. For step-level debugging use
JAX_DEBUG_NANS=1 (disables some fusion; dev only).
"""

from __future__ import annotations

import math
from typing import Mapping


class TrainingDiverged(RuntimeError):
    pass


def assert_finite_metrics(metrics: Mapping[str, float], step: int) -> None:
    """Raise TrainingDiverged if any scalar metric is NaN/Inf."""
    bad = {
        k: v
        for k, v in metrics.items()
        if isinstance(v, float) and not math.isfinite(v)
    }
    if bad:
        raise TrainingDiverged(
            f"non-finite metrics at step {step}: {bad}. "
            "Re-run with JAX_DEBUG_NANS=1 to locate the producing op."
        )
