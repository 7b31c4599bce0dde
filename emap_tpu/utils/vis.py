"""Visualization helpers (reference src/utils/visualization.py:9-29)."""

from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def visualize_depth(depth: np.ndarray) -> np.ndarray:
    """Normalize a depth map to [0,255] and apply the JET colormap.

    Returns an (H, W, 3) uint8 RGB image.
    """
    x = np.nan_to_num(np.asarray(depth, dtype=np.float64))
    mi, ma = float(x.min()), float(x.max())
    x = (x - mi) / max(ma - mi, 1e-8)
    x8 = (255 * x).astype(np.uint8)
    return np.asarray(cv2.applyColorMap(x8, cv2.COLORMAP_JET))
