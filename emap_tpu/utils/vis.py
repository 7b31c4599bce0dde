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


def get_flow_vis(ang: np.ndarray, magnitude: float = 5.0) -> np.ndarray:
    """Angle-field visualization (reference visualization.py:25-29 uses the
    flow_vis package; here the equivalent HSV flow-color wheel via OpenCV:
    hue = angle, value = magnitude)."""
    u = magnitude * np.cos(ang)
    v = magnitude * np.sin(ang)
    mag, angle = cv2.cartToPolar(
        u.astype(np.float32), v.astype(np.float32), angleInDegrees=True
    )
    hsv = np.zeros((*ang.shape, 3), dtype=np.uint8)
    hsv[..., 0] = (angle / 2).astype(np.uint8)  # OpenCV hue range 0..180
    hsv[..., 1] = 255
    hsv[..., 2] = cv2.normalize(mag, None, 0, 255, cv2.NORM_MINMAX).astype(
        np.uint8
    )
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def semantic_color_map(n: int = 256, seed: int = 1) -> np.ndarray:
    """Deterministic categorical color map for semantic visualizations
    (the reference vendors a fixed random table, visualization.py:32+)."""
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 1.0, size=(n, 3))
