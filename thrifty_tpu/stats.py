"""Statistical utilities."""

from __future__ import annotations

import numpy as np


def is_outlier(points: np.ndarray, thresh: float = 3.5) -> np.ndarray:
    """Modified-z-score (MAD-based) outlier mask.

    A point is an outlier when 0.6745*|x - median| / MAD > thresh
    (Iglewicz & Hoaglin; reference thrifty/stat_tools.py:8-41).
    """
    points = np.asarray(points, dtype=np.float64)
    if points.ndim == 1:
        points = points[:, None]
    median = np.median(points, axis=0)
    diff = np.sqrt(np.sum((points - median) ** 2, axis=-1))
    mad = np.median(diff)
    if mad == 0:
        return np.zeros(len(points), dtype=bool)
    return 0.6745 * diff / mad > thresh
