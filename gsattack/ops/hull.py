"""Convex-hull membership for grouped-object selection.

Host-side (scipy Delaunay) re-implementation of
`scratch/edit_object_removal.py:31-69` — needed by the grouped attack path
(the reference calls it at `attack.py:312` with the import commented out;
documented defect SURVEY.md §2.5). One-shot scene setup, not a hot path.
"""

from __future__ import annotations

import numpy as np


def points_inside_convex_hull(
    points: np.ndarray,
    mask: np.ndarray,
    remove_outliers: bool = True,
    outlier_factor: float = 1.0,
) -> np.ndarray:
    """Mask of points inside the convex hull of the masked subset.

    IQR outlier filter on the masked points (factor * IQR beyond Q1/Q3 on
    any axis drops the point), then Delaunay membership of every point.
    """
    points = np.asarray(points)
    mask = np.asarray(mask, dtype=bool)
    masked = points[mask]
    if remove_outliers and masked.shape[0] > 0:
        q1 = np.percentile(masked, 25, axis=0)
        q3 = np.percentile(masked, 75, axis=0)
        iqr = q3 - q1
        bad = (masked < (q1 - outlier_factor * iqr)) | (
            masked > (q3 + outlier_factor * iqr)
        )
        masked = masked[~np.any(bad, axis=1)]
    if masked.shape[0] < 4:  # degenerate hull
        return mask.copy()
    from scipy.spatial import Delaunay

    try:
        tri = Delaunay(masked)
    except Exception:
        return mask.copy()
    return tri.find_simplex(points) >= 0
