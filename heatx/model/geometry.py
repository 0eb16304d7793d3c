"""Minimal 3-D polygon geometry for building surfaces.

Host-side replacement for the slice of the reference's external ``geometry3d``
crate that the heat module consumes (normal / area / perimeter / centroid of a
surface polygon, see model.rs:248-256).  Pure numpy float64; runs once at
model build.
"""

from __future__ import annotations

import numpy as np


def polygon_normal(vertices: np.ndarray) -> np.ndarray:
    """Unit normal of a planar polygon via Newell's method."""
    v = np.asarray(vertices, dtype=np.float64)
    n = np.zeros(3)
    for i in range(len(v)):
        a = v[i]
        b = v[(i + 1) % len(v)]
        n[0] += (a[1] - b[1]) * (a[2] + b[2])
        n[1] += (a[2] - b[2]) * (a[0] + b[0])
        n[2] += (a[0] - b[0]) * (a[1] + b[1])
    norm = np.linalg.norm(n)
    if norm < 1e-12:
        raise ValueError("degenerate polygon (zero normal)")
    return n / norm


def polygon_area(vertices: np.ndarray) -> float:
    """Area of a planar polygon (outer loop only)."""
    v = np.asarray(vertices, dtype=np.float64)
    normal = polygon_normal(v)
    total = np.zeros(3)
    for i in range(len(v)):
        total += np.cross(v[i], v[(i + 1) % len(v)])
    return float(abs(np.dot(total, normal)) / 2.0)


def polygon_perimeter(vertices: np.ndarray) -> float:
    v = np.asarray(vertices, dtype=np.float64)
    return float(sum(np.linalg.norm(v[(i + 1) % len(v)] - v[i]) for i in range(len(v))))


def polygon_centroid(vertices: np.ndarray) -> np.ndarray:
    """Vertex-average centroid (sufficient for the centroid.z height used by
    the wind-speed profile, model.rs:256)."""
    v = np.asarray(vertices, dtype=np.float64)
    return v.mean(axis=0)
