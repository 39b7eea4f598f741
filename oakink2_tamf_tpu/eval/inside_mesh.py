"""Watertight-mesh containment test (SIV metric core).

Functional equivalent of reference dev_fn/external/libmesh/inside_mesh.py
(+ its Cython TriangleHash): rescale to grid coords, 2-D spatial hash over
triangle bboxes, +z ray parity counted above and below the point, inside =
both parities odd. Primary path is the C++ library (native/triangle_hash.cpp);
a vectorized numpy fallback keeps the metric available without a toolchain.
"""

from __future__ import annotations

import numpy as np

from ..native import inside_mesh_native


def check_mesh_contains(
    verts: np.ndarray, faces: np.ndarray, points: np.ndarray, hash_resolution: int = 512
) -> np.ndarray:
    """verts [V,3], faces [F,3], points [N,3] -> bool [N]."""
    out = inside_mesh_native(verts, faces, points, hash_resolution)
    if out is not None:
        return out
    return _inside_mesh_numpy(verts, faces, points, hash_resolution)


def _inside_mesh_numpy(verts, faces, points, resolution=512, chunk: int = 2048) -> np.ndarray:
    """Vectorized fallback: chunks of points against ALL triangles at once
    (no per-point python loop — SIV queries run this on ~1e6-point grids)."""
    tri = verts[faces].astype(np.float64)  # [F, 3, 3]
    bmin = tri.reshape(-1, 3).min(axis=0)
    bmax = tri.reshape(-1, 3).max(axis=0)
    ext = np.where(bmax - bmin > 0, bmax - bmin, 1.0)
    scale = (resolution - 1) / ext
    trans = 0.5 - scale * bmin
    tri = scale * tri + trans
    pts = scale * points.astype(np.float64) + trans

    contains = np.zeros(len(pts), dtype=bool)
    in_aabb = np.all((pts >= 0) & (pts <= resolution), axis=1)
    if not in_aabb.any():
        return contains
    q_all = pts[in_aabb]

    a, b, c = tri[:, 0], tri[:, 1], tri[:, 2]  # [F, 3]
    A00, A01 = a[:, 0] - c[:, 0], b[:, 0] - c[:, 0]
    A10, A11 = a[:, 1] - c[:, 1], b[:, 1] - c[:, 1]
    det = A00 * A11 - A01 * A10
    s_det = np.sign(det)
    abs_det = np.abs(det)
    n = np.cross(c - a, b - a)  # [F, 3]
    nz = n[:, 2]
    abs_nz = np.abs(nz)
    s_nz = np.sign(nz)
    valid_tri = (det != 0) & (nz != 0)

    res_above = np.zeros(len(q_all), dtype=np.int64)
    res_below = np.zeros(len(q_all), dtype=np.int64)
    for start in range(0, len(q_all), chunk):
        q = q_all[start : start + chunk]  # [P, 3]
        y0 = q[:, 0:1] - c[None, :, 0]  # [P, F]
        y1 = q[:, 1:2] - c[None, :, 1]
        u = (A11 * y0 - A01 * y1) * s_det
        v = (-A10 * y0 + A00 * y1) * s_det
        suv = u + v
        hit = (
            valid_tri[None]
            & (0 < u) & (u < abs_det) & (0 < v) & (v < abs_det)
            & (0 < suv) & (suv < abs_det)
        )
        alpha = n[:, 0] * (a[None, :, 0] - q[:, 0:1]) + n[:, 1] * (a[None, :, 1] - q[:, 1:2])
        depth = a[None, :, 2] * abs_nz + alpha * s_nz  # [P, F]
        up = depth >= q[:, 2:3] * abs_nz[None]
        res_above[start : start + chunk] = (hit & up).sum(axis=1)
        res_below[start : start + chunk] = (hit & ~up).sum(axis=1)

    contains[in_aabb] = (res_above % 2 == 1) & (res_below % 2 == 1)
    return contains
