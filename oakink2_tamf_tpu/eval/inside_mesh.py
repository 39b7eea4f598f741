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


def _inside_mesh_numpy(verts, faces, points, resolution=512) -> np.ndarray:
    tri = verts[faces].astype(np.float64)  # [F, 3, 3]
    n_tri = tri.shape[0]
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
    q = pts[in_aabb]

    # cell ids
    cell_q = np.clip(q[:, :2].astype(int), 0, resolution - 1)
    # triangle bbox cells
    t0 = np.clip(tri[:, :, :2].min(axis=1).astype(int), 0, resolution - 1)
    t1 = np.clip(tri[:, :, :2].max(axis=1).astype(int), 0, resolution - 1)

    # bucket triangles by cell (python dict of lists — eval-side, small meshes)
    buckets: dict[tuple[int, int], list[int]] = {}
    for t in range(n_tri):
        for x in range(t0[t, 0], t1[t, 0] + 1):
            for y in range(t0[t, 1], t1[t, 1] + 1):
                buckets.setdefault((x, y), []).append(t)

    above = np.zeros(len(q), dtype=np.int64)
    below = np.zeros(len(q), dtype=np.int64)
    for i in range(len(q)):
        cand = buckets.get((cell_q[i, 0], cell_q[i, 1]))
        if not cand:
            continue
        T = tri[cand]  # [k, 3, 3]
        a, b, c = T[:, 0], T[:, 1], T[:, 2]
        A00, A01 = a[:, 0] - c[:, 0], b[:, 0] - c[:, 0]
        A10, A11 = a[:, 1] - c[:, 1], b[:, 1] - c[:, 1]
        y0, y1 = q[i, 0] - c[:, 0], q[i, 1] - c[:, 1]
        det = A00 * A11 - A01 * A10
        s = np.sign(det)
        ad = np.abs(det)
        u = (A11 * y0 - A01 * y1) * s
        v = (-A10 * y0 + A00 * y1) * s
        suv = u + v
        hit = (det != 0) & (0 < u) & (u < ad) & (0 < v) & (v < ad) & (0 < suv) & (suv < ad)
        if not hit.any():
            continue
        a, b, c = a[hit], b[hit], c[hit]
        v1 = c - a
        v2 = b - a
        n = np.cross(v1, v2)
        alpha = n[:, 0] * (a[:, 0] - q[i, 0]) + n[:, 1] * (a[:, 1] - q[i, 1])
        nz = n[:, 2]
        ok = nz != 0
        depth = a[ok, 2] * np.abs(nz[ok]) + alpha[ok] * np.sign(nz[ok])
        up = depth >= q[i, 2] * np.abs(nz[ok])
        above[i] = int(up.sum())
        below[i] = int((~up).sum())

    contains[in_aabb] = (above % 2 == 1) & (below % 2 == 1)
    return contains
