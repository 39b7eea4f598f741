"""Static-shape batch collate.

The reference collate (dataset/collate.py) pads the object axis to the batch
max and keeps meshes/texts as ragged python lists. On TPU every jitted shape
must be static, so:
- the object axis pads to a FIXED `max_nobj` with a boolean `obj_mask`
- per-object point clouds pad likewise -> `obj_points` [bs, max_nobj, P, 3]
- hand_side becomes an int id (0=rh, 1=lh)
- raw text stays a python list (encoded to `text_emb` before device transfer)

Key classes mirror the reference: DEFAULT (stack), NO (list), PAD (object
axis), DROP.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

HAND_SIDE_MAP = {"rh": 0, "lh": 1}

DEFAULT_COLLATE_KEY = [
    "pose_repr",
    "pose_repr_lh",
    "pose_repr_rh",
    "shape",
    "shape_lh",
    "shape_rh",
    "len",
    "mask",
    "obj_num",
    "sample_pose_repr",
    "action_label_id",
    "action_onehot",
    "text_emb",
    "target_h2o",
    "gt_o2h",
    "gt_h2o",
]
NO_COLLATE_KEY = [
    "text",
    "obj_list",
    "info",
    "obj_faces",
    "sample_info",
    "frame_id",
    "action_label",
]
PAD_OBJ_KEY = ["obj_traj", "obj_embedding", "obj_pointcloud", "obj_verts"]


def _pad_axis0(a: np.ndarray, n: int) -> np.ndarray:
    if a.shape[0] >= n:
        return a[:n]
    pad = np.zeros((n - a.shape[0], *a.shape[1:]), dtype=a.dtype)
    return np.concatenate([a, pad], axis=0)


# permutations are pure functions of the canonical clouds, which recur
# identically every batch and epoch — recomputing the recursive median-split
# per collate call kept loader threads busy for ms per cloud. Content-keyed
# (md5 of the downsampled bytes, ~50 us) so it is safe even when the dataset
# rebuilds arrays per __getitem__; capped FIFO (datasets hold hundreds of
# distinct objects, not millions). Benign GIL races: worst case is one
# duplicate computation.
_SORT_CACHE: dict[bytes, np.ndarray] = {}
_SORT_CACHE_MAX = 4096


def _pad_points(point_list: Sequence[np.ndarray], n_points: int) -> np.ndarray:
    """Ragged per-object point arrays -> [nobj, n_points, 3] (subsample or pad).

    Each cloud is spatially sorted (utils/pc_util.spatial_sort_indices) so
    contiguous 128-point blocks are compact: the cluster-pruned chamfer
    kernels (ops/chamfer_cluster.py) cell on contiguous blocks, and rigid
    per-frame transforms preserve block membership — one sort here serves
    every frame of the segment. Pure reordering; NN distances are unchanged."""
    import hashlib

    from ..utils.pc_util import spatial_sort_indices

    out = []
    for p in point_list:
        p = np.asarray(p, dtype=np.float32)
        if p.shape[0] >= n_points:
            idx = np.linspace(0, p.shape[0] - 1, n_points).astype(np.int64)
            p = p[idx]
        else:
            reps = int(np.ceil(n_points / max(p.shape[0], 1)))
            p = np.tile(p, (reps, 1))[:n_points]
        key = hashlib.md5(np.ascontiguousarray(p).tobytes()).digest()
        perm = _SORT_CACHE.get(key)
        if perm is None:
            perm = spatial_sort_indices(p)
            if len(_SORT_CACHE) >= _SORT_CACHE_MAX:
                _SORT_CACHE.pop(next(iter(_SORT_CACHE)))
            _SORT_CACHE[key] = perm
        out.append(p[perm])
    return np.stack(out, axis=0)


class SegmentCollate:
    """Collate sample dicts to a static-shape numpy batch.

    Args:
      max_nobj: static object-axis bound (reference pads to batch max;
                we pad to this fixed bound and mask).
      n_obj_points: static per-object point count for `obj_points`
                    (from obj_pointcloud or obj_verts, whichever is present).
    """

    def __init__(
        self,
        max_nobj: int = 4,
        n_obj_points: int = 2048,
        extra_default_key: Sequence[str] = (),
        extra_no_key: Sequence[str] = (),
        drop_key: Sequence[str] = (),
    ):
        self.max_nobj = max_nobj
        self.n_obj_points = n_obj_points
        self.default_key = set(DEFAULT_COLLATE_KEY) | set(extra_default_key)
        self.no_key = set(NO_COLLATE_KEY) | set(extra_no_key)
        self.pad_key = set(PAD_OBJ_KEY)
        self.drop_key = set(drop_key)

    def __call__(self, samples: Sequence[dict[str, Any]]) -> dict[str, Any]:
        keys = list(samples[0].keys())
        res: dict[str, Any] = {}
        for key in keys:
            if key in self.drop_key:
                continue
            vals = [s[key] for s in samples]
            if key == "hand_side":
                res[key] = np.asarray(
                    [HAND_SIDE_MAP[v] if isinstance(v, str) else int(v) for v in vals],
                    dtype=np.int32,
                )
            elif key in self.default_key:
                res[key] = np.stack([np.asarray(v) for v in vals], axis=0)
            elif key in self.no_key:
                res[key] = vals
            elif key in ("obj_pointcloud", "obj_verts"):
                # the reference prefers obj_pointcloud when both are present
                # (extra_loss.py:100-103, segment_refine_model.py:196-199)
                if key == "obj_verts" and "obj_pointcloud" in keys:
                    continue
                pts = [
                    _pad_axis0(_pad_points(v, self.n_obj_points), self.max_nobj) for v in vals
                ]
                res["obj_points"] = np.stack(pts, axis=0).astype(np.float32)
            elif key in self.pad_key:
                res[key] = np.stack(
                    [_pad_axis0(np.asarray(v, dtype=np.float32), self.max_nobj) for v in vals],
                    axis=0,
                )
            else:
                raise KeyError(f"unexpected key in batch: {key}")

        n_real = np.asarray([min(int(s["obj_num"]), self.max_nobj) for s in samples])
        res["obj_mask"] = np.arange(self.max_nobj)[None, :] < n_real[:, None]
        if "len" in res:
            res["len"] = res["len"].astype(np.int32)
        if "mask" in res:
            res["mask"] = res["mask"].astype(np.float32)
        return res


def interaction_segment_collate(samples, max_nobj: int = 4, n_obj_points: int = 2048):
    return SegmentCollate(max_nobj=max_nobj, n_obj_points=n_obj_points)(samples)
