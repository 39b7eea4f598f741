"""Synthetic interaction-segment batches: geometrically valid stand-ins for the
OakInk2 data, used by tests, benchmarks and the dry-run entry points.

Shapes follow the framework's static batch contract (data/collate.py):
  pose_repr  [bs, L, 99]   valid rot6d blocks (decodable to rotations)
  mask       [bs, L]       1.0 up to a per-sample length
  shape      [bs, L, 10]
  hand_side  [bs]          int32, 0=rh 1=lh
  text_emb   [bs, 512]     stand-in CLIP text features
  obj_traj   [bs, nobj, L, 9]  valid tslrot6d trajectories
  obj_embedding [bs, nobj, 768]
  obj_mask   [bs, nobj]    bool
  obj_points [bs, nobj, P, 3]
  action_label_id [bs]     int32 in [0, 70)
"""

from __future__ import annotations

import numpy as np

from ..core import transforms as T

import jax.numpy as jnp


def _random_rot6d(rng, shape):
    """Random valid rot6d blocks from random rotations."""
    a = rng.normal(size=shape + (3, 3))
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[..., None, :]
    det = np.linalg.det(q)
    q[..., :, 0] *= det[..., None]
    return q[..., :2, :].reshape(shape + (6,)).astype(np.float32)


def synthetic_batch(
    rng: np.random.Generator,
    batch_size: int = 4,
    seq_len: int = 160,
    max_nobj: int = 2,
    n_obj_points: int = 512,
    min_len: int = 16,
    as_jax: bool = True,
) -> dict:
    bs, L = batch_size, seq_len
    tsl = rng.normal(scale=0.2, size=(bs, L, 3)).astype(np.float32)
    rot6d = _random_rot6d(rng, (bs, L, 16)).reshape(bs, L, 96)
    pose_repr = np.concatenate([tsl, rot6d], axis=-1)

    lens = rng.integers(min_len, L + 1, size=(bs,))
    mask = np.zeros((bs, L), np.float32)
    for i, n in enumerate(lens):
        mask[i, :n] = 1.0
    # the real pipeline ZERO-pads every per-frame key past the true length
    # (data/slice.py:33; the reference zero-pads at collate the same way) —
    # honor that contract here so (a) synthetic benches exercise the
    # padded-frame dedup in models/refine_r.sample_geometry exactly as
    # production data does, (b) padded-frame content never leaks signal
    pose_repr = pose_repr * mask[:, :, None]

    n_real = rng.integers(1, max_nobj + 1, size=(bs,))
    obj_mask = np.zeros((bs, max_nobj), bool)
    for i, n in enumerate(n_real):
        obj_mask[i, :n] = True

    obj_tsl = rng.normal(scale=0.3, size=(bs, max_nobj, L, 3)).astype(np.float32)
    obj_rot6d = _random_rot6d(rng, (bs, max_nobj, L))
    obj_traj = np.concatenate([obj_tsl, obj_rot6d], axis=-1)
    obj_traj = obj_traj * mask[:, None, :, None]  # zero-pad contract (above)

    # canonical clouds, spatially sorted — the REAL pipeline's collate
    # contract (data/collate.py:74-95): contiguous leaf blocks are compact,
    # which the culled/cluster chamfer kernels' tile bounds rely on for
    # speed (never for correctness). Unsorted synthetic clouds would make
    # benches understate production kernels.
    from ..utils.pc_util import spatial_sort_indices

    obj_points = rng.normal(
        scale=0.1, size=(bs, max_nobj, n_obj_points, 3)
    ).astype(np.float32)
    for i in range(bs):
        for j in range(max_nobj):
            obj_points[i, j] = obj_points[i, j][spatial_sort_indices(obj_points[i, j])]

    batch = {
        "pose_repr": pose_repr,
        "mask": mask,
        "len": lens.astype(np.int32),
        "shape": rng.normal(scale=0.5, size=(bs, L, 10)).astype(np.float32)
        * mask[:, :, None],
        "hand_side": rng.integers(0, 2, size=(bs,)).astype(np.int32),
        "text_emb": rng.normal(size=(bs, 512)).astype(np.float32),
        "obj_traj": obj_traj,
        "obj_embedding": rng.normal(size=(bs, max_nobj, 768)).astype(np.float32),
        "obj_mask": obj_mask,
        "obj_points": obj_points,
        "action_label_id": rng.integers(0, 70, size=(bs,)).astype(np.int32),
    }
    if as_jax:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
    return batch


def with_perturbed_sample(batch: dict, rng: np.random.Generator, sigma_range=(0.02, 0.1)) -> dict:
    """Add a sample_pose_repr via Gaussian perturbation of pose_repr (the
    GuassianPerturbSampleAdaptor pattern, dataset/pose_repr_sample.py:55-94).

    Padded frames stay ZERO: the reference perturbs dataset items at their
    true length and zero-pads at collate, so sample_pose_repr past the mask
    is exactly zero — the contract sample_geometry's padded-frame dedup
    (models/refine_r.py) relies on. An earlier version perturbed the padded
    batch directly, deviating from the reference."""
    pr = np.asarray(batch["pose_repr"])
    sigma = rng.uniform(*sigma_range)
    noisy = pr.copy()
    noisy[..., 0:3] += rng.normal(scale=0.1 * sigma, size=pr[..., 0:3].shape)
    noisy[..., 3:] += rng.normal(scale=sigma, size=pr[..., 3:].shape)
    sp = np.asarray(T.renormalize_pose_repr_rot6d(jnp.asarray(noisy)))
    sp = sp * (np.asarray(batch["mask"]) > 0)[:, :, None]
    out = dict(batch)
    out["sample_pose_repr"] = jnp.asarray(sp)
    return out
