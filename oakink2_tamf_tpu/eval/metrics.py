"""Evaluation metrics: Contact Ratio, Solid Intersection Volume, PSKL-J, FID.

Functional ports of the reference metric definitions
(script/compute_score/compute_score_{cr,siv,psklj,fid}.py):

- CR: fraction of frames whose min hand-vert <-> object-point distance < 5 mm
  (cr.py:282-286); the distance core runs on device (core/geometry.min_cdist).
- SIV: sum of object-interior cell volumes (cm^3) inside the closed hand mesh,
  every `frame_stride`-th frame (siv.py:128-155). Object interior points come
  from a voxel-grid containment test (replacing the pysdf dependency: the
  reference only ever uses sdf>0 as an inside mask, so the interior-point set
  is identical up to boundary cells). The hand containment test is the C++
  triangle-hash parity check.
- PSKL-J: symmetric KL between normalized FFT power spectra of joint
  accelerations, averaged over feature dims (psklj.py:279-317).
- FID: Frechet distance between SegmentEncoder encodings (fid.py:142-207).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from ..core import geometry as G
from ..core import transforms as T
from .inside_mesh import check_mesh_contains

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Contact Ratio
# ---------------------------------------------------------------------------


def transf_merge_obj_pointcloud(obj_pointcloud: np.ndarray, obj_traj: np.ndarray) -> np.ndarray:
    """[nobj, P, 3] canonical clouds + [nobj, L, 9] tslrot6d -> [L, nobj*P, 3]
    world-frame merged cloud (cr.py:123-137)."""
    transf = np.asarray(T.tslrot6d_to_transf(jnp.asarray(obj_traj)))  # [nobj, L, 4, 4]
    moved = np.asarray(
        T.transf_point_array(jnp.asarray(transf), jnp.asarray(obj_pointcloud[:, None]))
    )  # [nobj, L, P, 3]
    moved = np.swapaxes(moved, 0, 1)
    return moved.reshape(moved.shape[0], -1, 3)


def contact_min_dists(hand_verts: np.ndarray, merged_pc: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """Per-frame min distances [L] (device-accelerated)."""
    return np.asarray(G.min_cdist(jnp.asarray(hand_verts), jnp.asarray(merged_pc), chunk=chunk))


def contact_ratio(all_min_dists: np.ndarray, threshold: float = 0.005) -> float:
    """mean(dist < 5mm) over all frames of all segments (cr.py:282-286)."""
    return float(np.mean(np.asarray(all_min_dists) < threshold))


# ---------------------------------------------------------------------------
# Solid Intersection Volume
# ---------------------------------------------------------------------------


def object_interior_grid(
    obj_verts: np.ndarray,
    obj_faces: np.ndarray,
    bbox_expand_ratio: float = 1.2,
    resolution: int = 100,
) -> tuple[np.ndarray, np.ndarray]:
    """Interior points of a watertight object mesh on a regular grid.

    Mirrors dev_fn/util/sdf_util.process_sdf's grid construction (center the
    mesh, expand the bbox by 1.2, res^3 ticks) but derives the interior mask by
    mesh containment instead of a pysdf field (only sdf>0 is ever consumed:
    compute_score_siv.py:139). Returns (interior points in object frame,
    tick_unit [3])."""
    vmin = obj_verts.min(axis=0)
    vmax = obj_verts.max(axis=0)
    center = (vmin + vmax) / 2.0
    extent = vmax - vmin
    extent_expanded = extent * bbox_expand_ratio
    tick_unit = extent_expanded / resolution

    ticks = [
        np.linspace(-extent_expanded[j] / 2.0, extent_expanded[j] / 2.0, resolution)
        for j in range(3)
    ]
    x, y, z = np.meshgrid(*ticks, indexing="ij")
    pts = np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1)

    inside = check_mesh_contains(obj_verts - center, obj_faces, pts)
    return pts[inside] + center, tick_unit


def solid_intersection_volume(
    hand_verts: np.ndarray,
    hand_faces_closed: np.ndarray,
    obj_interior_points: Sequence[np.ndarray],
    obj_tick_units: Sequence[np.ndarray],
    obj_transf: Sequence[np.ndarray],
) -> float:
    """SIV for ONE frame in cm^3 (siv.py:128-155): per object, move its interior
    grid points by the frame transform and count those inside the hand mesh."""
    siv = 0.0
    for pts, tick, X in zip(obj_interior_points, obj_tick_units, obj_transf):
        if len(pts) == 0:
            continue
        el_vol = float(np.prod(tick))
        world = np.asarray(
            T.transf_point_array(jnp.asarray(X[None]), jnp.asarray(pts[None]))
        )[0]
        inside = check_mesh_contains(hand_verts, hand_faces_closed, world)
        siv += float(inside.sum()) * el_vol * 1e6
    return siv


# ---------------------------------------------------------------------------
# PSKL-J
# ---------------------------------------------------------------------------


def joint_power_spectrum(joints: np.ndarray) -> np.ndarray:
    """[L, J, 3] joints -> |FFT(accel)|^2 over time (psklj.py:285-293)."""
    acc = np.diff(joints, n=2, axis=0)
    return np.abs(np.fft.fft(acc, axis=0)) ** 2


def psklj(
    dataset_joints: Sequence[np.ndarray], model_joints: Sequence[np.ndarray]
) -> tuple[float, float]:
    """Symmetric KL of summed+normalized acceleration power spectra
    (psklj.py:279-317). All sequences must share a common padded length (the
    reference pads trailing frames with the last valid pose)."""
    ds_psd = np.stack([joint_power_spectrum(j) for j in dataset_joints], axis=0)
    md_psd = np.stack([joint_power_spectrum(j) for j in model_joints], axis=0)

    ds = ds_psd.sum(axis=0) + 1e-8
    md = md_psd.sum(axis=0) + 1e-8
    ds = ds / ds.sum(axis=0, keepdims=True)
    md = md / md.sum(axis=0, keepdims=True)

    num_feat = ds.shape[1]
    pskl_gt_model = float(np.sum(ds * np.log(ds / md)) / num_feat)
    pskl_model_gt = float(np.sum(md * np.log(md / ds)) / num_feat)
    return pskl_gt_model, pskl_model_gt


def pad_tail_with_last(joints: np.ndarray, valid_len: int) -> np.ndarray:
    """Freeze trailing padded frames at the last valid pose (psklj.py:270-272)."""
    out = joints.copy()
    if valid_len < len(out):
        out[valid_len:] = out[valid_len - 1]
    return out


# ---------------------------------------------------------------------------
# FID
# ---------------------------------------------------------------------------


def calculate_activation_statistics(activations: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    mu = np.mean(activations, axis=0)
    sigma = np.cov(activations, rowvar=False)
    return mu, sigma


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Stable Frechet distance (fid.py:142-197, the Dougal Sutherland form)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(f"imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def calculate_fid(act1: np.ndarray, act2: np.ndarray) -> float:
    return calculate_frechet_distance(
        *calculate_activation_statistics(act1), *calculate_activation_statistics(act2)
    )
