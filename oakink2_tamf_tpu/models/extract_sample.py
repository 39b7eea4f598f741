"""G -> R chained inference (reference model/extract_sample.py).

`extract_refined_sample` runs the full two-stage pipeline on one segment:
batched reverse diffusion through G, then R's residual refinement. The bihand
variant slices a bimanual segment into one hand's sub-problem via `obj_pair`
(extract_sample.py:44-109) before running the same chain.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax

from ..core import diffusion as D
from ..data.collate import SegmentCollate
from ..models.refine_r import refine_forward
from ..parallel.train import g_cond_from_batch


def _device_batch(batch: dict[str, Any]) -> dict[str, Any]:
    from ..launch.common import DEVICE_BATCH_KEYS

    return {k: batch[k] for k in DEVICE_BATCH_KEYS if k in batch}


def extract_refined_sample(
    g_model,
    g_params,
    sched: D.DiffusionSchedule,
    refine_net,
    r_params,
    mano_stack,
    gt_samples: Sequence[dict[str, Any]],
    clip,
    key: jax.Array,
    *,
    max_nobj: int = 4,
    n_obj_points: int = 2048,
    sampler: str = "ddpm",
) -> np.ndarray:
    """Segments -> refined pose_reprs [bs, L, 99].

    Unlike the reference (one segment at a time, extract_sample.py:7-41), any
    number of segments batch through one scan chain + one refine forward.
    """
    collate = SegmentCollate(max_nobj=max_nobj, n_obj_points=n_obj_points)
    batch = collate(list(gt_samples))
    batch["text_emb"] = clip.encode_text(batch["text"]).astype(np.float32)
    dbatch = _device_batch(batch)
    cond = g_cond_from_batch(dbatch)
    bs, L = dbatch["pose_repr"].shape[:2]

    def model_fn(x, t):
        return g_model.apply(g_params, x, t, cond, deterministic=True)

    if sampler == "ddpm":
        sample = D.p_sample_loop(model_fn, sched, (bs, L, 99), key, clip_denoised=False)
    elif sampler == "ddim":
        sample = D.ddim_sample_loop(model_fn, sched, (bs, L, 99), key, clip_denoised=False)
    elif sampler == "plms":
        sample = D.plms_sample_loop(model_fn, sched, (bs, L, 99), key, clip_denoised=False)
    elif sampler == "parallel":
        sample = D.p_sample_loop_parallel(model_fn, sched, (bs, L, 99), key, clip_denoised=False)
    else:
        raise ValueError(sampler)

    # zero G's output past the true length before R (reference contract:
    # R consumes samples via its zero-padding collate — see serving.py note)
    dbatch["sample_pose_repr"] = sample * dbatch["mask"][:, :, None]
    out = refine_forward(
        refine_net, r_params, mano_stack, dbatch, deterministic=True,
        with_target=False, loss_frame_mask=dbatch["mask"],
    )
    return np.asarray(jax.device_get(out["refine_pose_repr"]))


def slice_bihand_sample(gt_sample: dict[str, Any], hand_side: str) -> dict[str, Any]:
    """Carve one hand's sub-segment out of a bimanual sample via obj_pair
    (extract_sample.py:44-80): keeps that hand's pose/shape and only the
    objects it interacts with."""
    magic = 1 if hand_side == "rh" else 0
    obj_list = gt_sample["obj_list"]
    obj_pair = gt_sample["obj_pair"]
    oid_indices = [obj_list.index(oid) for oid in obj_pair[magic]]
    return {
        "text": gt_sample["text"],
        "len": gt_sample["len"],
        "mask": gt_sample["mask"],
        "hand_side": hand_side,
        "pose_repr": gt_sample["pose_repr_rh" if hand_side == "rh" else "pose_repr_lh"],
        "shape": gt_sample["shape_rh" if hand_side == "rh" else "shape_lh"],
        "obj_num": len(obj_pair[magic]),
        "obj_list": obj_pair[magic],
        "obj_traj": gt_sample["obj_traj"][oid_indices, ...],
        "obj_embedding": gt_sample["obj_embedding"][oid_indices, ...],
        "obj_pointcloud": gt_sample["obj_pointcloud"][oid_indices, ...],
    }


def extract_refined_sample_bihand(
    g_model,
    g_params,
    sched: D.DiffusionSchedule,
    refine_net,
    r_params,
    mano_stack,
    gt_sample: dict[str, Any],
    hand_side: str,
    clip,
    key: jax.Array,
    **kwargs,
) -> np.ndarray:
    """Bimanual segment + hand side -> refined pose_repr [L, 99]."""
    sub = slice_bihand_sample(gt_sample, hand_side)
    out = extract_refined_sample(
        g_model, g_params, sched, refine_net, r_params, mano_stack, [sub], clip, key, **kwargs
    )
    return out[0]
