"""Refined sampling: run R over cached G samples (or perturbed GT) and save the
per-segment `save_dict.pkl` consumed by the compute_score metrics
(reference launch/sample_refine.py:221-300).

Output layout matches the reference:
  <ckpt_path>/sample/<offset>/<process_key with / -> ++>/<prim_id>/<hand_side>/save_dict.pkl
with keys {process_key, info, hand_side, joints, verts, faces (closed),
obj_list, len, frame_id, refine_pose_repr}. Dedup by info, like the reference.

Parallelism (reference sample_refine.py:264-292 shards 8 worker processes):
- across hosts: the DEDUPED segment list is split into contiguous per-process
  ranges (same contract as sample_g.py:99-104); override with
  --sample.num_shards/--sample.shard_index for external launchers
- across chips: refine_forward is jitted over the 1-D data mesh with the
  batch sharded on its leading axis
"""

from __future__ import annotations

import logging
import os
import pickle

import numpy as np
import jax

from ..core import mano as M
from ..data.adaptors import GaussianPerturbSampleAdaptor, GeneratedPoseReprSampleAdaptor
from ..data.collate import SegmentCollate
from ..models.refine_r import refine_forward, stack_mano_models
from ..parallel.mesh import make_local_mesh
from ..runtime.ckpt import load_checkpoint
from . import common, param
from .train_r import build_refine_net

_logger = logging.getLogger(__name__)

PROG = "sample_r"


def main(argv=None):
    reg, run_dir = common.boot(
        PROG,
        [
            param.reg_base_param,
            param.reg_mano_param,
            param.reg_model_param,
            param.reg_refine_sample_param,
            param.reg_sample_param,
        ],
        argv,
    )
    sample_cfg = reg.select("sample")
    split = sample_cfg.get("split", "test")
    # LOCAL mesh: sampler processes shard by segment (resolve_shard) and run
    # independent jits — a global mesh would deadlock (parallel/mesh.py)
    mesh = make_local_mesh(int(reg.select("runtime").get("device_count") or 0) or None)

    base = common.build_dataset(reg, split)
    try:
        sample_dirs = reg.select(f"{split}.data").get("pose_repr_sample_dir_list") or []
    except KeyError:
        sample_dirs = []
    if sample_dirs:
        dataset = GeneratedPoseReprSampleAdaptor(base, sample_dirs)
    else:
        dataset = GaussianPerturbSampleAdaptor(base, (0.02, 0.1), seed=0)
        _logger.warning("no G-sample dirs given; refining Gaussian-perturbed GT")

    # a `.pt` model_filepath is a ported REFERENCE checkpoint: the net must run
    # the exact erf gelu the torch weights were trained under
    from ..interop.torch_port import activation_for_checkpoint

    net = build_refine_net(
        reg, activation=activation_for_checkpoint(reg, sample_cfg.get("model_filepath"))
    )
    mano_path = reg.select("mano").get("mano_path") or None
    mano_rh = M.get_mano_model(mano_path, "right")
    mano_lh = M.get_mano_model(mano_path, "left")
    mano_stack = stack_mano_models(mano_rh, mano_lh)
    faces_closed = {
        0: M.closed_faces(mano_rh),
        1: M.closed_faces(mano_lh),
    }

    data_cfg = reg.select("data")
    collate = SegmentCollate(
        max_nobj=int(data_cfg.get("max_nobj", 4)),
        n_obj_points=int(data_cfg.get("n_obj_points", 2048)),
    )
    probe = collate([dataset[0]])
    dprobe = common.device_batch(probe)
    cond = {k: dprobe[k] for k in ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
    h2o0 = np.zeros(dprobe["sample_pose_repr"].shape[:2] + (778,), np.float32)
    params = net.init(jax.random.PRNGKey(0), dprobe["sample_pose_repr"], h2o0, cond)
    if sample_cfg.get("model_filepath"):
        fp = sample_cfg["model_filepath"]
        if fp.endswith(".pt"):  # trained REFERENCE checkpoint: port the weights
            from ..interop.torch_port import load_reference_checkpoint

            m = reg.select("model")
            params = load_reference_checkpoint(
                fp, "r", num_layers=int(m.get("num_layers", 8)),
                num_heads=int(m.get("num_heads", 4)),
            )
            _logger.info("ported reference torch checkpoint %s", fp)
        else:
            params = load_checkpoint(fp, params, strict=False)
            _logger.info("loaded refine model from %s", fp)

    from ..parallel.mesh import batch_sharding, replicate, replicated, shard_batch

    fwd = jax.jit(
        # loss_frame_mask: sample-h2o padded-frame dedup (exact, the loader's
        # collate zero-pads) — nothing saved here reads h2o at padded frames
        lambda p, b: refine_forward(net, p, mano_stack, b, deterministic=True,
                                    with_target=False, loss_frame_mask=b["mask"]),
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )
    params = replicate(params, mesh)

    out_root = os.path.join(run_dir.path, "sample", sample_cfg.get("save_prefix") or run_dir.exp_id)

    n_done = 0
    bs = int(sample_cfg.get("batch_size", 8))
    n_mesh = mesh.devices.size
    bs = max(bs, n_mesh) - (max(bs, n_mesh) % n_mesh)  # divisible by the mesh
    pending: list[dict] = []

    def flush(pending):
        nonlocal n_done
        if not pending:
            return
        batch = collate(pending)
        n_real = len(pending)
        dbatch = common.device_batch(batch)
        if n_real < bs:
            dbatch = jax.tree.map(
                lambda a: np.concatenate([a, np.repeat(a[-1:], bs - n_real, axis=0)], axis=0),
                jax.tree.map(np.asarray, dbatch),
            )
        # explicit device_put: raw numpy + in_shardings is rejected under
        # jax.distributed even on a fully-addressable local mesh
        out = fwd(params, shard_batch(dbatch, mesh))
        refined = np.asarray(jax.device_get(out["refine_pose_repr"]))[:n_real]
        verts = np.asarray(jax.device_get(out["refine_hand_verts"]))[:n_real]
        joints = np.asarray(jax.device_get(out["refine_hand_joints"]))[:n_real]
        for j, s in enumerate(pending):
            info = s["info"]
            hs = s["hand_side"]
            hs_id = 0 if hs == "rh" else 1
            save_dict = {
                "process_key": info[0],
                "info": info,
                "hand_side": hs,
                "joints": joints[j],
                "verts": verts[j],
                "faces": faces_closed[hs_id],
                "obj_list": s["obj_list"],
                "len": s["len"],
                "frame_id": s["frame_id"],
                "refine_pose_repr": refined[j],
            }
            if run_dir.commit:
                fp = os.path.join(
                    out_root,
                    str(info[0]).replace("/", "++"),
                    str(info[1]),
                    str(info[2]),
                    "save_dict.pkl",
                )
                os.makedirs(os.path.dirname(fp), exist_ok=True)
                with open(fp, "wb") as f:
                    pickle.dump(save_dict, f)
            n_done += 1
        _logger.info("refined %d segments", n_done)

    # dedup by info over the WHOLE dataset (reference sample_refine.py:221-232),
    # then shard the deduped work list into contiguous per-process ranges
    # (sample_g contract). num_shards/shard_index default to the jax process
    # topology; the explicit knobs support external launchers and tests.
    seen = set()
    work: list[int] = []
    for i, info in enumerate(common.segment_infos(dataset)):
        if info in seen:
            continue
        seen.add(info)
        work.append(i)
    w, W = common.resolve_shard(sample_cfg)
    n = len(work)
    mine = work[(n * w) // W : (n * (w + 1)) // W]
    _logger.info("shard %d/%d: %d of %d deduped segments", w, W, len(mine), n)

    for i in mine:
        pending.append(dataset[i])
        if len(pending) == bs:
            flush(pending)
            pending = []
    flush(pending)
    _logger.info("done: %s", out_root if run_dir.commit else "(dry run)")
    return out_root


if __name__ == "__main__":
    main()
