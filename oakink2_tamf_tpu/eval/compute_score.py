"""compute_score CLIs: CR / SIV / PSKL-J / FID over refined-sample trees
(reference script/compute_score/*.py workflows).

All four consume the `save_dict.pkl` tree written by launch/sample_r.py plus
the evaluation dataset; GT hand geometry is recomputed through the JAX MANO
layer. Usage:

  python -m oakink2_tamf_tpu.eval.compute_score cr   --cfg ... \
      --score.sample_dir common/sample_r/<exp>/sample/<name>
  python -m oakink2_tamf_tpu.eval.compute_score siv  ...
  python -m oakink2_tamf_tpu.eval.compute_score psklj ...
  python -m oakink2_tamf_tpu.eval.compute_score fid  --score.encoder_filepath ...
"""

from __future__ import annotations

import json
import logging
import os
import pickle
import sys

import numpy as np
import jax
import jax.numpy as jnp

from ..core import mano as M
from ..data.collate import SegmentCollate
from ..launch import common, param
from . import metrics as ME

_logger = logging.getLogger(__name__)


def reg_score_param(reg):
    reg.register("sample_dir", prefix="score", category=str, default="")
    reg.register("split", prefix="score", category=str, default="test")
    reg.register("frame_stride", prefix="score", category=int, default=20, desc="SIV frame stride")
    reg.register("sdf_resolution", prefix="score", category=int, default=100)
    reg.register("encoder_filepath", prefix="score", category=str, default="")
    reg.register("out_json", prefix="score", category=str, default="")


def load_save_dicts(sample_dir: str) -> dict[tuple, dict]:
    """Walk the save_dict tree -> {info tuple: save_dict}."""
    out = {}
    for root, _, files in os.walk(sample_dir):
        for f in files:
            if f == "save_dict.pkl":
                with open(os.path.join(root, f), "rb") as fh:
                    d = pickle.load(fh)
                out[tuple(d["info"])] = d
    return out


def iter_eval_pairs(dataset, save_dicts):
    """Yield (gt_sample, save_dict) deduped by info (cr.py:210-232 semantics)."""
    seen = set()
    for i in range(len(dataset)):
        s = dataset[i]
        info = tuple(s["info"])
        if info in seen or info not in save_dicts:
            continue
        seen.add(info)
        yield s, save_dicts[info]


def gt_hand_geometry(mano_stack, sample):
    """GT verts/joints via the MANO decode path (cr.py:240-266)."""
    hs = 0 if sample["hand_side"] == "rh" else 1
    model = jax.tree.map(lambda a: a[hs], mano_stack)
    verts, joints = M.recover_mano_from_pose_repr(
        model, jnp.asarray(sample["pose_repr"]), jnp.asarray(sample["shape"])
    )
    return np.asarray(verts), np.asarray(joints)


def run_cr(reg, dataset, save_dicts, mano_stack) -> dict:
    gt_dists, refined_dists = [], []
    for s, sd in iter_eval_pairs(dataset, save_dicts):
        n = int(s["len"])
        gt_verts, _ = gt_hand_geometry(mano_stack, s)
        merged = ME.transf_merge_obj_pointcloud(
            np.asarray(s["obj_pointcloud"]), np.asarray(s["obj_traj"])[:, :n]
        )
        gt_dists.extend(ME.contact_min_dists(gt_verts[:n], merged).tolist())
        refined_dists.extend(
            ME.contact_min_dists(np.asarray(sd["verts"])[:n], merged).tolist()
        )
    return {
        "gt_contact_ratio": ME.contact_ratio(np.asarray(gt_dists)),
        "refined_contact_ratio": ME.contact_ratio(np.asarray(refined_dists)),
        "n_frames": len(gt_dists),
    }


def run_siv(reg, dataset, save_dicts, mano_stack) -> dict:
    from ..core import transforms as T

    stride = int(reg.select("score").get("frame_stride", 20))
    res = int(reg.select("score").get("sdf_resolution", 100))

    # interior grids per object id (from per-sample obj meshes when present,
    # else from the point cloud's convex bbox is NOT valid -> require meshes)
    interior_cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    gt_sivs, refined_sivs = [], []
    for s, sd in iter_eval_pairs(dataset, save_dicts):
        if "obj_verts" not in s:
            _logger.warning("SIV requires obj meshes (data.enable_obj_model); skipping %s", s["info"])
            continue
        n = int(s["len"])
        transf_all = np.asarray(T.tslrot6d_to_transf(jnp.asarray(s["obj_traj"])))
        pts_list, tick_list = [], []
        for k, oid in enumerate(s["obj_list"]):
            if oid not in interior_cache:
                interior_cache[oid] = ME.object_interior_grid(
                    np.asarray(s["obj_verts"][k]), np.asarray(s["obj_faces"][k]), resolution=res
                )
            p, t = interior_cache[oid]
            pts_list.append(p)
            tick_list.append(t)

        gt_verts, _ = gt_hand_geometry(mano_stack, s)
        faces_closed = np.asarray(sd["faces"])
        for f in range(0, n, stride):
            Xs = [transf_all[k, f] for k in range(len(s["obj_list"]))]
            gt_sivs.append(
                ME.solid_intersection_volume(gt_verts[f], faces_closed, pts_list, tick_list, Xs)
            )
            refined_sivs.append(
                ME.solid_intersection_volume(
                    np.asarray(sd["verts"])[f], faces_closed, pts_list, tick_list, Xs
                )
            )
    return {
        "gt_siv_cm3": float(np.mean(gt_sivs)) if gt_sivs else float("nan"),
        "refined_siv_cm3": float(np.mean(refined_sivs)) if refined_sivs else float("nan"),
        "n_frames": len(gt_sivs),
    }


def run_psklj(reg, dataset, save_dicts, mano_stack) -> dict:
    gt_list, md_list = [], []
    for s, sd in iter_eval_pairs(dataset, save_dicts):
        n = int(s["len"])
        _, gt_joints = gt_hand_geometry(mano_stack, s)
        gt_list.append(ME.pad_tail_with_last(np.asarray(gt_joints), n))
        md_list.append(ME.pad_tail_with_last(np.asarray(sd["joints"]), n))
    a, b = ME.psklj(gt_list, md_list)
    return {"psklj_gt_to_model": a, "psklj_model_to_gt": b, "n_segments": len(gt_list)}


def run_fid(reg, dataset, save_dicts, mano_stack) -> dict:
    from ..launch.train_encoder import build_encoder
    from ..runtime.ckpt import load_checkpoint

    enc_fp = reg.select("score").get("encoder_filepath")
    # a ported reference `.pt` forces the exact erf gelu it trained under
    from ..interop.torch_port import activation_for_checkpoint

    model = build_encoder(reg, activation=activation_for_checkpoint(reg, enc_fp))
    collate = SegmentCollate(
        max_nobj=int(reg.select("data").get("max_nobj", 4)),
        n_obj_points=int(reg.select("data").get("n_obj_points", 2048)),
    )
    pairs = list(iter_eval_pairs(dataset, save_dicts))
    if not pairs:
        raise ValueError(
            f"no save_dict matches any dataset segment: --score.sample_dir "
            f"yielded {len(save_dicts)} save_dicts for a {len(dataset)}-segment "
            f"{reg.select('score').get('split', 'test')!r} split — wrong dir, "
            "empty tree, or split mismatch"
        )
    probe = collate([pairs[0][0]])
    dprobe = common.device_batch(probe)
    cond = {k: dprobe[k] for k in ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
    params = model.init(jax.random.PRNGKey(0), dprobe["pose_repr"], cond)
    if enc_fp:
        if enc_fp.endswith(".pt"):
            # the reference's trained FID encoder (README.md:206-211,
            # encoder__fid_1/save/model_0399.pt): port the torch weights
            from ..interop.torch_port import load_reference_checkpoint

            m = reg.select("model")
            params = load_reference_checkpoint(
                enc_fp, "encoder", num_layers=int(m.get("num_layers", 2)),
                num_heads=int(m.get("num_heads", 4)),
            )
            _logger.info("ported reference encoder checkpoint %s", enc_fp)
        else:
            params = load_checkpoint(enc_fp, params, strict=False)
            _logger.info("loaded encoder from %s", enc_fp)
    apply_fn = jax.jit(lambda p, x, c: model.apply(p, x, c, deterministic=True))

    gt_acts, md_acts = [], []
    bs = 16
    for start in range(0, len(pairs), bs):
        chunk = pairs[start : start + bs]
        gt_batch = collate([c[0] for c in chunk])
        md_samples = []
        for s, sd in chunk:
            s2 = dict(s)
            s2["pose_repr"] = np.asarray(sd["refine_pose_repr"], np.float32)
            md_samples.append(s2)
        md_batch = collate(md_samples)
        for batch, acts in ((gt_batch, gt_acts), (md_batch, md_acts)):
            db = common.device_batch(batch)
            c = {k: db[k] for k in ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
            out = apply_fn(params, db["pose_repr"], c)
            acts.append(np.asarray(jax.device_get(out["encoding"])))
    gt_act = np.concatenate(gt_acts, axis=0)
    md_act = np.concatenate(md_acts, axis=0)
    return {
        "fid": ME.calculate_fid(gt_act, md_act),
        "n_segments": len(gt_act),
    }


RUNNERS = {"cr": run_cr, "siv": run_siv, "psklj": run_psklj, "fid": run_fid}


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in RUNNERS:
        raise SystemExit(f"usage: compute_score {{{'|'.join(RUNNERS)}}} [--cfg ...]")
    which = argv.pop(0)

    reg, run_dir = common.boot(
        f"compute_score_{which}",
        [param.reg_base_param, param.reg_mano_param, param.reg_model_param, reg_score_param],
        argv,
    )
    dataset = common.build_dataset(reg, reg.select("score").get("split", "test"))
    sample_dir = reg.select("score").get("sample_dir")
    save_dicts = load_save_dicts(sample_dir)
    _logger.info("loaded %d save_dicts from %s", len(save_dicts), sample_dir)

    mano_path = reg.select("mano").get("mano_path") or None
    from ..models.refine_r import stack_mano_models

    mano_stack = stack_mano_models(
        M.get_mano_model(mano_path, "right"), M.get_mano_model(mano_path, "left")
    )

    result = RUNNERS[which](reg, dataset, save_dicts, mano_stack)
    print(json.dumps({"score": which, **result}))
    out_json = reg.select("score").get("out_json")
    if out_json:
        os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
        with open(out_json, "w") as f:
            json.dump({"score": which, **result}, f)
    return result


if __name__ == "__main__":
    main()
