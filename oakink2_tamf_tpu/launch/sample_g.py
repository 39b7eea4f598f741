"""Sample MF-MDM G over a split, caching per-segment .npy pose_reprs for R
training (reference launch/sample.py workflow).

The reference shards the dataset over 8 worker processes at batch-size 1 and
runs 1000 sequential python-loop denoise steps per segment (sample.py:198-229).
Here one process per host drives a batched on-device scan chain: every chip
denoises `sample.batch_size` segments at once; hosts shard the index space by
process_index (same striding contract).

Output layout matches the reference so R training interoperates:
  <save_prefix or ckpt_path>/sample/<split>/<name>/{index:06d}.npy
"""

from __future__ import annotations

import logging
import os

import numpy as np
import jax

from ..core import diffusion as D
from ..parallel import train as PT
from ..parallel.mesh import make_local_mesh, replicate, shard_batch
from ..runtime.ckpt import load_checkpoint
from . import common, param
from .train_g import build_model

_logger = logging.getLogger(__name__)

PROG = "sample_g"


def main(argv=None):
    reg, run_dir = common.boot(
        PROG,
        [
            param.reg_base_param,
            param.reg_model_param,
            param.reg_diffusion_param,
            param.reg_clip_param,
            param.reg_sample_param,
        ],
        argv,
    )
    sample_cfg = reg.select("sample")
    split = sample_cfg.get("split", "test")
    # LOCAL mesh: sampler processes shard by segment (resolve_shard) and run
    # independent jits — a global mesh would deadlock (parallel/mesh.py)
    mesh = make_local_mesh(int(reg.select("runtime").get("device_count") or 0) or None)

    dataset = common.build_dataset(reg, split)
    clip = common.build_clip(reg)

    # a `.pt` model_filepath is a ported REFERENCE checkpoint: the net must run
    # the exact erf gelu the torch weights were trained under
    from ..interop.torch_port import activation_for_checkpoint

    model = build_model(
        reg, activation=activation_for_checkpoint(reg, sample_cfg.get("model_filepath"))
    )
    dcfg = reg.select("diffusion")
    sched = D.tamf_schedule(
        int(dcfg.get("steps", 1000)), str(dcfg.get("noise_schedule", "cosine")),
        str(dcfg.get("timestep_respacing", "")),
    )

    # params: load checkpoint or init fresh (smoke mode)
    from ..data.collate import SegmentCollate

    data_cfg = reg.select("data")
    collate = SegmentCollate(
        max_nobj=int(data_cfg.get("max_nobj", 4)),
        n_obj_points=int(data_cfg.get("n_obj_points", 2048)),
    )
    probe = common.attach_text_emb(collate([dataset[0]]), clip)
    dprobe = common.device_batch(probe)
    cond = PT.g_cond_from_batch(dprobe)
    params = model.init(
        jax.random.PRNGKey(0), dprobe["pose_repr"],
        np.zeros((1,), np.int32), cond,
    )
    if sample_cfg.get("model_filepath"):
        fp = sample_cfg["model_filepath"]
        if fp.endswith(".pt"):  # trained REFERENCE checkpoint: port the weights
            from ..interop.torch_port import load_reference_checkpoint

            m = reg.select("model")
            params = load_reference_checkpoint(
                fp, "g", num_layers=int(m.get("num_layers", 8)),
                num_heads=int(m.get("num_heads", 4)),
            )
            _logger.info("ported reference torch checkpoint %s", fp)
        else:
            params = load_checkpoint(fp, params, strict=False)
            _logger.info("loaded model from %s", fp)

    sampler = PT.make_g_sampler(
        model, sched, sampler=sample_cfg.get("sampler", "ddpm"), mesh=mesh,
        parallel_window=int(sample_cfg.get("parallel_window", 64)),
        parallel_tol=float(sample_cfg.get("parallel_tol", 1e-2)),
    )
    params_r = replicate(params, mesh)

    # output dir
    base = sample_cfg.get("save_prefix") or run_dir.path
    out_dir = os.path.join(base, "sample", split, run_dir.exp_id)
    if run_dir.commit:
        os.makedirs(out_dir, exist_ok=True)

    # host-sharded contiguous index ranges (sample.py:198-200 semantics);
    # sample.num_shards/shard_index override the jax process topology for
    # external launchers (same contract as sample_r)
    n = len(dataset)
    w, W = common.resolve_shard(sample_cfg)
    lo, hi = (n * w) // W, (n * (w + 1)) // W
    indices = list(range(lo, hi))

    bs = int(sample_cfg.get("batch_size", 32))
    key = jax.random.PRNGKey(int(reg.select("runtime").get("seed", 0)) + w)

    for start in range(0, len(indices), bs):
        chunk = indices[start : start + bs]
        samples = [dataset[i] for i in chunk]
        batch = common.attach_text_emb(collate(samples), clip)
        dbatch = common.device_batch(batch)
        # pad the tail batch to the static size
        n_real = len(chunk)
        if n_real < bs:
            dbatch = jax.tree.map(
                lambda a: np.concatenate([a, np.repeat(a[-1:], bs - n_real, axis=0)], axis=0),
                jax.tree.map(np.asarray, dbatch),
            )
        key, k = jax.random.split(key)
        out = sampler(params_r, shard_batch(dbatch, mesh), k)
        out_np = np.asarray(jax.device_get(out))[:n_real]
        if run_dir.commit:
            for j, idx in enumerate(chunk):
                np.save(os.path.join(out_dir, f"{idx:06d}.npy"), out_np[j])
        _logger.info("sampled %d/%d", min(start + bs, len(indices)), len(indices))

    _logger.info("done: %s", out_dir if run_dir.commit else "(dry run, nothing written)")
    return out_dir


if __name__ == "__main__":
    main()
