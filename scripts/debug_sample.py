#!/usr/bin/env python
"""Debug/visual check: run G (and optionally R) on a few segments and render
GT vs prediction strips (reference script/debug/debug_train_sample.py +
debug_refine_sample.py, re-targeted to headless matplotlib output).

  python scripts/debug_sample.py --cfg config/synthetic_smoke.yml \
      [--model_filepath ckpt] [--refine_filepath ckpt] --out tmp/debug
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oakink2_tamf_tpu.launch import common, param
from oakink2_tamf_tpu.runtime.config import ConfigRegistry


def main(argv=None):
    reg = ConfigRegistry("debug_sample")
    param.reg_base_param(reg)
    param.reg_mano_param(reg)
    param.reg_model_param(reg)
    param.reg_diffusion_param(reg)
    reg.register("model_filepath", category=str, default="")
    reg.register("refine_filepath", category=str, default="")
    reg.register("out", category=str, default="tmp/debug_sample")
    reg.register("n_samples", category=int, default=2)
    reg.register("html", category=bool, default=False,
                 desc="also export an interactive sample_<i>.html viewer")
    parser = argparse.ArgumentParser()
    reg.hook(parser)
    reg.parse(parser, argv)

    import jax
    import jax.numpy as jnp

    common._enable_compile_cache()

    from oakink2_tamf_tpu.core import diffusion as D
    from oakink2_tamf_tpu.core import mano as M
    from oakink2_tamf_tpu.data.collate import SegmentCollate
    from oakink2_tamf_tpu.eval.metrics import transf_merge_obj_pointcloud
    from oakink2_tamf_tpu.launch.train_g import build_model
    from oakink2_tamf_tpu.models.refine_r import stack_mano_models
    from oakink2_tamf_tpu.parallel.train import g_cond_from_batch
    from oakink2_tamf_tpu.runtime.ckpt import load_checkpoint
    from oakink2_tamf_tpu.viz.render import render_sequence_grid

    dataset = common.build_dataset(reg, "test")
    clip = common.build_clip(reg)
    model = build_model(reg)
    dcfg = reg.select("diffusion")
    sched = D.tamf_schedule(int(dcfg.get("steps", 1000)), str(dcfg.get("noise_schedule", "cosine")))
    mano_path = reg.select("mano").get("mano_path") or None
    mano_stack = stack_mano_models(
        M.get_mano_model(mano_path, "right"), M.get_mano_model(mano_path, "left")
    )

    n = min(int(reg.select("n_samples")), len(dataset))
    collate = SegmentCollate(max_nobj=2, n_obj_points=512)
    samples = [dataset[i] for i in range(n)]
    batch = collate(samples)
    batch["text_emb"] = clip.encode_text(batch["text"]).astype(np.float32)
    db = common.device_batch(batch)
    cond = g_cond_from_batch(db)
    params = model.init(jax.random.PRNGKey(0), db["pose_repr"], np.zeros((n,), np.int32), cond)
    if reg.select("model_filepath"):
        params = load_checkpoint(reg.select("model_filepath"), params, strict=False)

    L = db["pose_repr"].shape[1]

    @jax.jit
    def sample_fn(params, cond, key):
        def model_fn(x, t):
            return model.apply(params, x, t, cond, deterministic=True)

        return D.p_sample_loop(model_fn, sched, (n, L, 99), key, clip_denoised=False)

    pred = sample_fn(params, cond, jax.random.PRNGKey(0))

    out_dir = reg.select("out")
    from oakink2_tamf_tpu.models.refine_r import batch_recover_mano

    recover = jax.jit(lambda pr, sh, hs: batch_recover_mano(mano_stack, pr, sh, hs))
    _, j_gt, _ = recover(db["pose_repr"], db["shape"], db["hand_side"])
    _, j_pred, _ = recover(pred, db["shape"], db["hand_side"])
    for i in range(n):
        merged = transf_merge_obj_pointcloud(
            np.asarray(batch["obj_points"][i]), np.asarray(batch["obj_traj"][i])
        )
        render_sequence_grid(
            np.asarray(j_pred[i]),
            obj_points_seq=merged,
            joints_ref_seq=np.asarray(j_gt[i]),
            out_path=os.path.join(out_dir, f"sample_{i:03d}.png"),
        )
        if reg.select("html"):
            from oakink2_tamf_tpu.viz.html_viewer import export_html_viewer

            export_html_viewer(
                os.path.join(out_dir, f"sample_{i:03d}.html"),
                [
                    {"name": "GT hand", "pos": np.asarray(j_gt[i]),
                     "kind": "skeleton", "color": "#999999", "alpha": 0.7},
                    {"name": "G sample", "pos": np.asarray(j_pred[i]),
                     "kind": "skeleton", "color": "#1f77b4"},
                    {"name": "object", "pos": merged, "kind": "cloud",
                     "color": "#ff7f0e", "alpha": 0.5},
                ],
                title=f"G sample {i}",
            )
        print(f"wrote {out_dir}/sample_{i:03d}.png")


if __name__ == "__main__":
    main()
