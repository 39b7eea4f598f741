#!/usr/bin/env python
"""Render raw dataset segments (reference script/viz_seg.py, headless).

  python scripts/viz_seg.py --cfg config/synthetic_smoke.yml --out tmp/viz \
      [--indices 0,1,2] [--gif]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oakink2_tamf_tpu.launch import common, param
from oakink2_tamf_tpu.runtime.config import ConfigRegistry


def main(argv=None):
    reg = ConfigRegistry("viz_seg")
    param.reg_base_param(reg)
    param.reg_mano_param(reg)
    reg.register("out", category=str, default="tmp/viz_seg")
    reg.register("indices", category=int, is_list=True, default=[0])
    reg.register("split", category=str, default="train")
    reg.register("gif", category=bool, default=False)
    reg.register("html", category=bool, default=False,
                 desc="also export an interactive seg_<i>.html viewer")
    parser = argparse.ArgumentParser()
    reg.hook(parser)
    reg.parse(parser, argv)

    import jax
    import jax.numpy as jnp

    common._enable_compile_cache()

    from oakink2_tamf_tpu.core import mano as M
    from oakink2_tamf_tpu.eval.metrics import transf_merge_obj_pointcloud
    from oakink2_tamf_tpu.models.refine_r import batch_recover_mano, stack_mano_models
    from oakink2_tamf_tpu.viz.render import render_sequence_grid, save_sequence_gif

    dataset = common.build_dataset(reg, reg.select("split"))
    mano_path = reg.select("mano").get("mano_path") or None
    mano_stack = stack_mano_models(
        M.get_mano_model(mano_path, "right"), M.get_mano_model(mano_path, "left")
    )
    recover = jax.jit(lambda pr, sh, hs: batch_recover_mano(mano_stack, pr, sh, hs))

    out_dir = reg.select("out")
    for idx in reg.select("indices"):
        s = dataset[int(idx)]
        hs = np.asarray([0 if s["hand_side"] == "rh" else 1], np.int32)
        _, joints, _ = recover(
            jnp.asarray(s["pose_repr"])[None], jnp.asarray(s["shape"])[None], jnp.asarray(hs)
        )
        n = int(s["len"])
        merged = transf_merge_obj_pointcloud(
            np.asarray(s["obj_pointcloud"]), np.asarray(s["obj_traj"])[:, :n]
        )
        render_sequence_grid(
            np.asarray(joints[0])[:n], obj_points_seq=merged,
            out_path=os.path.join(out_dir, f"seg_{idx:04d}.png"),
        )
        if reg.select("gif"):
            save_sequence_gif(
                np.asarray(joints[0])[:n],
                os.path.join(out_dir, f"seg_{idx:04d}.gif"),
                obj_points_seq=merged,
            )
        if reg.select("html"):
            from oakink2_tamf_tpu.viz.html_viewer import export_html_viewer

            export_html_viewer(
                os.path.join(out_dir, f"seg_{idx:04d}.html"),
                [
                    {"name": "GT hand", "pos": np.asarray(joints[0])[:n],
                     "kind": "skeleton", "color": "#2ca02c"},
                    {"name": "object", "pos": merged, "kind": "cloud",
                     "color": "#ff7f0e", "alpha": 0.5},
                ],
                title=f"segment {idx} ({reg.select('split')})",
            )
        print(f"rendered segment {idx} -> {out_dir}")


if __name__ == "__main__":
    main()
