#!/usr/bin/env python
"""Debug/visual check of the R (refine) path: load refine samples, run R, and
render GT vs sample vs refined overlays plus h2o-distance heatmap strips
(reference script/debug/debug_refine_data.py + debug_refine_sample.py:207-299,
re-targeted from the interactive VizControl/Open3D loop to headless PNGs).

  python scripts/debug_refine.py --cfg config/synthetic_smoke.yml \
      [--model_filepath ckpt-or-.pt] [--sample_dir G-sample-tree] \
      --out tmp/debug_refine

Per segment it writes:
  refine_<i>_overlay.png  3 skeleton strips: sample-vs-GT, refined-vs-GT,
                          refined joints with the moved object cloud
  refine_<i>_h2o.png      heatmaps of the 778-vert h2o distances over time for
                          sample / refined / GT target + per-frame mean curves
and prints the sample->refined improvement in joint MPJPE and mean |h2o delta|
vs the GT target (the day-one numbers for diagnosing a bad R checkpoint).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oakink2_tamf_tpu.launch import common, param
from oakink2_tamf_tpu.runtime.config import ConfigRegistry


def render_h2o_strip(h2o_by_name: dict, out_path: str, vmax: float = 0.05):
    """Heatmaps [L, 778] per variant + per-frame mean curves in one figure."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(h2o_by_name)
    fig, axes = plt.subplots(n + 1, 1, figsize=(10, 2.2 * (n + 1)))
    for ax, (name, h2o) in zip(axes[:-1], h2o_by_name.items()):
        im = ax.imshow(
            np.asarray(h2o).T, aspect="auto", origin="lower",
            cmap="viridis", vmin=0.0, vmax=vmax,
        )
        ax.set_ylabel(f"{name}\nvert")
        fig.colorbar(im, ax=ax, fraction=0.02)
    for name, h2o in h2o_by_name.items():
        axes[-1].plot(np.mean(np.asarray(h2o), axis=1), label=name)
    axes[-1].set_xlabel("frame")
    axes[-1].set_ylabel("mean h2o [m]")
    axes[-1].legend(fontsize=8)
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def main(argv=None):
    reg = ConfigRegistry("debug_refine")
    param.reg_base_param(reg)
    param.reg_mano_param(reg)
    param.reg_model_param(reg)
    reg.register("model_filepath", category=str, default="")
    reg.register("sample_dir", category=str, default="")
    reg.register("out", category=str, default="tmp/debug_refine")
    reg.register("n_samples", category=int, default=2)
    reg.register("split", category=str, default="test")
    reg.register("html", category=bool, default=False,
                 desc="also export an interactive refine_<i>.html viewer per segment")
    parser = argparse.ArgumentParser()
    reg.hook(parser)
    reg.parse(parser, argv)

    import jax

    common._enable_compile_cache()

    from oakink2_tamf_tpu.core import mano as M
    from oakink2_tamf_tpu.data.adaptors import (
        GaussianPerturbSampleAdaptor, GeneratedPoseReprSampleAdaptor,
    )
    from oakink2_tamf_tpu.data.collate import SegmentCollate
    from oakink2_tamf_tpu.eval.metrics import transf_merge_obj_pointcloud
    from oakink2_tamf_tpu.interop.torch_port import activation_for_checkpoint
    from oakink2_tamf_tpu.launch.train_r import build_refine_net
    from oakink2_tamf_tpu.models.refine_r import refine_forward, stack_mano_models
    from oakink2_tamf_tpu.runtime.ckpt import load_checkpoint
    from oakink2_tamf_tpu.viz.render import render_sequence_grid

    base = common.build_dataset(reg, reg.select("split"))
    if reg.select("sample_dir"):
        dataset = GeneratedPoseReprSampleAdaptor(base, [reg.select("sample_dir")])
    else:
        dataset = GaussianPerturbSampleAdaptor(base, (0.02, 0.1), seed=0)
        print("no --sample_dir: refining Gaussian-perturbed GT", file=sys.stderr)

    model_fp = reg.select("model_filepath")
    # .pt = ported reference checkpoint -> erf gelu (interop.torch_port contract)
    net = build_refine_net(reg, activation=activation_for_checkpoint(reg, model_fp))
    mano_path = reg.select("mano").get("mano_path") or None
    mano_stack = stack_mano_models(
        M.get_mano_model(mano_path, "right"), M.get_mano_model(mano_path, "left")
    )

    n = min(int(reg.select("n_samples")), len(dataset))
    # shapes from the data config (launch/sample_r.py contract): hardcoded
    # max_nobj would silently TRUNCATE objects and diagnose the checkpoint
    # against wrong geometry
    dcfg = reg.select("data")
    collate = SegmentCollate(
        max_nobj=int(dcfg.get("max_nobj", 4)),
        n_obj_points=int(dcfg.get("n_obj_points", 2048)),
    )
    samples = [dataset[i] for i in range(n)]
    batch = collate(samples)
    db = common.device_batch(batch)

    cond = {k: db[k] for k in ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
    h2o0 = np.zeros(db["sample_pose_repr"].shape[:2] + (778,), np.float32)
    params = net.init(jax.random.PRNGKey(0), db["sample_pose_repr"], h2o0, cond)
    if model_fp:
        if model_fp.endswith(".pt"):
            from oakink2_tamf_tpu.interop.torch_port import load_reference_checkpoint

            m = reg.select("model")
            params = load_reference_checkpoint(
                model_fp, "r", num_layers=int(m.get("num_layers", 8)),
                num_heads=int(m.get("num_heads", 4)),
            )
        else:
            params = load_checkpoint(model_fp, params, strict=False)
        print(f"loaded refine model from {model_fp}", file=sys.stderr)
    else:
        print("no --model_filepath: running with FRESH random params", file=sys.stderr)

    fwd = jax.jit(
        lambda p, b: refine_forward(net, p, mano_stack, b, deterministic=True, with_target=True)
    )
    out = jax.device_get(fwd(params, db))

    out_dir = reg.select("out")
    L = db["sample_pose_repr"].shape[1]
    for i in range(n):
        seg_len = int(np.asarray(batch["mask"][i]).sum()) if "mask" in batch else L
        sl = slice(0, max(seg_len, 1))
        merged = transf_merge_obj_pointcloud(
            np.asarray(batch["obj_points"][i]), np.asarray(batch["obj_traj"][i])
        )
        t_j = np.asarray(out["target_hand_joints"][i])
        s_j = np.asarray(out["sample_hand_joints"][i])
        r_j = np.asarray(out["refine_hand_joints"][i])

        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        figs = [
            render_sequence_grid(s_j[sl], joints_ref_seq=t_j[sl]),
            render_sequence_grid(r_j[sl], joints_ref_seq=t_j[sl]),
            render_sequence_grid(r_j[sl], obj_points_seq=merged[sl]),
        ]
        # stack the three strips into one overlay image
        import PIL.Image as Image

        rows = []
        for f in figs:
            f.canvas.draw()
            rows.append(np.asarray(f.canvas.buffer_rgba())[..., :3])
            plt.close(f)
        w = max(r.shape[1] for r in rows)
        rows = [
            np.pad(r, ((0, 0), (0, w - r.shape[1]), (0, 0)), constant_values=255)
            for r in rows
        ]
        os.makedirs(out_dir, exist_ok=True)
        fp = os.path.join(out_dir, f"refine_{i:03d}_overlay.png")
        Image.fromarray(np.concatenate(rows, axis=0)).save(fp)

        render_h2o_strip(
            {
                "sample": out["sample_h2o_dist"][i][sl],
                "refined": out["refine_h2o_dist"][i][sl],
                "target": out["target_h2o_dist"][i][sl],
            },
            os.path.join(out_dir, f"refine_{i:03d}_h2o.png"),
        )

        if reg.select("html"):
            from oakink2_tamf_tpu.viz.html_viewer import export_html_viewer

            hp = export_html_viewer(
                os.path.join(out_dir, f"refine_{i:03d}.html"),
                [
                    {"name": "target (GT)", "pos": t_j[sl], "kind": "skeleton",
                     "color": "#999999", "alpha": 0.7},
                    {"name": "sample (G)", "pos": s_j[sl], "kind": "skeleton",
                     "color": "#1f77b4"},
                    {"name": "refined (R)", "pos": r_j[sl], "kind": "skeleton",
                     "color": "#2ca02c"},
                    {"name": "object", "pos": merged[sl], "kind": "cloud",
                     "color": "#ff7f0e", "alpha": 0.5},
                ],
                title=f"refine segment {i}",
            )
            print(f"segment {i}: interactive viewer {hp}")

        mpjpe_s = float(np.linalg.norm(s_j[sl] - t_j[sl], axis=-1).mean())
        mpjpe_r = float(np.linalg.norm(r_j[sl] - t_j[sl], axis=-1).mean())
        h2o_s = float(
            np.abs(out["sample_h2o_dist"][i][sl] - out["target_h2o_dist"][i][sl]).mean()
        )
        h2o_r = float(
            np.abs(out["refine_h2o_dist"][i][sl] - out["target_h2o_dist"][i][sl]).mean()
        )
        print(
            f"segment {i}: MPJPE sample {mpjpe_s * 1e3:.2f} -> refined "
            f"{mpjpe_r * 1e3:.2f} mm | mean|h2o-target| {h2o_s * 1e3:.2f} -> "
            f"{h2o_r * 1e3:.2f} mm | wrote {fp}"
        )


if __name__ == "__main__":
    main()
