#!/usr/bin/env python
"""Dump golden MANO fixtures from the REAL manotorch ManoLayer.

Run this wherever manotorch + the licensed MANO assets are installed (they are
not shippable with this repo); the output lands in tests/fixtures/
mano_golden_real.npz and unlocks tests/test_mano_golden.py::
test_mano_matches_real_manotorch_golden, which pins core/mano.mano_forward
against the actual reference dependency (usage contract:
reference model/interaction_segment_extra_loss.py:22-37 — rot_mode="quat",
use_pca=False, flat_hand_mean=True, center_idx=0, side=...).

  python scripts/dump_mano_golden.py --mano_path <dir with mano/MANO_*.pkl>
"""

import argparse
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mano_path", required=True, help="MANO assets root")
    p.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(HERE), "tests", "fixtures", "mano_golden_real.npz"),
    )
    p.add_argument("--n", type=int, default=4, help="poses per side")
    args = p.parse_args(argv)

    import torch
    from manotorch.manolayer import ManoLayer

    rng = np.random.default_rng(42)
    entries = {}
    for side in ("right", "left"):
        layer = ManoLayer(
            rot_mode="quat",
            side=side,
            center_idx=0,
            mano_assets_root=args.mano_path,
            use_pca=False,
            flat_hand_mean=True,
        )
        poses, betas_all, verts_all, joints_all = [], [], [], []
        for _ in range(args.n):
            rv = rng.normal(scale=0.5, size=(16, 3))
            # axis-angle -> quat (w,x,y,z), matching dev_fn rotvec_to_quat
            angle = np.linalg.norm(rv, axis=-1, keepdims=True)
            axis = rv / np.maximum(angle, 1e-12)
            q = np.concatenate(
                [np.cos(angle / 2), axis * np.sin(angle / 2)], axis=-1
            ).astype(np.float32)
            b = rng.normal(scale=0.8, size=(10,)).astype(np.float32)
            out = layer(
                torch.from_numpy(q[None]), torch.from_numpy(b[None])
            )
            poses.append(q)
            betas_all.append(b)
            verts_all.append(out.verts[0].detach().numpy())
            joints_all.append(out.joints[0].detach().numpy())
        entries[f"{side}_pose_quat"] = np.stack(poses)
        entries[f"{side}_betas"] = np.stack(betas_all)
        entries[f"{side}_verts"] = np.stack(verts_all)
        entries[f"{side}_joints"] = np.stack(joints_all)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **entries)
    print(f"wrote {args.out}")
    print("run: TAMF_MANO_PATH=<assets> pytest tests/test_mano_golden.py -k real")


if __name__ == "__main__":
    main()
