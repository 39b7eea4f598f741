"""Generate tests/fixtures/mano_golden_synthetic.npz — golden MANO outputs from
an INDEPENDENT torch implementation written in manotorch's own style.

The replica follows the manotorch ManoLayer algorithm (rot_mode="quat",
use_pca=False, flat_hand_mean=True, center_idx=0; reference usage contract at
model/interaction_segment_extra_loss.py:22-37):
- quats normalized then converted with the REFERENCE's dev_fn quat_to_rotmat
  (the same (w,x,y,z) convention the reference pipes into manotorch,
  extra_loss.py:76-79) — so the rotation half is pinned to real reference code;
- SMPL-style homogeneous-matrix FK + "subtract rest joint" relative transforms
  (the with_zeros/pack formulation), structurally different from both
  core/mano's einsum LBS and the numpy loop in test_mano_golden.py;
- tips from vertices (745, 317, 444, 556, 673), manopth/manotorch 21-joint
  reorder, wrist recentering.

Run `python tests/gen_mano_fixture.py` to (re)generate; the .npz is committed
so the test guards against future drift of all implementations at once.
"""

import os
import sys

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
REF_SRC = "/root/reference/src"
if REF_SRC not in sys.path:
    sys.path.insert(0, REF_SRC)

from dev_fn.transform import rotation as ref_rot  # noqa: E402

from oakink2_tamf_tpu.core import mano as M  # noqa: E402

TIPS = [745, 317, 444, 556, 673]
REORDER = [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20]


def manotorch_style_forward(model: M.ManoModel, pose_quat: np.ndarray, betas: np.ndarray):
    """One sample: pose_quat [16, 4] (w,x,y,z), betas [10] -> (verts, joints21)."""
    q = torch.from_numpy(pose_quat).double()
    q = q / q.norm(dim=-1, keepdim=True)
    R = ref_rot.quat_to_rotmat(q)  # [16, 3, 3], reference convention

    v_template = torch.from_numpy(np.asarray(model.v_template)).double()
    shapedirs = torch.from_numpy(np.asarray(model.shapedirs)).double()
    posedirs = torch.from_numpy(np.asarray(model.posedirs)).double()
    j_reg = torch.from_numpy(np.asarray(model.j_regressor)).double()
    weights = torch.from_numpy(np.asarray(model.skin_weights)).double()
    b = torch.from_numpy(betas).double()

    v_shaped = v_template + torch.einsum("vcs,s->vc", shapedirs, b)
    j_rest = j_reg @ v_shaped  # [16, 3]

    pose_map = (R[1:] - torch.eye(3, dtype=torch.double)).reshape(-1)  # [135]
    v_posed = v_shaped + torch.einsum("vcp,p->vc", posedirs, pose_map)

    def with_zeros(mat34):  # [3,4] -> [4,4]
        return torch.cat([mat34, torch.tensor([[0.0, 0.0, 0.0, 1.0]], dtype=torch.double)], dim=0)

    results = [with_zeros(torch.cat([R[0], j_rest[0:1].T], dim=1))]
    for i in range(1, 16):
        p = M.PARENTS[i]
        local = with_zeros(torch.cat([R[i], (j_rest[i] - j_rest[p]).reshape(3, 1)], dim=1))
        results.append(results[p] @ local)
    stacked = torch.stack(results)  # [16, 4, 4]

    # pack trick: subtract the transform of the rest joint
    rel = stacked.clone()
    rel[:, :3, 3] = stacked[:, :3, 3] - torch.einsum(
        "kij,kj->ki", stacked[:, :3, :3], j_rest
    )

    Tm = torch.einsum("vk,kij->vij", weights, rel)  # [778, 4, 4]
    verts = torch.einsum("vij,vj->vi", Tm[:, :3, :3], v_posed) + Tm[:, :3, 3]

    jtr = stacked[:, :3, 3]
    jtr = torch.cat([jtr, verts[TIPS]], dim=0)[REORDER]

    center = jtr[0:1].clone()
    return (verts - center).float().numpy(), (jtr - center).float().numpy()


def main():
    rng = np.random.default_rng(42)
    entries = {}
    for side in ("right", "left"):
        model = M.synthetic_mano_model(side)
        poses, betas_all, verts_all, joints_all = [], [], [], []
        for k in range(4):
            rv = rng.normal(scale=0.5, size=(16, 3)).astype(np.float64)
            q = ref_rot.rotvec_to_quat(torch.from_numpy(rv)).numpy().astype(np.float32)
            b = rng.normal(scale=0.8, size=(10,)).astype(np.float32)
            v, j = manotorch_style_forward(model, q, b)
            poses.append(q)
            betas_all.append(b)
            verts_all.append(v)
            joints_all.append(j)
        entries[f"{side}_pose_quat"] = np.stack(poses)
        entries[f"{side}_betas"] = np.stack(betas_all)
        entries[f"{side}_verts"] = np.stack(verts_all)
        entries[f"{side}_joints"] = np.stack(joints_all)

    out = os.path.join(HERE, "fixtures", "mano_golden_synthetic.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(out, **entries)
    print(f"wrote {out}: " + ", ".join(f"{k}{v.shape}" for k, v in entries.items()))


if __name__ == "__main__":
    main()
