"""Full two-stage workflow integration: train G -> cache G samples ->
train R on the generated dir -> refine to save_dicts -> run all four metrics.
Mirrors the reference's end-to-end recipe (README.md:137-224) on synthetic
data in one temp workspace."""

import json
import os

import numpy as np
import pytest

SMOKE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "config", "synthetic_smoke.yml"
)


@pytest.mark.slow
def test_full_two_stage_pipeline(tmp_path):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        from oakink2_tamf_tpu.launch import sample_g, sample_r, train_g, train_r
        from oakink2_tamf_tpu.eval import compute_score

        # 1) train G briefly
        train_g.main(
            ["--cfg", SMOKE, "--exp_id", "pipe_g", "--train.num_epoch", "1",
             "--train.val_freq", "0", "--commit"]
        )
        g_ckpt = str(tmp_path / "common" / "train_g" / "pipe_g" / "save" / "model_0000.ckpt")
        assert os.path.exists(g_ckpt)

        # 2) cache G samples for the train split (R's training input)
        sample_dir = sample_g.main(
            ["--cfg", SMOKE, "--exp_id", "pipe_sample",
             "--sample.model_filepath", g_ckpt,
             "--sample.split", "train", "--sample.batch_size", "8", "--commit"]
        )
        n_npy = len([f for f in os.listdir(sample_dir) if f.endswith(".npy")])
        assert n_npy == 16

        # 3) train R on the generated samples + perturb mix
        train_r.main(
            ["--cfg", SMOKE, "--exp_id", "pipe_r", "--train.num_epoch", "1",
             "--train.val_freq", "0",
             "--train.data.pose_repr_sample_dir_list", sample_dir,
             "--commit"]
        )
        r_ckpt = str(tmp_path / "common" / "train_r" / "pipe_r" / "save" / "model_0000.ckpt")
        assert os.path.exists(r_ckpt)

        # 4) refined save_dicts on the test split (via G samples for test)
        test_sample_dir = sample_g.main(
            ["--cfg", SMOKE, "--exp_id", "pipe_sample_test",
             "--sample.model_filepath", g_ckpt,
             "--sample.split", "test", "--sample.batch_size", "8", "--commit"]
        )
        out_root = sample_r.main(
            ["--cfg", SMOKE, "--exp_id", "pipe_refine",
             "--sample.model_filepath", r_ckpt,
             "--sample.split", "test", "--sample.batch_size", "8",
             "--test.data.pose_repr_sample_dir_list", test_sample_dir,
             "--commit"]
        )
        found = [
            os.path.join(r, f)
            for r, _, fs in os.walk(out_root)
            for f in fs
            if f == "save_dict.pkl"
        ]
        assert len(found) == 16

        # 5) all four metrics over the refined tree (SIV uses the synthetic
        # box meshes via obj_verts/obj_faces on a tiny grid)
        for which in ("cr", "siv", "psklj", "fid"):
            res = compute_score.main(
                [which, "--cfg", SMOKE,
                 "--score.sample_dir", out_root,
                 "--score.sdf_resolution", "24", "--score.frame_stride", "16"]
            )
            assert all(np.isfinite(v) for v in res.values() if isinstance(v, float)), (which, res)
            if "n_frames" in res:
                assert res["n_frames"] > 0, (which, res)
    finally:
        os.chdir(cwd)
