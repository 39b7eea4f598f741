"""End-to-end launcher smoke tests on synthetic data: each CLI runs its full
pipeline (config -> data -> model -> sharded steps -> ckpt/outputs) in-process
on the 8-device CPU mesh."""

import os

import numpy as np
import pytest

SMOKE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "config", "synthetic_smoke.yml")


def run_in_tmp(tmp_path, fn, argv):
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        return fn(argv)
    finally:
        os.chdir(cwd)


def test_train_g_e2e(tmp_path):
    from oakink2_tamf_tpu.launch import train_g

    state = run_in_tmp(
        tmp_path, train_g.main,
        ["--cfg", SMOKE, "--exp_id", "smoke_g", "--commit"],
    )
    import jax

    assert int(jax.device_get(state.step)) == 2 * (16 // 8)
    # checkpoints written
    save_dir = tmp_path / "common" / "train_g" / "smoke_g" / "save"
    assert any(p.name.startswith("model_") for p in save_dir.iterdir())
    assert (tmp_path / "common" / "train_g" / "smoke_g" / "opt.yml").exists()


def test_train_g_dry_run_writes_nothing(tmp_path):
    from oakink2_tamf_tpu.launch import train_g

    run_in_tmp(tmp_path, train_g.main, ["--cfg", SMOKE, "--exp_id", "dry_g"])
    assert not (tmp_path / "common" / "train_g" / "dry_g").exists()


def test_sample_g_e2e(tmp_path):
    from oakink2_tamf_tpu.launch import sample_g

    out_dir = run_in_tmp(
        tmp_path, sample_g.main,
        [
            "--cfg", SMOKE, "--exp_id", "smoke_sample",
            "--sample.batch_size", "8", "--sample.split", "test", "--commit",
        ],
    )
    files = sorted(os.listdir(out_dir))
    assert len(files) == 16  # synthetic_size
    arr = np.load(os.path.join(out_dir, files[0]))
    assert arr.shape == (32, 99)


def test_train_r_e2e(tmp_path):
    from oakink2_tamf_tpu.launch import train_r

    state = run_in_tmp(
        tmp_path, train_r.main,
        ["--cfg", SMOKE, "--exp_id", "smoke_r", "--train.num_epoch", "1",
         "--train.val_freq", "0", "--commit"],
    )
    import jax

    assert int(jax.device_get(state.step)) >= 1


def test_train_encoder_e2e(tmp_path):
    from oakink2_tamf_tpu.launch import train_encoder

    state = run_in_tmp(
        tmp_path, train_encoder.main,
        ["--cfg", SMOKE, "--exp_id", "smoke_e", "--train.num_epoch", "1",
         "--train.batch_size", "16", "--commit"],
    )
    import jax

    assert int(jax.device_get(state.step)) >= 1


def test_sample_r_e2e(tmp_path):
    from oakink2_tamf_tpu.launch import sample_r

    out_root = run_in_tmp(
        tmp_path, sample_r.main,
        ["--cfg", SMOKE, "--exp_id", "smoke_sr", "--sample.batch_size", "4",
         "--sample.split", "test", "--commit"],
    )
    import pickle

    found = []
    for root, _, files in os.walk(out_root):
        for f in files:
            if f == "save_dict.pkl":
                found.append(os.path.join(root, f))
    assert len(found) == 16
    with open(found[0], "rb") as f:
        d = pickle.load(f)
    assert d["verts"].shape == (32, 778, 3)
    assert d["joints"].shape == (32, 21, 3)
    assert d["refine_pose_repr"].shape == (32, 99)
    assert d["faces"].ndim == 2
