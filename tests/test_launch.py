"""End-to-end launcher smoke tests on synthetic data: each CLI runs its full
pipeline (config -> data -> model -> sharded steps -> ckpt/outputs) on the
8-device CPU mesh, in a FRESH SUBPROCESS per launcher.

Why subprocesses: running the mains in-process was observed to intermittently
SIGABRT inside XLA:CPU value fetch/compile — only when executed late in a long
suite run (clean in isolation, clean in every serial re-run of just these
files), i.e. dependent on accumulated in-process state from earlier test
modules (torch, h5py, matplotlib, dozens of compiled executables). A fresh
interpreter per launcher removes that coupling; the on-disk XLA compile cache
keeps the cost to one jax init (~10 s) per test.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE = os.path.join(REPO, "config", "synthetic_smoke.yml")

STEP_EXPR = "int(__import__('jax').device_get(s.step))"


def run_in_tmp(tmp_path, module, argv, print_expr=None):
    """Run oakink2_tamf_tpu.launch.<module>.main(argv) in a subprocess with
    cwd=tmp_path; returns str(print_expr evaluated on the return value s)."""
    code = (
        "import sys\n"
        f"sys.path.insert(0, {str(REPO)!r})\n"
        # pin the CPU platform BEFORE any jax use: the image's sitecustomize
        # re-registers the axon TPU-tunnel backend and overrides JAX_PLATFORMS
        # (jax.config.update after import is the only reliable override — see
        # tests/conftest.py). Without this, every launcher subprocess silently
        # ran through the TUNNEL: recompile-everything when it was up (the
        # round-2 91-minute slow suite), a multi-minute hang per test when
        # it was down.
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"from oakink2_tamf_tpu.launch import {module} as m\n"
        f"s = m.main({list(argv)!r})\n"
    )
    if print_expr:
        code += f"print('RET=' + str({print_expr}))\n"
    env = dict(os.environ)
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tamf_xla_tests")
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, (
        f"launcher {module} failed (rc={r.returncode})\n"
        f"--- stdout ---\n{r.stdout[-3000:]}\n--- stderr ---\n{r.stderr[-3000:]}"
    )
    for line in r.stdout.splitlines():
        if line.startswith("RET="):
            return line[4:]
    return None


def test_train_g_e2e(tmp_path):
    step = run_in_tmp(
        tmp_path, "train_g",
        ["--cfg", SMOKE, "--exp_id", "smoke_g", "--commit"],
        print_expr=STEP_EXPR,
    )
    assert int(step) == 2 * (16 // 8)
    # checkpoints written
    save_dir = tmp_path / "common" / "train_g" / "smoke_g" / "save"
    assert any(p.name.startswith("model_") for p in save_dir.iterdir())
    assert (tmp_path / "common" / "train_g" / "smoke_g" / "opt.yml").exists()


def test_train_g_dry_run_writes_nothing(tmp_path):
    run_in_tmp(tmp_path, "train_g", ["--cfg", SMOKE, "--exp_id", "dry_g"])
    assert not (tmp_path / "common" / "train_g" / "dry_g").exists()


def test_sample_g_e2e(tmp_path):
    out_dir = run_in_tmp(
        tmp_path, "sample_g",
        [
            "--cfg", SMOKE, "--exp_id", "smoke_sample",
            "--sample.batch_size", "8", "--sample.split", "test", "--commit",
        ],
        print_expr="s",
    )
    files = sorted(os.listdir(out_dir))
    assert len(files) == 16  # synthetic_size
    arr = np.load(os.path.join(out_dir, files[0]))
    assert arr.shape == (32, 99)


def test_train_r_e2e(tmp_path):
    step = run_in_tmp(
        tmp_path, "train_r",
        ["--cfg", SMOKE, "--exp_id", "smoke_r", "--train.num_epoch", "1",
         "--train.val_freq", "0", "--commit"],
        print_expr=STEP_EXPR,
    )
    assert int(step) >= 1


def test_train_encoder_e2e(tmp_path):
    step = run_in_tmp(
        tmp_path, "train_encoder",
        ["--cfg", SMOKE, "--exp_id", "smoke_e", "--train.num_epoch", "1",
         "--train.batch_size", "16", "--commit"],
        print_expr=STEP_EXPR,
    )
    assert int(step) >= 1


def test_sample_r_e2e(tmp_path):
    import pickle

    out_root = run_in_tmp(
        tmp_path, "sample_r",
        ["--cfg", SMOKE, "--exp_id", "smoke_sr", "--sample.batch_size", "4",
         "--sample.split", "test", "--commit"],
        print_expr="s",
    )
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


def _tree_keys(out_root):
    keys = set()
    for root, _, files in os.walk(out_root):
        for f in files:
            if f == "save_dict.pkl":
                keys.add(os.path.relpath(os.path.join(root, f), out_root))
    return keys


def test_sample_r_sharded_disjoint_complete(tmp_path):
    """Two shards (sample.num_shards=2) must produce DISJOINT trees whose
    union equals the single-shard run (multi-host contract; reference
    sample_refine.py:264-292 shards worker processes the same way)."""
    trees = []
    for w in (0, 1):
        wd = tmp_path / f"shard{w}"
        wd.mkdir()
        out_root = run_in_tmp(
            wd, "sample_r",
            ["--cfg", SMOKE, "--exp_id", "smoke_srs", "--sample.batch_size", "8",
             "--sample.split", "test", "--sample.num_shards", "2",
             "--sample.shard_index", str(w), "--commit"],
            print_expr="s",
        )
        trees.append(_tree_keys(out_root))
    assert trees[0] and trees[1]
    assert not (trees[0] & trees[1]), "shards overlap"
    assert len(trees[0] | trees[1]) == 16, "union incomplete"
