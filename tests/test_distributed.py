"""TRUE multi-process (jax.distributed) coverage on CPU.

Everything multi-device elsewhere in the suite is single-process (8 virtual
CPU devices). These tests spawn TWO real `jax.distributed` processes (2 local
CPU devices each, Gloo collectives) and convert the multi-host design
arguments into executed evidence:

- `parallel.mesh.shard_batch` assembles the global batch from per-host loader
  stripes via make_array_from_process_local_data (a plain device_put RAISES
  cross-process: "passed to device_put is not the same on each process").
- DataLoader process striding (DistributedSampler semantics, reference
  launch/train.py:394-432) partitions the dataset disjointly + completely.
- `launch.common.resolve_shard` defaults to the process topology.
- `data.TargetH2OCache.precompute` stripes a SHARED cache dir across hosts;
  the fingerprint meta write is race-safe (both processes hit it at once).
- train_r runs a full GSPMD epoch across the 2-process mesh and both hosts
  agree bit-for-bit on the final replicated params.
- sample_r shards segments by process (local mesh per process) and the two
  output trees are disjoint + complete.

The reference's equivalent is torch DDP + DistributedSampler spawned by
torchrun (util/ddp_util.py:16-21, launch/train.py:394-432) and manually
sharded sampler workers (script/sample_refine.py:264-292).
"""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE = os.path.join(REPO, "config", "synthetic_smoke.yml")

# Every worker starts with this prologue: pin the CPU platform (the image's
# sitecustomize registers the TPU-tunnel backend and overrides JAX_PLATFORMS —
# jax.config.update after import is the only reliable override, see
# tests/conftest.py), 2 local devices, then join the 2-process rendezvous.
_PROLOGUE = """
import os, sys, json
sys.path.insert(0, {repo!r})
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tamf_xla_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="127.0.0.1:{port}",
                           num_processes=2, process_id=pid,
                           initialization_timeout=120)
assert jax.process_count() == 2 and jax.process_index() == pid
assert len(jax.local_devices()) == 2 and len(jax.devices()) == 4
SHARED = {shared!r}
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_pair(code: str, tmp_path, timeout=900):
    """Run `code` in two concurrent processes (argv[1] = process id 0/1)."""
    procs = []
    for pid in (0, 1):
        wd = tmp_path / f"proc{pid}"
        wd.mkdir(exist_ok=True)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", code, str(pid)],
                cwd=wd,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs, deadline = [], time.time() + timeout
    for p in procs:
        try:
            out, _ = p.communicate(timeout=max(10.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            out, _ = p.communicate()
            raise AssertionError(f"distributed worker timed out\n{out[-3000:]}")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode})\n{out[-5000:]}"
        )
    return outs


def test_two_process_infra_and_train_r(tmp_path):
    """Loader striding + resolve_shard + shared-dir cache precompute + one
    GSPMD train_r epoch across 2 processes (val_freq=1: the val pass is a
    global-mesh SPMD program that must run on BOTH processes — the round-3
    regression this pins is a coordinator-only eval deadlocking here); hosts
    must agree on final params."""
    shared = tmp_path / "shared"
    shared.mkdir()
    code = _PROLOGUE.format(repo=REPO, port=_free_port(), shared=str(shared)) + """
# --- resolve_shard defaults to the process topology ---
from oakink2_tamf_tpu.launch.common import resolve_shard
assert resolve_shard({}) == (pid, 2), resolve_shard({})

# --- DataLoader striding: disjoint complete partition across processes ---
from oakink2_tamf_tpu.data.loader import DataLoader
ds = [{"i": i} for i in range(9)]  # odd size: exercises the wrap-pad
loader = DataLoader(ds, batch_size=2,
                    collate_fn=lambda l: np.array([d["i"] for d in l]),
                    shuffle=True, drop_last=False, seed=3, num_workers=0)
loader.set_epoch(1)
seen = sorted(int(i) for b in loader for i in b)
with open(os.path.join(SHARED, f"stripe{pid}.json"), "w") as f:
    json.dump(seen, f)

# --- train_r: shared target-h2o cache dir + 1 epoch over the global mesh,
# --- with the val/test eval pass running as a 2-process SPMD program ---
from oakink2_tamf_tpu.launch import train_r
s = train_r.main([
    "--cfg", {smoke!r}, "--exp_id", "dist_r",
    "--train.num_epoch", "1", "--train.val_freq", "1",
    "--train.eval_max_batches", "1",
    "--train.data.target_h2o_cache_dir", os.path.join(SHARED, "h2o_cache"),
])
step = int(jax.device_get(s.step))
leaves = jax.tree.leaves(s.params)
checksum = float(sum(float(jax.device_get(l.astype("float64")).sum()) for l in leaves))
with open(os.path.join(SHARED, f"result{pid}.json"), "w") as f:
    json.dump({"step": step, "checksum": checksum}, f)
print(f"[{pid}] OK step={step} checksum={checksum}", flush=True)
""".replace("{smoke!r}", repr(SMOKE))
    outs = _run_pair(code, tmp_path)
    # the val pass ran (it executes on BOTH processes; only the coordinator
    # logs the result line)
    assert any("refine loss" in o for o in outs), "val pass did not run"

    stripes = [json.load(open(shared / f"stripe{p}.json")) for p in (0, 1)]
    # 9 samples / 2 shards -> wrap-pad to 10, 5 per host (DistributedSampler
    # semantics): union complete, exactly one duplicated pad index overall
    assert set(stripes[0]) | set(stripes[1]) == set(range(9))
    assert len(stripes[0]) == len(stripes[1]) == 5

    results = [json.load(open(shared / f"result{p}.json")) for p in (0, 1)]
    assert results[0]["step"] == results[1]["step"] >= 1
    # replicated params after a GSPMD data-parallel step are bitwise equal
    assert results[0]["checksum"] == results[1]["checksum"]

    cache = shared / "h2o_cache"
    npys = sorted(p.name for p in cache.iterdir() if p.suffix == ".npy")
    assert len(npys) == 16, npys  # striped precompute union covers ALL segments
    assert (cache / "meta.json").exists()  # race-safe fingerprint write


# One G train step on a deterministic synthetic batch: executed verbatim by
# BOTH the 2-process workers (4 local devices each -> 8 global) and the
# single-process 8-device reference in the pytest parent, so the two
# topologies cannot diverge in setup. Expects `lo, hi` (this host's stripe
# of the global batch) and binds `loss`.
_G_STEP_CODE = """
import dataclasses
import numpy as np
import jax
from oakink2_tamf_tpu.core import diffusion as D
from oakink2_tamf_tpu.core import mano as M
from oakink2_tamf_tpu.data.synthetic import synthetic_batch
from oakink2_tamf_tpu.models import losses as LL
from oakink2_tamf_tpu.models.mdm_g import InteractionSegmentMDM, MDMConfig
from oakink2_tamf_tpu.models.refine_r import stack_mano_models
from oakink2_tamf_tpu.parallel import train as PT
from oakink2_tamf_tpu.parallel.mesh import make_mesh, replicate, shard_batch

BS, L, P = 8, 16, 64
cfg = dataclasses.replace(
    MDMConfig(), latent_dim=32, ff_size=64, num_layers=2, num_heads=2, dropout=0.0
)
model = InteractionSegmentMDM(cfg)
sched = D.tamf_schedule(50)
mano_stack = stack_mano_models(
    M.synthetic_mano_model("right"), M.synthetic_mano_model("left")
)
assets = LL.load_contact_assets()
batch = synthetic_batch(
    np.random.default_rng(0), batch_size=BS, seq_len=L, max_nobj=2, n_obj_points=P
)
# fixed timesteps: the in-step uniform draw is rng-identical anyway (same
# key), but pinning them keeps the equality argument trivial
batch["t"] = np.arange(BS, dtype=np.int32) % 50
batch["t_weights"] = np.ones(BS, np.float32)
cond = PT.g_cond_from_batch(batch)
params = model.init(
    jax.random.PRNGKey(0), batch["pose_repr"], np.zeros((BS,), np.int32), cond
)
opt = PT.make_optimizer()
mesh = make_mesh()
step = PT.make_g_train_step(
    model, sched, opt, mano_stack, assets, LL.ExtraLossConfig(), chunk=64, mesh=mesh
)
state = replicate(PT.init_train_state(params, opt), mesh)
local = {k: (np.asarray(v)[lo:hi] if np.ndim(v) else v) for k, v in batch.items()}
sbatch = shard_batch(local, mesh)
state, metrics = step(state, sbatch, jax.random.PRNGKey(1))
loss = float(jax.device_get(metrics["loss"]))
"""


def test_two_process_train_g_step_matches_single_process(tmp_path):
    """Multi-host train smoke (round-3 verdict stretch #8): ONE G train step
    (geometric losses included) under jax.distributed with 2 processes x 4
    local devices must produce the same loss as the 1-process 8-device run
    of the identical batch — the GSPMD program is topology-invariant."""
    shared = tmp_path / "shared"
    shared.mkdir()
    code = (
        _PROLOGUE.replace('"--xla_force_host_platform_device_count=2"',
                          '"--xla_force_host_platform_device_count=4"')
        .replace("len(jax.local_devices()) == 2 and len(jax.devices()) == 4",
                 "len(jax.local_devices()) == 4 and len(jax.devices()) == 8")
        .format(repo=REPO, port=_free_port(), shared=str(shared))
        + "lo, hi = pid * 4, pid * 4 + 4\n"
        + _G_STEP_CODE
        + """
with open(os.path.join(SHARED, f"loss{pid}.json"), "w") as f:
    json.dump({"loss": loss}, f)
print(f"[{pid}] OK loss={loss}", flush=True)
"""
    )
    _run_pair(code, tmp_path)

    # single-process 8-device reference in THIS process (conftest mesh)
    ns = {"lo": 0, "hi": 8}
    exec(_G_STEP_CODE, ns)  # noqa: S102 - the same code the workers ran
    ref_loss = ns["loss"]

    losses = [json.load(open(shared / f"loss{p}.json"))["loss"] for p in (0, 1)]
    assert losses[0] == losses[1], "hosts disagree on the replicated loss"
    np.testing.assert_allclose(losses[0], ref_loss, rtol=1e-5)


def test_two_process_sample_r_disjoint_complete(tmp_path):
    """sample_r under jax.distributed: resolve_shard picks the process
    topology, each process runs an independent LOCAL-mesh jit over its own
    segment stripe, trees are disjoint and their union is complete."""
    shared = tmp_path / "shared"
    shared.mkdir()
    code = _PROLOGUE.format(repo=REPO, port=_free_port(), shared=str(shared)) + """
# each worker writes into its OWN cwd tree (the production equivalent is a
# shared filesystem; separate roots let each worker report exactly what IT
# wrote — disjointness/completeness is judged on the relpath key sets)
from oakink2_tamf_tpu.launch import sample_r
out_root = sample_r.main([
    "--cfg", {smoke!r}, "--exp_id", "dist_sr",
    "--sample.batch_size", "4", "--sample.split", "test", "--commit",
])
keys = []
for root, _, files in os.walk(out_root):
    for f in files:
        if f == "save_dict.pkl":
            keys.append(os.path.relpath(os.path.join(root, f), out_root))
with open(os.path.join(SHARED, f"tree{pid}.json"), "w") as f:
    json.dump(sorted(keys), f)
print(f"[{pid}] OK n={len(keys)}", flush=True)
""".replace("{smoke!r}", repr(SMOKE))
    _run_pair(code, tmp_path)

    trees = [set(json.load(open(shared / f"tree{p}.json"))) for p in (0, 1)]
    assert trees[0] and trees[1]
    assert not (trees[0] & trees[1]), "process shards overlap"
    assert len(trees[0] | trees[1]) == 16, "union incomplete"
