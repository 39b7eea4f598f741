"""Utils tests: Kabsch, random rotations, mesh IO/sampling, cast, extract_sample,
profiler timer."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from oakink2_tamf_tpu.core import transforms as T
from oakink2_tamf_tpu.utils import cast as UC
from oakink2_tamf_tpu.utils import mesh_io as MI
from oakink2_tamf_tpu.utils import random as UR
from oakink2_tamf_tpu.utils import registration as REG


def test_kabsch_recovers_transform():
    rng = np.random.default_rng(0)
    R = np.asarray(UR.random_rotmat(jax.random.PRNGKey(1)))
    t = rng.normal(size=(3,))
    src = rng.normal(size=(100, 3)).astype(np.float64)
    dst = src @ R.T + t
    X = REG.kabsch(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(X[:3, :3]), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(X[:3, 3]), t, atol=1e-5)


def test_random_quat_uniformish():
    q = UR.random_quat(jax.random.PRNGKey(0), (1000,))
    norms = np.asarray(jnp.linalg.norm(q, axis=-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    R = UR.random_rotmat(jax.random.PRNGKey(0), (500,))
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-4)
    # mean rotation axis roughly isotropic
    assert np.abs(np.asarray(q).mean(axis=0)[1:]).max() < 0.1


def test_obj_io_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    p = str(tmp_path / "m.obj")
    MI.save_obj(p, verts, faces)
    v2, f2 = MI.load_obj(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)


def test_surface_sampling_on_triangle():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    pts = MI.sample_surface(verts, faces, 500)
    assert pts.shape == (500, 3)
    # all on the z=0 plane inside the triangle
    np.testing.assert_allclose(pts[:, 2], 0.0, atol=1e-6)
    assert (pts[:, 0] >= -1e-6).all() and (pts[:, 1] >= -1e-6).all()
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-5).all()


def test_map_copy_select_to():
    batch = {"a": np.ones((2, 3)), "b": ["x", "y"], "c": np.zeros((2,))}
    out = UC.map_copy_select_to(batch, select=("a",), dtype=jnp.float32)
    assert isinstance(out["a"], jax.Array)
    assert out["b"] == ["x", "y"]
    assert isinstance(out["c"], np.ndarray)


def test_step_timer():
    from oakink2_tamf_tpu.runtime.profiler import StepTimer

    t = StepTimer(window=4)
    assert t.tick() is None
    for _ in range(3):
        dt = t.tick()
        assert dt is not None and dt >= 0
    assert t.mean_step_time >= 0
    assert t.throughput(10) > 0


def test_extract_refined_sample():
    from oakink2_tamf_tpu.core import diffusion as D
    from oakink2_tamf_tpu.core import mano as M
    from oakink2_tamf_tpu.launch.common import SyntheticSegments
    from oakink2_tamf_tpu.models.clip_text import FrozenClipText
    from oakink2_tamf_tpu.models.extract_sample import extract_refined_sample
    from oakink2_tamf_tpu.models.mdm_g import InteractionSegmentMDM, MDMConfig
    from oakink2_tamf_tpu.models.refine_r import (
        RefineConfig,
        SegmentRefineNet,
        stack_mano_models,
    )
    from oakink2_tamf_tpu.parallel.train import g_cond_from_batch
    from oakink2_tamf_tpu.data.collate import SegmentCollate

    ds = SyntheticSegments(4, seq_len=16, max_nobj=2, n_obj_points=64)
    clip = FrozenClipText()
    g = InteractionSegmentMDM(MDMConfig(latent_dim=32, ff_size=64, num_layers=1, num_heads=2, dropout=0.0))
    r = SegmentRefineNet(RefineConfig(latent_dim=32, ff_size=64, num_layers=1, num_heads=2, dropout=0.0))
    sched = D.tamf_schedule(4)
    mano_stack = stack_mano_models(M.synthetic_mano_model("right"), M.synthetic_mano_model("left"))

    collate = SegmentCollate(max_nobj=2, n_obj_points=64)
    batch = collate([ds[0], ds[1]])
    batch["text_emb"] = clip.encode_text(batch["text"]).astype(np.float32)
    from oakink2_tamf_tpu.launch.common import device_batch

    db = device_batch(batch)
    cond = g_cond_from_batch(db)
    g_params = g.init(jax.random.PRNGKey(0), db["pose_repr"], np.zeros((2,), np.int32), cond)
    rcond = {k: db[k] for k in ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
    r_params = r.init(
        jax.random.PRNGKey(1), db["pose_repr"], jnp.zeros((2, 16, 778)), rcond
    )

    out = extract_refined_sample(
        g, g_params, sched, r, r_params, mano_stack, [ds[0], ds[1]], clip,
        jax.random.PRNGKey(2), max_nobj=2, n_obj_points=64,
    )
    assert out.shape == (2, 16, 99)
    assert np.all(np.isfinite(out))


def test_design_bench_table_markers_and_renderer():
    """docs/DESIGN.md's measured table is GENERATED from the newest BENCH
    artifact (scripts/update_design_tables.py) — hand-copied numbers drifted
    in rounds 3 and 4. The block markers must exist and the renderer must
    produce a table from a synthetic artifact record."""
    import importlib.util

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "docs", "DESIGN.md")) as f:
        doc = f.read()
    spec = importlib.util.spec_from_file_location(
        "update_design_tables",
        os.path.join(here, "scripts", "update_design_tables.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.BEGIN in doc and mod.END in doc

    rec = {
        "parsed": {
            "value": 17.0, "vs_baseline": 30.0,
            "extra": {
                "sampling_mfu": 0.775,
                "train_g_prod_step_ms": 1500.0,
                "train_g_prod_samples_per_sec_per_chip": 42.7,
                "train_g_prod_shape": {
                    "batch": 64, "nobj": 2, "n_obj_points": 8192,
                    "valid_frac_frame_objects": 0.41,
                },
                "train_g_prod_budget": {
                    "step_ms": 1500.0, "trunk_opt_ms": 80.0, "mano_ms": 150.0,
                    "chamfer_ms": 1100.0, "other_ms": 170.0,
                },
                "kernel_selfcheck": "ok",
            },
        }
    }
    block = mod.render(5, rec)
    assert "train_g_prod" in block and "1.50 s" in block and "42.7" in block
    assert "41% slots valid" in block
    assert "kernel selfcheck: ok" in block
    assert block.startswith(mod.BEGIN) and block.endswith(mod.END)
