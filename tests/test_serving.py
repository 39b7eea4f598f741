"""TamfPipeline serving tests: load, fixed-batch generate, padding behavior."""

import numpy as np
import jax
import pytest

from oakink2_tamf_tpu.launch.common import SyntheticSegments
from oakink2_tamf_tpu.models.mdm_g import MDMConfig
from oakink2_tamf_tpu.models.refine_r import RefineConfig
from oakink2_tamf_tpu.serving import TamfPipeline


@pytest.fixture(scope="module")
def pipe():
    # ONE pipeline for the module: each load compiles the G chain + R forward
    return TamfPipeline.load(
        g_config=MDMConfig(latent_dim=32, ff_size=64, num_layers=1, num_heads=2, dropout=0.0),
        r_config=RefineConfig(latent_dim=32, ff_size=64, num_layers=1, num_heads=2, dropout=0.0),
        diffusion_steps=4,
        batch_size=4,
        seq_len=24,
        max_nobj=2,
        n_obj_points=64,
    )


def test_pipeline_generate(pipe):
    ds = SyntheticSegments(6, seq_len=24, max_nobj=2, n_obj_points=64)
    segments = [ds[i] for i in range(6)]  # 6 = 1.5 compiled batches
    results = pipe.generate(segments, key=jax.random.PRNGKey(0))
    assert len(results) == 6
    for r in results:
        assert r["refine_pose_repr"].shape == (24, 99)
        assert r["verts"].shape == (24, 778, 3)
        assert r["joints"].shape == (24, 21, 3)
        assert np.all(np.isfinite(r["refine_pose_repr"]))


def test_pipeline_deterministic(pipe):
    ds = SyntheticSegments(2, seq_len=24, max_nobj=2, n_obj_points=64)
    segs = [ds[0], ds[1]]
    r1 = pipe.generate(segs, key=jax.random.PRNGKey(7))
    r2 = pipe.generate(segs, key=jax.random.PRNGKey(7))
    np.testing.assert_allclose(r1[0]["refine_pose_repr"], r2[0]["refine_pose_repr"], atol=1e-6)
