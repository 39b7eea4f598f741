"""PointBERT (PointTransformer) tests: FPS/kNN properties and encoder shapes."""

import numpy as np
import jax
import jax.numpy as jnp

from oakink2_tamf_tpu.models import pointbert as PB


def test_fps_spreads_points():
    rng = np.random.default_rng(0)
    # two separated clusters: FPS must pick from both
    a = rng.normal(size=(100, 3)) * 0.01
    b = rng.normal(size=(100, 3)) * 0.01 + 10.0
    pts = jnp.asarray(np.concatenate([a, b])[None].astype(np.float32))
    idx = PB.farthest_point_sampling(pts, 8)
    picked = np.asarray(idx[0])
    assert len(set(picked.tolist())) == 8  # distinct
    assert (picked < 100).any() and (picked >= 100).any()  # both clusters


def test_knn_group_shapes_and_centering():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    centers = pts[:, :4]
    neigh, idx = PB.knn_group(pts, centers, k=8)
    assert neigh.shape == (2, 4, 8, 3)
    # nearest neighbor of a center is itself -> offset 0 present
    d = np.linalg.norm(np.asarray(neigh), axis=-1)
    assert (d.min(axis=-1) < 1e-6).all()


def test_point_transformer_embedding():
    cfg = PB.PointBertConfig(trans_dim=32, depth=2, num_heads=4, group_size=8, num_group=16, encoder_dims=24)
    model = PB.PointTransformer(cfg)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), pts)
    out = model.apply(variables, pts)
    assert out.shape == (2, 64)  # 2 * trans_dim
    assert np.all(np.isfinite(np.asarray(out)))

    # default config emits the 768-d embedding the models consume
    assert 2 * PB.PointBertConfig().trans_dim == 768


def test_embedding_permutation_invariance():
    """FPS start is index 0, so permuting all but point 0 keeps the embedding
    approximately stable (same geometry)."""
    cfg = PB.PointBertConfig(trans_dim=16, depth=1, num_heads=2, group_size=8, num_group=8, encoder_dims=16)
    model = PB.PointTransformer(cfg)
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(1, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts))
    out1 = model.apply(variables, jnp.asarray(pts))
    perm = np.concatenate([[0], 1 + rng.permutation(63)])
    out2 = model.apply(variables, jnp.asarray(pts[:, perm]))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)
