"""Tests for core/geometry: vertex normals + signed chamfer vs naive numpy."""

import numpy as np
import jax.numpy as jnp

from oakink2_tamf_tpu.core import geometry as G


def test_vertex_normals_plane():
    # a flat square in z=0 -> all normals +z (consistent winding)
    verts = jnp.asarray(
        np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    )
    faces = jnp.asarray(np.array([[0, 1, 2], [0, 2, 3]], np.int32))
    n = G.vertex_normals(verts, faces)
    np.testing.assert_allclose(np.asarray(n), np.tile([0, 0, 1.0], (4, 1)), atol=1e-6)


def test_vertex_normals_batched():
    rng = np.random.default_rng(0)
    verts = rng.normal(size=(3, 50, 3)).astype(np.float32)
    faces = rng.integers(0, 50, size=(80, 3)).astype(np.int32)
    n = G.vertex_normals(jnp.asarray(verts), jnp.asarray(faces))
    assert n.shape == (3, 50, 3)
    for i in range(3):
        ni = G.vertex_normals(jnp.asarray(verts[i]), jnp.asarray(faces))
        np.testing.assert_allclose(np.asarray(n[i]), np.asarray(ni), atol=1e-6)


def test_vertex_normals_zero_acc_grad_finite():
    """A vertex whose incident face normals cancel (or that no face touches)
    accumulates a ZERO normal; the backward must stay finite. The naive
    acc/max(||acc||, eps) normalize NaN'd there (d||x||/dx is NaN at 0, and
    zero-cotangent x NaN = NaN) — this bit batch_recover_mano's two-side
    `where` select through its UNSELECTED branch and poisoned real G
    gradients on mixed-handed batches (caught by the slow fused-vs-composed
    e2e; kept fast here)."""
    import jax

    # two coincident opposite-winding triangles -> vertex normals cancel;
    # vertex 3 untouched by any face -> zero accumulation as well
    verts0 = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]], np.float32
    )
    faces = jnp.asarray(np.array([[0, 1, 2], [0, 2, 1]], np.int32))

    def loss(v):
        return jnp.sum(G.vertex_normals(v, faces) ** 2)

    g = jax.grad(loss)(jnp.asarray(verts0))
    assert np.all(np.isfinite(np.asarray(g)))

    # batched (dense-operator path stays under _VN_DENSE_MAX) and through a
    # jnp.where select with a zero cotangent on the branch holding the zeros
    vb = jnp.asarray(np.stack([verts0, verts0 + 1.0]))

    def loss_where(v):
        n = G.vertex_normals(v, faces)
        sel = jnp.where(jnp.asarray([True, False])[:, None, None], n, 0.0)
        return jnp.sum(sel ** 2)

    g2 = jax.grad(loss_where)(vb)
    assert np.all(np.isfinite(np.asarray(g2)))


def naive_signed(x, y, xn):
    """Direct numpy mirror of the reference point2point_signed (chamfer wrapper)."""
    N, P1, _ = x.shape
    P2 = y.shape[1]
    y2x_signed = np.zeros((N, P2))
    x2y = np.zeros((N, P1))
    yidx = np.zeros((N, P2), np.int64)
    for n in range(N):
        d = np.linalg.norm(x[n][:, None] - y[n][None], axis=-1)  # [P1, P2]
        idx_y2x = np.argmin(d, axis=0)  # nearest x for each y
        idx_x2y = np.argmin(d, axis=1)  # nearest y for each x
        yidx[n] = idx_y2x
        offs = y[n] - x[n][idx_y2x]
        sign = np.sign(np.sum(xn[n][idx_y2x] * offs, axis=-1))
        y2x_signed[n] = d[idx_y2x, np.arange(P2)] * sign
        x2y[n] = d[np.arange(P1), idx_x2y]
    return y2x_signed, x2y, yidx


def test_point2point_signed_matches_naive():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 37, 3)).astype(np.float32)
    y = rng.normal(size=(2, 101, 3)).astype(np.float32)
    xn = rng.normal(size=(2, 37, 3)).astype(np.float32)
    xn /= np.linalg.norm(xn, axis=-1, keepdims=True)

    y2x_s, x2y_s, yidx = G.point2point_signed(
        jnp.asarray(x), jnp.asarray(y), x_normals=jnp.asarray(xn), chunk=32
    )
    ref_y2x, ref_x2y, ref_yidx = naive_signed(x, y, xn)
    np.testing.assert_allclose(np.asarray(y2x_s), ref_y2x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(x2y_s), ref_x2y, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(yidx), ref_yidx)


def test_point2point_signed_with_valid_mask():
    """Padded y points must not affect x2y distances and get zeroed y2x."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 20, 3)).astype(np.float32)
    y_real = rng.normal(size=(1, 50, 3)).astype(np.float32)
    # pad with points AT the x positions (worst case if unmasked)
    y_pad = np.concatenate([y_real, x[:, :10] * 1.0], axis=1)
    valid = np.concatenate([np.ones((1, 50), bool), np.zeros((1, 10), bool)], axis=1)

    _, x2y_masked, _ = G.point2point_signed(
        jnp.asarray(x), jnp.asarray(y_pad), y_valid=jnp.asarray(valid), chunk=16
    )
    _, x2y_ref, _ = G.point2point_signed(jnp.asarray(x), jnp.asarray(y_real), chunk=16)
    np.testing.assert_allclose(np.asarray(x2y_masked), np.asarray(x2y_ref), atol=1e-5)

    y2x_masked, _, _ = G.point2point_signed(
        jnp.asarray(x), jnp.asarray(y_pad), y_valid=jnp.asarray(valid), chunk=16
    )
    np.testing.assert_allclose(np.asarray(y2x_masked[0, 50:]), np.zeros(10), atol=0)


def test_min_cdist():
    rng = np.random.default_rng(3)
    hv = rng.normal(size=(4, 30, 3)).astype(np.float32)
    pc = rng.normal(size=(4, 70, 3)).astype(np.float32)
    out = np.asarray(G.min_cdist(jnp.asarray(hv), jnp.asarray(pc), chunk=32))
    for t in range(4):
        d = np.linalg.norm(hv[t][:, None] - pc[t][None], axis=-1).min()
        np.testing.assert_allclose(out[t], d, atol=1e-5)


def test_nearest_neighbor_chunk_boundaries():
    """Answer must be independent of chunk size."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(13, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(97, 3)).astype(np.float32))
    d1, i1 = G.nearest_neighbor(x, y, chunk=8)
    d2, i2 = G.nearest_neighbor(x, y, chunk=97)
    d3, i3 = G.nearest_neighbor(x, y, chunk=128)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d3), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i3))
