"""Pallas chamfer kernel vs the XLA streaming reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from oakink2_tamf_tpu.core import geometry as G
from oakink2_tamf_tpu.ops import chamfer_pallas as CP


def test_nn_bidirectional_matches_reference():
    rng = np.random.default_rng(0)
    F, P1, P2 = 3, 50, 300
    x = rng.normal(size=(F, P1, 3)).astype(np.float32)
    y = rng.normal(size=(F, P2, 3)).astype(np.float32)

    h2o_d, h2o_i, o2h_d, o2h_i = CP.nn_bidirectional_pallas(
        jnp.asarray(x), jnp.asarray(y), tile=128, interpret=True
    )
    for f in range(F):
        d = np.linalg.norm(x[f][:, None] - y[f][None], axis=-1) ** 2
        np.testing.assert_allclose(np.asarray(h2o_d[f]), d.min(axis=1), rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(h2o_i[f]), d.argmin(axis=1))
        np.testing.assert_allclose(np.asarray(o2h_d[f]), d.min(axis=0), rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(o2h_i[f]), d.argmin(axis=0))


def test_nn_with_valid_mask():
    rng = np.random.default_rng(1)
    F, P1, P2 = 2, 20, 200
    x = rng.normal(size=(F, P1, 3)).astype(np.float32)
    y = rng.normal(size=(F, P2, 3)).astype(np.float32)
    valid = np.ones((F, P2), bool)
    valid[:, 150:] = False
    # poison invalid points at x positions: must be ignored for h2o
    y[:, 150:170] = x[:, :20] if P1 >= 20 else y[:, 150:170]

    h2o_d, h2o_i, _, _ = CP.nn_bidirectional_pallas(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid), tile=128, interpret=True
    )
    for f in range(F):
        d = np.linalg.norm(x[f][:, None] - y[f][None, :150], axis=-1) ** 2
        np.testing.assert_allclose(np.asarray(h2o_d[f]), d.min(axis=1), rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(h2o_i[f]), d.argmin(axis=1))


def test_point2point_signed_pallas_matches_geometry():
    rng = np.random.default_rng(2)
    N, P1, P2 = 2, 37, 260
    x = rng.normal(size=(N, P1, 3)).astype(np.float32)
    y = rng.normal(size=(N, P2, 3)).astype(np.float32)
    xn = rng.normal(size=(N, P1, 3)).astype(np.float32)
    xn /= np.linalg.norm(xn, axis=-1, keepdims=True)

    y2x_p, x2y_p, yidx_p = CP.point2point_signed_pallas(
        jnp.asarray(x), jnp.asarray(y), x_normals=jnp.asarray(xn), tile=128, interpret=True
    )
    y2x_r, x2y_r, yidx_r = G.point2point_signed(
        jnp.asarray(x), jnp.asarray(y), x_normals=jnp.asarray(xn), chunk=64
    )
    np.testing.assert_allclose(np.asarray(y2x_p), np.asarray(y2x_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x2y_p), np.asarray(x2y_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(yidx_p), np.asarray(yidx_r))


def test_point2point_signed_pallas_grad_matches_xla():
    """Training differentiates through the chamfer distances (extra_loss /
    refine loss); the Pallas path's custom VJP must match XLA's gradient."""
    rng = np.random.default_rng(3)
    N, P1, P2 = 2, 23, 150
    x = rng.normal(size=(N, P1, 3)).astype(np.float32)
    y = rng.normal(size=(N, P2, 3)).astype(np.float32)
    xn = rng.normal(size=(N, P1, 3)).astype(np.float32)
    xn /= np.linalg.norm(xn, axis=-1, keepdims=True)
    valid = np.ones((N, P2), bool)
    valid[:, 120:] = False
    w = rng.normal(size=(N, P2)).astype(np.float32)
    v = rng.normal(size=(N, P1)).astype(np.float32)

    def loss_pallas(x, y):
        y2x, x2y, _ = CP.point2point_signed_pallas(
            x, y, x_normals=jnp.asarray(xn), y_valid=jnp.asarray(valid),
            tile=128, interpret=True,
        )
        return jnp.sum(y2x * w) + jnp.sum(x2y * v)

    def loss_xla(x, y):
        y2x, x2y, _ = G.point2point_signed(
            x, y, x_normals=jnp.asarray(xn), y_valid=jnp.asarray(valid), chunk=64,
            backend="xla",
        )
        return jnp.sum(y2x * w) + jnp.sum(x2y * v)

    gx_p, gy_p = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(y))
    gx_r, gy_r = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy_p), np.asarray(gy_r), rtol=1e-4, atol=1e-5)


def test_point2point_signed_pallas_grad_no_normals():
    rng = np.random.default_rng(4)
    N, P1, P2 = 2, 17, 140
    x = rng.normal(size=(N, P1, 3)).astype(np.float32)
    y = rng.normal(size=(N, P2, 3)).astype(np.float32)

    def loss_pallas(x, y):
        y2x, x2y, _ = CP.point2point_signed_pallas(x, y, tile=128, interpret=True)
        return jnp.sum(y2x) + 2.0 * jnp.sum(x2y)

    def loss_xla(x, y):
        y2x, x2y, _ = G.point2point_signed(x, y, chunk=64, backend="xla")
        return jnp.sum(y2x) + 2.0 * jnp.sum(x2y)

    gx_p, gy_p = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(y))
    gx_r, gy_r = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy_p), np.asarray(gy_r), rtol=1e-4, atol=1e-5)


def test_point2point_h2o_pallas_value_and_grad():
    """R's h2o-only kernel variant: values and gradients match the full path."""
    rng = np.random.default_rng(5)
    N, P1, P2 = 2, 29, 300
    x = rng.normal(size=(N, P1, 3)).astype(np.float32)
    y = rng.normal(size=(N, P2, 3)).astype(np.float32)
    valid = np.ones((N, P2), bool)
    valid[:, 250:] = False
    w = rng.normal(size=(N, P1)).astype(np.float32)

    h2o = CP.point2point_h2o_pallas(
        jnp.asarray(x), jnp.asarray(y), y_valid=jnp.asarray(valid),
        tile=128, interpret=True,
    )
    _, x2y_ref, _ = G.point2point_signed(
        jnp.asarray(x), jnp.asarray(y), y_valid=jnp.asarray(valid),
        chunk=64, backend="xla",
    )
    np.testing.assert_allclose(np.asarray(h2o), np.asarray(x2y_ref), rtol=1e-4, atol=1e-5)

    def loss_pallas(x, y):
        d = CP.point2point_h2o_pallas(
            x, y, y_valid=jnp.asarray(valid), tile=128, interpret=True
        )
        return jnp.sum(d * w)

    def loss_xla(x, y):
        _, x2y, _ = G.point2point_signed(
            x, y, y_valid=jnp.asarray(valid), chunk=64, backend="xla"
        )
        return jnp.sum(x2y * w)

    gx_p, gy_p = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(y))
    gx_r, gy_r = jax.grad(loss_xla, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy_p), np.asarray(gy_r), rtol=1e-4, atol=1e-5)


def test_grad_y_false_pallas_matches_gx_and_zeros_gy():
    """grad_y=False must leave gx equal to the grad_y=True gradient and
    return exactly zero gy — for both the signed and the h2o-only all-pairs
    kernels. Signed: bit-identical (the nogy kernel drops ONLY the gy
    one-hot matmuls). h2o: allclose at f32 rounding — its grad_y=False
    backward is the dvec path (x - y* from CENTERED coordinates carried out
    of the forward kernel, chamfer_pallas._nn_h2o_dvec_kernel) vs the legacy
    backward kernel's uncentered subtraction; algebraically identical,
    last-ulp different."""
    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.normal(size=(2, 150, 3)).astype(np.float32) * 0.1)
    y = jnp.asarray(rng.normal(size=(2, 300, 3)).astype(np.float32) * 0.2)
    n = rng.normal(size=(2, 150, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.asarray(n)

    def loss_signed(x_, y_, gy):
        o2h, h2o, _ = CP.point2point_signed_pallas(
            x_, y_, x_normals=n, tile=128, interpret=True, grad_y=gy
        )
        return jnp.sum(o2h**2) + jnp.sum(h2o**2)

    gx_t, gy_t = jax.grad(lambda a, b: loss_signed(a, b, True), argnums=(0, 1))(x, y)
    gx_f, gy_f = jax.grad(lambda a, b: loss_signed(a, b, False), argnums=(0, 1))(x, y)
    np.testing.assert_array_equal(np.asarray(gx_f), np.asarray(gx_t))
    assert np.any(np.asarray(gy_t) != 0.0)
    np.testing.assert_array_equal(np.asarray(gy_f), np.zeros_like(gy_f))

    def loss_h2o(x_, y_, gy):
        return jnp.sum(
            CP.point2point_h2o_pallas(x_, y_, tile=128, interpret=True, grad_y=gy) ** 2
        )

    gx_t, gy_t = jax.grad(lambda a, b: loss_h2o(a, b, True), argnums=(0, 1))(x, y)
    gx_f, gy_f = jax.grad(lambda a, b: loss_h2o(a, b, False), argnums=(0, 1))(x, y)
    np.testing.assert_allclose(
        np.asarray(gx_f), np.asarray(gx_t), rtol=1e-5, atol=1e-7
    )
    assert np.any(np.asarray(gy_t) != 0.0)
    np.testing.assert_array_equal(np.asarray(gy_f), np.zeros_like(gy_f))
