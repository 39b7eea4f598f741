"""Shared-Y (y_group) chamfer mode vs the per-frame kernels.

The grouped mode lets L frames share one canonical object cloud (call sites
move the HAND into the object's canonical frame — distances are
rigid-invariant, reference model/loss/chamfer_distance.py computes them in
the world frame per frame). These tests pin grouped == repeat(y, L) for the
fused signed kernel, the h2o-only kernel, and the cluster-pruned kernel,
values and grads."""
import numpy as np
import jax
import jax.numpy as jnp

from oakink2_tamf_tpu.ops import chamfer_pallas as CP


def test_grouped_signed_matches_perframe():
    rng = np.random.default_rng(0)
    G, L, P1, P2 = 3, 4, 17, 33
    F = G * L
    x = jnp.asarray(rng.normal(size=(F, P1, 3)).astype(np.float32))
    n = jnp.asarray(rng.normal(size=(F, P1, 3)).astype(np.float32))
    yg = jnp.asarray(rng.normal(size=(G, P2, 3)).astype(np.float32))
    yv = jnp.asarray(rng.random((G, P2)) > 0.2)
    yf = jnp.repeat(yg, L, axis=0)
    yvf = jnp.repeat(yv, L, axis=0)

    def f_group(x):
        o2h, h2o, oi = CP.point2point_signed_pallas(
            x, yg, x_normals=n, y_valid=yv, tile=16, interpret=True,
            grad_y=False, y_group=L,
        )
        return o2h, h2o, oi

    def f_frame(x):
        o2h, h2o, oi = CP.point2point_signed_pallas(
            x, yf, x_normals=n, y_valid=yvf, tile=16, interpret=True,
            grad_y=False,
        )
        return o2h, h2o, oi

    og, hg, ig = f_group(x)
    of, hf, i_f = f_frame(x)
    np.testing.assert_allclose(np.asarray(og), np.asarray(of), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hg), np.asarray(hf), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ig), np.asarray(i_f))

    def loss_g(x):
        o2h, h2o, _ = f_group(x)
        return jnp.sum(jnp.abs(o2h)) + jnp.sum(h2o**2)

    def loss_f(x):
        o2h, h2o, _ = f_frame(x)
        return jnp.sum(jnp.abs(o2h)) + jnp.sum(h2o**2)

    gg = jax.grad(loss_g)(x)
    gf = jax.grad(loss_f)(x)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gf), atol=1e-5)


def test_grouped_h2o_matches_perframe():
    rng = np.random.default_rng(1)
    G, L, P1, P2 = 2, 5, 9, 40
    F = G * L
    x = jnp.asarray(rng.normal(size=(F, P1, 3)).astype(np.float32))
    yg = jnp.asarray(rng.normal(size=(G, P2, 3)).astype(np.float32))
    yv = jnp.asarray(rng.random((G, P2)) > 0.3)
    yf = jnp.repeat(yg, L, axis=0)
    yvf = jnp.repeat(yv, L, axis=0)

    dg = CP.point2point_h2o_pallas(
        x, yg, y_valid=yv, tile=16, interpret=True, grad_y=False, y_group=L
    )
    df = CP.point2point_h2o_pallas(
        x, yf, y_valid=yvf, tile=16, interpret=True, grad_y=False
    )
    np.testing.assert_allclose(np.asarray(dg), np.asarray(df), atol=1e-5)

    gg = jax.grad(lambda x: jnp.sum(
        CP.point2point_h2o_pallas(x, yg, y_valid=yv, tile=16, interpret=True,
                                  grad_y=False, y_group=L) ** 2))(x)
    gf = jax.grad(lambda x: jnp.sum(
        CP.point2point_h2o_pallas(x, yf, y_valid=yvf, tile=16, interpret=True,
                                  grad_y=False) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gf), atol=1e-5)


def test_grouped_cluster_h2o_matches_perframe():
    from oakink2_tamf_tpu.ops import chamfer_cluster as CC

    rng = np.random.default_rng(2)
    G, L, P1, P2 = 2, 3, 70, 4 * CC.S_CELL
    F = G * L
    x = jnp.asarray(rng.normal(size=(F, P1, 3)).astype(np.float32))
    yg = jnp.asarray(rng.normal(size=(G, P2, 3)).astype(np.float32))
    yv = jnp.asarray(rng.random((G, P2)) > 0.1)
    yf = jnp.repeat(yg, L, axis=0)
    yvf = jnp.repeat(yv, L, axis=0)

    dg = CC.point2point_h2o_cluster(
        x, yg, y_valid=yv, k_cells=4, interpret=True, grad_y=False, y_group=L
    )
    df = CC.point2point_h2o_cluster(
        x, yf, y_valid=yvf, k_cells=4, interpret=True, grad_y=False
    )
    np.testing.assert_allclose(np.asarray(dg), np.asarray(df), atol=1e-5)

    gg = jax.grad(lambda x: jnp.sum(CC.point2point_h2o_cluster(
        x, yg, y_valid=yv, k_cells=4, interpret=True, grad_y=False, y_group=L) ** 2))(x)
    gf = jax.grad(lambda x: jnp.sum(CC.point2point_h2o_cluster(
        x, yf, y_valid=yvf, k_cells=4, interpret=True, grad_y=False) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gf), atol=1e-5)

    ovf_g = CC.h2o_cluster_overflow(x, yg, y_valid=yv, k_cells=4, y_group=L)
    ovf_f = CC.h2o_cluster_overflow(x, yf, y_valid=yvf, k_cells=4)
    np.testing.assert_array_equal(np.asarray(ovf_g), np.asarray(ovf_f))


def test_padded_slot_zero_distance_grad_finite():
    """Regression: collate pads obj_points with ZEROS and a padded slot's
    canonical-frame hand verts are exactly 0 too (zero traj -> R=0, t=0), so
    the per-object NN hits d == 0.0 bit-exact. sqrt'(0) = inf and the loss's
    obj_mask multiply (0 cotangent) made the WHOLE grad NaN through the XLA
    fallback (one AdamW step -> every param NaN, masked downstream by
    nan_to_num). _safe_sqrt pins the zero subgradient."""
    from oakink2_tamf_tpu.models.refine_r import multi_object_h2o_dist

    rng = np.random.default_rng(3)
    bs, L, nobj, P = 2, 3, 3, 32
    verts = jnp.asarray(rng.normal(size=(bs, L, 778, 3)).astype(np.float32))
    normals = jnp.asarray(rng.normal(size=(bs, L, 778, 3)).astype(np.float32))
    traj = np.zeros((bs, nobj, L, 9), np.float32)
    traj[:, :2, :, 3] = 1.0
    traj[:, :2, :, 7] = 1.0  # identity rot6d for the 2 real slots
    pts = rng.normal(size=(bs, nobj, P, 3)).astype(np.float32)
    pts[:, 2] = 0.0  # padded slot: ZERO cloud (collate padding)
    mask = jnp.asarray(np.array([[1, 1, 0], [1, 0, 0]], bool))

    def f(v):
        return jnp.sum(
            multi_object_h2o_dist(v, normals, jnp.asarray(traj), jnp.asarray(pts), mask, chunk=32)
        )

    val = f(verts)
    g = jax.grad(f)(verts)
    assert bool(jnp.isfinite(val))
    assert bool(jnp.isfinite(g).all())

    # the G-side per-object signed path shares the trigger
    from oakink2_tamf_tpu.models.losses import _per_object_signed
    from oakink2_tamf_tpu.core import transforms as T

    transf = T.tslrot6d_to_transf(jnp.asarray(traj))

    def fg(v):
        o2h, h2o = _per_object_signed(v, normals, transf, jnp.asarray(pts), 32)
        m = mask.astype(jnp.float32)[:, :, None, None]
        return jnp.sum(o2h * m) + jnp.sum(h2o * m)

    assert bool(jnp.isfinite(jax.grad(fg)(verts)).all())
