"""A/B parity of the cluster-pruned chamfer kernels (ops/chamfer_cluster.py)
against the exact XLA oracle (core/geometry._point2point_signed_xla path).

The pruning is EXACT by construction (cell-bound argument in the module
docstring); these tests verify the implementation of that argument — forward
distances, both gradients, both y layouts, validity masks, padding edges —
under interpret mode on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oakink2_tamf_tpu.core import geometry as G
from oakink2_tamf_tpu.ops import chamfer_cluster as CC
from oakink2_tamf_tpu.utils.pc_util import spatial_sort_indices

# the cluster kernel is RETIRED from all default routes (see its STATUS
# header) — its suite runs with `pytest -m slow`, keeping the fast suite for
# live paths; the live certificate plumbing stays fast-guarded by
# test_overflow_monitor.py
pytestmark = pytest.mark.slow


def scene(F=2, P1=200, P2=700, seed=0, spread=0.2):
    rng = np.random.default_rng(seed)
    x = (rng.normal(size=(F, P1, 3)) * 0.1).astype(np.float32)
    y = (rng.normal(size=(F, P2, 3)) * spread + rng.normal(size=(F, 1, 3)) * 0.1).astype(np.float32)
    yv = rng.random((F, P2)) > 0.15
    return x, y, yv


def _oracle(x, y, yv):
    return np.asarray(
        G.point2point_h2o(jnp.asarray(x), jnp.asarray(y), y_valid=jnp.asarray(yv), backend="xla")
    )


def test_forward_matches_oracle():
    x, y, yv = scene()
    ref = _oracle(x, y, yv)
    got = np.asarray(
        CC.point2point_h2o_cluster(jnp.asarray(x), jnp.asarray(y), jnp.asarray(yv), interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_forward_yT_layout_matches():
    x, y, yv = scene(seed=3)
    ref = _oracle(x, y, yv)
    yT = jnp.swapaxes(jnp.asarray(y), 1, 2)
    got = np.asarray(
        CC.point2point_h2o_cluster(jnp.asarray(x), yT=yT, y_valid=jnp.asarray(yv), interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_forward_unaligned_sizes():
    # P1 % 128 != 0 and P2 % 128 != 0 exercise both pad paths
    x, y, yv = scene(F=3, P1=131, P2=300, seed=5)
    ref = _oracle(x, y, yv)
    got = np.asarray(
        CC.point2point_h2o_cluster(jnp.asarray(x), jnp.asarray(y), jnp.asarray(yv), interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_forward_spatially_sorted_cells():
    """Spatially sorted y (the collate path) must give identical results —
    sorting only tightens the cells."""
    x, y, yv = scene(F=2, P1=150, P2=1024, seed=7)
    yv = np.ones_like(yv)  # keep the permutation simple
    perm = spatial_sort_indices(y[0])
    ys = y[:, perm]
    ref = _oracle(x, ys, yv)
    got = np.asarray(
        CC.point2point_h2o_cluster(jnp.asarray(x), jnp.asarray(ys), jnp.asarray(yv), interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_all_invalid_frame_is_big():
    x, y, yv = scene(F=2, P1=130, P2=256, seed=9)
    yv[1] = False  # whole frame invalid
    got = np.asarray(
        CC.point2point_h2o_cluster(jnp.asarray(x), jnp.asarray(y), jnp.asarray(yv), interpret=True)
    )
    ref = _oracle(x, y, np.maximum(yv, [[False]]))  # oracle on same masks
    np.testing.assert_allclose(got[0], ref[0], atol=2e-5)
    assert np.all(got[1] > 1e6)  # no valid target: distances blow up, not NaN
    assert np.all(np.isfinite(got[0]))


def test_gradients_match_oracle():
    x, y, yv = scene(F=2, P1=140, P2=500, seed=11)
    xj, yj, yvj = jnp.asarray(x), jnp.asarray(y), jnp.asarray(yv)
    yT = jnp.swapaxes(yj, 1, 2)

    def loss_new(x_, yT_):
        return jnp.sum(CC.point2point_h2o_cluster(x_, yT=yT_, y_valid=yvj, interpret=True) ** 2)

    def loss_ref(x_, y_):
        return jnp.sum(G.point2point_h2o(x_, y_, y_valid=yvj, backend="xla") ** 2)

    gx_n, gyT_n = jax.grad(loss_new, argnums=(0, 1))(xj, yT)
    gx_r, gy_r = jax.grad(loss_ref, argnums=(0, 1))(xj, yj)
    np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(gyT_n, 1, 2)), np.asarray(gy_r), atol=1e-5
    )


def _grasp_scene(F=2, P1=256, P2=2048, seed=13):
    """Realistic-geometry scene: spatially sorted object surface cloud with a
    COMPACT x blob near one side (a hand grasps, it doesn't envelop). The
    sigma=0.012 blob spans ~4 cm against an ~18 cm object — real-hand
    proportions; tile compactness is what makes top-K pruning effective
    (measured: needed cells/tile 5-6 of 16 here vs 9-13 at sigma=0.03)."""
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(P2, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    obj = (v * 0.08 * (1 + 0.2 * rng.random((P2, 1)))).astype(np.float32)
    obj = obj[spatial_sort_indices(obj)]
    y = obj[None].repeat(F, 0) + rng.normal(scale=0.02, size=(F, 1, 3)).astype(np.float32)
    anchor = y[:, :1] * 1.1  # just outside the surface
    x = (anchor + rng.normal(scale=0.012, size=(F, P1, 3))).astype(np.float32)
    yv = np.ones((F, P2), bool)
    return x, y, yv


def test_small_k_exact_when_certificate_clear():
    """With a deliberately small k_cells on a benign grasp scene, the result
    is exact IFF the overflow certificate is clear — the certificate is the
    exactness contract (module docstring point 3)."""
    x, y, yv = _grasp_scene()
    ovf = np.asarray(
        CC.h2o_cluster_overflow(jnp.asarray(x), jnp.asarray(y), jnp.asarray(yv), k_cells=8)
    )
    assert ovf.sum() == 0, "grasp scene should not overflow at k_cells=8"
    ref = _oracle(x, y, yv)
    got = np.asarray(
        CC.point2point_h2o_cluster(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(yv), k_cells=8, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_overflow_certificate_fires_on_adversarial_scene():
    """x scattered across the WHOLE object at k_cells=2 must trip the
    certificate (nearly every cell qualifies for some vert)."""
    x, y, yv = scene(F=2, P1=256, P2=2048, seed=13, spread=0.1)
    ovf = np.asarray(
        CC.h2o_cluster_overflow(jnp.asarray(x), jnp.asarray(y), jnp.asarray(yv), k_cells=2)
    )
    assert ovf.sum() > 0


def test_static_template_perm_matches_morton():
    """The static x_perm path (production: MANO template sort) must agree
    with the Morton fallback and the oracle, forward and backward."""
    x, y, yv = _grasp_scene(seed=31)
    perm = CC.template_perm(x[0])  # template := frame-0 pose
    ref = _oracle(x, y, yv)
    got = np.asarray(
        CC.point2point_h2o_cluster(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(yv), x_perm=perm, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)

    yT = jnp.swapaxes(jnp.asarray(y), 1, 2)
    yvj = jnp.asarray(yv)

    def loss_new(x_, yT_):
        return jnp.sum(
            CC.point2point_h2o_cluster(
                x_, yT=yT_, y_valid=yvj, x_perm=perm, interpret=True
            ) ** 2
        )

    def loss_ref(x_, y_):
        return jnp.sum(G.point2point_h2o(x_, y_, y_valid=yvj, backend="xla") ** 2)

    gx_n, gyT_n = jax.grad(loss_new, argnums=(0, 1))(jnp.asarray(x), yT)
    gx_r, gy_r = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(gyT_n, 1, 2)), np.asarray(gy_r), atol=1e-5
    )


def test_signed_static_perm_and_certificate():
    x, y, yv = _grasp_scene(seed=33)
    n = _normals(x, 33)
    perm = CC.template_perm(x[0])
    ovf_h, ovf_o = (
        np.asarray(a)
        for a in CC.signed_cluster_overflow(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(yv), x_perm=perm
        )
    )
    assert ovf_h.sum() == 0 and ovf_o.sum() == 0
    r_y2x, r_x2y, r_idx = (np.asarray(a) for a in _oracle_signed(x, y, n, yv))
    g_y2x, g_x2y, g_idx = (
        np.asarray(a)
        for a in CC.point2point_signed_cluster(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(n), jnp.asarray(yv),
            x_perm=perm, interpret=True,
        )
    )
    np.testing.assert_allclose(g_x2y, r_x2y, atol=2e-5)
    np.testing.assert_allclose(g_y2x, r_y2x, atol=2e-5)
    # o2h argmin indices must come back in ORIGINAL vert order
    d = np.linalg.norm(x[:, :, None] - y[:, None], axis=-1).transpose(0, 2, 1)
    np.testing.assert_allclose(
        np.take_along_axis(d, g_idx[..., None], axis=2)[..., 0],
        np.take_along_axis(d, r_idx[..., None], axis=2)[..., 0],
        atol=2e-5,
    )


def test_geometry_route_cluster_backend():
    """core.geometry.point2point_h2o backend='cluster' routes here."""
    x, y, yv = scene(F=2, P1=130, P2=300, seed=17)
    ref = _oracle(x, y, yv)
    got = np.asarray(
        G.point2point_h2o(
            jnp.asarray(x), jnp.asarray(y), y_valid=jnp.asarray(yv),
            backend="cluster", interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


# ---------------------------------------------------------------------------
# Signed variant (G's extra loss path)
# ---------------------------------------------------------------------------


def _oracle_signed(x, y, n, yv):
    return G.point2point_signed(
        jnp.asarray(x), jnp.asarray(y), x_normals=jnp.asarray(n),
        y_valid=jnp.asarray(yv), backend="xla",
    )


def _normals(x, seed=0):
    rng = np.random.default_rng(seed + 100)
    n = rng.normal(size=x.shape).astype(np.float32)
    return n / np.linalg.norm(n, axis=-1, keepdims=True)


def test_signed_forward_matches_oracle():
    x, y, yv = scene(F=2, P1=200, P2=700, seed=21)
    n = _normals(x, 21)
    r_y2x, r_x2y, r_idx = (np.asarray(a) for a in _oracle_signed(x, y, n, yv))
    g_y2x, g_x2y, g_idx = (
        np.asarray(a)
        for a in CC.point2point_signed_cluster(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(n), jnp.asarray(yv),
            interpret=True,
        )
    )
    np.testing.assert_allclose(g_x2y, r_x2y, atol=2e-5)
    np.testing.assert_allclose(g_y2x, r_y2x, atol=2e-5)
    # index parity on valid points (ties may differ; require distance match)
    d_at_ref = np.take_along_axis(
        np.linalg.norm(x[:, :, None] - y[:, None], axis=-1).transpose(0, 2, 1),
        r_idx[..., None], axis=2,
    )[..., 0]
    d_at_got = np.take_along_axis(
        np.linalg.norm(x[:, :, None] - y[:, None], axis=-1).transpose(0, 2, 1),
        g_idx[..., None], axis=2,
    )[..., 0]
    np.testing.assert_allclose(d_at_got[yv], d_at_ref[yv], atol=2e-5)


def test_signed_forward_yT_and_unaligned():
    x, y, yv = scene(F=3, P1=131, P2=300, seed=23)
    n = _normals(x, 23)
    r_y2x, r_x2y, _ = (np.asarray(a) for a in _oracle_signed(x, y, n, yv))
    yT = jnp.swapaxes(jnp.asarray(y), 1, 2)
    g_y2x, g_x2y, _ = (
        np.asarray(a)
        for a in CC.point2point_signed_cluster(
            jnp.asarray(x), x_normals=jnp.asarray(n), y_valid=jnp.asarray(yv),
            yT=yT, interpret=True,
        )
    )
    np.testing.assert_allclose(g_x2y, r_x2y, atol=2e-5)
    np.testing.assert_allclose(g_y2x, r_y2x, atol=2e-5)


def test_signed_gradients_match_oracle():
    x, y, yv = scene(F=2, P1=140, P2=500, seed=25)
    n = _normals(x, 25)
    xj, yj, nj, yvj = (jnp.asarray(a) for a in (x, y, n, yv))
    yT = jnp.swapaxes(yj, 1, 2)

    def loss_new(x_, yT_):
        y2x, x2y, _ = CC.point2point_signed_cluster(
            x_, x_normals=nj, y_valid=yvj, yT=yT_, interpret=True
        )
        return jnp.sum(y2x**2) + jnp.sum(jnp.abs(x2y))

    def loss_ref(x_, y_):
        y2x, x2y, _ = G.point2point_signed(
            x_, y_, x_normals=nj, y_valid=yvj, backend="xla"
        )
        return jnp.sum(y2x**2) + jnp.sum(jnp.abs(x2y))

    gx_n, gyT_n = jax.grad(loss_new, argnums=(0, 1))(xj, yT)
    gx_r, gy_r = jax.grad(loss_ref, argnums=(0, 1))(xj, yj)
    # |x2y| divides the cotangent by the distance: near-contact points amplify
    # the kernels' ~1e-6 distance delta into ~5e-5 gradient noise
    np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(gyT_n, 1, 2)), np.asarray(gy_r), atol=2e-4
    )


def test_signed_geometry_route():
    x, y, yv = scene(F=2, P1=130, P2=300, seed=27)
    n = _normals(x, 27)
    r_y2x, r_x2y, _ = (np.asarray(a) for a in _oracle_signed(x, y, n, yv))
    g_y2x, g_x2y, _ = (
        np.asarray(a)
        for a in G.point2point_signed(
            jnp.asarray(x), jnp.asarray(y), x_normals=jnp.asarray(n),
            y_valid=jnp.asarray(yv), backend="cluster", interpret=True,
        )
    )
    np.testing.assert_allclose(g_x2y, r_x2y, atol=2e-5)
    np.testing.assert_allclose(g_y2x, r_y2x, atol=2e-5)


def test_grad_y_false_matches_gx_and_zeros_gy():
    """grad_y=False (the loss call sites' mode: the object clouds are batch-
    derived, models/refine_r.py:179-195) must leave gx bit-identical to the
    grad_y=True kernel and return exactly zero for gy."""
    x, y, yv = scene(F=2, P1=140, P2=500, seed=17)
    xj, yvj = jnp.asarray(x), jnp.asarray(yv)
    yT = jnp.swapaxes(jnp.asarray(y), 1, 2)

    def loss(x_, yT_, gy):
        return jnp.sum(
            CC.point2point_h2o_cluster(
                x_, yT=yT_, y_valid=yvj, interpret=True, grad_y=gy
            ) ** 2
        )

    gx_t, gy_t = jax.grad(lambda a, b: loss(a, b, True), argnums=(0, 1))(xj, yT)
    gx_f, gy_f = jax.grad(lambda a, b: loss(a, b, False), argnums=(0, 1))(xj, yT)
    np.testing.assert_array_equal(np.asarray(gx_f), np.asarray(gx_t))
    assert np.any(np.asarray(gy_t) != 0.0)
    np.testing.assert_array_equal(np.asarray(gy_f), np.zeros_like(gy_f))


def test_signed_grad_y_false_matches_gx_and_zeros_gy():
    x, y, yv = scene(F=2, P1=150, P2=400, seed=19)
    rng = np.random.default_rng(21)
    n = rng.normal(size=x.shape).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    xj, nj, yvj = jnp.asarray(x), jnp.asarray(n), jnp.asarray(yv)
    yT = jnp.swapaxes(jnp.asarray(y), 1, 2)

    def loss(x_, yT_, gy):
        o2h, h2o, _ = CC.point2point_signed_cluster(
            x_, x_normals=nj, y_valid=yvj, yT=yT_, interpret=True, grad_y=gy
        )
        return jnp.sum(o2h**2) + jnp.sum(h2o**2)

    gx_t, gy_t = jax.grad(lambda a, b: loss(a, b, True), argnums=(0, 1))(xj, yT)
    gx_f, gy_f = jax.grad(lambda a, b: loss(a, b, False), argnums=(0, 1))(xj, yT)
    np.testing.assert_array_equal(np.asarray(gx_f), np.asarray(gx_t))
    assert np.any(np.asarray(gy_t) != 0.0)
    np.testing.assert_array_equal(np.asarray(gy_f), np.zeros_like(gy_f))


# ---------------------------------------------------------------------------
# Adversarial tuning-surface suite (round-4): the kernel's exactness contract
# is "exact IFF the certificate is clear, and NEVER an underestimate" — these
# scenes probe geometries OUTSIDE the tuned grasp regime and assert that
# contract (exact-or-flagged + soundness) on each.
#
# Round-4 measurement that motivated this suite: with a full-size hand
# (x spread ~15 cm, anatomical 128-vert tiles) the candidate budget
# k_cells=24 certifies ONLY up to ~24 cells (P2 <= ~3k); every realistic
# scene tested at P2 >= 4096 (bottle / object surface / tabletop) needed
# k ~= n_cells. The pruned kernel is therefore an OPT-IN for small clouds,
# not the live default (core/geometry.py routes "auto" to the exact kernels).
# ---------------------------------------------------------------------------


def _assert_exact_or_flagged(x, y, yv=None, k_cells=CC.K_CELLS_DEFAULT):
    """The contract: certificate clear -> bit-level match with the oracle;
    flagged or not, the pruned min (over a candidate SUBSET) must never
    UNDERestimate the true distance. Returns the overflow count."""
    if yv is None:
        yv = np.ones(y.shape[:2], bool)
    ovf = int(
        np.asarray(
            CC.h2o_cluster_overflow(
                jnp.asarray(x), jnp.asarray(y), jnp.asarray(yv), k_cells=k_cells
            )
        ).sum()
    )
    got = np.asarray(
        CC.point2point_h2o_cluster(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(yv),
            k_cells=k_cells, interpret=True,
        )
    )
    ref = _oracle(x, y, yv)
    if ovf == 0:
        np.testing.assert_allclose(got, ref, atol=2e-5)
    assert np.all(got >= ref - 2e-5), "pruned NN must never underestimate"
    return ovf


def test_adversarial_two_far_objects_hand_midflight():
    """Two object blobs 60 cm apart with the hand mid-flight between them:
    candidate cells split across both blobs at near-equal margins."""
    rng = np.random.default_rng(41)
    P2 = 4096
    blob_a = rng.normal(size=(P2 // 2, 3)) * 0.04 + [-0.3, 0, 0]
    blob_b = rng.normal(size=(P2 // 2, 3)) * 0.04 + [0.3, 0, 0]
    y = np.concatenate([blob_a, blob_b]).astype(np.float32)
    y = y[spatial_sort_indices(y)][None].repeat(2, 0)
    x = (rng.normal(size=(2, 300, 3)) * 0.05).astype(np.float32)  # hand-size
    _assert_exact_or_flagged(x, y)


def test_adversarial_degenerate_one_point_cloud():
    """All object points within 1 mm: every cell is at the same place, so
    EVERY cell qualifies — flagged above the budget, yet the result is
    trivially exact (any cell contains the same geometry); soundness holds."""
    rng = np.random.default_rng(43)
    P2 = 4096  # 32 cells > k_cells=24
    y = (rng.normal(size=(2, P2, 3)) * 5e-4 + [0.2, 0.0, 0.1]).astype(np.float32)
    x = (rng.normal(size=(2, 300, 3)) * 0.05).astype(np.float32)
    ovf = _assert_exact_or_flagged(x, y)
    assert ovf > 0  # 32 identical cells cannot be pruned certifiably


def test_adversarial_shell_around_hand_flags():
    """Object shell centered ON the hand: all cells equidistant from every
    x tile — the worst case for margin pruning. Must flag at C > k_cells
    and certify (exact) at C <= k_cells."""
    rng = np.random.default_rng(45)
    x = (rng.normal(size=(2, 300, 3)) * 0.05).astype(np.float32)
    for P2, expect_flag in ((4096, True), (2048, False)):
        d = rng.normal(size=(P2, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        y = (d * 2.0).astype(np.float32)
        y = y[spatial_sort_indices(y)][None].repeat(2, 0)
        ovf = _assert_exact_or_flagged(x, y)
        assert (ovf > 0) == expect_flag, (P2, ovf)


def test_adversarial_full_hand_scale_x_at_4096():
    """A full-size hand (15 cm x spread — anatomical tiles are ~2-4 cm, vs
    the tuned blob's 4 cm TOTAL spread) against a realistic object surface
    at P2=4096: measured to exceed the tuned budget — must be flagged, and
    must stay sound."""
    rng = np.random.default_rng(47)
    P2 = 4096
    v = rng.normal(size=(P2, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    obj = (v * 0.08 * (1 + 0.2 * rng.random((P2, 1)))).astype(np.float32)
    obj = obj[spatial_sort_indices(obj)]
    y = obj[None].repeat(2, 0)
    x = (rng.normal(size=(2, 778, 3)) * 0.05 + [0.0, 0.0, 0.1]).astype(np.float32)
    ovf = _assert_exact_or_flagged(x, y)
    assert ovf > 0, "full-hand x at 32 cells should exceed the tuned budget"


def test_adversarial_padded_object_slots_multi_object_route():
    """max_nobj=4 with 3 padded slots through the multi-object route: padded
    slots (R=0 -> x'=0, zero clouds) must neither poison the distances nor
    count toward the certificate."""
    from oakink2_tamf_tpu.models.refine_r import (
        multi_object_h2o_dist, multi_object_h2o_overflow,
    )

    rng = np.random.default_rng(49)
    bs, L, nobj, P = 1, 2, 4, 2048
    hv = (rng.normal(size=(bs, L, 778, 3)) * 0.05).astype(np.float32)
    hn = np.zeros_like(hv)
    traj = np.zeros((bs, nobj, L, 9), np.float32)
    traj[:, 0, :, 3:] = [1, 0, 0, 0, 1, 0]  # identity rot for the real slot
    pts = np.zeros((bs, nobj, P, 3), np.float32)
    pts[:, 0] = rng.normal(size=(bs, P, 3)).astype(np.float32) * 0.05
    om = np.zeros((bs, nobj), bool)
    om[:, 0] = True

    args = (jnp.asarray(traj), jnp.asarray(pts), jnp.asarray(om))
    got = np.asarray(
        multi_object_h2o_dist(
            jnp.asarray(hv), jnp.asarray(hn), *args, backend="cluster", interpret=True,
        )
    )
    ref = np.asarray(
        multi_object_h2o_dist(jnp.asarray(hv), jnp.asarray(hn), *args, backend="xla")
    )
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, ref, atol=2e-5)
    ovf = np.asarray(
        multi_object_h2o_overflow(jnp.asarray(hv), *args, backend="cluster")
    )
    assert int(ovf.sum()) == 0  # 16 cells <= budget; pad slots excluded
