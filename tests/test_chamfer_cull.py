"""Bounds-culled exact h2o kernel (ops/chamfer_cull.py) vs the all-pairs
oracle — the cull is exact BY CONSTRUCTION (triangle-inequality skip, see the
module doc), so these tests demand bit-identical VALUES on every geometry,
including the adversarial ones that broke the retired cluster kernel."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oakink2_tamf_tpu.ops import chamfer_cull as CU
from oakink2_tamf_tpu.ops import chamfer_pallas as CP


def _oracle(x, y, y_valid=None, y_group=1):
    """XLA all-pairs reference (independent of both Pallas kernels)."""
    F, P1, _ = x.shape
    G, P2, _ = y.shape
    yf = jnp.repeat(y, y_group, axis=0) if y_group > 1 else y
    d2 = jnp.sum((x[:, :, None, :] - yf[:, None, :, :]) ** 2, axis=-1)
    if y_valid is not None:
        vf = jnp.repeat(y_valid, y_group, axis=0) if y_group > 1 else y_valid
        d2 = jnp.where(vf[:, None, :], d2, np.inf)
    return jnp.sqrt(jnp.min(d2, axis=-1))


def _pallas_exact(x, y, y_valid=None, y_group=1, tile=512):
    d2, _ = CP._nn_h2o_forward(
        x, y,
        y_valid if y_valid is not None else jnp.ones(y.shape[:2], bool),
        tile, True, y_group,
    )
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def _cull(x, y, y_valid=None, y_group=1, tile=512):
    return CU.point2point_h2o_cull(
        x, y, y_valid=y_valid, y_group=y_group, tile=tile, interpret=True
    )


def _grasp_scene(rng, F=6, P1=778, P2=1024, y_group=1, length=0.12):
    """Hand-shaped cluster structure touching an object-sized surface — the
    regime where culling actually skips (and where the cluster kernel
    silently erred). The hand mimics the template-permuted layout the real
    call sites feed (core/mano.hand_template_perm): contiguous 128-row
    REGIONS are spatially compact (~1-2 cm), like anatomical leaf tiles."""
    G = F // y_group
    # object: a `length`-long cylinder-ish shell, spatially sorted along its
    # axis so contiguous cull tiles are compact chunks (data/collate.py does
    # the same sort for real clouds)
    t = np.sort(rng.uniform(0, length, size=(G, P2)))
    ang = rng.uniform(0, 2 * np.pi, size=(G, P2))
    y = np.stack(
        [t, 0.03 * np.cos(ang), 0.03 * np.sin(ang)], axis=-1
    ).astype(np.float32)
    # hand: 7 compact knuckle-ish clusters (sigma 8 mm) spread over a 10 cm
    # span near one end of the object
    n_reg = (P1 + 127) // 128
    centers = rng.uniform(-0.05, 0.05, size=(F, n_reg, 3)) + np.array(
        [0.02, 0.05, 0.0]
    )
    reg = np.minimum(np.arange(P1) // 128, n_reg - 1)
    x = (
        centers[:, reg, :] + rng.normal(size=(F, P1, 3)) * 0.008
    ).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_cull_matches_oracle_random():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 778, 3)).astype(np.float32) * 0.05)
    y = jnp.asarray(rng.normal(size=(4, 640, 3)).astype(np.float32) * 0.05)
    got = _cull(x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_oracle(x, y)), rtol=1e-5, atol=1e-6)
    # vs the all-pairs Pallas kernel: identical selection math -> bit-equal
    np.testing.assert_array_equal(np.asarray(got), np.asarray(_pallas_exact(x, y)))


def test_cull_grasp_scene_bitexact_and_actually_culls():
    rng = np.random.default_rng(1)
    x, y = _grasp_scene(rng, length=0.25)
    got = _cull(x, y, tile=128)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(_pallas_exact(x, y, tile=128))
    )
    # the far end of the object must be culled for some hand region
    mask = CU._cull_mask(x, y, jnp.ones(y.shape[:2], bool), 128, 1, 896)
    frac = float(jnp.mean(mask.astype(jnp.float32)))
    assert frac < 0.75, f"grasp scene culled nothing (run frac {frac})"


def test_cull_far_object_culls_most():
    """Hand 0.5+ m away from a long object: most tiles provably lose."""
    rng = np.random.default_rng(2)
    x, y = _grasp_scene(rng, length=0.5)
    x = x + jnp.asarray([1.0, 0.0, 0.0])
    got = _cull(x, y, tile=128)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(_pallas_exact(x, y, tile=128))
    )
    mask = CU._cull_mask(x, y, jnp.ones(y.shape[:2], bool), 128, 1, 896)
    frac = float(jnp.mean(mask.astype(jnp.float32)))
    assert frac < 0.6, f"far scene kept {frac:.0%} of blocks"


def test_cull_shared_y_group():
    rng = np.random.default_rng(3)
    x, y = _grasp_scene(rng, F=8, y_group=4)
    got = _cull(x, y, y_group=4)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(_pallas_exact(x, y, y_group=4))
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_oracle(x, y, y_group=4)), rtol=1e-5, atol=1e-6
    )


def test_cull_y_valid_ragged():
    rng = np.random.default_rng(4)
    x, y = _grasp_scene(rng, F=4, P2=896)  # padding forces a ragged tail tile
    yv = jnp.asarray(np.arange(896)[None, :] < np.array([[640], [896], [513], [1]]))
    got = _cull(x, y, y_valid=yv)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(_pallas_exact(x, y, y_valid=yv))
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_oracle(x, y, y_valid=yv)), rtol=1e-5, atol=1e-6
    )


def test_cull_degenerate_single_point_cloud():
    """All object points at one location (zero tile radius everywhere)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 778, 3)).astype(np.float32) * 0.05)
    y = jnp.broadcast_to(jnp.asarray([[0.01, 0.02, 0.03]]), (2, 640, 3)).astype(
        jnp.float32
    )
    got = _cull(x, y)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_oracle(x, y)), rtol=1e-5, atol=1e-6
    )


def test_cull_two_objects_hand_between():
    """The adversarial geometry from the cluster-kernel postmortem: two
    clusters far apart, hand mid-flight between them."""
    rng = np.random.default_rng(6)
    P2 = 1024
    a = rng.normal(size=(1, P2 // 2, 3)) * 0.02 + np.array([-0.3, 0, 0])
    b = rng.normal(size=(1, P2 // 2, 3)) * 0.02 + np.array([+0.3, 0, 0])
    y = jnp.asarray(np.concatenate([a, b], axis=1).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(1, 778, 3)).astype(np.float32) * 0.04)
    got = _cull(x, y)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(_pallas_exact(x, y)))


def _pallas_grad(x, y, ct, y_group=1, tile=512):
    """Gradient through the exact kernel's dvec path (the production
    comparator: same expansion math and same within/across-tile selection
    policy as the cull kernel, so near-tie verts pick the SAME neighbor —
    an XLA-oracle comparison flips a handful of equidistant selections and
    reports O(1) spurious diffs at those verts)."""
    def loss(xx):
        d = CP.point2point_h2o_pallas(
            xx, y, tile=tile, grad_y=False, y_group=y_group, interpret=True
        )
        return jnp.sum(d * ct)

    return jax.grad(loss)(x)


def test_cull_gradient_matches_exact_kernel():
    rng = np.random.default_rng(7)
    x, y = _grasp_scene(rng, F=4, P2=640)
    ct = jnp.asarray(rng.normal(size=(4, 778)).astype(np.float32))
    gc = jax.grad(lambda xx: jnp.sum(_cull(xx, y) * ct))(x)
    gp = _pallas_grad(x, y, ct)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gp), rtol=1e-4, atol=1e-6)


def test_cull_gradient_shared_y():
    rng = np.random.default_rng(8)
    x, y = _grasp_scene(rng, F=8, P2=640, y_group=4)
    ct = jnp.asarray(rng.normal(size=(8, 778)).astype(np.float32))
    gc = jax.grad(lambda xx: jnp.sum(_cull(xx, y, y_group=4) * ct))(x)
    gp = _pallas_grad(x, y, ct, y_group=4)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gp), rtol=1e-4, atol=1e-6)


def test_cull_small_p2_single_tile():
    """P2 smaller than the tile: the cull degenerates to the exact kernel."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(3, 778, 3)).astype(np.float32) * 0.05)
    y = jnp.asarray(rng.normal(size=(3, 200, 3)).astype(np.float32) * 0.05)
    got = _cull(x, y)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_oracle(x, y)), rtol=1e-5, atol=1e-6
    )


def test_cull_via_geometry_backend():
    """core/geometry.point2point_h2o(backend='cull') routes here, applies the
    template permutation, and returns unpermuted distances."""
    from oakink2_tamf_tpu.core import geometry as G

    rng = np.random.default_rng(10)
    x, y = _grasp_scene(rng, F=4, P2=640, y_group=2)
    perm = np.argsort(rng.normal(size=778))  # any permutation must be a no-op
    got = G.point2point_h2o(
        x, y, backend="cull", x_perm=perm, grad_y=False, y_group=2,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_oracle(x, y, y_group=2)), rtol=1e-5, atol=1e-6
    )


def test_cull_padded_object_slot_fully_culled():
    """An all-invalid cloud (a padded object slot) culls every tile; the
    union-min path masks its values off, matching the exact route."""
    rng = np.random.default_rng(11)
    x, y = _grasp_scene(rng, F=4, P2=640, y_group=2)
    yv = jnp.asarray(np.array([[True] * 640, [False] * 640]))
    mask = CU._cull_mask(x, y, yv, 512, 2, 896)
    assert int(jnp.sum(mask[2:])) == 0, "padded slot ran blocks"
    got = _cull(x, y, y_valid=yv, y_group=2)
    # valid group: exact values; invalid group: BIG (callers mask these)
    np.testing.assert_allclose(
        np.asarray(got[:2]),
        np.asarray(_oracle(x[:2], y[:1], y_group=2)),
        rtol=1e-5, atol=1e-6,
    )
    assert bool(jnp.all(got[2:] > 1e6))


def test_multi_object_padded_slot_matches_exact_route():
    """multi_object_h2o_dist with a padded slot: cull route == xla route."""
    from oakink2_tamf_tpu.models import refine_r as RR

    rng = np.random.default_rng(12)
    bs, L, nobj, P = 2, 3, 2, 640
    hand = rng.normal(size=(bs, L, 778, 3)).astype(np.float32) * 0.05
    normals = rng.normal(size=(bs, L, 778, 3)).astype(np.float32)
    tsl = rng.normal(scale=0.2, size=(bs, nobj, L, 3))
    r6 = np.tile(np.array([1.0, 0, 0, 0, 1.0, 0]), (bs, nobj, L, 1))
    traj = jnp.asarray(np.concatenate([tsl, r6], axis=-1).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(bs, nobj, P, 3)).astype(np.float32) * 0.1)
    omask = jnp.asarray(np.array([[True, False], [True, True]]))
    args = (jnp.asarray(hand), jnp.asarray(normals), traj, pts, omask)
    got = RR.multi_object_h2o_dist(*args, backend="cull", interpret=True)
    ref = RR.multi_object_h2o_dist(*args, backend="xla")
    # atol 1e-5: the kernel's ||x-y||^2 expansion vs the XLA route's direct
    # difference round differently at near-contact distances (~1e-3 m) —
    # same bound as the exact-kernel parity tests
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_multi_object_frame_mask_skips_and_loss_matches():
    """frame_mask culls mask-padded frames on the cull route; valid frames
    bit-match the unmasked run and masked frames come out large (the refine
    loss zeroes them — the reference pays nothing for padded frames at all,
    it runs segments at their true length)."""
    from oakink2_tamf_tpu.models import refine_r as RR

    rng = np.random.default_rng(13)
    bs, L, nobj, P = 2, 4, 2, 640
    hand = rng.normal(size=(bs, L, 778, 3)).astype(np.float32) * 0.05
    normals = rng.normal(size=(bs, L, 778, 3)).astype(np.float32)
    tsl = rng.normal(scale=0.2, size=(bs, nobj, L, 3))
    r6 = np.tile(np.array([1.0, 0, 0, 0, 1.0, 0]), (bs, nobj, L, 1))
    traj = jnp.asarray(np.concatenate([tsl, r6], axis=-1).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(bs, nobj, P, 3)).astype(np.float32) * 0.1)
    omask = jnp.ones((bs, nobj), bool)
    fmask = jnp.asarray(np.array([[1, 1, 0, 0], [1, 1, 1, 0]], np.float32))
    args = (jnp.asarray(hand), jnp.asarray(normals), traj, pts, omask)
    full = RR.multi_object_h2o_dist(*args, backend="cull", interpret=True)
    culled = RR.multi_object_h2o_dist(
        *args, backend="cull", interpret=True, frame_mask=fmask
    )
    valid = np.asarray(fmask) > 0
    np.testing.assert_array_equal(
        np.asarray(culled)[valid], np.asarray(full)[valid]
    )
    assert bool(jnp.all(culled[~valid] > 1e6))
