"""Property/round-trip tests for core.transforms, mirroring the formulas of
reference dev_fn/transform/{rotation,transform}.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oakink2_tamf_tpu.core import transforms as T


def random_rotmat(rng, shape=()):
    """Uniform-ish random rotations via QR of Gaussians."""
    a = rng.normal(size=shape + (3, 3))
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[..., None, :]
    det = np.linalg.det(q)
    q[..., :, 0] *= det[..., None]
    return q.astype(np.float32)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_rot6d_roundtrip(rng):
    R = random_rotmat(rng, (64,))
    d6 = T.rotmat_to_rot6d(jnp.asarray(R))
    R2 = T.rot6d_to_rotmat(d6)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_rot6d_gram_schmidt_on_noisy_input(rng):
    d6 = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32))
    R = T.rot6d_to_rotmat(d6)
    eye = np.eye(3, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(R @ jnp.swapaxes(R, -1, -2)), np.broadcast_to(eye, (32, 3, 3)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), np.ones(32), atol=1e-5)


def test_quat_roundtrip(rng):
    R = random_rotmat(rng, (128,))
    q = T.rotmat_to_quat(jnp.asarray(R))
    R2 = T.quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
    # unit norm
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(q, axis=-1)), np.ones(128), atol=1e-6)


def test_quat_roundtrip_near_identity():
    R = np.eye(3, dtype=np.float32)[None].repeat(4, 0)
    q = T.rotmat_to_quat(jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(q), np.array([[1.0, 0, 0, 0]] * 4), atol=1e-6)


def test_quat_roundtrip_180deg():
    # worst case for naive trace-based algorithms
    R = np.diag([1.0, -1.0, -1.0]).astype(np.float32)[None]
    q = T.rotmat_to_quat(jnp.asarray(R))
    R2 = T.quat_to_rotmat(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_quat_multiply_invert(rng):
    R1 = random_rotmat(rng, (16,))
    R2 = random_rotmat(rng, (16,))
    q1, q2 = T.rotmat_to_quat(jnp.asarray(R1)), T.rotmat_to_quat(jnp.asarray(R2))
    q12 = T.quat_multiply(q1, q2)
    np.testing.assert_allclose(np.asarray(T.quat_to_rotmat(q12)), R1 @ R2, atol=1e-5)
    qid = T.quat_multiply(q1, T.quat_invert(q1))
    np.testing.assert_allclose(np.abs(np.asarray(qid[..., 0])), np.ones(16), atol=1e-5)


def test_rotvec_roundtrip(rng):
    # the roundtrip is identity only on the canonical branch |v| < pi —
    # rescale draws into it (a shared-stream draw landing above pi is a
    # legitimate 2*pi wrap, not a bug; this bit an xdist-reordered run)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    mag = np.linalg.norm(v, axis=-1, keepdims=True)
    v = v * (0.9 * np.pi * np.tanh(mag / np.pi) / np.maximum(mag, 1e-9))
    q = T.rotvec_to_quat(jnp.asarray(v))
    v2 = T.quat_to_rotvec(q)
    np.testing.assert_allclose(np.asarray(v2), v, atol=1e-4)


def test_rotvec_small_angle():
    v = jnp.asarray(np.array([[1e-9, 0, 0], [0, 0, 0]], dtype=np.float32))
    q = T.rotvec_to_quat(v)
    assert np.all(np.isfinite(np.asarray(q)))
    R = T.rotvec_to_rotmat(v)
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)


def test_transf_roundtrip(rng):
    R = random_rotmat(rng, (8,))
    t = rng.normal(size=(8, 3)).astype(np.float32)
    X = T.assemble_T(jnp.asarray(t), jnp.asarray(R))
    assert X.shape == (8, 4, 4)
    Xinv = T.inv_transf(X)
    np.testing.assert_allclose(
        np.asarray(X @ Xinv), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5
    )


def test_transf_point_array(rng):
    R = random_rotmat(rng, (4,))
    t = rng.normal(size=(4, 3)).astype(np.float32)
    p = rng.normal(size=(4, 100, 3)).astype(np.float32)
    X = T.assemble_T(jnp.asarray(t), jnp.asarray(R))
    out = T.transf_point_array(X, jnp.asarray(p))
    ref = np.einsum("bij,bnj->bni", R, p) + t[:, None, :]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_tslrot6d_roundtrip(rng):
    R = random_rotmat(rng, (6, 7))
    t = rng.normal(size=(6, 7, 3)).astype(np.float32)
    X = T.assemble_T(jnp.asarray(t), jnp.asarray(R))
    v = T.transf_to_tslrot6d(X)
    assert v.shape == (6, 7, 9)
    X2 = T.tslrot6d_to_transf(v)
    np.testing.assert_allclose(np.asarray(X2), np.asarray(X), atol=1e-5)


def test_pose_repr_roundtrip(rng):
    R = random_rotmat(rng, (10, T.N_JOINT_ROT))
    t = rng.normal(size=(10, 3)).astype(np.float32)
    pr = T.pose_repr_encode(jnp.asarray(t), jnp.asarray(R))
    assert pr.shape == (10, 99)
    t2, R2 = T.pose_repr_decode(pr)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-6)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
    _, q = T.pose_repr_to_quat(pr)
    np.testing.assert_allclose(np.asarray(T.quat_to_rotmat(q)), R, atol=1e-5)


def test_renormalize_pose_repr(rng):
    pr = jnp.asarray(rng.normal(size=(5, 99)).astype(np.float32))
    out = T.renormalize_pose_repr_rot6d(pr)
    d6 = np.asarray(out)[..., 3:].reshape(5, 16, 6)
    np.testing.assert_allclose(np.linalg.norm(d6[..., 0:3], axis=-1), np.ones((5, 16)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(d6[..., 3:6], axis=-1), np.ones((5, 16)), atol=1e-5)
    # tsl untouched
    np.testing.assert_allclose(np.asarray(out)[..., :3], np.asarray(pr)[..., :3])


def test_euler_to_rotmat():
    # 90deg about Z
    e = jnp.asarray(np.array([[0.0, 0.0, np.pi / 2]], dtype=np.float32))
    R = T.euler_to_rotmat(e, "XYZ")
    expect = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(R[0]), expect, atol=1e-6)


def test_jit_compatible():
    f = jax.jit(lambda x: T.tslrot6d_to_transf(T.transf_to_tslrot6d(x)))
    x = jnp.eye(4)[None]
    np.testing.assert_allclose(np.asarray(f(x)), np.eye(4)[None], atol=1e-6)
