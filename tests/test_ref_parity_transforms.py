"""Convention cross-check vs the REFERENCE's own rotation/transform code.

The reference feeds manotorch with quats produced by dev_fn's
rotmat_to_quat (extra_loss.py:65-80: rot6d -> rotmat -> quat -> ManoLayer),
so dev_fn's conventions ARE the MANO input contract: (w,x,y,z) quats,
row-dropping rot6d, [tsl | first-two-rotmat-rows] tslrot6d. These tests import
the reference's torch implementations read-only from /root/reference/src and
compare our JAX transforms value-by-value — pinning the convention chain
against the real thing instead of our own round-trips.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SRC = os.environ.get("TAMF_REF_SRC", "/root/reference/src")
if REF_SRC not in sys.path:
    sys.path.insert(0, REF_SRC)

ref_rot = pytest.importorskip("dev_fn.transform.rotation")
ref_transf = pytest.importorskip("dev_fn.transform.transform")

import jax.numpy as jnp

from oakink2_tamf_tpu.core import transforms as T


@pytest.fixture()
def rotmats():
    rng = np.random.default_rng(0)
    rv = torch.from_numpy(rng.normal(scale=1.2, size=(64, 3)).astype(np.float32))
    return ref_rot.rotvec_to_rotmat(rv).numpy()


def test_quat_convention_matches_dev_fn(rotmats):
    """rotmat -> quat: same (w,x,y,z) values as reference rotmat_to_quat
    (rotation.py:167) up to the +/-q ambiguity resolved identically."""
    ref_q = ref_rot.rotmat_to_quat(torch.from_numpy(rotmats)).numpy()
    our_q = np.asarray(T.rotmat_to_quat(jnp.asarray(rotmats)))
    # sign-align (both pick max-|component| branches; align defensively)
    sign = np.sign(np.sum(ref_q * our_q, axis=-1, keepdims=True))
    np.testing.assert_allclose(our_q * sign, ref_q, atol=1e-5)


def test_quat_to_rotmat_matches_dev_fn(rotmats):
    ref_q = ref_rot.rotmat_to_quat(torch.from_numpy(rotmats))
    ref_m = ref_rot.quat_to_rotmat(ref_q).numpy()
    our_m = np.asarray(T.quat_to_rotmat(jnp.asarray(ref_q.numpy())))
    np.testing.assert_allclose(our_m, ref_m, atol=1e-5)


def test_rot6d_matches_dev_fn(rotmats):
    """rot6d codec: reference drops the last ROW (rotation.py:470-487) and
    reconstructs via Gram-Schmidt over rows (rotation.py:446-467)."""
    ref_6d = ref_rot.rotmat_to_rot6d(torch.from_numpy(rotmats)).numpy()
    our_6d = np.asarray(T.rotmat_to_rot6d(jnp.asarray(rotmats)))
    np.testing.assert_allclose(our_6d, ref_6d, atol=1e-6)

    noisy = ref_6d + np.random.default_rng(1).normal(scale=0.1, size=ref_6d.shape).astype(np.float32)
    ref_m = ref_rot.rot6d_to_rotmat(torch.from_numpy(noisy)).numpy()
    our_m = np.asarray(T.rot6d_to_rotmat(jnp.asarray(noisy)))
    np.testing.assert_allclose(our_m, ref_m, atol=1e-5)


def test_rotvec_matches_dev_fn():
    rng = np.random.default_rng(2)
    rv = rng.normal(scale=0.8, size=(32, 3)).astype(np.float32)
    ref_m = ref_rot.rotvec_to_rotmat(torch.from_numpy(rv)).numpy()
    our_m = np.asarray(T.quat_to_rotmat(T.rotvec_to_quat(jnp.asarray(rv))))
    np.testing.assert_allclose(our_m, ref_m, atol=1e-5)


def test_tslrot6d_matches_dev_fn(rotmats):
    """obj_traj codec (dataset/interaction_segment.py:408): 4x4 <-> [tsl|rot6d]
    per reference transf_to_tslrot6d/tslrot6d_to_transf (transform.py:138-155)."""
    rng = np.random.default_rng(3)
    n = rotmats.shape[0]
    tr = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    tr[:, :3, :3] = rotmats
    tr[:, :3, 3] = rng.normal(size=(n, 3)).astype(np.float32)

    ref_9 = ref_transf.transf_to_tslrot6d(torch.from_numpy(tr)).numpy()
    our_9 = np.asarray(T.transf_to_tslrot6d(jnp.asarray(tr)))
    np.testing.assert_allclose(our_9, ref_9, atol=1e-6)

    ref_back = ref_transf.tslrot6d_to_transf(torch.from_numpy(ref_9)).numpy()
    our_back = np.asarray(T.tslrot6d_to_transf(jnp.asarray(ref_9)))
    np.testing.assert_allclose(our_back, ref_back, atol=1e-5)


def test_transf_point_array_matches_dev_fn(rotmats):
    rng = np.random.default_rng(4)
    tr = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    tr[:, :3, :3] = rotmats[:8]
    tr[:, :3, 3] = rng.normal(size=(8, 3)).astype(np.float32)
    pts = rng.normal(size=(8, 50, 3)).astype(np.float32)

    ref_out = ref_transf.transf_point_array(torch.from_numpy(tr), torch.from_numpy(pts)).numpy()
    our_out = np.asarray(T.transf_point_array(jnp.asarray(tr), jnp.asarray(pts)))
    np.testing.assert_allclose(our_out, ref_out, atol=1e-5)


def test_pose_repr_decode_matches_dev_fn():
    """The full pose_repr decode used before MANO (extra_loss.py:65-80):
    [tsl(3) | 16 x rot6d(6)] -> (tsl, quat[16,4])."""
    rng = np.random.default_rng(5)
    rv = torch.from_numpy(rng.normal(scale=1.0, size=(16, 3)).astype(np.float32))
    rotm = ref_rot.rotvec_to_rotmat(rv)
    pr = np.concatenate(
        [rng.normal(size=(3,)).astype(np.float32),
         ref_rot.rotmat_to_rot6d(rotm).numpy().reshape(-1)]
    )

    # reference decode: rot6d -> rotmat -> quat
    ref_quat = ref_rot.rotmat_to_quat(
        ref_rot.rot6d_to_rotmat(torch.from_numpy(pr[3:].reshape(16, 6)))
    ).numpy()
    tsl, quat = T.pose_repr_to_quat(jnp.asarray(pr))
    np.testing.assert_allclose(np.asarray(tsl), pr[:3], atol=1e-7)
    sign = np.sign(np.sum(ref_quat * np.asarray(quat), axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(quat) * sign, ref_quat, atol=1e-5)
