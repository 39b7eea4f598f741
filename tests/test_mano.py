"""Structural & kinematic tests for the JAX MANO layer (core/mano.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from oakink2_tamf_tpu.core import mano as M
from oakink2_tamf_tpu.core import transforms as T


def identity_quat(shape=()):
    q = np.zeros(shape + (M.N_KIN_JOINTS, 4), dtype=np.float32)
    q[..., 0] = 1.0
    return jnp.asarray(q)


def test_shapes_and_determinism():
    model = M.synthetic_mano_model("right")
    model2 = M.synthetic_mano_model("right")
    np.testing.assert_array_equal(np.asarray(model.v_template), np.asarray(model2.v_template))

    q = identity_quat((5,))
    b = jnp.zeros((5, 10))
    verts, joints = M.mano_forward(model, q, b)
    assert verts.shape == (5, M.N_VERTS, 3)
    assert joints.shape == (5, M.N_JOINTS, 3)
    assert np.all(np.isfinite(np.asarray(verts)))


def test_rest_pose_matches_template():
    """Identity pose, zero betas -> verts == template (recentered on wrist)."""
    model = M.synthetic_mano_model("right")
    q = identity_quat((1,))
    b = jnp.zeros((1, 10))
    verts, joints = M.mano_forward(model, q, b, center_idx=None)
    np.testing.assert_allclose(np.asarray(verts[0]), np.asarray(model.v_template), atol=1e-5)
    # wrist joint = regressed rest joint 0
    j0 = np.asarray(model.j_regressor @ model.v_template)[0]
    np.testing.assert_allclose(np.asarray(joints[0, 0]), j0, atol=1e-5)


def test_center_idx_zero():
    model = M.synthetic_mano_model("right")
    q = identity_quat((3,))
    b = jnp.zeros((3, 10))
    _, joints = M.mano_forward(model, q, b, center_idx=0)
    np.testing.assert_allclose(np.asarray(joints[:, 0]), np.zeros((3, 3)), atol=1e-6)


def test_global_rotation_equivariance():
    """Rotating the root rotates all (centered) outputs rigidly."""
    model = M.synthetic_mano_model("right")
    rng = np.random.default_rng(1)
    v = rng.normal(size=(3,)).astype(np.float32)
    q_root = T.rotvec_to_quat(jnp.asarray(v))
    R = np.asarray(T.quat_to_rotmat(q_root))

    q_id = identity_quat((1,))
    q_rot = np.asarray(q_id).copy()
    q_rot[0, 0] = np.asarray(q_root)
    b = jnp.zeros((1, 10))

    v_id, j_id = M.mano_forward(model, q_id, b, center_idx=0)
    v_rot, j_rot = M.mano_forward(model, jnp.asarray(q_rot), b, center_idx=0)

    np.testing.assert_allclose(np.asarray(v_rot[0]), np.asarray(v_id[0]) @ R.T, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_rot[0]), np.asarray(j_id[0]) @ R.T, atol=1e-4)


def test_betas_move_verts():
    model = M.synthetic_mano_model("right")
    q = identity_quat((1,))
    v0, _ = M.mano_forward(model, q, jnp.zeros((1, 10)))
    v1, _ = M.mano_forward(model, q, jnp.ones((1, 10)))
    assert float(jnp.abs(v1 - v0).max()) > 1e-5


def test_articulation_moves_chain_only_weakly_elsewhere():
    """Rotating a finger joint moves that finger's segment far more than the wrist area."""
    model = M.synthetic_mano_model("right")
    q = np.asarray(identity_quat((1,))).copy()
    # joint 2 (index mid): 90 deg about z
    q[0, 2] = np.asarray(T.rotvec_to_quat(jnp.asarray(np.array([0, 0, np.pi / 2], np.float32))))
    b = jnp.zeros((1, 10))
    v_id, j_id = M.mano_forward(model, identity_quat((1,)), b)
    v_rot, j_rot = M.mano_forward(model, jnp.asarray(q), b)
    # child joint (kin joint 3) must move
    moved = np.linalg.norm(np.asarray(j_rot - j_id)[0], axis=-1)
    # reorder: kin joint 3 sits at output slot 7 (index chain), wrist slot 0
    assert moved[7] > 1e-3
    assert moved[0] < 1e-6


def test_batch_time_vmap_consistency():
    """mano_forward over [B,T] leading dims == loop over frames."""
    model = M.synthetic_mano_model("left")
    rng = np.random.default_rng(2)
    v = rng.normal(scale=0.3, size=(2, 4, M.N_KIN_JOINTS, 3)).astype(np.float32)
    q = np.asarray(T.rotvec_to_quat(jnp.asarray(v)))
    b = rng.normal(size=(2, 4, 10)).astype(np.float32)
    verts, joints = M.mano_forward(model, jnp.asarray(q), jnp.asarray(b))
    for i in range(2):
        for t in range(4):
            v1, j1 = M.mano_forward(model, jnp.asarray(q[i, t]), jnp.asarray(b[i, t]))
            np.testing.assert_allclose(np.asarray(verts[i, t]), np.asarray(v1), atol=2e-5)
            np.testing.assert_allclose(np.asarray(joints[i, t]), np.asarray(j1), atol=2e-5)


def test_recover_from_pose_repr():
    model = M.synthetic_mano_model("right")
    rng = np.random.default_rng(3)
    rv = rng.normal(scale=0.2, size=(6, M.N_KIN_JOINTS, 3)).astype(np.float32)
    quat = T.rotvec_to_quat(jnp.asarray(rv))
    rotmat = T.quat_to_rotmat(quat)
    tsl = jnp.asarray(rng.normal(size=(6, 3)).astype(np.float32))
    pr = T.pose_repr_encode(tsl, rotmat)
    shape = jnp.asarray(rng.normal(size=(6, 10)).astype(np.float32))

    verts, joints = M.recover_mano_from_pose_repr(model, pr, shape)
    v_direct, j_direct = M.mano_forward(model, quat, shape)
    np.testing.assert_allclose(
        np.asarray(verts), np.asarray(v_direct + tsl[:, None, :]), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(joints), np.asarray(j_direct + tsl[:, None, :]), atol=2e-5
    )


def test_closed_faces_watertight_increase():
    model = M.synthetic_mano_model("right")
    cf = M.closed_faces(model)
    assert cf.shape[0] >= np.asarray(model.faces).shape[0]


def test_jit_and_grad():
    model = M.synthetic_mano_model("right")

    def loss(pr):
        v, j = M.recover_mano_from_pose_repr(model, pr, jnp.zeros((2, 10)))
        return jnp.sum(v**2) + jnp.sum(j**2)

    rng = np.random.default_rng(4)
    pr = jnp.asarray(rng.normal(size=(2, 99)).astype(np.float32))
    g = jax.jit(jax.grad(loss))(pr)
    assert g.shape == (2, 99)
    assert np.all(np.isfinite(np.asarray(g)))


def test_explicit_missing_mano_path_raises(tmp_path):
    """An explicitly-given but unresolvable mano_path must NOT silently fall
    back to the synthetic hand (fail-loud contract, round-3 hardening)."""
    import pytest

    with pytest.raises(FileNotFoundError):
        M.get_mano_model(str(tmp_path / "nope"), "right")


def test_unset_mano_path_warns_once_and_returns_synthetic(caplog):
    import logging

    M._synthetic_warned = False
    with caplog.at_level(logging.WARNING, logger="oakink2_tamf_tpu.core.mano"):
        m1 = M.get_mano_model(None, "right")
        m2 = M.get_mano_model(None, "left")
    assert m1.v_template.shape == (M.N_VERTS, 3)
    assert m2.v_template.shape == (M.N_VERTS, 3)
    warns = [r for r in caplog.records if "SYNTHETIC" in r.message]
    assert len(warns) == 1  # one loud warning, not per-call spam
