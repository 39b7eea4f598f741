"""Golden test: core/mano LBS vs an independent straight-line numpy
implementation (explicit loops, no einsum sharing with the module under test).
Catches silent einsum/kintree/skinning mistakes the property tests can't."""

import numpy as np
import jax.numpy as jnp

from oakink2_tamf_tpu.core import mano as M
from oakink2_tamf_tpu.core import transforms as T


def numpy_mano_forward(model, pose_quat, betas):
    """Loop-based MANO LBS for ONE sample. Returns (verts, joints21) with
    center_idx=0 recentering, mirroring manotorch semantics."""
    v_template = np.asarray(model.v_template, np.float64)
    shapedirs = np.asarray(model.shapedirs, np.float64)
    posedirs = np.asarray(model.posedirs, np.float64)
    j_reg = np.asarray(model.j_regressor, np.float64)
    weights = np.asarray(model.skin_weights, np.float64)

    # rotations
    R = np.asarray(T.quat_to_rotmat(jnp.asarray(pose_quat)), np.float64)  # [16,3,3]

    # shape blend
    v_shaped = v_template + shapedirs @ betas.astype(np.float64)
    j_rest = j_reg @ v_shaped  # [16, 3]

    # pose blend
    feat = np.concatenate([(R[k] - np.eye(3)).reshape(-1) for k in range(1, 16)])
    v_posed = v_shaped + posedirs @ feat

    # FK
    G = [None] * 16
    G[0] = np.eye(4)
    G[0][:3, :3] = R[0]
    G[0][:3, 3] = j_rest[0]
    for k in range(1, 16):
        p = M.PARENTS[k]
        L = np.eye(4)
        L[:3, :3] = R[k]
        L[:3, 3] = j_rest[k] - j_rest[p]
        G[k] = G[p] @ L
    G = np.stack(G)
    posed_joints = G[:, :3, 3].copy()

    # remove rest offset
    Gc = G.copy()
    for k in range(16):
        Gc[k, :3, 3] = G[k, :3, 3] - G[k, :3, :3] @ j_rest[k]

    # skinning (per-vertex loop)
    verts = np.zeros((M.N_VERTS, 3))
    for v in range(M.N_VERTS):
        A = np.zeros((4, 4))
        for k in range(16):
            A += weights[v, k] * Gc[k]
        verts[v] = (A[:3, :3] @ v_posed[v]) + A[:3, 3]

    tips = verts[list(M.TIP_VERT_IDS)]
    joints = np.concatenate([posed_joints, tips], axis=0)[list(M.JOINT_REORDER)]

    center = joints[0].copy()
    return verts - center, joints - center


def test_mano_matches_independent_numpy():
    model = M.synthetic_mano_model("right")
    rng = np.random.default_rng(0)
    for trial in range(3):
        rv = rng.normal(scale=0.4, size=(16, 3)).astype(np.float32)
        quat = np.asarray(T.rotvec_to_quat(jnp.asarray(rv)))
        betas = rng.normal(size=(10,)).astype(np.float32)

        ref_v, ref_j = numpy_mano_forward(model, quat, betas)
        v, j = M.mano_forward(model, jnp.asarray(quat), jnp.asarray(betas))
        np.testing.assert_allclose(np.asarray(v), ref_v, atol=2e-5)
        np.testing.assert_allclose(np.asarray(j), ref_j, atol=2e-5)


def test_mano_left_hand_matches_numpy():
    model = M.synthetic_mano_model("left")
    rng = np.random.default_rng(1)
    rv = rng.normal(scale=0.3, size=(16, 3)).astype(np.float32)
    quat = np.asarray(T.rotvec_to_quat(jnp.asarray(rv)))
    betas = rng.normal(size=(10,)).astype(np.float32)
    ref_v, ref_j = numpy_mano_forward(model, quat, betas)
    v, j = M.mano_forward(model, jnp.asarray(quat), jnp.asarray(betas))
    np.testing.assert_allclose(np.asarray(v), ref_v, atol=2e-5)
    np.testing.assert_allclose(np.asarray(j), ref_j, atol=2e-5)


# ---------------------------------------------------------------------------
# Checked-in golden fixtures
# ---------------------------------------------------------------------------

import os

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
SYNTH_FIXTURE = os.path.join(FIXTURE_DIR, "mano_golden_synthetic.npz")
REAL_FIXTURE = os.path.join(FIXTURE_DIR, "mano_golden_real.npz")

import pytest


def test_mano_matches_checked_in_golden():
    """Golden fixture generated ONCE by tests/gen_mano_fixture.py — a
    manotorch-style torch implementation (SMPL homogeneous-matrix FK, rotation
    half running the reference's own dev_fn quat_to_rotmat). Committed outputs
    guard against all implementations drifting together."""
    data = np.load(SYNTH_FIXTURE)
    for side in ("right", "left"):
        model = M.synthetic_mano_model(side)
        q = jnp.asarray(data[f"{side}_pose_quat"])
        b = jnp.asarray(data[f"{side}_betas"])
        v, j = M.mano_forward(model, q, b)
        np.testing.assert_allclose(np.asarray(v), data[f"{side}_verts"], atol=3e-5)
        np.testing.assert_allclose(np.asarray(j), data[f"{side}_joints"], atol=3e-5)


@pytest.mark.skipif(
    not (os.path.isfile(REAL_FIXTURE) and os.environ.get("TAMF_MANO_PATH")),
    reason="real manotorch golden fixture / MANO assets not installed "
    "(generate with scripts/dump_mano_golden.py where manotorch is available)",
)
def test_mano_matches_real_manotorch_golden():
    """Golden parity vs the REAL manotorch ManoLayer on the REAL MANO assets:
    runs when scripts/dump_mano_golden.py has produced the fixture (needs
    manotorch + licensed MANO pkls, neither shippable here) and
    $TAMF_MANO_PATH points at the assets."""
    data = np.load(REAL_FIXTURE)
    root = os.environ["TAMF_MANO_PATH"]
    for side in ("right", "left"):
        key = f"{side}_pose_quat"
        if key not in data:
            continue
        model = M.load_mano_model(root, side)
        q = jnp.asarray(data[f"{side}_pose_quat"])
        b = jnp.asarray(data[f"{side}_betas"])
        v, j = M.mano_forward(model, q, b)
        np.testing.assert_allclose(np.asarray(v), data[f"{side}_verts"], atol=1e-4)
        np.testing.assert_allclose(np.asarray(j), data[f"{side}_joints"], atol=1e-4)
