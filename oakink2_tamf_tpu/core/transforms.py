"""Rotation & rigid-transform math as pure JAX functions.

A single implementation replaces the reference's three parallel variants
(dev_fn/transform/{rotation,rotation_np,rotation_jit}.py — torch/numpy/torchscript):
under `jax.jit` these run compiled on TPU; called eagerly on numpy inputs they run
on host. All conventions match the reference (which adapted pytorch3d):

- quaternions are (w, x, y, z), real part first
- rot6d is the first two ROWS of the rotation matrix, flattened
  (reference: dev_fn/transform/rotation.py:446-486)
- homogeneous transforms are 4x4 row-major with translation in the last column
  (reference: dev_fn/transform/transform.py:10-54, 138-155)
- tslrot6d = [tsl(3) | rot6d(6)]: the per-object trajectory format

Everything is shape-polymorphic over leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def _mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matmul at full float32 precision: geometric 3x3/3xN contractions must not
    silently drop to bf16 on the MXU (the contraction dim is tiny, so this is
    bandwidth-bound either way)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# rot6d <-> rotmat
# ---------------------------------------------------------------------------


def rot6d_to_rotmat(d6: jax.Array) -> jax.Array:
    """6D rotation (Zhou et al. 2019) -> rotation matrix, Gram-Schmidt on rows.

    Args:  d6 [..., 6]
    Returns: [..., 3, 3]
    """
    a1, a2 = d6[..., :3], d6[..., 3:6]
    b1 = _normalize(a1)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = _normalize(b2)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-2)


def rotmat_to_rot6d(matrix: jax.Array) -> jax.Array:
    """Rotation matrix -> 6D representation (first two rows flattened)."""
    batch_dim = matrix.shape[:-2]
    return matrix[..., :2, :].reshape(batch_dim + (6,))


# ---------------------------------------------------------------------------
# quaternion <-> rotmat  (w, x, y, z convention)
# ---------------------------------------------------------------------------


def quat_to_rotmat(quaternions: jax.Array) -> jax.Array:
    """Unit quaternion (w,x,y,z) -> rotation matrix. [..., 4] -> [..., 3, 3]."""
    q = _normalize(quaternions)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0
    o = jnp.stack(
        (
            1 - two_s * (y * y + z * z),
            two_s * (x * y - z * w),
            two_s * (x * z + y * w),
            two_s * (x * y + z * w),
            1 - two_s * (x * x + z * z),
            two_s * (y * z - x * w),
            two_s * (x * z - y * w),
            two_s * (y * z + x * w),
            1 - two_s * (x * x + y * y),
        ),
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x: jax.Array) -> jax.Array:
    """sqrt(max(0, x)) with a subgradient of 0 at x=0 (pytorch3d-style)."""
    positive = x > 0
    safe_x = jnp.where(positive, x, 1.0)
    return jnp.where(positive, jnp.sqrt(safe_x), 0.0)


def rotmat_to_quat(matrix: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (w,x,y,z). [..., 3, 3] -> [..., 4].

    Branch-free port of the numerically-stable pytorch3d algorithm the reference
    uses (dev_fn/transform/rotation.py:167): build four candidate quaternions
    (one per largest component) and select by the largest denominator.
    """
    batch_dim = matrix.shape[:-2]
    m = matrix.reshape(batch_dim + (9,))
    m00, m01, m02 = m[..., 0], m[..., 1], m[..., 2]
    m10, m11, m12 = m[..., 3], m[..., 4], m[..., 5]
    m20, m21, m22 = m[..., 6], m[..., 7], m[..., 8]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            (
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ),
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        (
            jnp.stack((q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01), axis=-1),
            jnp.stack((m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20), axis=-1),
            jnp.stack((m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21), axis=-1),
            jnp.stack((m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2), axis=-1),
        ),
        axis=-2,
    )  # [..., 4, 4]

    flr = jnp.asarray(0.1, dtype=matrix.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    out = jnp.take_along_axis(
        quat_candidates, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    return _normalize(out)


def quat_invert(quat: jax.Array) -> jax.Array:
    """Conjugate of a unit quaternion."""
    return quat * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=quat.dtype)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of quaternions (w,x,y,z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        (
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ),
        axis=-1,
    )


# ---------------------------------------------------------------------------
# axis-angle (rotvec)
# ---------------------------------------------------------------------------


def rotvec_to_quat(rotvec: jax.Array) -> jax.Array:
    """Axis-angle vector -> quaternion (w,x,y,z). Safe at angle ~ 0."""
    angle = jnp.linalg.norm(rotvec, axis=-1, keepdims=True)
    half = angle * 0.5
    small = angle < 1e-6
    # sin(x/2)/x -> 0.5 - x^2/48 as x -> 0
    sin_half_over_angle = jnp.where(
        small, 0.5 - (angle * angle) / 48.0, jnp.sin(half) / jnp.maximum(angle, 1e-12)
    )
    return jnp.concatenate((jnp.cos(half), rotvec * sin_half_over_angle), axis=-1)


def quat_to_rotvec(quat: jax.Array) -> jax.Array:
    """Quaternion (w,x,y,z) -> axis-angle vector."""
    q = _normalize(quat)
    # force w >= 0 for a unique representation
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    xyz = q[..., 1:]
    norm_xyz = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm_xyz, w)
    small = norm_xyz < 1e-6
    scale = jnp.where(small, 2.0, angle / jnp.maximum(norm_xyz, 1e-12))
    return xyz * scale


def rotvec_to_rotmat(rotvec: jax.Array) -> jax.Array:
    return quat_to_rotmat(rotvec_to_quat(rotvec))


def rotmat_to_rotvec(matrix: jax.Array) -> jax.Array:
    return quat_to_rotvec(rotmat_to_quat(matrix))


# ---------------------------------------------------------------------------
# euler angles (XYZ intrinsic, matching pytorch3d euler_angles_to_matrix)
# ---------------------------------------------------------------------------


def _axis_rotmat(axis: str, angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        flat = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        flat = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(f"invalid axis {axis}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_to_rotmat(euler: jax.Array, convention: str = "XYZ") -> jax.Array:
    """Euler angles [..., 3] -> rotation matrix (intrinsic, per-axis compose)."""
    mats = [_axis_rotmat(c, euler[..., i]) for i, c in enumerate(convention)]
    return _mm(_mm(mats[0], mats[1]), mats[2])


# ---------------------------------------------------------------------------
# rigid transforms (4x4 homogeneous)
# ---------------------------------------------------------------------------


def assemble_T(tsl: jax.Array, rotmat: jax.Array) -> jax.Array:
    """tsl [..., 3] + rotmat [..., 3, 3] -> transf [..., 4, 4]."""
    leading = tsl.shape[:-1]
    top = jnp.concatenate((rotmat, tsl[..., :, None]), axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=tsl.dtype), leading + (1, 4)
    )
    return jnp.concatenate((top, bottom), axis=-2)


def inv_transf(transf: jax.Array) -> jax.Array:
    """Invert a rigid transform [..., 4, 4]."""
    R_inv = jnp.swapaxes(transf[..., :3, :3], -1, -2)
    t_inv = -_mm(R_inv, transf[..., :3, 3:])
    return assemble_T(t_inv[..., 0], R_inv)


def transf_point_array(transf: jax.Array, point: jax.Array) -> jax.Array:
    """Apply transf [..., 4, 4] to points [..., N, 3] -> [..., N, 3].

    Implemented as point @ R^T + t so the contraction hits the MXU directly.
    """
    R = transf[..., :3, :3]
    t = transf[..., :3, 3]
    return _mm(point, jnp.swapaxes(R, -1, -2)) + t[..., None, :]


def rotate_point_array(rotmat: jax.Array, point: jax.Array) -> jax.Array:
    """Apply rotmat [..., 3, 3] to points [..., N, 3]."""
    return _mm(point, jnp.swapaxes(rotmat, -1, -2))


def transf_to_tslrot6d(transf: jax.Array) -> jax.Array:
    """[..., 4, 4] -> [..., 9] = [tsl | rot6d]."""
    tsl = transf[..., :3, 3]
    rot6d = rotmat_to_rot6d(transf[..., :3, :3])
    return jnp.concatenate((tsl, rot6d), axis=-1)


def tslrot6d_to_transf(tslrot6d: jax.Array) -> jax.Array:
    """[..., 9] -> [..., 4, 4]."""
    tsl = tslrot6d[..., 0:3]
    rotmat = rot6d_to_rotmat(tslrot6d[..., 3:9])
    return assemble_T(tsl, rotmat)


def project_point_array(cam_intr: jax.Array, point: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Pinhole projection: cam_intr [..., 3, 3], point [..., N, 3] -> [..., N, 2]."""
    hom = _mm(point, jnp.swapaxes(cam_intr, -1, -2))
    return hom[..., :2] / jnp.maximum(hom[..., 2:3], eps)


# ---------------------------------------------------------------------------
# pose_repr codec: the universal data format
# pose_repr [..., seqlen, 99] = [tsl(3) | 16 joints x rot6d(6)]
# (reference: dataset/interaction_segment.py:400-404)
# ---------------------------------------------------------------------------

N_JOINT_ROT = 16
POSE_REPR_DIM = 3 + N_JOINT_ROT * 6  # 99


def pose_repr_encode(tsl: jax.Array, joint_rotmat: jax.Array) -> jax.Array:
    """tsl [..., 3] + joint rotmats [..., 16, 3, 3] -> pose_repr [..., 99]."""
    rot6d = rotmat_to_rot6d(joint_rotmat).reshape(tsl.shape[:-1] + (N_JOINT_ROT * 6,))
    return jnp.concatenate((tsl, rot6d), axis=-1)


def pose_repr_decode(pose_repr: jax.Array) -> tuple[jax.Array, jax.Array]:
    """pose_repr [..., 99] -> (tsl [..., 3], joint rotmats [..., 16, 3, 3])."""
    tsl = pose_repr[..., 0:3]
    rot6d = pose_repr[..., 3:POSE_REPR_DIM].reshape(pose_repr.shape[:-1] + (N_JOINT_ROT, 6))
    return tsl, rot6d_to_rotmat(rot6d)


def pose_repr_to_quat(pose_repr: jax.Array) -> tuple[jax.Array, jax.Array]:
    """pose_repr [..., 99] -> (tsl [..., 3], joint quats [..., 16, 4]).

    The decode path every loss/metric uses (reference:
    model/interaction_segment_extra_loss.py:65-80).
    """
    tsl, rotmat = pose_repr_decode(pose_repr)
    return tsl, rotmat_to_quat(rotmat)


def renormalize_pose_repr_rot6d(pose_repr: jax.Array) -> jax.Array:
    """Re-normalize the two 3-vectors of each joint's rot6d block (used by the
    Gaussian-perturb sample adaptor; reference: dataset/pose_repr_sample.py:77-86)."""
    lead = pose_repr.shape[:-1]
    tsl = pose_repr[..., 0:3]
    d6 = pose_repr[..., 3:POSE_REPR_DIM].reshape(lead + (N_JOINT_ROT, 6))
    a = d6[..., 0:3] / jnp.maximum(jnp.linalg.norm(d6[..., 0:3], axis=-1, keepdims=True), 1e-7)
    b = d6[..., 3:6] / jnp.maximum(jnp.linalg.norm(d6[..., 3:6], axis=-1, keepdims=True), 1e-7)
    d6 = jnp.concatenate((a, b), axis=-1).reshape(lead + (N_JOINT_ROT * 6,))
    return jnp.concatenate((tsl, d6), axis=-1)
