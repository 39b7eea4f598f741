"""MANO hand layer as a pure JAX function (TPU-native replacement for the
reference's manotorch ManoLayer; usage contract at reference
model/interaction_segment_extra_loss.py:22-37 and script/compute_score/compute_score_cr.py:189-208).

Contract replicated:
- ``rot_mode="quat"``: pose input is per-joint unit quaternions [..., 16, 4]
  (root + 15 articulations), (w, x, y, z).
- ``use_pca=False, flat_hand_mean=True``: quats are absolute local rotations,
  no PCA basis and no mean-pose offset.
- ``center_idx=0``: verts/joints are recentered on the wrist joint.
- Output: 778 verts and 21 joints in manotorch order
  [wrist, thumb(1..3,tip), index(1..3,tip), middle(1..3,tip), ring(1..3,tip),
  pinky(1..3,tip)], tips taken from vertices (745, 317, 444, 556, 673).

Instead of a stateful torch Module holding buffers, the model is a pytree of
arrays (`ManoModel`) plus a pure `mano_forward`; `jax.vmap` over (batch, time)
replaces the reference's per-batch-item python loops
(extra_loss.py:95, segment_refine_model.py:113).

Real MANO assets (MANO_RIGHT.pkl / MANO_LEFT.pkl, MPI license) are loaded with
a chumpy-free unpickler when available; `synthetic_mano_model` provides a
deterministic structurally-identical stand-in so tests/benchmarks never require
the licensed download.
"""

from __future__ import annotations

import io
import logging
import os
import pickle
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import transforms as T

N_VERTS = 778
N_KIN_JOINTS = 16
N_JOINTS = 21
N_SHAPE = 10
N_POSEDIRS = 135  # 15 articulated joints x 9 rotmat entries

# MANO kinematic tree (index finger 1-3, middle 4-6, pinky 7-9, ring 10-12,
# thumb 13-15; wrist root).
PARENTS = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)

# Fingertip vertex ids appended as joints 16..20 (thumb, index, middle, ring,
# pinky), then reordered to the 21-joint convention above.
TIP_VERT_IDS = (745, 317, 444, 556, 673)
JOINT_REORDER = (0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20)


class ManoModel(NamedTuple):
    """MANO template data as a pytree of HOST numpy arrays.

    Host residency is deliberate: these are compile-time constants of every
    jitted consumer, and numpy leaves lower to MLIR constants directly, while
    device arrays would be fetched back D2H during lowering (measured: minutes
    through a remote TPU tunnel)."""

    v_template: np.ndarray  # [778, 3]
    shapedirs: np.ndarray  # [778, 3, 10]
    posedirs: np.ndarray  # [778, 3, 135]
    j_regressor: np.ndarray  # [16, 778]
    skin_weights: np.ndarray  # [778, 16]
    faces: np.ndarray  # [F, 3] int32


# ---------------------------------------------------------------------------
# Asset loading
# ---------------------------------------------------------------------------


class _Stub:
    """Absorbs chumpy objects during unpickling; keeps their ndarray payload."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})


class _ChumpyFreeUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _Stub
        return super().find_class(module, name)


def _to_np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    if isinstance(x, _Stub):
        for key in ("x", "_x", "a", "v"):
            if key in x.__dict__ and isinstance(x.__dict__[key], np.ndarray):
                return x.__dict__[key]
        for v in x.__dict__.values():
            if isinstance(v, np.ndarray):
                return v
        raise ValueError("chumpy stub without ndarray payload")
    if hasattr(x, "toarray"):  # scipy sparse
        return x.toarray()
    return np.asarray(x)


def _find_mano_pkl(mano_assets_root: str, side: str) -> str:
    fname = f"MANO_{side.upper()}.pkl"
    candidates = [
        os.path.join(mano_assets_root, fname),
        os.path.join(mano_assets_root, "assets", "mano", fname),
        os.path.join(mano_assets_root, "mano", fname),
        os.path.join(mano_assets_root, "models", fname),
    ]
    for c in candidates:
        if os.path.isfile(c):
            return c
    raise FileNotFoundError(f"MANO asset {fname} not found under {mano_assets_root}")


def load_mano_model(mano_assets_root: str, side: str = "right") -> ManoModel:
    """Load a MANO pickle (python-2 era, chumpy-laden) into a ManoModel."""
    path = _find_mano_pkl(mano_assets_root, side)
    # integrity gate: presence alone would let a corrupted download train
    # (asset/SHA256SUMS pin, recorded by scripts/fetch_assets.sh --pin)
    from ..utils.integrity import verify_pinned

    verify_pinned(path, what="MANO asset")
    with open(path, "rb") as f:
        data = _ChumpyFreeUnpickler(io.BytesIO(f.read()), encoding="latin1").load()
    # The kinematic tree is baked into mano_forward's static FK unroll
    # (PARENTS). Verify the asset agrees instead of silently diverging.
    if "kintree_table" in data:
        kt = np.asarray(_to_np(data["kintree_table"]))
        parents = kt[0].astype(np.int64)
        parents[0] = -1  # root is stored as uint32 max
        if tuple(int(p) for p in parents) != PARENTS:
            raise ValueError(
                f"MANO asset {path} kintree {tuple(parents)} != expected {PARENTS}; "
                "core/mano.PARENTS must match the asset's kintree_table"
            )
    # NOTE: leaves stay HOST numpy arrays. Jitted consumers embed them as
    # MLIR constants directly from host memory; device-resident leaves would
    # force a D2H fetch per array at lowering time (minutes over a TPU tunnel).
    return ManoModel(
        v_template=np.asarray(_to_np(data["v_template"]), np.float32),
        shapedirs=np.asarray(_to_np(data["shapedirs"])[..., :N_SHAPE], np.float32),
        posedirs=np.asarray(_to_np(data["posedirs"]), np.float32),
        j_regressor=np.asarray(_to_np(data["J_regressor"]), np.float32),
        skin_weights=np.asarray(_to_np(data["weights"]), np.float32),
        faces=_to_np(data["f"]).astype(np.int32),
    )


def synthetic_mano_model(side: str = "right", seed: int = 0) -> ManoModel:
    """Deterministic structurally-faithful stand-in for the licensed MANO assets.

    Geometry is a smooth procedural blob with a valid 16-joint kintree, a
    row-stochastic joint regressor, smooth skinning weights and a closed-ish
    triangulation; adequate for numerics/shape tests and for benchmarking the
    compute path. NOT anatomically meaningful.
    """
    rng = np.random.default_rng(seed + (1 if side == "right" else 2))

    # joints laid out as a hand skeleton: wrist at origin, fingers fanning +x
    rest_joints = np.zeros((N_KIN_JOINTS, 3), dtype=np.float64)
    finger_base = {1: 0.25, 4: 0.10, 7: -0.25, 10: -0.05, 13: 0.45}  # y fan
    for chain_root, y in finger_base.items():
        for i in range(3):
            j = chain_root + i
            rest_joints[j] = (0.03 + 0.025 * (i + 1), y * 0.05, 0.0)
    rest_joints += rng.normal(scale=1e-3, size=rest_joints.shape)

    # verts: gaussian cloud around the segment midpoints
    seg_centers = []
    for j in range(N_KIN_JOINTS):
        p = PARENTS[j]
        base = rest_joints[j] if p < 0 else 0.5 * (rest_joints[j] + rest_joints[p])
        seg_centers.append(base)
    seg_centers = np.stack(seg_centers)
    assign = rng.integers(0, N_KIN_JOINTS, size=(N_VERTS,))
    v_template = seg_centers[assign] + rng.normal(scale=0.012, size=(N_VERTS, 3))

    # skinning: soft assignment by distance to joints
    d2 = ((v_template[:, None, :] - rest_joints[None, :, :]) ** 2).sum(-1)
    w = np.exp(-d2 / (2 * 0.015**2))
    skin_weights = w / w.sum(axis=1, keepdims=True)

    # j_regressor: soft-weights over nearest verts, rows sum to 1, and
    # reproduces rest_joints from v_template closely enough for FK sanity
    jr = np.exp(-d2.T / (2 * 0.008**2))
    jr = jr / jr.sum(axis=1, keepdims=True)

    shapedirs = rng.normal(scale=1e-3, size=(N_VERTS, 3, N_SHAPE))
    posedirs = rng.normal(scale=1e-4, size=(N_VERTS, 3, N_POSEDIRS))

    # triangulation: convex-hull-free synthetic faces — random but fixed
    faces = rng.integers(0, N_VERTS, size=(1538, 3)).astype(np.int32)
    # avoid degenerate faces
    faces[:, 1] = (faces[:, 0] + 1 + faces[:, 1] % (N_VERTS - 1)) % N_VERTS
    faces[:, 2] = (faces[:, 0] + 1 + faces[:, 2] % (N_VERTS - 2)) % N_VERTS

    if side == "left":
        v_template = v_template * np.array([1.0, -1.0, 1.0])
        faces = faces[:, ::-1].copy()

    # host-resident leaves (see load_mano_model note)
    return ManoModel(
        v_template=np.asarray(v_template, np.float32),
        shapedirs=np.asarray(shapedirs, np.float32),
        posedirs=np.asarray(posedirs, np.float32),
        j_regressor=np.asarray(jr, np.float32),
        skin_weights=np.asarray(skin_weights, np.float32),
        faces=np.asarray(faces, np.int32),
    )


_synthetic_warned = False


def get_mano_model(mano_assets_root: str | None, side: str = "right") -> ManoModel:
    """Load real MANO assets, or the synthetic stand-in when NO path was given.

    Fail-loud contract (mirrors models/clip_text.FrozenClipText's refusal to
    pair pretrained weights with a fallback tokenizer): an EXPLICIT
    `--mano.mano_path` that doesn't resolve raises instead of silently
    substituting the procedural blob hand — a typo'd path must not train G/R
    or compute CR/SIV/FID against a fake hand (reference contract:
    interaction_segment_extra_loss.py:22-37 hard-requires the assets).
    With no path at all, the synthetic hand is returned with ONE loud warning.
    """
    if mano_assets_root:
        return load_mano_model(mano_assets_root, side)  # missing -> raises
    global _synthetic_warned
    if not _synthetic_warned:
        _synthetic_warned = True
        logging.getLogger(__name__).warning(
            "mano.mano_path unset: using the SYNTHETIC procedural hand. "
            "Geometric losses and CR/SIV/FID metrics are NOT meaningful; "
            "point --mano.mano_path at the real MANO pickles for any real run."
        )
    return synthetic_mano_model(side)


# ---------------------------------------------------------------------------
# Forward kinematics + LBS
# ---------------------------------------------------------------------------


def _ein(*args):
    return jnp.einsum(*args, precision=jax.lax.Precision.HIGHEST)


def mano_forward(
    model: ManoModel,
    pose_quat: jax.Array,
    betas: jax.Array,
    center_idx: int | None = 0,
) -> tuple[jax.Array, jax.Array]:
    """MANO LBS. pose_quat [..., 16, 4], betas [..., 10] ->
    (verts [..., 778, 3], joints [..., 21, 3]).

    Batch-polymorphic over any leading dims; everything is expressed as batched
    einsums so XLA maps the heavy contractions onto the MXU.
    """
    lead = pose_quat.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    q = pose_quat.reshape((B, N_KIN_JOINTS, 4))
    b = jnp.broadcast_to(betas, lead + (N_SHAPE,)).reshape((B, N_SHAPE)) if lead else betas.reshape((1, N_SHAPE))

    rot = T.quat_to_rotmat(q)  # [B, 16, 3, 3]

    # shape blend
    v_shaped = model.v_template[None] + _ein("vcs,bs->bvc", model.shapedirs, b)
    j_rest = _ein("jv,bvc->bjc", model.j_regressor, v_shaped)  # [B, 16, 3]

    # pose blend (articulated joints only)
    eye = jnp.eye(3, dtype=rot.dtype)
    pose_feat = (rot[:, 1:] - eye).reshape((B, N_POSEDIRS))
    v_posed = v_shaped + _ein("vcp,bp->bvc", model.posedirs, pose_feat)

    # forward kinematics (static 16-joint tree, unrolled)
    glob = [None] * N_KIN_JOINTS
    glob[0] = T.assemble_T(j_rest[:, 0], rot[:, 0])
    for k in range(1, N_KIN_JOINTS):
        p = PARENTS[k]
        local = T.assemble_T(j_rest[:, k] - j_rest[:, p], rot[:, k])
        glob[k] = jnp.matmul(glob[p], local, precision=jax.lax.Precision.HIGHEST)
    G = jnp.stack(glob, axis=1)  # [B, 16, 4, 4]

    posed_joints = G[..., :3, 3]  # [B, 16, 3]

    # remove rest-pose joint offset: t' = t - R_global @ j_rest
    t_corr = G[..., :3, 3] - _ein("bkij,bkj->bki", G[..., :3, :3], j_rest)

    # linear blend skinning
    R_blend = _ein("vk,bkij->bvij", model.skin_weights, G[..., :3, :3])
    t_blend = _ein("vk,bki->bvi", model.skin_weights, t_corr)
    verts = _ein("bvij,bvj->bvi", R_blend, v_posed) + t_blend

    # 21-joint output: kinematic joints + fingertips, manotorch order
    tips = verts[:, jnp.asarray(TIP_VERT_IDS)]
    joints = jnp.concatenate((posed_joints, tips), axis=1)
    joints = joints[:, jnp.asarray(JOINT_REORDER)]

    if center_idx is not None:
        center = joints[:, center_idx : center_idx + 1]
        verts = verts - center
        joints = joints - center

    verts = verts.reshape(lead + (N_VERTS, 3))
    joints = joints.reshape(lead + (N_JOINTS, 3))
    return verts, joints


def recover_mano_from_pose_repr(
    model: ManoModel, pose_repr: jax.Array, shape: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """pose_repr [..., 99] + betas [..., 10] -> world-frame (verts, joints).

    The decode path of every loss/metric (reference extra_loss.py:65-80):
    rot6d -> rotmat -> quat -> MANO LBS, then add the global translation.
    """
    tsl, quat = T.pose_repr_to_quat(pose_repr)
    verts, joints = mano_forward(model, quat, shape, center_idx=0)
    return verts + tsl[..., None, :], joints + tsl[..., None, :]


# ---------------------------------------------------------------------------
# Mesh utilities
# ---------------------------------------------------------------------------

_TEMPLATE_PERM_CACHE: dict[bytes, np.ndarray] = {}


def hand_template_perm(model: ManoModel) -> np.ndarray:
    """Static 778-vert tiling permutation for the cluster-pruned chamfer
    kernels (ops/chamfer_cluster.template_perm): a spatial sort of the REST
    template keeps each contiguous 128-vert tile anatomically — hence, in
    every articulated pose, spatially — compact, replacing the kernels'
    per-frame Morton argsort (a measured 35 ms/call at 640 frames).

    Accepts a single model or a 2-stacked lh/rh model (uses the first side:
    the mirror image of a compact tile is compact). Memoized on the template
    bytes; `v_template` is host numpy (see ManoModel), so this is callable at
    trace time inside jitted consumers."""
    v = np.asarray(model.v_template)
    if v.ndim == 3:  # stacked rh/lh (models/refine_r.stack_mano_models)
        v = v[0]
    key = v.tobytes()
    perm = _TEMPLATE_PERM_CACHE.get(key)
    if perm is None:
        from ..ops.chamfer_cluster import template_perm

        perm = template_perm(v)
        _TEMPLATE_PERM_CACHE[key] = perm
    return perm


def closed_faces(model: ManoModel) -> np.ndarray:
    """Faces plus a fan sealing the wrist boundary loop -> watertight mesh
    (functional equivalent of manotorch get_mano_closed_faces, used by the SIV
    metric; reference compute_score_cr.py:198).

    Host-side numpy: finds boundary edges (edges on exactly one face), chains
    them into loops, and fans each loop from its first vertex.
    """
    faces = np.asarray(model.faces)
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0)
    key = np.sort(edges, axis=1)
    _, inv, counts = np.unique(key, axis=0, return_inverse=True, return_counts=True)
    boundary = edges[counts[inv] == 1]
    if len(boundary) == 0:
        return faces

    succ = {int(a): int(b) for a, b in boundary}
    new_faces = []
    visited: set[int] = set()
    for start in list(succ.keys()):
        if start in visited:
            continue
        loop = [start]
        visited.add(start)
        cur = succ.get(start)
        while cur is not None and cur != start and cur not in visited:
            loop.append(cur)
            visited.add(cur)
            cur = succ.get(cur)
        if len(loop) >= 3:
            for i in range(1, len(loop) - 1):
                # reversed winding so the seal faces outward-consistent
                new_faces.append((loop[0], loop[i + 1], loop[i]))
    if not new_faces:
        return faces
    return np.concatenate([faces, np.asarray(new_faces, dtype=faces.dtype)], axis=0)
