"""MF-MDM R: the deterministic refiner (reference model/segment_refine_model.py).

Takes G's sample (or a Gaussian-perturbed GT), conditions on a hand-to-object
signed-distance feature, and outputs a residual pose correction.

Split into two layers:
- `SegmentRefineNet` (flax): the pure network. Conditioning tokens
  [hand_side, shape, obj_embed] (no text/timestep; ref :174-186), a 3-stream
  input merge (pose + obj traj + h2o feature; ref :80-84, :207-208), trunk,
  residual output `x_in + head` (ref :216).
- `refine_forward` (function): the full reference forward including geometry —
  MANO recovery and signed h2o distances for sample/refined/target, all as
  vmapped static-shape JAX (replacing the per-batch-item python loops at
  ref :107-168) — returning the same result-dict keys.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core import geometry as G
from ..core import mano as M
from ..core import transforms as T
from .trunk import (
    HandShapeProcess,
    HandSideProcess,
    InputMerge,
    InputProcess,
    ObjectEmbedProcess,
    ObjectInputProcess,
    OutputProcess,
    PositionalEncoding,
    TransformerEncoder,
)


@dataclasses.dataclass(frozen=True)
class RefineConfig:
    input_dim: int = 99
    obj_input_dim: int = 9
    hand_shape_dim: int = 10
    obj_embed_dim: int = 768
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    n_hand_verts: int = 778
    remat: bool = False
    compute_dtype: str = "float32"


NUM_COND_TOKENS_R = 3


class SegmentRefineNet(nn.Module):
    cfg: RefineConfig

    @nn.compact
    def __call__(
        self,
        x_in: jax.Array,  # [bs, L, 99] sample pose_repr
        h2o_dist: jax.Array,  # [bs, L, 778] signed hand-to-object distances
        cond: dict[str, Any],
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg

        emb_handside = HandSideProcess(cfg.latent_dim, name="hand_side_process")(cond["hand_side"])
        emb_shape = HandShapeProcess(cfg.latent_dim, name="hand_shape_process")(cond["shape"])
        emb_obj = ObjectEmbedProcess(cfg.latent_dim, name="obj_embed_process")(
            cond["obj_embedding"], cond["obj_mask"]
        )
        emb = jnp.stack([emb_handside, emb_shape, emb_obj], axis=1)
        emb = jnp.nan_to_num(emb)

        hand_traj = InputProcess(cfg.latent_dim, name="input_process")(x_in)
        object_input = ObjectInputProcess(cfg.latent_dim, name="obj_input_process")(
            cond["obj_traj"], cond["obj_mask"]
        )
        h2o_input = InputProcess(cfg.latent_dim, name="h2o_dist_input_process")(h2o_dist)

        merged = InputMerge(cfg.latent_dim, name="input_merge")(hand_traj, object_input, h2o_input)
        merged = jnp.nan_to_num(merged)

        xseq = jnp.concatenate([emb, merged], axis=1)
        xseq = PositionalEncoding(cfg.latent_dim, cfg.dropout, name="sequence_pos_encoder")(
            xseq, deterministic=deterministic
        )
        out = TransformerEncoder(
            d_model=cfg.latent_dim,
            num_heads=cfg.num_heads,
            ff_size=cfg.ff_size,
            num_layers=cfg.num_layers,
            dropout=cfg.dropout,
            activation=cfg.activation,
            remat=cfg.remat,
            dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
            name="seqTransEncoder",
        )(xseq, deterministic=deterministic)
        out = out[:, NUM_COND_TOKENS_R:]
        out = OutputProcess(cfg.input_dim, name="output_process")(out)
        return jnp.nan_to_num(x_in + out)  # residual (ref :216)


# ---------------------------------------------------------------------------
# Geometry helpers (vmapped; replace ref per-item loops)
# ---------------------------------------------------------------------------


def stack_mano_models(rh: M.ManoModel, lh: M.ManoModel) -> M.ManoModel:
    """Stack both hand models on a leading side axis (0=rh, 1=lh) so the per-
    sample hand side becomes a gather instead of a python branch.

    Stays host-resident (np.stack): the stack is a compile-time constant of
    the jitted geometry; see core/mano.ManoModel."""
    import numpy as _np

    return jax.tree.map(lambda a, b: _np.stack([_np.asarray(a), _np.asarray(b)], axis=0), rh, lh)


def batch_recover_mano(
    mano_stack: M.ManoModel,
    pose_repr: jax.Array,  # [bs, L, 99]
    shape: jax.Array,  # [bs, L, 10]
    hand_side: jax.Array,  # [bs] int (0=rh, 1=lh)
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (verts [bs,L,778,3], joints [bs,L,21,3], normals [bs,L,778,3]).

    Parity with ref :107-140 (per-item loop + pytorch3d normals)."""

    def single(pr, sh, side):
        # leaves are host numpy constants; wrap before the traced gather
        model = jax.tree.map(lambda a: jnp.asarray(a)[side], mano_stack)
        return M.recover_mano_from_pose_repr(model, pr, sh)

    verts, joints = jax.vmap(single)(pose_repr, shape, hand_side)
    # normals OUTSIDE the vmap with STATIC per-side faces: inside it the
    # faces would be a traced gather, forcing vertex_normals onto its
    # scatter path (TPU-serialized — measured 83 ms of the 136 ms MANO
    # fwd+bwd at the G production batch); the static path runs dense
    # {0,+-1}-operator matmuls instead. Both sides are computed (~2 ms
    # each) and selected per sample.
    import numpy as np

    faces = np.asarray(mano_stack.faces)  # [2, F, 3] host constant
    n_by_side = [G.vertex_normals(verts, faces[s]) for s in range(2)]
    normals = jnp.where(
        (hand_side == 0)[:, None, None, None], n_by_side[0], n_by_side[1]
    )
    return verts, joints, normals


def _canonical_frame_operands(hand_verts, obj_traj, obj_points):
    """Shared kernel-operand prep for the canonical-frame h2o searches:
    moves the hand into each object's canonical frame (x' = R^T(v - t)) and
    flattens to the [bs*nobj*L, 778, 3] x / [bs*nobj, 3, P] yT layout the
    shared-Y kernels take. One definition so the routed distance pass and
    the overflow certificate can never diverge in precision or layout."""
    transf = T.tslrot6d_to_transf(obj_traj)  # [bs, nobj, L, 4, 4]
    R = transf[..., :3, :3]  # (world_c = sum_k R[c,k] y_k)
    t = transf[..., :3, 3]
    hi = jax.lax.Precision.HIGHEST  # near-contact distances are ~5e-3 m
    diff = hand_verts[:, None] - t[:, :, :, None, :]  # [bs, nobj, L, 778, 3]
    xc = jnp.einsum("bolck,bolvc->bolvk", R, diff, precision=hi)
    bs, nobj, L, nhv, _ = xc.shape
    P = obj_points.shape[2]
    flat_h = xc.reshape(bs * nobj * L, nhv, 3)
    flat_oT = jnp.swapaxes(obj_points, -1, -2).reshape(bs * nobj, 3, P)
    return flat_h, flat_oT


def multi_object_h2o_dist(
    hand_verts: jax.Array,  # [bs, L, 778, 3]
    hand_normals: jax.Array,  # [bs, L, 778, 3]
    obj_traj: jax.Array,  # [bs, nobj, L, 9] tslrot6d
    obj_points: jax.Array,  # [bs, nobj, P, 3] canonical point clouds
    obj_mask: jax.Array,  # [bs, nobj] bool
    chunk: int = 2048,
    x_perm=None,  # static 778-perm (core/mano.hand_template_perm) for the
    # cluster kernel's x tiling; None falls back to a per-frame Morton sort
    backend: str = "auto",  # "exact" forces the platform's exact route
    # (data/target_cache's overflow fallback; see multi_object_h2o_overflow)
    interpret: bool = False,  # Pallas interpret mode (CPU tests)
    frame_mask: jax.Array | None = None,  # [bs, L]: mask-padded frames cull
    # every tile on the cull route and come out BIG — callers must REPLACE
    # them. Loss-side callers zero them (segment_refine_loss); the
    # network-input path (sample_h2o) substitutes the reference-exact
    # degenerate closed form instead — see sample_geometry, which owns that
    # dedup. Do not read this function's padded-frame values directly.
) -> jax.Array:
    """Unsigned hand->object distances [bs, L, 778] (ref :142-168; the
    reference's point2point_signed signs only o2h, which this path discards —
    hand_normals is kept in the signature for reference parity but unused).

    The reference moves every object's canonical cloud to the world frame
    per frame and searches their union. Distances are rigid-invariant, so
    the HAND moves into each object's CANONICAL frame instead (x' =
    R^T(v - t), a [bs,nobj,L,778,3] tensor — 42x smaller than the per-frame
    clouds whose prep/cell-stat passes used to cost more than the pruned NN
    kernel itself), the kernel runs in SHARED-Y mode (one cloud + one set of
    cell stats per (sample, object); y_group = L frames each), and the union
    min becomes a masked min over the per-object distances — identical by
    min(A ∪ B) = min(min A, min B)."""
    bs, L, nhv, _ = hand_verts.shape
    nobj = obj_points.shape[1]

    flat_h, flat_oT = _canonical_frame_operands(hand_verts, obj_traj, obj_points)
    # h2o is UNSIGNED (the reference signs only the o2h direction, which this
    # path never reads) — the hand normals do not enter; the h2o-only kernel
    # variants skip the o2h/sign work entirely on TPU. grad_y=False: the
    # object clouds come from the batch (obj_traj x canonical points), never
    # from model params, so the backward drops the gy matmul and its
    # serializing accumulation (the cluster kernel's backward bottleneck).
    # Padded object slots ride in as all-invalid clouds: their (masked-off
    # anyway, see the where below) distances come out BIG and the culled
    # kernel skips their every tile — a full free search per pad slot.
    P = obj_points.shape[2]
    y_valid = jnp.broadcast_to(
        obj_mask.reshape(bs * nobj, 1), (bs * nobj, P)
    )
    x_valid = None
    if frame_mask is not None:
        # flat frame order is [bs, nobj, L] (matches flat_h's reshape): the
        # per-sequence mask broadcasts over the object axis. The reference
        # pays nothing for these frames (it runs segments at true length) —
        # culling them recovers that under the static batch contract.
        x_valid = jnp.broadcast_to(
            (frame_mask > 0)[:, None, :], (bs, nobj, L)
        ).reshape(bs * nobj * L)
    h2o = G.point2point_h2o(
        flat_h, yT=flat_oT, y_valid=y_valid, chunk=chunk, x_perm=x_perm,
        backend=backend, grad_y=False, y_group=L, x_valid=x_valid,
        interpret=interpret,
    )
    h2o = h2o.reshape(bs, nobj, L, nhv)
    # padded object slots lose the union min (the reference masks their
    # points out of the search; min over per-object mins is identical).
    # The pad sentinel must stay FINITE: a degenerate sample with obj_mask
    # all-False would otherwise min to +inf, and inf - inf = NaN in the
    # refine loss poisons the whole batch's gradients. 10 m is "far from
    # everything" at the mm-scale proximity thresholds and stays a sane
    # network input for the h2o feature.
    h2o = jnp.where(obj_mask[:, :, None, None], h2o, jnp.float32(10.0))
    return jnp.min(h2o, axis=1)


def multi_object_h2o_overflow(
    hand_verts: jax.Array,  # [bs, L, 778, 3]
    obj_traj: jax.Array,  # [bs, nobj, L, 9] tslrot6d
    obj_points: jax.Array,  # [bs, nobj, P, 3]
    obj_mask: jax.Array,  # [bs, nobj] bool
    chunk: int = 2048,
    x_perm=None,
    backend: str = "auto",  # "cluster" forces the certificate off-TPU (tests)
) -> jax.Array:
    """Per-sample cluster-overflow counts [bs] i32 for the exact operands
    multi_object_h2o_dist searches: zero PROVES its auto-routed result is
    exact (trivially zero off the cluster route). Padded object slots are
    excluded — their distances never enter the union min."""
    bs, L = hand_verts.shape[:2]
    nobj = obj_points.shape[1]
    flat_h, flat_oT = _canonical_frame_operands(hand_verts, obj_traj, obj_points)
    ovf = G.point2point_h2o_overflow(
        flat_h, yT=flat_oT, chunk=chunk, x_perm=x_perm, y_group=L,
        backend=backend,
    ).reshape(bs, nobj, L)
    ovf = jnp.where(obj_mask[:, :, None], ovf, 0)
    return jnp.sum(ovf, axis=(1, 2))


def target_geometry(
    mano_stack: M.ManoModel,
    batch: dict[str, Any],
    *,
    chunk: int = 2048,
    h2o_backend: str = "auto",
    frame_mask: jax.Array | None = None,  # loss-side cull hint, see
    # multi_object_h2o_dist — target_h2o only feeds the (masked) refine loss
) -> dict[str, jax.Array]:
    """Geometry of the GT target (ref :219-248 target branch).

    Pure function of the GT batch — no model params enter, so the train step
    computes it OUTSIDE the grad closure (no residuals saved, nothing
    differentiated). When the batch carries a precomputed `target_h2o`
    (data/target_cache.TargetH2OCache), the expensive target chamfer pass is
    skipped entirely and only the (cheap) MANO recovery runs."""
    t_verts, t_joints, t_normals = batch_recover_mano(
        mano_stack, batch["pose_repr"], batch["shape"], batch["hand_side"]
    )
    if "target_h2o" in batch:
        t_h2o = batch["target_h2o"]
    else:
        t_h2o = multi_object_h2o_dist(
            t_verts, t_normals, batch["obj_traj"], batch["obj_points"],
            batch["obj_mask"], chunk=chunk,
            x_perm=M.hand_template_perm(mano_stack), backend=h2o_backend,
            frame_mask=frame_mask,
        )
    return {
        "target_hand_verts": jax.lax.stop_gradient(t_verts),
        "target_hand_joints": jax.lax.stop_gradient(t_joints),
        "target_hand_normals": jax.lax.stop_gradient(t_normals),
        "target_h2o_dist": jax.lax.stop_gradient(t_h2o),
    }


def sample_geometry(
    mano_stack: M.ManoModel,
    batch: dict[str, Any],
    *,
    chunk: int = 2048,
    h2o_backend: str = "auto",
    frame_mask: jax.Array | None = None,  # [bs, L]: enables the EXACT
    # padded-frame dedup below. Correct ONLY under the padding contract
    # (sample_pose_repr/obj_traj/shape zero-padded past the true length —
    # data/collate.py and every adaptor, which perturb/copy PRE-collate like
    # the reference's dataset-level adaptors); pass None to force the full
    # unculled pass.
) -> dict[str, jax.Array]:
    """Geometry of the INPUT sample (ref :193-208): MANO recovery + h2o of
    sample_pose_repr. Pure function of the batch — no model params — so the
    train step computes it OUTSIDE the grad closure (like target_geometry);
    only the refined branch needs differentiation.

    sample_h2o is NETWORK INPUT: the trunk keeps the reference's
    no-attention-mask contract, so padded frames feed real distances (the
    reference computes them over its own zero-padded batch —
    segment_refine_model.py:201). Zero-padding makes every padded frame of
    a sample IDENTICAL (pose=0, obj_traj=0, shape=0), and on such a frame
    the reference's object-to-world formulation DEGENERATES: rot6d(0) maps
    to the zero matrix, the transformed cloud collapses to the origin, and
    its h2o is per-vert ||v_i|| of the zero-pose hand — which the
    hand-into-canonical-frame trick (multi_object_h2o_dist) CANNOT
    reproduce (R=0 collapses the hand instead; rigid invariance needs an
    orthonormal R). So with `frame_mask` the h2o pass runs frame-CULLED
    over the true-length frames, and padded frames get the reference-exact
    closed form ||v_i|| broadcast from representative frame L-1 (unused
    when the segment fills all L frames). This both FIXES the padded-frame
    parity deviation of the full unculled pass and cuts its cost to the
    valid fraction — measured 667 ms of the 1104 ms production R step
    (bench train_r_prod budget, v5e)."""
    s_verts, s_joints, s_normals = batch_recover_mano(
        mano_stack, batch["sample_pose_repr"], batch["shape"], batch["hand_side"]
    )
    x_perm = M.hand_template_perm(mano_stack)
    if frame_mask is None:
        s_h2o = multi_object_h2o_dist(
            s_verts, s_normals, batch["obj_traj"], batch["obj_points"],
            batch["obj_mask"], chunk=chunk, x_perm=x_perm, backend=h2o_backend,
        )
    else:
        masked = multi_object_h2o_dist(
            s_verts, s_normals, batch["obj_traj"], batch["obj_points"],
            batch["obj_mask"], chunk=chunk, x_perm=x_perm,
            backend=h2o_backend, frame_mask=frame_mask,
        )  # culled frames come out BIG — replaced below
        # reference-exact padded-frame value (see docstring): every valid
        # object's cloud sits at the origin, so the union h2o is the
        # per-vert norm of the (zero-pose) hand at frame L-1
        pad_h2o = jnp.linalg.norm(s_verts[:, -1:], axis=-1)  # [bs, 1, 778]
        s_h2o = jnp.where((frame_mask > 0)[:, :, None], masked, pad_h2o)
    return {
        "sample_hand_verts": s_verts,
        "sample_hand_joints": s_joints,
        "sample_hand_normals": s_normals,
        "sample_h2o_dist": s_h2o,
    }


def refine_forward(
    net: SegmentRefineNet,
    variables,
    mano_stack: M.ManoModel,
    batch: dict[str, Any],
    *,
    deterministic: bool = True,
    with_target: bool = True,
    chunk: int = 2048,
    rngs=None,
    sample_geom: dict[str, jax.Array] | None = None,
    h2o_backend: str = "auto",
    loss_frame_mask: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """Full reference forward (ref :170-250): geometry for the input sample,
    the network's residual refinement, geometry for the refined output, and
    (optionally) for the GT target — same output keys as the reference.
    Pass `sample_geom` (from sample_geometry) to reuse a precomputed input
    branch (the train step computes it outside the grad closure).

    `loss_frame_mask` (usually batch["mask"]) marks mask-padded frames whose
    refine/target h2o the loss zeroes: the cull route skips their searches
    entirely and leaves BIG values there. sample_h2o is a NETWORK INPUT
    (no-attention-mask trunk: padded-frame inputs must be the reference's
    real values), so when loss_frame_mask is given the fallback
    sample_geometry call uses it for the EXACT padded-frame dedup — padded
    inputs become the reference's degenerate closed form, see
    sample_geometry — never for zeroing. Callers that READ refine/target
    h2o at padded frames (none do: the loss masks, debug_refine slices to
    true length) must not pass it."""
    x_in = batch["sample_pose_repr"]
    cond = {
        "hand_side": batch["hand_side"],
        "shape": batch["shape"],
        "obj_embedding": batch["obj_embedding"],
        "obj_traj": batch["obj_traj"],
        "obj_mask": batch["obj_mask"],
    }
    obj_pts = batch["obj_points"]

    if sample_geom is None:
        sample_geom = sample_geometry(
            mano_stack, batch, chunk=chunk, h2o_backend=h2o_backend,
            frame_mask=loss_frame_mask,
        )
    s_verts = sample_geom["sample_hand_verts"]
    s_joints = sample_geom["sample_hand_joints"]
    s_normals = sample_geom["sample_hand_normals"]
    s_h2o = sample_geom["sample_h2o_dist"]

    output = net.apply(
        variables, x_in, s_h2o, cond, deterministic=deterministic, rngs=rngs
    )

    r_verts, r_joints, r_normals = batch_recover_mano(
        mano_stack, output, batch["shape"], batch["hand_side"]
    )
    r_h2o = multi_object_h2o_dist(
        r_verts, r_normals, batch["obj_traj"], obj_pts, batch["obj_mask"],
        chunk=chunk, x_perm=M.hand_template_perm(mano_stack),
        backend=h2o_backend, frame_mask=loss_frame_mask,
    )

    res = {
        "refine_pose_repr": output,
        "refine_hand_verts": r_verts,
        "refine_hand_joints": r_joints,
        "refine_hand_normals": r_normals,
        "refine_h2o_dist": r_h2o,
        "sample_hand_verts": s_verts,
        "sample_hand_joints": s_joints,
        "sample_hand_normals": s_normals,
        "sample_h2o_dist": s_h2o,
    }

    if with_target:
        res.update(
            target_geometry(
                mano_stack, batch, chunk=chunk, h2o_backend=h2o_backend,
                frame_mask=loss_frame_mask,
            )
        )
    return res
