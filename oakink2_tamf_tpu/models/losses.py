"""Loss modules: G's geometric extra loss, R's refine loss, the encoder CE.

Vmapped static-shape re-designs of:
- model/interaction_segment_extra_loss.py  (G; per-batch-item python loop at :95)
- model/segment_refine_model_loss.py       (R)
- model/segment_encoder_loss.py            (encoder)

Reduction parity notes (quirks preserved deliberately):
- the G extra loss SUMS per-item losses over the batch (ref :123/:136/:144/:171),
  while the R loss MEANS over the batch (ref loss :51/:61/:71).
- `mask_coef = L / sum(mask)` rescales means computed over the padded length.
- per-object terms are averaged with 1/num_obj where num_obj counts REAL
  objects (padded objects contribute zero).

GrabNet contact assets (vpe edge list + per-vertex contact weights, loaded from
asset/grabnet/*.npy in the reference, config/loss_param.yml) are loaded when
present; otherwise deterministic synthetic stand-ins with the same shapes.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import geometry as G
from ..core import mano as M
from ..core import transforms as T
from .refine_r import batch_recover_mano


class ContactAssets(NamedTuple):
    vpe: jax.Array  # [ne, 2] int — vertex pairs per edge
    v_weights: jax.Array  # [778] — contact weight per vertex
    v_weights2: jax.Array  # v_weights ** (1/2.5)


_synthetic_assets_warned = False


def load_contact_assets(
    vpe_path: str | None = None, c_weight_path: str | None = None, mano_faces: np.ndarray | None = None
) -> ContactAssets:
    """Load GrabNet vpe/rhand_weight npys, else synthesize: edges from the MANO
    triangulation and smooth pseudo contact weights (deterministic).

    Fail-loud contract (same as core/mano.get_mano_model): EXPLICIT paths that
    don't resolve raise — the reference hard-requires these assets
    (extra_loss.py:39-42, README.md:118-126) and training against random
    contact weights would silently corrupt rec_vert/dist losses. With no paths
    given, the synthetic stand-ins are used with ONE loud warning.
    """
    if vpe_path or c_weight_path:
        for p, name in ((vpe_path, "vpe_path"), (c_weight_path, "c_weight_path")):
            if not (p and os.path.isfile(p)):
                raise FileNotFoundError(
                    f"contact asset {name}={p!r} was given explicitly but does not "
                    "exist; refusing to substitute synthetic contact weights. "
                    "Fetch the grabnet verts_per_edge.npy/rhand_weight.npy "
                    "(reference README.md:118-126) or drop the config keys."
                )
        from ..utils.integrity import verify_pinned

        verify_pinned(vpe_path, what="grabnet contact asset")
        verify_pinned(c_weight_path, what="grabnet contact asset")
        vpe = np.load(vpe_path).astype(np.int32)
        w = np.load(c_weight_path).astype(np.float32)
    else:
        global _synthetic_assets_warned
        if not _synthetic_assets_warned:
            _synthetic_assets_warned = True
            logging.getLogger(__name__).warning(
                "grabnet contact assets (vpe_path/c_weight_path) unset: using "
                "synthetic edges/weights. rec_vert/edge_len/dist losses are NOT "
                "reference-faithful; set train.loss.vpe_path/c_weight_path for "
                "any real run."
            )
        if mano_faces is None:
            mano_faces = np.asarray(M.synthetic_mano_model("right").faces)
        e = np.concatenate(
            [mano_faces[:, [0, 1]], mano_faces[:, [1, 2]], mano_faces[:, [2, 0]]], axis=0
        )
        vpe = np.unique(np.sort(e, axis=1), axis=0).astype(np.int32)
        rng = np.random.default_rng(7)
        w = rng.random(M.N_VERTS).astype(np.float32)
    # host-resident (compile-time constants; see core/mano.ManoModel note)
    return ContactAssets(
        vpe=np.asarray(vpe),
        v_weights=np.asarray(w),
        v_weights2=np.asarray(np.power(w, 1.0 / 2.5), np.float32),
    )


@dataclasses.dataclass(frozen=True)
class ExtraLossConfig:
    """config/loss_param.yml coefficients."""

    coef_rec_joint: float = 1.0
    coef_rec_vert: float = 1.0
    coef_edge_len: float = 0.1
    coef_dist_h: float = 0.1
    coef_dist_o: float = 1.0


@dataclasses.dataclass(frozen=True)
class RefineLossConfig:
    """config/loss_param_refine.yml coefficients."""

    coef_rec_joint: float = 1.0
    coef_rec_vert: float = 1.0
    coef_dist_h: float = 0.1


def _edges(verts: jax.Array, vpe: jax.Array) -> jax.Array:
    """verts [..., V, 3] -> edge vectors [..., ne, 3] (ref _edges_for)."""
    return jnp.take(verts, vpe[:, 0], axis=-2) - jnp.take(verts, vpe[:, 1], axis=-2)


def _canonical_operands(
    verts: jax.Array,  # [bs, L, 778, 3] world-frame hand verts
    normals: jax.Array,  # [bs, L, 778, 3]
    transf: jax.Array,  # [bs, nobj, L, 4, 4] canonical->world rigid transforms
    obj_points: jax.Array,  # [bs, nobj, P, 3] CANONICAL clouds
):
    """Canonical-frame kernel operands shared by the composed and fused dist
    paths: the HAND moves into each object's canonical frame (x' = R^T(v-t))
    and the normals rotate with R^T. Returns (x [F,778,3], n [F,778,3],
    yT [bs*nobj,3,P]) with F = bs*nobj*L (shared-Y mode: y_group = L)."""
    bs, nobj, L = transf.shape[:3]
    P = obj_points.shape[2]
    vh = verts.shape[2]
    R = transf[..., :3, :3]  # [bs, nobj, L, 3, 3] (world_c = sum_k R[c,k] y_k)
    t = transf[..., :3, 3]  # [bs, nobj, L, 3]
    diff = verts[:, None] - t[:, :, :, None, :]  # [bs, nobj, L, 778, 3]
    hi = jax.lax.Precision.HIGHEST  # near-contact distances are ~5e-3 m
    x = jnp.einsum("bolck,bolvc->bolvk", R, diff, precision=hi).reshape(-1, vh, 3)
    n = jnp.einsum(
        "bolck,blvc->bolvk", R, normals, precision=hi
    ).reshape(-1, vh, 3)
    yT = jnp.swapaxes(obj_points, -1, -2).reshape(-1, 3, P)  # [bs*nobj, 3, P]
    return x, n, yT


def _per_object_signed(
    verts: jax.Array,  # [bs, L, 778, 3] world-frame hand verts
    normals: jax.Array,  # [bs, L, 778, 3]
    transf: jax.Array,  # [bs, nobj, L, 4, 4] canonical->world rigid transforms
    obj_points: jax.Array,  # [bs, nobj, P, 3] CANONICAL clouds
    chunk: int,
):
    """Per-object signed distances: returns (o2h [bs,nobj,L,P], h2o [bs,nobj,L,778]).

    Distances are rigid-invariant, so instead of moving each object's
    canonical cloud to the world frame per frame (a [bs,nobj,L,3,P] monster —
    its kernel operand prep measured 8.1 GB of HBM temps and OOM'd the bs64
    2x8192 G train step), the HAND moves into each object's CANONICAL frame
    (x' = R^T(v - t), [bs,nobj,L,778,3] — 42x smaller) and the kernel runs
    in SHARED-Y mode: one cloud operand per (sample, object), y_group = L
    frames each (ops/chamfer_pallas._prep_operands). Normals rotate with
    R^T; the o2h sign n'·(y' - x') = n·(y - x) is unchanged.
    """
    bs, nobj, L = transf.shape[:3]
    P = obj_points.shape[2]
    vh = verts.shape[2]
    x, n, yT = _canonical_operands(verts, normals, transf, obj_points)
    # grad_y=False: the clouds are batch-derived — never on the path to model
    # params — so the backward kernels drop their gy work entirely
    o2h, h2o, _ = G.point2point_signed(
        x, x_normals=n, yT=yT, chunk=chunk, grad_y=False, y_group=L
    )
    return o2h.reshape(bs, nobj, L, P), h2o.reshape(bs, nobj, L, vh)


def _dist_sums_fused(
    verts: jax.Array,  # [bs, L, 778, 3] PREDICTED world-frame hand verts
    normals: jax.Array,  # [bs, L, 778, 3]
    transf: jax.Array,  # [bs, nobj, L, 4, 4]
    obj_points: jax.Array,  # [bs, nobj, P, 3]
    o2h_g: jax.Array,  # [bs, nobj, L, P] GT signed o2h (cache or GT pass)
    h2o_g: jax.Array,  # [bs, nobj, L, 778]
    vw2: jax.Array,  # [778] v_weights2
    chunk: int,
    seq_mask: jax.Array | None = None,  # [bs, L] frame mask
    obj_mask: jax.Array | None = None,  # [bs, nobj] bool
    interpret: bool = False,
    region_cull: bool = False,
    x_perm=None,  # static [778] template perm (core/mano.hand_template_perm)
):
    """Fused dist_o/dist_h per-frame SUMS via ops/chamfer_loss: the predicted
    signed field never materializes and its gradient is computed in the same
    kernel pass (measured: replaces the composed pred fwd+bwd — ~5 full-rate
    MXU passes/block — with 3). Returns (do_f, dh_f) both [bs, nobj, L]."""
    from ..ops import chamfer_loss as CL

    bs, nobj, L = transf.shape[:3]
    P = obj_points.shape[2]
    vh = verts.shape[2]
    x, n, yT = _canonical_operands(verts, normals, transf, obj_points)
    # frame-level skip: mask-padded frames and padded object slots only ever
    # feed the loss TIMES ZERO (the m3/om weights below) — the kernel emits
    # zero sums/gradients for them without running their MXU passes. The
    # reference pays nothing for either (true-length segments, real objects
    # only), so this recovers its dynamic-shape advantage.
    x_valid = None
    if seq_mask is not None or obj_mask is not None:
        fm = (
            (seq_mask > 0)[:, None, :]
            if seq_mask is not None
            else jnp.ones((bs, 1, L), bool)
        )
        om = (
            obj_mask.astype(bool)[:, :, None]
            if obj_mask is not None
            else jnp.ones((bs, nobj, 1), bool)
        )
        x_valid = jnp.broadcast_to(
            jnp.logical_and(fm, om), (bs, nobj, L)
        ).reshape(bs * nobj * L)
    do_f, dh_f = CL.chamfer_dist_loss(
        x, n, yT=yT,
        o2h_g=o2h_g.reshape(-1, P), h2o_g=h2o_g.reshape(-1, vh), vw2=vw2,
        y_group=L, tile=G._clamp_tile(chunk, P), x_valid=x_valid,
        interpret=interpret, region_cull=region_cull, x_perm=x_perm,
    )
    return do_f.reshape(bs, nobj, L), dh_f.reshape(bs, nobj, L)


def extra_loss_gt_geometry(
    mano_stack: M.ManoModel,
    batch: dict[str, Any],
    *,
    chunk: int = 2048,
    with_chamfer: bool = True,
) -> dict[str, jax.Array]:
    """GT-side geometry of the G extra loss — a pure function of the batch
    (no model output), so the train step computes it OUTSIDE the grad closure
    and passes it into the checkpointed loss as an input (never recomputed in
    the backward, no policy ambiguity)."""
    verts_gt, joints_gt, normals_gt = batch_recover_mano(
        mano_stack, batch["pose_repr"], batch["shape"], batch["hand_side"]
    )
    out = {"verts_gt": verts_gt, "joints_gt": joints_gt, "normals_gt": normals_gt}
    if with_chamfer:
        if "gt_o2h" in batch and "gt_h2o" in batch:
            # precomputed per-sample (data/target_cache.GTGeomCache): the GT
            # all-pairs forward — ~23% of the step's chamfer time — vanishes
            o2h_g = batch["gt_o2h"].astype(jnp.float32)
            h2o_g = batch["gt_h2o"].astype(jnp.float32)
        else:
            transf = T.tslrot6d_to_transf(batch["obj_traj"])  # [bs,nobj,L,4,4]
            o2h_g, h2o_g = _per_object_signed(
                verts_gt, normals_gt, transf, batch["obj_points"], chunk
            )
        out.update({"o2h_g": o2h_g, "h2o_g": h2o_g})
    return out


def interaction_segment_extra_loss(
    mano_stack: M.ManoModel,
    assets: ContactAssets,
    cfg: ExtraLossConfig,
    model_output: jax.Array,  # [bs, L, 99] predicted pose_repr
    batch: dict[str, Any],
    *,
    chunk: int = 2048,
    gt_geom: dict[str, jax.Array] | None = None,
    dist_impl: str = "auto",
    interpret: bool = False,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """G's geometric losses (ref extra_loss.py:85-197), fully batched.
    Pass `gt_geom` (from extra_loss_gt_geometry) to reuse a precomputed GT
    branch (the train step computes it outside the grad closure).

    dist_impl routes the PREDICTED-side dist_h/dist_o pass: "fused" uses the
    single-pass loss kernel (ops/chamfer_loss — fwd + grad together, the
    signed field never materializes), "composed" the point2point_signed
    pipeline, "auto" = fused on TPU (measured faster at every tested shape),
    composed elsewhere. Both compute the same math; only summation order
    differs (parity-tested in tests/test_chamfer_loss.py)."""
    mask = batch["mask"]  # [bs, L]
    L = mask.shape[1]
    mask_coef = L / jnp.maximum(jnp.sum(mask, axis=1), 1.0)  # [bs]

    # checkpoint-named so the train step's remat policy keeps these across
    # the backward pass (MANO LBS + vertex normals measured 92 ms/call on
    # v5e at bs=64xL=160 — recomputing both calls costs ~184 ms/step for
    # ~760 MB of savable activations)
    from jax.ad_checkpoint import checkpoint_name

    need_chamfer = cfg.coef_dist_h > 0.0 or cfg.coef_dist_o > 0.0
    if gt_geom is None:
        gt_geom = extra_loss_gt_geometry(
            mano_stack, batch, chunk=chunk, with_chamfer=need_chamfer
        )
        # name ONLY the small geometry tensors as savable residuals; the
        # chamfer-branch output o2h_g is multi-GB at production shapes and
        # must stay rematerializable under save_only_these_names (the train
        # step avoids this path entirely by passing gt_geom as a checkpoint
        # input)
        gt_geom = {
            k: (checkpoint_name(v, "geom_res")
                if k in ("verts_gt", "joints_gt", "normals_gt") else v)
            for k, v in gt_geom.items()
        }
    verts_gt, joints_gt = gt_geom["verts_gt"], gt_geom["joints_gt"]

    verts_pred, joints_pred, normals_pred = (
        checkpoint_name(t, "geom_res")
        for t in batch_recover_mano(
            mano_stack, model_output, batch["shape"], batch["hand_side"]
        )
    )

    m = mask[:, :, None]  # [bs, L, 1]
    terms: dict[str, jax.Array] = {}

    # joint loss: mask_coef * mean_{L,nj}(sq dist * mask), summed over batch
    jd = jnp.sum((joints_pred - joints_gt) ** 2, axis=-1) * m  # [bs, L, 21]
    terms["rec_joint"] = jnp.sum(mask_coef * jnp.mean(jd, axis=(1, 2)))

    # vert loss with squared contact weights
    vd = jnp.sum((verts_pred - verts_gt) ** 2, axis=-1) * m  # [bs, L, 778]
    vd = vd * (assets.v_weights**2)[None, None, :]
    terms["rec_vert"] = jnp.sum(mask_coef * jnp.mean(vd, axis=(1, 2)))

    # edge length loss
    e_pred = _edges(verts_pred, assets.vpe)  # [bs, L, ne, 3]
    e_gt = _edges(verts_gt, assets.vpe)
    ed = jnp.abs(e_pred - e_gt) * mask[:, :, None, None]
    terms["edge_len"] = jnp.sum(mask_coef * jnp.mean(ed, axis=(1, 2, 3)))

    # per-object signed-distance losses
    if need_chamfer:
        o2h_g, h2o_g = gt_geom["o2h_g"], gt_geom["h2o_g"]
        transf = T.tslrot6d_to_transf(batch["obj_traj"])  # cheap [bs,nobj,L,4,4]

        obj_mask = batch["obj_mask"].astype(mask.dtype)  # [bs, nobj]
        num_obj = jnp.maximum(jnp.sum(obj_mask, axis=1), 1.0)  # [bs]
        om = obj_mask / num_obj[:, None]  # 1/num_obj weights, 0 for pads

        use_cull = dist_impl == "fused_cull"
        use_fused = use_cull or dist_impl == "fused" or (
            dist_impl == "auto" and G._on_tpu()
        )
        if use_fused:
            P = batch["obj_points"].shape[2]
            do_f, dh_f = _dist_sums_fused(
                verts_pred, normals_pred, transf, batch["obj_points"],
                o2h_g, h2o_g, assets.v_weights2, chunk,
                seq_mask=mask, obj_mask=batch["obj_mask"],
                interpret=interpret,
                region_cull=use_cull,
                x_perm=M.hand_template_perm(mano_stack) if use_cull else None,
            )
            vh = verts_pred.shape[2]
            m3 = mask[:, None, :]  # [bs, 1, L]
            dh = jnp.sum(dh_f * m3, axis=2) / (L * vh)  # [bs, nobj]
            do = jnp.sum(do_f * m3, axis=2) / (L * P)
        else:
            o2h_p, h2o_p = _per_object_signed(
                verts_pred, normals_pred, transf, batch["obj_points"], chunk
            )
            # dist_h: | |h2o| - |h2o_gt| | * v_weights2, masked mean over (L, 778)
            dh = jnp.abs(jnp.abs(h2o_p) - jnp.abs(h2o_g)) * assets.v_weights2[None, None, None, :]
            dh = dh * mask[:, None, :, None]
            dh = jnp.mean(dh, axis=(2, 3))  # [bs, nobj]

            # dist_o: proximity/penetration-weighted |o2h - o2h_gt|
            w_dist = (o2h_g < 0.01) & (o2h_g > -0.005)
            w = jnp.where(w_dist, 1.0, 0.1)
            w = jnp.where(o2h_p < 0.0, 1.5, w)
            do = jnp.abs(o2h_p - o2h_g) * w * mask[:, None, :, None]
            do = jnp.mean(do, axis=(2, 3))  # [bs, nobj]

        terms["dist_h"] = jnp.sum(mask_coef * jnp.sum(dh * om, axis=1))
        terms["dist_o"] = jnp.sum(mask_coef * jnp.sum(do * om, axis=1))
    else:
        terms["dist_h"] = jnp.asarray(0.0)
        terms["dist_o"] = jnp.asarray(0.0)

    loss = (
        cfg.coef_rec_joint * terms["rec_joint"]
        + cfg.coef_rec_vert * terms["rec_vert"]
        + cfg.coef_edge_len * terms["edge_len"]
        + cfg.coef_dist_h * terms["dist_h"]
        + cfg.coef_dist_o * terms["dist_o"]
    )
    terms["loss"] = loss
    return loss, terms


def segment_refine_loss(
    assets: ContactAssets,
    cfg: RefineLossConfig,
    output: dict[str, jax.Array],
    batch: dict[str, Any],
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """R's loss (ref segment_refine_model_loss.py:35-84): joint/vert recon vs
    target + |h2o| matching, batch-mean reduction."""
    mask = batch["mask"]  # [bs, L]
    mask_coef = mask.shape[1] / jnp.maximum(jnp.sum(mask, axis=1), 1.0)  # [bs]
    m = mask[:, :, None]

    jd = jnp.sum((output["refine_hand_joints"] - output["target_hand_joints"]) ** 2, axis=-1) * m
    rec_joint = jnp.mean(mask_coef * jnp.mean(jd, axis=(1, 2)))

    vd = jnp.sum((output["refine_hand_verts"] - output["target_hand_verts"]) ** 2, axis=-1) * m
    vd = vd * (assets.v_weights**2)[None, None, :]
    rec_vert = jnp.mean(mask_coef * jnp.mean(vd, axis=(1, 2)))

    dh = jnp.abs(jnp.abs(output["refine_h2o_dist"]) - jnp.abs(output["target_h2o_dist"])) * m
    dh = dh * assets.v_weights2[None, None, :]
    dist_h = jnp.mean(mask_coef * jnp.mean(dh, axis=(1, 2)))

    loss = cfg.coef_rec_joint * rec_joint + cfg.coef_rec_vert * rec_vert + cfg.coef_dist_h * dist_h
    return loss, {"loss": loss, "rec_joint": rec_joint, "rec_vert": rec_vert, "dist_h": dist_h}


def segment_encoder_loss(
    output: dict[str, jax.Array], action_label_id: jax.Array
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Cross-entropy + accuracy (ref segment_encoder_loss.py:10-27)."""
    logits = output["activation"]  # [bs, n_actions]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, action_label_id[:, None], axis=1)[:, 0]
    loss = jnp.mean(nll)
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == action_label_id).astype(jnp.float32))
    return loss, {"loss": loss, "ce": loss, "acc": acc}
