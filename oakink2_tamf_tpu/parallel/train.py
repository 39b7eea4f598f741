"""Sharded train/sample steps for G, R and the FID encoder.

One jitted step per model family, compiled over a data mesh: batch sharded on
the leading axis, params/opt-state replicated, gradient averaging fused by
GSPMD (replacing the reference's DDP backward all-reduce, launch/train.py:529).

Optimizer parity (launch/train.py:469-479, util/net_util.py:13):
- AdamW(lr=1e-4, weight_decay=0.0)
- PER-PARAMETER grad-clip to L2 norm 0.1 (each tensor clipped independently —
  NOT a global-norm clip)
- MultiStepLR(milestones, gamma) stepped per epoch — realized as a step-count
  boundaries-and-scales optax schedule.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..core import diffusion as D
from ..core import mano as M
from ..models import losses as LL
from ..models.encoder import SegmentEncoder
from ..models.mdm_g import InteractionSegmentMDM
from ..models.refine_r import SegmentRefineNet, refine_forward
from .mesh import batch_sharding, replicated



# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------


def per_param_clip(max_norm: float) -> optax.GradientTransformation:
    """Clip each parameter tensor's gradient to `max_norm` L2 independently
    (parity with util/net_util.py:13 clip_grad_norm_ per param)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def clip_leaf(g):
            n = jnp.linalg.norm(g.reshape(-1))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(n, 1e-6))
            return g * scale

        return jax.tree.map(clip_leaf, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def multistep_lr(base_lr: float, milestones_steps: list[int], gamma: float) -> optax.Schedule:
    """MultiStepLR as an optax schedule over optimizer steps."""
    if not milestones_steps:
        return optax.constant_schedule(base_lr)
    return optax.piecewise_constant_schedule(
        base_lr, {int(m): gamma for m in milestones_steps}
    )


def make_optimizer(
    base_lr: float = 1e-4,
    weight_decay: float = 0.0,
    grad_clip: float = 0.1,
    milestones_steps: list[int] | None = None,
    gamma: float = 0.5,
) -> optax.GradientTransformation:
    schedule = multistep_lr(base_lr, milestones_steps or [], gamma)
    return optax.chain(
        per_param_clip(grad_clip),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay),
    )


@dataclasses.dataclass
class TrainState:
    """Minimal mutable train-state bundle (a pytree via the helpers below)."""

    step: jax.Array
    params: Any
    opt_state: Any

    def as_tuple(self):
        return (self.step, self.params, self.opt_state)


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=optimizer.init(params))


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.step, s.params, s.opt_state), None),
    lambda _, c: TrainState(step=c[0], params=c[1], opt_state=c[2]),
)


# ---------------------------------------------------------------------------
# G: diffusion train step
# ---------------------------------------------------------------------------


def g_cond_from_batch(batch: dict[str, Any]) -> dict[str, Any]:
    return {
        "text_emb": batch["text_emb"],
        "hand_side": batch["hand_side"],
        "shape": batch["shape"],
        "obj_traj": batch["obj_traj"],
        "obj_embedding": batch["obj_embedding"],
        "obj_mask": batch["obj_mask"],
    }


def make_g_train_step(
    model: InteractionSegmentMDM,
    sched: D.DiffusionSchedule,
    optimizer: optax.GradientTransformation,
    mano_stack: M.ManoModel | None = None,
    assets: LL.ContactAssets | None = None,
    extra_cfg: LL.ExtraLossConfig | None = None,
    *,
    chunk: int = 2048,
    mesh=None,
    dist_impl: str = "auto",
) -> Callable:
    """Build the jitted G train step. With mano/assets/extra_cfg set, the
    geometric extra losses are computed on model_output (the reference's
    loss_callback hook, gd.py:1182 / launch/train.py:522-528). dist_impl
    routes the predicted-side dist pass (models/losses.py docstring)."""

    use_extra = mano_stack is not None and assets is not None and extra_cfg is not None

    def step_fn(state: TrainState, batch: dict[str, Any], rng: jax.Array):
        k_t, k_noise, k_dropout, k_cond = jax.random.split(rng, 4)
        bs = batch["pose_repr"].shape[0]
        # timesteps: host-provided (importance resampler) or uniform in-step
        if "t" in batch:
            t = batch["t"].astype(jnp.int32)
            weights = batch["t_weights"].astype(jnp.float32)
        else:
            t = jax.random.randint(k_t, (bs,), 0, sched.num_timesteps, dtype=jnp.int32)
            weights = jnp.ones((bs,), jnp.float32)  # uniform sampler

        cond = g_cond_from_batch(batch)

        # GT-side geometry is batch-only (no params): computed once, outside
        # the grad closure (mirrors the R step; the reference recomputes it
        # in-graph every step, extra_loss.py:95-178)
        gt_geom = None
        if use_extra:
            gt_geom = jax.lax.stop_gradient(
                LL.extra_loss_gt_geometry(
                    mano_stack, batch, chunk=chunk,
                    with_chamfer=extra_cfg.coef_dist_h > 0.0 or extra_cfg.coef_dist_o > 0.0,
                )
            )

        def loss_fn(params):
            def model_fn(x, tt):
                return model.apply(
                    params, x, tt, cond,
                    deterministic=False,
                    rngs={"dropout": k_dropout, "cond_mask": k_cond},
                )

            mse, aux = D.training_losses(
                model_fn, sched, batch["pose_repr"], t, batch["mask"], k_noise
            )
            diffusion_loss = jnp.mean(mse * weights)
            metrics = {
                "diffusion_loss": diffusion_loss,
                "t_mean": jnp.mean(t.astype(jnp.float32)),
                # per-sample values for the loss-second-moment resampler's
                # host-side history update (resample.py:83-118 counterpart)
                "per_sample_mse": mse,
                "per_sample_t": t,
            }
            total = diffusion_loss
            if use_extra:
                # remat: the geometric losses expand to [bs*nobj*L, 778|P]
                # MANO/chamfer intermediates (multi-GB at production batch) —
                # recompute them in the backward pass instead of saving. The
                # chamfer residual rows are exempted (checkpoint-named in
                # ops/chamfer_pallas._p2ps_fwd): they are small and keeping
                # them means the backward never re-runs the NN kernels.
                # gt_geom enters as an INPUT of the checkpointed region (it
                # is computed once outside the grad closure below): the GT
                # MANO + chamfer branch is neither differentiated nor ever
                # recomputed in the backward pass.
                extra, terms = jax.checkpoint(
                    lambda mo, gg: LL.interaction_segment_extra_loss(
                        mano_stack, assets, extra_cfg, mo, batch,
                        chunk=chunk, gt_geom=gg, dist_impl=dist_impl,
                    ),
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "chamfer_res", "geom_res"
                    ),
                )(aux["model_output"], gt_geom)
                total = total + extra
                metrics.update({f"extra/{k}": v for k, v in terms.items()})
            metrics["loss"] = total
            return total, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params, opt_state=new_opt)
        return new_state, metrics

    if mesh is not None:
        bsh = batch_sharding(mesh)  # prefix-broadcast over the whole batch dict
        rep = replicated(mesh)
        return jax.jit(
            step_fn,
            in_shardings=(rep, bsh, rep),
            out_shardings=(rep, rep),
            donate_argnums=(0,),
        )
    return jax.jit(step_fn, donate_argnums=(0,))


def make_g_sampler(
    model: InteractionSegmentMDM,
    sched: D.DiffusionSchedule,
    *,
    sampler: str = "ddpm",
    mesh=None,
    parallel_window: int = 64,
    parallel_tol: float = 1e-2,
) -> Callable:
    """Batched reverse-diffusion sampler, jitted over the mesh. Replaces the
    reference's bs=1 sequential python loop (launch/sample.py:202-229): here
    many segments denoise together per chip and the 1000 steps are one scan.
    sampler="parallel" runs the Picard-window chain (D.p_sample_loop_parallel)
    — the latency-oriented path for SMALL batches, where the sequential scan
    leaves the MXU idle and a window of steps batches into one model call."""

    def sample_fn(params, batch: dict[str, Any], rng: jax.Array):
        cond = g_cond_from_batch(batch)
        bs, L = batch["pose_repr"].shape[:2]

        def model_fn(x, tt):
            return model.apply(params, x, tt, cond, deterministic=True)

        shape = (bs, L, 99)
        if sampler == "ddpm":
            return D.p_sample_loop(model_fn, sched, shape, rng, clip_denoised=False)
        elif sampler == "ddim":
            return D.ddim_sample_loop(model_fn, sched, shape, rng, clip_denoised=False)
        elif sampler == "plms":
            return D.plms_sample_loop(model_fn, sched, shape, rng, clip_denoised=False)
        elif sampler == "parallel":
            return D.p_sample_loop_parallel(
                model_fn, sched, shape, rng, clip_denoised=False,
                window=parallel_window, tol=parallel_tol,
            )
        raise ValueError(f"unknown sampler {sampler}")

    if mesh is not None:
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        return jax.jit(sample_fn, in_shardings=(rep, bsh, rep), out_shardings=bsh)
    return jax.jit(sample_fn)


# ---------------------------------------------------------------------------
# R: refiner train step
# ---------------------------------------------------------------------------


def make_r_train_step(
    net: SegmentRefineNet,
    optimizer: optax.GradientTransformation,
    mano_stack: M.ManoModel,
    assets: LL.ContactAssets,
    loss_cfg: LL.RefineLossConfig,
    *,
    chunk: int = 2048,
    mesh=None,
    h2o_backend: str = "auto",
) -> Callable:
    from ..models.refine_r import sample_geometry, target_geometry

    def step_fn(state: TrainState, batch: dict[str, Any], rng: jax.Array):
        k_dropout = rng
        # target AND sample geometry are batch-only (no params): both stay
        # outside the grad closure so AD never sees them — only the refined
        # branch (net + its geometry) is differentiated. With a cached
        # batch["target_h2o"] the target chamfer pass vanishes entirely
        # (ref recomputed all three branches inside the graph every step,
        # segment_refine_model.py:193-248)
        tgt = target_geometry(
            mano_stack, batch, chunk=chunk, h2o_backend=h2o_backend,
            frame_mask=batch["mask"],
        )
        sg = jax.lax.stop_gradient(
            sample_geometry(
                mano_stack, batch, chunk=chunk, h2o_backend=h2o_backend,
                # exact padded-frame dedup (see sample_geometry): valid under
                # the zero-padding collate/adaptor contract
                frame_mask=batch["mask"],
            )
        )

        def loss_fn(params):
            out = refine_forward(
                net, params, mano_stack, batch,
                deterministic=False, with_target=False, chunk=chunk,
                rngs={"dropout": k_dropout}, sample_geom=sg,
                h2o_backend=h2o_backend, loss_frame_mask=batch["mask"],
            )
            out.update(tgt)
            loss, terms = LL.segment_refine_loss(assets, loss_cfg, out, batch)
            return loss, terms

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, new_opt), metrics

    if mesh is not None:
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        return jax.jit(
            step_fn, in_shardings=(rep, bsh, rep), out_shardings=(rep, rep), donate_argnums=(0,)
        )
    return jax.jit(step_fn, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Encoder train step
# ---------------------------------------------------------------------------


def make_encoder_train_step(
    model: SegmentEncoder,
    optimizer: optax.GradientTransformation,
    *,
    mesh=None,
) -> Callable:
    def step_fn(state: TrainState, batch: dict[str, Any], rng: jax.Array):
        cond = {
            "hand_side": batch["hand_side"],
            "shape": batch["shape"],
            "obj_traj": batch["obj_traj"],
            "obj_embedding": batch["obj_embedding"],
            "obj_mask": batch["obj_mask"],
        }
        # train on sampled pose_repr when provided (train_encoder.py:521-523)
        x = batch.get("sample_pose_repr", batch["pose_repr"])

        def loss_fn(params):
            out = model.apply(params, x, cond, deterministic=False, rngs={"dropout": rng})
            return LL.segment_encoder_loss(out, batch["action_label_id"])

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        # the 'buffers' collection (classification_token) is a FROZEN buffer
        # in the reference (segment_encoder.py:52, excluded from
        # parameters()): grads are zero via stop_gradient, and zeroing the
        # update also blocks weight-decay drift under adamw(wd > 0)
        if isinstance(updates, dict) and "buffers" in updates:
            updates = dict(
                updates, buffers=jax.tree.map(jnp.zeros_like, updates["buffers"])
            )
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, new_params, new_opt), metrics

    if mesh is not None:
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        return jax.jit(
            step_fn, in_shardings=(rep, bsh, rep), out_shardings=(rep, rep), donate_argnums=(0,)
        )
    return jax.jit(step_fn, donate_argnums=(0,))
