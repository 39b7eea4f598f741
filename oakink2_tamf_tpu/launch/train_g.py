"""Train MF-MDM G (reference launch/train.py workflow, TPU-native).

Usage mirrors the reference:
  python -m oakink2_tamf_tpu.launch.train_g --cfg config/arch_mdm_l.yml \
      --cfg config/loss_param.yml --train.cache_dict_filepath ... --commit

With --data.synthetic true it runs end-to-end on generated data (smoke/e2e).
"""

from __future__ import annotations

import logging
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..core import diffusion as D
from ..core import mano as M
from ..models import losses as LL
from ..models.mdm_g import InteractionSegmentMDM, MDMConfig
from ..models.refine_r import stack_mano_models
from ..parallel import train as PT
from ..parallel.mesh import is_coordinator, make_mesh, replicate, shard_batch
from ..runtime.ckpt import load_checkpoint, save_train_state
from ..runtime.logging import MetricWriter
from . import common, param

_logger = logging.getLogger(__name__)

PROG = "train_g"


def build_model(reg, activation: str | None = None) -> InteractionSegmentMDM:
    """`activation` overrides model.activation — the `.pt` checkpoint-port
    paths force "gelu_exact" (torch's default erf gelu): a ported checkpoint
    run under the tanh approximation drifts ~1e-3 per activation, silently
    corrupting FID/CR parity claims (see interop.torch_port.port_activation)."""
    m = reg.select("model")
    return InteractionSegmentMDM(
        MDMConfig(
            input_dim=int(m.get("input_dim", 99)),
            obj_input_dim=int(m.get("obj_input_dim", 9)),
            hand_shape_dim=int(m.get("hand_shape_dim", 10)),
            obj_embed_dim=int(m.get("obj_embed_dim", 768)),
            latent_dim=int(m.get("latent_dim", 256)),
            ff_size=int(m.get("ff_size", 1024)),
            num_layers=int(m.get("num_layers", 8)),
            num_heads=int(m.get("num_heads", 4)),
            dropout=float(m.get("dropout", 0.1)),
            activation=activation or str(m.get("activation", "gelu")),
            cond_mask_prob=float(m.get("cond_mask_prob", 0.0)),
            remat=bool(m.get("remat", False)),
            compute_dtype=str(m.get("compute_dtype", "float32")),
        )
    )


def evaluate_g(sampler, extra_fn, params, loader, clip, mesh, key, max_batches: int = 0):
    """val/test pass (reference launch/train.py:577-656): sample the model on
    held-out segments, then run the geometric extra loss ON THE SAMPLES and
    report the term breakdown (rec_joint/rec_vert/edge_len/dist_h/dist_o) plus
    the masked MSE vs GT. Batched scan sampling replaces the reference's
    per-batch 1000-step loop. `sampler`/`extra_fn` are pre-built jitted
    callables (one compile each). max_batches=0 evaluates the FULL split
    (reference parity); smoke configs cap it via train.eval_max_batches."""
    from ..parallel.mesh import replicate as _rep, shard_batch as _shard

    params_r = _rep(params, mesh)
    # jitted so it runs on the GLOBAL batch arrays: an eager masked_l2 would
    # mix the global `sample` with process-local device_put operands, which
    # multi-process jax rejects (and the jit's reduced output is replicated,
    # so every process can fetch it)
    mse_fn = jax.jit(lambda x, s, m: jnp.mean(D.masked_l2(x, s, m)))
    acc: dict[str, list] = {}
    n = 0
    for batch in loader:
        if max_batches and n >= max_batches:
            break
        batch = common.attach_text_emb(batch, clip)
        db = common.device_batch(batch)
        sb = _shard(db, mesh)
        key, k = jax.random.split(key)
        sample = sampler(params_r, sb, k)
        mse = mse_fn(sb["pose_repr"], sample, sb["mask"])
        acc.setdefault("sample_mse", []).append(float(jax.device_get(mse)))
        terms = extra_fn(sample, sb)
        for tk, tv in terms.items():
            a = jax.device_get(tv)
            if np.ndim(a) == 0:
                acc.setdefault(tk, []).append(float(a))
        n += 1
    return {k: float(np.mean(v)) for k, v in acc.items()}


def _scalars(metrics):
    out = {}
    for k, v in metrics.items():
        a = jax.device_get(v)
        if np.ndim(a) == 0:
            out[k] = float(a)
    return out


def main(argv=None):
    reg, run_dir = common.boot(
        PROG,
        [
            param.reg_base_param,
            param.reg_mano_param,
            param.reg_model_param,
            lambda r: param.reg_train_param(r, 400),
            param.reg_diffusion_param,
            param.reg_loss_param,
            param.reg_clip_param,
        ],
        argv,
    )
    train_cfg = reg.select("train")
    mesh = make_mesh(int(reg.select("runtime").get("device_count") or 0) or None)
    _logger.info("mesh: %s", mesh)

    # mano stack is needed both by the loss and the optional GT-geometry cache
    mano_path = reg.select("mano").get("mano_path") or None
    mano_stack = stack_mano_models(
        M.get_mano_model(mano_path, "right"), M.get_mano_model(mano_path, "left")
    )

    # data
    train_ds = common.build_dataset(reg, "train")
    try:
        tdc = reg.select("train.data")
    except KeyError:
        tdc = {}
    g_cache = None
    if bool(tdc.get("cache_gt_geom", False)):
        # wrap the base dataset so every epoch reuses the precomputed GT-side
        # signed chamfer (gt_o2h/gt_h2o) instead of recomputing it in-step —
        # ~23% of the G step's chamfer time at production shapes
        from ..data.collate import SegmentCollate
        from ..data.target_cache import GTGeomCache

        data_cfg = reg.select("data")
        g_cache = GTGeomCache(
            train_ds, mano_stack,
            SegmentCollate(
                max_nobj=int(data_cfg.get("max_nobj", 4)),
                n_obj_points=int(data_cfg.get("n_obj_points", 2048)),
            ),
            chunk=int(train_cfg.get("chunk", 2048)),
            cache_dir=tdc.get("gt_geom_cache_dir") or None,
        )
        train_ds = g_cache
    train_loader = common.build_loader(reg, train_ds, "train")
    if g_cache is not None:
        # disk caches split the precompute across hosts (cross-stripe misses
        # fall back lazily); in-memory dicts are host-private, so each host
        # must precompute the FULL range (same reasoning as train_r)
        if g_cache.cache_dir:
            g_cache.precompute(
                shard_index=jax.process_index(), num_shards=jax.process_count()
            )
        else:
            g_cache.precompute()
    clip = common.build_clip(reg)

    # model + diffusion
    model = build_model(reg)
    dcfg = reg.select("diffusion")
    sched = D.tamf_schedule(
        int(dcfg.get("steps", 1000)), str(dcfg.get("noise_schedule", "cosine")),
        str(dcfg.get("timestep_respacing", "")),
    )

    # loss assets (mano_stack built above, before the data pipeline)
    loss_yaml = train_cfg.get("loss", {})
    assets = LL.load_contact_assets(
        loss_yaml.get("vpe_path") or None, loss_yaml.get("c_weight_path") or None
    )
    extra_cfg = LL.ExtraLossConfig(
        coef_rec_joint=float(loss_yaml.get("coef_rec_joint_loss", 1.0)),
        coef_rec_vert=float(loss_yaml.get("coef_rec_vert_loss", 1.0)),
        coef_edge_len=float(loss_yaml.get("coef_edge_len_loss", 0.1)),
        coef_dist_h=float(loss_yaml.get("coef_dist_h_loss", 0.1)),
        coef_dist_o=float(loss_yaml.get("coef_dist_o_loss", 1.0)),
    )

    # init params from one batch
    first = common.attach_text_emb(next(iter(train_loader)), clip)
    dbatch = common.device_batch(first)
    cond = PT.g_cond_from_batch(dbatch)
    params = model.init(
        jax.random.PRNGKey(int(reg.select("runtime").get("seed", 0))),
        dbatch["pose_repr"], np.zeros((dbatch["pose_repr"].shape[0],), np.int32), cond,
    )

    # optimizer: epoch milestones -> step milestones
    steps_per_epoch = len(train_loader)
    milestones = [int(m) * steps_per_epoch for m in train_cfg.get("scheduler_milestone", [])]
    optimizer = PT.make_optimizer(
        base_lr=float(train_cfg.get("lr", 1e-4)),
        weight_decay=float(train_cfg.get("weight_decay", 0.0)),
        grad_clip=float(train_cfg.get("grad_clip", 0.1)),
        milestones_steps=milestones,
        gamma=float(train_cfg.get("scheduler_gamma", 0.5)),
    )
    state = PT.init_train_state(params, optimizer)
    if train_cfg.get("reload_ckpt_model_filepath"):
        state = load_checkpoint(train_cfg["reload_ckpt_model_filepath"], state, strict=False)
        _logger.info("reloaded ckpt from %s at step %d", train_cfg["reload_ckpt_model_filepath"], int(jax.device_get(state.step)))

    chunk = int(train_cfg.get("chunk", 2048))
    step_fn = PT.make_g_train_step(
        model, sched, optimizer, mano_stack, assets, extra_cfg,
        chunk=chunk, mesh=mesh,
        dist_impl=str(train_cfg.get("dist_impl", "auto")),
    )
    state = replicate(state, mesh)

    # schedule sampler: uniform (all TaMF configs) or host-side importance
    # resampling over timesteps (resample.py:119-147 counterpart)
    from ..core.schedule_sampler import create_named_schedule_sampler

    sampler_name = str(train_cfg.get("schedule_sampler", "uniform"))
    resampler = (
        create_named_schedule_sampler(sampler_name, sched.num_timesteps)
        if sampler_name != "uniform"
        else None
    )

    writer = MetricWriter(run_dir.sub("summary") if run_dir.commit else None,
                          enabled=run_dir.commit and is_coordinator())

    num_epoch = int(train_cfg.get("num_epoch", 400))
    record_freq = int(train_cfg.get("record_freq", 20))
    seed = int(reg.select("runtime").get("seed", 0))
    key = jax.random.PRNGKey(seed)

    # held-out loaders, built once (rank-0 only — reference loads val/test
    # datasets on rank 0 only, launch/train.py:352-384). A split is attempted
    # only when its source is configured; a configured-but-broken split RAISES
    # instead of silently disappearing from the eval logs.
    eval_loaders = {}
    eval_sampler = None
    eval_extra_fn = None
    if int(train_cfg.get("val_freq", 0) or 0):
        # shared construction (fail-loud configured splits, full-split
        # drop_last=False, every-process SPMD invariant): common.py
        eval_loaders = common.build_eval_loaders(reg)
        if eval_loaders:
            eval_sampler = PT.make_g_sampler(model, sched, mesh=mesh)
            # geometric extra loss on the SAMPLED output (ref train.py:613-649)
            eval_extra_fn = jax.jit(
                lambda sample, b: LL.interaction_segment_extra_loss(
                    mano_stack, assets, extra_cfg, sample, b, chunk=chunk
                )[1]
            )

    # optional device trace (runtime.profile_dir or TAMF_PROFILE_DIR)
    import os as _os

    profile_dir = reg.values.get("runtime.profile_dir") or _os.environ.get("TAMF_PROFILE_DIR")
    profile_span = (10, 20)

    from ..runtime.profiler import StepTimer

    timer = StepTimer()
    global_step = 0
    for epoch_id in range(num_epoch):
        train_loader.set_epoch(epoch_id)
        t_epoch = time.time()
        last_metrics = {}
        for batch in train_loader:
            batch = common.attach_text_emb(batch, clip)
            dbatch = common.device_batch(batch)
            key, k_step = jax.random.split(key)
            if resampler is not None:
                key, k_t = jax.random.split(key)
                t, w = resampler.sample(k_t, dbatch["pose_repr"].shape[0])
                dbatch = dict(dbatch, t=np.asarray(t), t_weights=np.asarray(w))
            sbatch = shard_batch(dbatch, mesh)
            if profile_dir and global_step == profile_span[0] and is_coordinator():
                jax.profiler.start_trace(profile_dir)
            state, metrics = step_fn(state, sbatch, k_step)
            global_step += 1
            timer.tick()
            if profile_dir and global_step == profile_span[1] and is_coordinator():
                jax.device_get(metrics["loss"])
                jax.profiler.stop_trace()
                _logger.info("profiler trace (steps %d-%d) -> %s", *profile_span, profile_dir)
            if resampler is not None:
                resampler.update_with_losses(
                    jax.device_get(metrics["per_sample_t"]),
                    jax.device_get(metrics["per_sample_mse"]),
                )
            if global_step % 50 == 0:
                last_metrics = _scalars(metrics)
                writer.add_scalars(last_metrics, global_step)
        if not last_metrics:
            last_metrics = _scalars(metrics)
        _logger.info(
            "train epoch %04d conclude | loss: %f | %.1fs | %.1f samples/s",
            epoch_id, last_metrics.get("loss", float("nan")), time.time() - t_epoch,
            timer.throughput(int(reg.select("train").get("batch_size", 64))),
        )

        if is_coordinator() and run_dir.commit and (
            epoch_id % record_freq == 0 or epoch_id == num_epoch - 1
        ):
            path = save_train_state(run_dir.sub("save"), epoch_id, jax.device_get(state))
            _logger.info("saved %s", path)

        val_freq = int(train_cfg.get("val_freq", 0) or 0)
        if val_freq and (
            # first/periodic/last epochs (ref launch/train.py:580-581).
            # Runs on EVERY process (global-mesh SPMD; the reference's rank-0
            # eval maps to gating the LOGGING, not the computation)
            epoch_id == 0 or (epoch_id + 1) % val_freq == 0 or epoch_id == num_epoch - 1
        ):
            for split, eval_loader in eval_loaders.items():
                key, k_eval = jax.random.split(key)
                terms = evaluate_g(
                    eval_sampler, eval_extra_fn, state.params, eval_loader, clip, mesh, k_eval,
                    max_batches=int(train_cfg.get("eval_max_batches", 0) or 0),
                )
                if not is_coordinator():
                    continue
                _logger.info(
                    "%s epoch %04d sample eval | %s", split, epoch_id,
                    " | ".join(f"{k}: {v:f}" for k, v in sorted(terms.items())),
                )
                for tk, tv in terms.items():
                    writer.add_scalar(f"{split}/{tk}", tv, global_step)

    writer.close()
    return state


if __name__ == "__main__":
    main()
