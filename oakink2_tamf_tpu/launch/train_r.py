"""Train MF-MDM R, the refiner (reference launch/train_refine.py workflow).

Training data = ConcatDataset[GeneratedPoseReprSampleAdaptor(G sample dirs),
GaussianPerturbSampleAdaptor(sigma in [0.02, 0.1])] (ref :367-373,
config/refine_sample_param.yml). One deterministic forward per step; the
forward internally runs 3x MANO recovery + 3x signed h2o chamfer (the hot
path) — all vmapped on device here.
"""

from __future__ import annotations

import logging
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..core import mano as M
from ..data.adaptors import ConcatDataset, GaussianPerturbSampleAdaptor, GeneratedPoseReprSampleAdaptor
from ..models import losses as LL
from ..models.refine_r import RefineConfig, SegmentRefineNet, stack_mano_models
from ..parallel import train as PT
from ..parallel.mesh import is_coordinator, make_mesh, replicate, shard_batch
from ..runtime.ckpt import load_checkpoint, save_train_state
from ..runtime.logging import MetricWriter
from . import common, param

_logger = logging.getLogger(__name__)

PROG = "train_r"


def build_refine_net(reg, activation: str | None = None) -> SegmentRefineNet:
    """`activation` overrides model.activation (forced to "gelu_exact" on the
    `.pt` checkpoint-port paths — see interop.torch_port.port_activation)."""
    m = reg.select("model")
    return SegmentRefineNet(
        RefineConfig(
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
            remat=bool(m.get("remat", False)),
            compute_dtype=str(m.get("compute_dtype", "float32")),
        )
    )


def _train_data_cfg(reg) -> dict:
    try:
        return reg.select("train.data")
    except KeyError:
        return {}


def build_r_train_dataset(reg, mano_stack=None):
    """-> (dataset, target_h2o_cache-or-None). With mano_stack given and
    train.data.cache_target_h2o on, the BASE dataset is wrapped so both
    adaptor views share one precomputed GT-h2o cache."""
    from ..data.collate import SegmentCollate
    from ..data.target_cache import TargetH2OCache

    base = common.build_dataset(reg, "train")
    tdc = _train_data_cfg(reg)
    sample_dirs = tdc.get("pose_repr_sample_dir_list") or []
    sigma_range = tdc.get("gaussian_perturb_range") or [0.02, 0.1]

    cache = None
    if mano_stack is not None and bool(tdc.get("cache_target_h2o", True)):
        data_cfg = reg.select("data")
        collate = SegmentCollate(
            max_nobj=int(data_cfg.get("max_nobj", 4)),
            n_obj_points=int(data_cfg.get("n_obj_points", 2048)),
        )
        cache = TargetH2OCache(
            base, mano_stack, collate,
            chunk=int(reg.select("train").get("chunk", 2048)),
            cache_dir=tdc.get("target_h2o_cache_dir") or None,
        )
        base = cache

    parts = []
    if sample_dirs:
        parts.append(GeneratedPoseReprSampleAdaptor(base, sample_dirs))
    parts.append(
        GaussianPerturbSampleAdaptor(base, sigma_range, seed=int(reg.select("runtime").get("seed", 0)))
    )
    ds = ConcatDataset(parts) if len(parts) > 1 else parts[0]
    return ds, cache


def main(argv=None):
    reg, run_dir = common.boot(
        PROG,
        [
            param.reg_base_param,
            param.reg_mano_param,
            param.reg_model_param,
            lambda r: param.reg_train_param(r, 400),
            param.reg_loss_param,
            param.reg_refine_sample_param,
        ],
        argv,
    )
    train_cfg = reg.select("train")
    mesh = make_mesh(int(reg.select("runtime").get("device_count") or 0) or None)
    chunk = int(train_cfg.get("chunk", 2048))
    h2o_backend = str(train_cfg.get("h2o_backend", "auto"))

    net = build_refine_net(reg)
    mano_path = reg.select("mano").get("mano_path") or None
    mano_stack = stack_mano_models(
        M.get_mano_model(mano_path, "right"), M.get_mano_model(mano_path, "left")
    )

    dataset, t_cache = build_r_train_dataset(reg, mano_stack)
    loader = common.build_loader(reg, dataset, "train")
    if t_cache is not None:
        # shared-dir runs split the precompute work across hosts (cross-stripe
        # misses fall back to the lazy per-sample path). In-MEMORY mode each
        # host's dict is private, and the shuffled loader stride needs samples
        # from ALL stripes — a striped precompute would leave ~(W-1)/W of the
        # epoch recomputing per-sample inside loader threads, negating the
        # cache. So without a cache_dir every host precomputes the full range.
        if t_cache.cache_dir:
            t_cache.precompute(
                shard_index=jax.process_index(), num_shards=jax.process_count()
            )
        else:
            if jax.process_count() > 1:
                _logger.warning(
                    "target_h2o cache is in-memory on %d hosts: each host "
                    "precomputes ALL %d segments. Point "
                    "train.data.target_h2o_cache_dir at a shared dir to split "
                    "the work.",
                    jax.process_count(), len(dataset),
                )
            t_cache.precompute()
    loss_yaml = train_cfg.get("loss", {})
    assets = LL.load_contact_assets(
        loss_yaml.get("vpe_path") or None, loss_yaml.get("c_weight_path") or None
    )
    loss_cfg = LL.RefineLossConfig(
        coef_rec_joint=float(loss_yaml.get("coef_rec_joint_loss", 1.0)),
        coef_rec_vert=float(loss_yaml.get("coef_rec_vert_loss", 1.0)),
        coef_dist_h=float(loss_yaml.get("coef_dist_h_loss", 0.1)),
    )

    first = next(iter(loader))
    dbatch = common.device_batch(first)
    cond = {k: dbatch[k] for k in ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
    h2o0 = np.zeros(dbatch["sample_pose_repr"].shape[:2] + (778,), np.float32)
    params = net.init(
        jax.random.PRNGKey(int(reg.select("runtime").get("seed", 0))),
        dbatch["sample_pose_repr"], h2o0, cond,
    )

    steps_per_epoch = len(loader)
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

    step_fn = PT.make_r_train_step(
        net, optimizer, mano_stack, assets, loss_cfg, chunk=chunk, mesh=mesh,
        h2o_backend=h2o_backend,
    )
    state = replicate(state, mesh)

    writer = MetricWriter(run_dir.sub("summary") if run_dir.commit else None,
                          enabled=run_dir.commit and is_coordinator())

    # single jitted val forward (reused across epochs -> one compile)
    eval_fn = jax.jit(
        lambda p, b: LL.segment_refine_loss(
            assets, loss_cfg,
            refine_forward_eval(net, p, mano_stack, b, h2o_backend=h2o_backend),
            b,
        )
    )

    # live cluster-exactness certificate (round-3 verdict #2): the h2o pass
    # auto-routes to the cluster-pruned kernel on TPU at P >= 4096 with a
    # candidate budget tuned on grasp scenes (ops/chamfer_cluster.py:82-101);
    # a training distribution that drifts outside that regime would silently
    # OVERESTIMATE h2o. One val batch per eval pass re-runs the (cheap,
    # stage-1-only) selection and warns above zero.
    ovf_fn = jax.jit(
        lambda b: make_overflow_probe(mano_stack, chunk=chunk, backend=h2o_backend)(b)
    )

    num_epoch = int(train_cfg.get("num_epoch", 400))
    record_freq = int(train_cfg.get("record_freq", 20))
    key = jax.random.PRNGKey(int(reg.select("runtime").get("seed", 0)))

    # eval loaders built ONCE via the shared helper (fail-loud configured
    # splits, full-split drop_last=False, every-process SPMD invariant)
    def _wrap_refine(split, base):
        try:
            dirs = reg.select(f"{split}.data").get("pose_repr_sample_dir_list") or []
        except KeyError:
            dirs = []
        if dirs:
            return GeneratedPoseReprSampleAdaptor(base, dirs)
        return GaussianPerturbSampleAdaptor(base, (0.02, 0.1), seed=1)

    eval_loaders = {}
    if int(train_cfg.get("val_freq", 0) or 0):
        eval_loaders = common.build_eval_loaders(reg, wrap=_wrap_refine)

    global_step = 0
    for epoch_id in range(num_epoch):
        loader.set_epoch(epoch_id)
        t0 = time.time()
        for batch in loader:
            sbatch = shard_batch(common.device_batch(batch), mesh)
            key, k = jax.random.split(key)
            state, metrics = step_fn(state, sbatch, k)
            global_step += 1
            if global_step % 50 == 0:
                writer.add_scalars({k_: float(jax.device_get(v)) for k_, v in metrics.items()}, global_step)
        _logger.info(
            "train epoch %04d conclude | loss: %f | %.1fs",
            epoch_id, float(jax.device_get(metrics["loss"])), time.time() - t0,
        )
        if is_coordinator() and run_dir.commit and (
            epoch_id % record_freq == 0 or epoch_id == num_epoch - 1
        ):
            save_train_state(run_dir.sub("save"), epoch_id, jax.device_get(state))

        # val/test deterministic forward + loss (train_refine.py val passes).
        # Runs on EVERY process: the eval_fn is a global-mesh SPMD program
        # (coordinator-only execution deadlocks multi-process runs at the
        # first collective); only the logging below is coordinator-gated.
        val_freq = int(train_cfg.get("val_freq", 0) or 0)
        if val_freq and (
            # first/periodic/last epochs (ref launch/train.py:580-581)
            epoch_id == 0 or (epoch_id + 1) % val_freq == 0 or epoch_id == num_epoch - 1
        ):
            for split, eval_loader in eval_loaders.items():
                losses = []
                emax = int(train_cfg.get("eval_max_batches", 0) or 0)
                for bi, b in enumerate(eval_loader):
                    if emax and bi >= emax:
                        break
                    sb = shard_batch(common.device_batch(b), mesh)
                    loss, _ = eval_fn(state.params, sb)
                    losses.append(float(jax.device_get(loss)))
                    if bi == 0:
                        report_cluster_overflow(
                            ovf_fn, sb, split, epoch_id,
                            writer if is_coordinator() else None,
                            global_step,
                        )
                if losses and is_coordinator():
                    _logger.info("%s epoch %04d refine loss: %f", split, epoch_id, np.mean(losses))
                    writer.add_scalar(f"{split}/loss", float(np.mean(losses)), global_step)

    writer.close()
    return state


def refine_forward_eval(net, params, mano_stack, batch, h2o_backend="auto"):
    from ..models.refine_r import refine_forward

    return refine_forward(
        net, params, mano_stack, batch, deterministic=True,
        h2o_backend=h2o_backend, loss_frame_mask=batch["mask"],
    )


def make_overflow_probe(mano_stack, *, chunk: int = 2048, backend: str = "auto"):
    """Batch -> total cluster-overflow count (scalar i32) for the exact h2o
    operands the refine pass searches (the SAMPLE hand — R's live input
    distribution). Zero PROVES the auto-routed cluster distances were exact;
    trivially zero off the cluster route. `backend="cluster"` forces the
    certificate on CPU (tests)."""
    from ..models.refine_r import batch_recover_mano, multi_object_h2o_overflow

    x_perm = M.hand_template_perm(mano_stack)

    def probe(b):
        verts, _, _ = batch_recover_mano(
            mano_stack, b["sample_pose_repr"], b["shape"], b["hand_side"]
        )
        ovf = multi_object_h2o_overflow(
            verts, b["obj_traj"], b["obj_points"], b["obj_mask"],
            chunk=chunk, x_perm=x_perm, backend=backend,
        )
        return jnp.sum(ovf)

    return probe


def report_cluster_overflow(ovf_fn, sbatch, split, epoch_id, writer, step) -> int:
    """Run the overflow probe on one val batch; INFO at zero, WARNING above
    (h2o distances were overestimated — retune k_cells or force
    backend='exact'). Returns the count."""
    count = int(jax.device_get(ovf_fn(sbatch)))
    if count > 0:
        _logger.warning(
            "%s epoch %04d: cluster NN overflow on val batch — %d x-tiles "
            "exceeded the candidate budget; h2o distances in this regime are "
            "OVERESTIMATED. Retune ops/chamfer_cluster k_cells or route "
            "backend='exact'.",
            split, epoch_id, count,
        )
    else:
        _logger.info(
            "%s epoch %04d: cluster-exactness certificate ok (0 overflow)",
            split, epoch_id,
        )
    if writer is not None:
        writer.add_scalar(f"{split}/h2o_cluster_overflow", float(count), step)
    return count


if __name__ == "__main__":
    main()
