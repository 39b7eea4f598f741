"""Train the FID SegmentEncoder (reference launch/train_encoder.py workflow).

Data = ConcatDataset[Identity, GeneratedPoseRepr?, GaussianPerturb] wrapped in
ActionRecognitionAdapter (ref :351-358); during training the sampled
pose_repr replaces the GT input (ref :521-523). CE + accuracy loss.
"""

from __future__ import annotations

import logging
import time

import numpy as np
import jax

from ..models import losses as LL
from ..data.adaptors import (
    ActionRecognitionAdapter,
    ConcatDataset,
    GaussianPerturbSampleAdaptor,
    GeneratedPoseReprSampleAdaptor,
    IdentitySampleAdaptor,
)
from ..models.encoder import EncoderConfig, SegmentEncoder
from ..parallel import train as PT
from ..parallel.mesh import is_coordinator, make_mesh, replicate, shard_batch
from ..runtime.ckpt import load_checkpoint, save_train_state
from ..runtime.logging import MetricWriter
from . import common, param

_logger = logging.getLogger(__name__)

PROG = "train_encoder"


def build_encoder(reg, activation: str | None = None) -> SegmentEncoder:
    """`activation` overrides model.activation (forced to "gelu_exact" on the
    `.pt` checkpoint-port paths — see interop.torch_port.port_activation)."""
    m = reg.select("model")
    return SegmentEncoder(
        EncoderConfig(
            output_dim=int(m.get("output_dim", 70)),
            input_dim=int(m.get("input_dim", 99)),
            obj_input_dim=int(m.get("obj_input_dim", 9)),
            hand_shape_dim=int(m.get("hand_shape_dim", 10)),
            obj_embed_dim=int(m.get("obj_embed_dim", 768)),
            latent_dim=int(m.get("latent_dim", 64)),
            ff_size=int(m.get("ff_size", 128)),
            num_layers=int(m.get("num_layers", 2)),
            num_heads=int(m.get("num_heads", 4)),
            dropout=float(m.get("dropout", 0.1)),
            activation=activation or str(m.get("activation", "gelu")),
        )
    )


def main(argv=None):
    reg, run_dir = common.boot(
        PROG,
        [
            param.reg_base_param,
            param.reg_model_param,
            lambda r: param.reg_train_param(r, 400),
            param.reg_refine_sample_param,
        ],
        argv,
    )
    train_cfg = reg.select("train")
    mesh = make_mesh(int(reg.select("runtime").get("device_count") or 0) or None)

    base = common.build_dataset(reg, "train")
    try:
        sample_dirs = reg.select("train.data").get("pose_repr_sample_dir_list") or []
    except KeyError:
        sample_dirs = []
    parts = [IdentitySampleAdaptor(base)]
    if sample_dirs:
        parts.append(GeneratedPoseReprSampleAdaptor(base, sample_dirs))
    parts.append(GaussianPerturbSampleAdaptor(base, (0.02, 0.1), seed=0))
    dataset = ActionRecognitionAdapter(ConcatDataset(parts))
    loader = common.build_loader(reg, dataset, "train")

    model = build_encoder(reg)
    first = next(iter(loader))
    dbatch = common.device_batch(first)
    cond = {k: dbatch[k] for k in ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
    params = model.init(jax.random.PRNGKey(0), dbatch["pose_repr"], cond)

    steps_per_epoch = len(loader)
    milestones = [int(m) * steps_per_epoch for m in train_cfg.get("scheduler_milestone", [80, 160, 240, 320])]
    optimizer = PT.make_optimizer(
        base_lr=float(train_cfg.get("lr", 1e-4)),
        grad_clip=float(train_cfg.get("grad_clip", 0.1)),
        milestones_steps=milestones,
        gamma=float(train_cfg.get("scheduler_gamma", 0.5)),
    )
    state = PT.init_train_state(params, optimizer)
    if train_cfg.get("reload_ckpt_model_filepath"):
        state = load_checkpoint(train_cfg["reload_ckpt_model_filepath"], state, strict=False)

    step_fn = PT.make_encoder_train_step(model, optimizer, mesh=mesh)
    state = replicate(state, mesh)

    writer = MetricWriter(run_dir.sub("summary") if run_dir.commit else None,
                          enabled=run_dir.commit and is_coordinator())

    num_epoch = int(train_cfg.get("num_epoch", 400))
    record_freq = int(train_cfg.get("record_freq", 20))
    key = jax.random.PRNGKey(0)
    eval_fn = None  # built lazily on the first val pass (one compile)
    # eval loaders built ONCE via the shared helper (fail-loud configured
    # splits, full-split drop_last=False, every-process SPMD invariant)
    eval_loaders = {}
    if int(train_cfg.get("val_freq", 0) or 0):
        eval_loaders = common.build_eval_loaders(
            reg, wrap=lambda _s, ds: ActionRecognitionAdapter(IdentitySampleAdaptor(ds))
        )
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
            "train epoch %04d | ce %.4f acc %.3f | %.1fs",
            epoch_id,
            float(jax.device_get(metrics["ce"])),
            float(jax.device_get(metrics["acc"])),
            time.time() - t0,
        )
        if is_coordinator() and run_dir.commit and (
            epoch_id % record_freq == 0 or epoch_id == num_epoch - 1
        ):
            save_train_state(run_dir.sub("save"), epoch_id, jax.device_get(state))

        # val/test CE+acc on the GT (identity) view — reference
        # train_encoder.py:580-640 evaluates the FULL held-out split;
        # train.eval_max_batches (0 = full) caps it for smoke configs
        val_freq = int(train_cfg.get("val_freq", 0) or 0)
        if val_freq and (
            epoch_id == 0 or (epoch_id + 1) % val_freq == 0 or epoch_id == num_epoch - 1
        ):
            if eval_fn is None:
                eval_fn = jax.jit(
                    lambda p, x, c, lab: LL.segment_encoder_loss(
                        model.apply(p, x, c, deterministic=True), lab
                    )[1]
                )
            emax = int(train_cfg.get("eval_max_batches", 0) or 0)
            for split, eval_loader in eval_loaders.items():
                accum: dict[str, list] = {}
                for bi, b in enumerate(eval_loader):
                    if emax and bi >= emax:
                        break
                    db = shard_batch(common.device_batch(b), mesh)
                    c = {k: db[k] for k in ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
                    m = eval_fn(state.params, db["pose_repr"], c, db["action_label_id"])
                    for mk, mv in m.items():
                        accum.setdefault(mk, []).append(float(jax.device_get(mv)))
                if accum and is_coordinator():
                    means = {mk: float(np.mean(mv)) for mk, mv in accum.items()}
                    _logger.info(
                        "%s epoch %04d | ce %.4f acc %.3f", split, epoch_id,
                        means.get("ce", float("nan")), means.get("acc", float("nan")),
                    )
                    for mk, mv in means.items():
                        writer.add_scalar(f"{split}/{mk}", mv, global_step)

    writer.close()
    return state


if __name__ == "__main__":
    main()
