"""Shared launcher plumbing: config boot, dataset/loader construction, text
embedding attachment, device placement. (The glue the reference spreads across
launch/train*.py:308-500.)"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Any

import numpy as np

import jax

from ..data.collate import SegmentCollate
from ..data.loader import DataLoader
from ..data.segment import InteractionSegmentData
from ..data.synthetic import synthetic_batch
from ..models.clip_text import FrozenClipText
from ..runtime import logging as RL
from ..runtime.ckpt import RunDir
from ..runtime.config import ConfigRegistry, sync_global_timestamp

_logger = logging.getLogger(__name__)


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: first compiles are 20-40s on TPU;
    subsequent launcher runs reuse them."""
    cache_dir = os.environ.get("TAMF_COMPILE_CACHE", os.path.expanduser("~/.cache/tamf_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knob
        pass


def boot(prog: str, register_fns, argv=None) -> tuple[ConfigRegistry, RunDir]:
    """Parse config, set up run dir + logging. Returns (registry, run_dir)."""
    maybe_init_distributed()
    _enable_compile_cache()
    # after distributed init, before any ?(ts) expands: one stamp per RUN,
    # not per process (see runtime/config.sync_global_timestamp)
    sync_global_timestamp()

    reg = ConfigRegistry(prog)
    for fn in register_fns:
        fn(reg)
    parser = argparse.ArgumentParser(prog=prog)
    reg.hook(parser)
    reg.parse(parser, argv)

    RL.log_init()
    RL.enable_console()
    RL.suppress_noisy()
    # exact-command provenance (reference dev_fn/upkeep/opt.get_command)
    import sys as _sys

    _logger.info("cmd: %s", " ".join(_sys.argv))

    run_dir = RunDir(prog, exp_id=reg.select("exp_id"), commit=reg.values.get("commit", False))
    run_dir.setup()
    if run_dir.commit and jax.process_index() == 0:
        RL.enable_file(run_dir.log_file)
    run_dir.dump_opt(config={k: _plain(v) for k, v in reg.values.items()})
    _logger.info("prog=%s exp_id=%s commit=%s", prog, run_dir.exp_id, run_dir.commit)
    return reg, run_dir


def maybe_init_distributed() -> None:
    """Multi-host bring-up: `jax.distributed.initialize()` when the standard
    coordinator env vars are present (replaces the reference's
    dist.init_process_group over a hardcoded localhost rendezvous,
    util/ddp_util.py:16-21 — which limited it to one node; here any pod
    topology works through the same mesh code)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
            _logger.info(
                "jax.distributed initialized: process %d/%d",
                jax.process_index(), jax.process_count(),
            )
        except Exception as e:  # already initialized / single-host
            _logger.warning("jax.distributed.initialize failed: %s", e)


def _plain(v: Any):
    try:
        import yaml

        yaml.safe_dump(v)
        return v
    except Exception:
        return repr(v)


class SyntheticSegments:
    """Dataset-shaped wrapper over data/synthetic.py: fixed per-index samples
    in the exact per-sample dict contract, for no-asset smoke/e2e runs."""

    def __init__(self, size: int, seq_len: int = 160, max_nobj: int = 2, n_obj_points: int = 512, seed: int = 0):
        self.size = size
        self.seq_len = seq_len
        self.max_nobj = max_nobj
        self.n_obj_points = n_obj_points
        self.seed = seed

    def __len__(self):
        return self.size

    def __getitem__(self, index: int) -> dict[str, Any]:
        rng = np.random.default_rng(self.seed * 100003 + index)
        b = synthetic_batch(
            rng, batch_size=1, seq_len=self.seq_len, max_nobj=self.max_nobj,
            n_obj_points=self.n_obj_points, as_jax=False,
        )
        n_real = int(b["obj_mask"][0].sum())
        from ..data.adaptors import ACTION_LIST

        # simple box meshes per object so mesh-consuming paths (SIV) run
        h = 0.04
        box_verts = np.array(
            [[-h, -h, -h], [h, -h, -h], [h, h, -h], [-h, h, -h],
             [-h, -h, h], [h, -h, h], [h, h, h], [-h, h, h]], np.float32,
        )
        box_faces = np.array(
            [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
             [1, 2, 6], [1, 6, 5], [2, 3, 7], [2, 7, 6], [3, 0, 4], [3, 4, 7]],
            np.int32,
        )

        return {
            "info": (f"synthetic/seq_{index}", f"{ACTION_LIST[index % 70]}:{index:04d}", "rh"),
            "frame_id": list(range(int(b["len"][0]))),
            "len": int(b["len"][0]),
            "mask": b["mask"][0],
            "pose_repr": b["pose_repr"][0],
            "shape": b["shape"][0],
            "hand_side": "rh" if index % 2 == 0 else "lh",
            "text": f"synthetic task {index % 7}",
            "obj_list": [f"obj_{j:02d}" for j in range(n_real)],
            "obj_num": n_real,
            "obj_traj": b["obj_traj"][0][:n_real],
            "obj_embedding": b["obj_embedding"][0][:n_real],
            "obj_pointcloud": b["obj_points"][0][:n_real],
            "obj_verts": [box_verts.copy() for _ in range(n_real)],
            "obj_faces": [box_faces.copy() for _ in range(n_real)],
        }


def build_dataset(reg: ConfigRegistry, split: str):
    data_cfg = reg.select("data")
    split_cfg = reg.select(split)
    if data_cfg.get("synthetic"):
        return SyntheticSegments(
            size=int(data_cfg.get("synthetic_size", 64)),
            seq_len=int(data_cfg.get("synthetic_seq_len", 160)),
            max_nobj=min(int(data_cfg.get("max_nobj", 4)), 2),
            n_obj_points=min(int(data_cfg.get("n_obj_points", 2048)), 512),
        )
    kwargs: dict[str, Any] = dict(
        process_range_list=split_cfg.get("process_range") or [],
        data_prefix=data_cfg.get("data_prefix") or None,
        obj_embedding_prefix=data_cfg.get("obj_embedding_prefix") or None,
        obj_pointcloud_prefix=data_cfg.get("obj_pointcloud_prefix") or None,
        enable_obj_model=bool(data_cfg.get("enable_obj_model")),
        cache_dict_filepath=split_cfg.get("cache_dict_filepath") or None,
    )
    if split == "train":
        kwargs["append_reverse_segment"] = bool(data_cfg.get("append_reverse_segment"))
    return InteractionSegmentData(**kwargs)


def build_loader(reg: ConfigRegistry, dataset, split: str, *, shuffle=None, drop_last=None) -> DataLoader:
    data_cfg = reg.select("data")
    bs = reg.select(split).get("batch_size", 8)
    return DataLoader(
        dataset,
        batch_size=int(bs),
        collate_fn=SegmentCollate(
            max_nobj=int(data_cfg.get("max_nobj", 4)),
            n_obj_points=int(data_cfg.get("n_obj_points", 2048)),
        ),
        shuffle=(split == "train") if shuffle is None else shuffle,
        drop_last=(split == "train") if drop_last is None else drop_last,
        seed=int(reg.select("runtime").get("seed", 0)),
        num_workers=int(reg.select("runtime").get("num_worker", 2)),
    )


def build_eval_loaders(reg: ConfigRegistry, wrap=None) -> dict[str, DataLoader]:
    """val/test eval loaders, shared by the three trainers.

    Invariants held here ONCE (they drifted when each launcher had its own
    copy): built on EVERY process (eval is a global-mesh SPMD computation —
    each process feeds its loader stripe; coordinator-only construction
    deadlocks multi-process runs); unconfigured splits are skipped with a
    log line, but a CONFIGURED split that fails to build RAISES (a typo'd
    cache path silently vanishing from the eval logs is the failure mode);
    drop_last=False so eval_max_batches=0 really covers the FULL split
    (reference launch/train.py:577-656 evaluates every sample — the tail
    batch recompiles once for its shape, which parity is worth); an empty
    split logs WHY it produced no loader. `wrap` adapts the dataset (R's
    sample adaptors, the encoder's action adapter) before the loader."""
    loaders: dict[str, DataLoader] = {}
    data_cfg = reg.select("data")
    for split in ("val", "test"):
        split_cfg = reg.select(split)
        if not (
            data_cfg.get("synthetic")
            or split_cfg.get("cache_dict_filepath")
            or split_cfg.get("process_range")
        ):
            _logger.info("%s split not configured; skipping its eval", split)
            continue
        ds = build_dataset(reg, split)
        if wrap is not None:
            ds = wrap(split, ds)
        ld = build_loader(reg, ds, split, shuffle=False, drop_last=False)
        if len(ld):
            loaders[split] = ld
        else:
            _logger.warning("%s split is configured but EMPTY; no eval for it", split)
    return loaders


def resolve_shard(sample_cfg) -> tuple[int, int]:
    """(shard_index, num_shards) for the samplers: sample.num_shards /
    sample.shard_index override the jax process topology; out-of-range
    indices fail loudly (a clamped slice would silently drop segments)."""
    W = int(sample_cfg.get("num_shards", 0) or 0) or jax.process_count()
    w = sample_cfg.get("shard_index", None)
    w = jax.process_index() if w is None or int(w) < 0 else int(w)
    if not 0 <= w < W:
        raise ValueError(f"sample.shard_index {w} out of range for num_shards {W}")
    return w, W


def segment_infos(dataset) -> list[tuple]:
    """Per-index segment info tuples WITHOUT materializing samples: unwraps
    adaptor/cache `.base` chains down to the segment store's info_list
    (sample adaptors synthesize noise / attach .npy files per __getitem__ —
    a full-dataset info scan through them costs one device dispatch per
    sample). Falls back to fetching when no aligned store is found."""
    n = len(dataset)
    d = dataset
    for _ in range(8):
        info_l = getattr(d, "info_list", None)
        # the segment store (data/segment.py) carries info_list AND len_list;
        # adaptors' own info_list (sample provenance) lacks len_list
        if info_l is not None and hasattr(d, "len_list") and len(info_l) == n:
            return [tuple(i) for i in info_l]
        nxt = getattr(d, "base", None)
        if nxt is None or len(nxt) != n:
            break
        d = nxt
    return [tuple(dataset[i]["info"]) for i in range(n)]


def build_clip(reg: ConfigRegistry) -> FrozenClipText:
    try:
        clip_cfg = reg.select("clip")
    except KeyError:
        clip_cfg = {}
    return FrozenClipText(
        checkpoint_path=clip_cfg.get("checkpoint_path") or None,
        bpe_path=clip_cfg.get("bpe_path") or None,
    )


def attach_text_emb(batch: dict[str, Any], clip: FrozenClipText) -> dict[str, Any]:
    """Encode batch['text'] -> batch['text_emb'] (cached per prompt)."""
    if "text_emb" not in batch:
        batch = dict(batch)
        batch["text_emb"] = clip.encode_text(batch["text"]).astype(np.float32)
    return batch


DEVICE_BATCH_KEYS = (
    "pose_repr",
    "sample_pose_repr",
    "mask",
    "shape",
    "hand_side",
    "text_emb",
    "obj_traj",
    "obj_embedding",
    "obj_mask",
    "obj_points",
    "action_label_id",
    "target_h2o",
    "gt_o2h",
    "gt_h2o",
)


def device_batch(batch: dict[str, Any]) -> dict[str, Any]:
    """Select the array keys that go to device (the reference's
    map_copy_select_to idiom, dev_fn/transform/cast.py:76)."""
    return {k: batch[k] for k in DEVICE_BATCH_KEYS if k in batch}
