"""Run-dir + checkpoint upkeep.

Directory contract matches the reference (dev_fn/upkeep/ckpt.py:62-149):
  common/<prog>/<exp_id>/{log.txt, opt.yml, summary/, save/, sample/}
with `?(ts)`-stamped exp_ids, opt.yml rotation up to .99, and a `commit`
dry-run flag: nothing is written unless --commit is passed.

Checkpoints: orbax-style pytree save of {params, opt_state, step} — unlike the
reference, the step counter IS saved (the reference loses it and restarts the
LR schedule on resume; SURVEY §5 'Checkpoint / resume'). Load supports partial
restore (strict=False semantics: missing/extra keys tolerated and reported).
"""

from __future__ import annotations

import logging
import os
import pickle
import shutil
import time
from typing import Any, Optional

import jax
import numpy as np

from . import config as _config
from .config import substitute

_logger = logging.getLogger(__name__)


def default_exp_id(prog: str) -> str:
    # read via the module: sync_global_timestamp() rebinds the value after
    # jax.distributed init (a from-import here would pin the pre-sync stamp)
    return f"{prog}__" + time.strftime(
        "%Y_%m%d_%H%M_%S", time.localtime(_config.GLOBAL_TIMESTAMP)
    )


def ckpt_path_for(prog: str, exp_id: str, root: str = ".") -> str:
    """Absolute `<root>/common/<prog>/<exp_id>` (the reference anchors at the
    process CWD, upkeep/ckpt.py:67-76)."""
    return os.path.abspath(os.path.join(root, "common", prog, exp_id))


def rotate_file(path: str, limit: int = 100) -> None:
    """Shift path -> path.00, path.00 -> path.01, ... up to .99 (drop oldest).
    (dev_fn/upkeep/rotate_file.py semantics.)"""
    if not os.path.exists(path):
        return
    slots = [f"{path}.{i:02d}" for i in range(limit)]
    if os.path.exists(slots[-1]):
        os.remove(slots[-1])
    for i in range(limit - 2, -1, -1):
        if os.path.exists(slots[i]):
            shutil.move(slots[i], slots[i + 1])
    shutil.move(path, slots[0])


class RunDir:
    """A run directory with dry-run gating."""

    def __init__(self, prog: str, exp_id: Optional[str] = None, commit: bool = False, root: str = "."):
        self.prog = prog
        self.exp_id = substitute(exp_id, prog) if exp_id else default_exp_id(prog)
        self.commit = commit
        self.path = ckpt_path_for(prog, self.exp_id, root)

    def setup(self) -> None:
        if self.commit:
            os.makedirs(self.path, exist_ok=True)
            _logger.info("commit mode: setup ckpt at %s", self.path)
        else:
            _logger.info("dry run mode")

    def sub(self, name: str) -> str:
        p = os.path.join(self.path, name)
        if self.commit:
            os.makedirs(p, exist_ok=True)
        return p

    @property
    def log_file(self) -> str:
        return os.path.join(self.path, "log.txt")

    def dump_opt(self, **cfg: Any) -> None:
        """Full config provenance -> opt.yml with rotation (upkeep/ckpt.py:142-149)."""
        if not self.commit:
            return
        import yaml

        opt_file = os.path.join(self.path, "opt.yml")
        rotate_file(opt_file)
        with open(opt_file, "w") as f:
            yaml.dump(cfg, f, sort_keys=False)


# ---------------------------------------------------------------------------
# Checkpoint save/load
# ---------------------------------------------------------------------------


def _to_host(tree):
    return jax.tree.map(lambda a: np.asarray(jax.device_get(a)), tree)


def save_checkpoint(
    path: str,
    state: Any,
    *,
    filter_out: tuple[str, ...] = (),
) -> None:
    """Save a pytree checkpoint. `filter_out` drops param subtrees by top-level
    path substring (the reference strips `clip_model.*`, util/state_util.py:23-39)."""
    flat = _flatten_dict(_to_host(jax.tree.map(lambda x: x, state)))
    if filter_out:
        flat = {k: v for k, v in flat.items() if not any(s in k for s in filter_out)}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(flat, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str, target: Any = None, strict: bool = False) -> Any:
    """Load a checkpoint. With a `target` pytree, restore into its structure,
    tolerating missing/extra keys when strict=False (reference
    load_state_dict(strict=False), launch/train.py:449-455)."""
    with open(path, "rb") as f:
        flat = pickle.load(f)
    if target is None:
        return _unflatten_dict(flat)
    t_flat = _flatten_dict(_to_host(target))
    missing = [k for k in t_flat if k not in flat]
    unexpected = [k for k in flat if k not in t_flat]
    if strict and (missing or unexpected):
        raise KeyError(f"strict load failed: missing={missing}, unexpected={unexpected}")
    if missing:
        _logger.info("checkpoint missing keys (kept init): %s", missing[:8])
    if unexpected:
        _logger.info("checkpoint unexpected keys (ignored): %s", unexpected[:8])
    # graft restored leaves back in the target's exact leaf order (path-keyed,
    # so node types — NamedTuples, dataclasses — and orderings are preserved)
    merged = {k: flat.get(k, v) for k, v in t_flat.items()}
    _, treedef = jax.tree.flatten(target)
    leaves_new = [merged[k] for k in t_flat]  # t_flat insertion order == leaf order
    return jax.tree.unflatten(treedef, leaves_new)


def _flatten_dict(tree, prefix: str = "") -> dict[str, Any]:
    out: dict[str, Any] = {}
    leaves_with_path = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_path:
        key = "/".join(_path_str(p) for p in path)
        out[key] = leaf
    return out


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    if hasattr(p, "name"):
        return str(p.name)
    return str(p)


def _unflatten_dict(flat: dict[str, Any]):
    """Best-effort nested-dict reconstruction (used without a target)."""
    out: dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split("/")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


def save_train_state(
    save_dir: str, step_or_epoch: int, state, prefix: str = "model", backend: str = "pickle"
) -> str:
    """<save_dir>/<prefix>_{epoch:04d}.ckpt (reference: save/model_{epoch:04d}.pt).
    backend="orbax" writes an orbax PyTree checkpoint directory instead."""
    if backend == "orbax":
        path = os.path.join(save_dir, f"{prefix}_{step_or_epoch:04d}.orbax")
        save_checkpoint_orbax(path, state)
        return path
    path = os.path.join(save_dir, f"{prefix}_{step_or_epoch:04d}.ckpt")
    save_checkpoint(path, state)
    return path


# ---------------------------------------------------------------------------
# Orbax backend (ecosystem-standard: async-capable, sharded-array aware)
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(path: str, state: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if os.path.exists(path):
        shutil.rmtree(path)
    ocp.PyTreeCheckpointer().save(path, _to_host(state))


def load_checkpoint_orbax(path: str, target: Any = None) -> Any:
    import orbax.checkpoint as ocp

    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    if target is None:
        return restored
    # graft restored leaves onto the target's pytree node types
    t_flat = _flatten_dict(_to_host(target))
    r_flat = _flatten_dict(restored)
    merged = {k: r_flat.get(k, v) for k, v in t_flat.items()}
    _, treedef = jax.tree.flatten(target)
    return jax.tree.unflatten(treedef, [merged[k] for k in t_flat])
