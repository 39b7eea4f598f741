"""Port trained REFERENCE torch checkpoints into this framework's flax params.

A user switching from OakInk2-TaMF brings `model_XXXX.pt` state dicts saved by
the reference launchers (util/state_util.save_state: DDP 'module.' prefix
stripped, 'clip_model.*' filtered). These converters map them onto our module
trees so evaluation/sampling continues from the same weights:

- `convert_g_state_dict`      InterationSegmentMDM  -> models/mdm_g params
- `convert_r_state_dict`      SegmentRefineModel    -> models/refine_r params
- `convert_encoder_state_dict` SegmentEncoder       -> models/encoder params

Layout rules:
- torch Linear [out, in] -> flax Dense kernel [in, out]
- nn.MultiheadAttention packed in_proj [3d, d] -> flax MHA per-head q/k/v
  kernels [d, heads, head_dim] (validated against torch in
  tests/test_trunk_parity.py)
- nn.Sequential indices -> our named submodules (input_merge.0/2 ->
  merge0/merge1, encoder head 0/2/4 -> fc0/1/2, time_embed 0/2 ->
  time_embed_0/1)
- non-trained buffers (hand-side embeds, classification_token, MANO data,
  grabnet weights) are NOT ported: they are deterministic constants rebuilt
  by our modules.
"""

from __future__ import annotations

import logging
from typing import Any, Mapping

import numpy as np

_logger = logging.getLogger(__name__)

# torch nn.TransformerEncoderLayer's default activation is F.gelu — the EXACT
# erf form. Our launchers default to the tanh approximation (43% cheaper on
# the v5e reverse chain, trunk.py:98-106), which drifts ~1e-3 per activation:
# fine for training from scratch, NOT fine for a ported checkpoint whose
# FID/CR parity is being claimed. Every `.pt` port path must run the net at
# this activation (tests/test_torch_port.py asserts the parity only holds
# under it).
PORT_ACTIVATION = "gelu_exact"


def activation_for_checkpoint(reg, filepath) -> str | None:
    """Activation override for a checkpoint path: PORT_ACTIVATION when it is
    a ported torch `.pt` (with port_activation's loud warning on config
    mismatch), None otherwise (build_* then uses the config activation).
    The single chokepoint for every port path — a hand-rolled `.endswith`
    check at a new call site is how the gelu_exact forcing gets missed."""
    if str(filepath or "").endswith(".pt"):
        return port_activation(reg)
    return None


def port_activation(reg) -> str:
    """Activation to build a net with when its params come from a ported torch
    checkpoint: always PORT_ACTIVATION, with a loud warning if the run config
    asked for something else."""
    cfg = str(reg.select("model").get("activation", "gelu"))
    if cfg != PORT_ACTIVATION:
        _logger.warning(
            "ported torch checkpoint: forcing activation=%s (config had %r) — "
            "the reference's F.gelu is the exact erf form; running ported "
            "weights under the tanh approximation corrupts parity",
            PORT_ACTIVATION, cfg,
        )
    return PORT_ACTIVATION


def _lin(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _ln(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _attn(sd: Mapping[str, np.ndarray], prefix: str, num_heads: int) -> dict:
    w_in = sd[f"{prefix}.in_proj_weight"]  # [3d, d]
    b_in = sd[f"{prefix}.in_proj_bias"]
    d = w_in.shape[1]
    head_dim = d // num_heads
    wq, wk, wv = np.split(w_in, 3, axis=0)
    bq, bk, bv = np.split(b_in, 3, axis=0)

    def qkv(w, b):
        return {
            "kernel": w.T.reshape(d, num_heads, head_dim),
            "bias": b.reshape(num_heads, head_dim),
        }

    return {
        "query": qkv(wq, bq),
        "key": qkv(wk, bk),
        "value": qkv(wv, bv),
        "out": {
            "kernel": sd[f"{prefix}.out_proj.weight"].T.reshape(num_heads, head_dim, d),
            "bias": sd[f"{prefix}.out_proj.bias"],
        },
    }


def _trunk(sd: Mapping[str, np.ndarray], prefix: str, num_layers: int, num_heads: int) -> dict:
    out = {}
    for i in range(num_layers):
        p = f"{prefix}.layers.{i}"
        out[f"layer_{i}"] = {
            "self_attn": _attn(sd, f"{p}.self_attn", num_heads),
            "linear1": _lin(sd, f"{p}.linear1"),
            "linear2": _lin(sd, f"{p}.linear2"),
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
        }
    return out


def _merge(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {"merge0": _lin(sd, f"{prefix}.0"), "merge1": _lin(sd, f"{prefix}.2")}


def _to_numpy(state_dict: Mapping[str, Any]) -> dict[str, np.ndarray]:
    out = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _common_cond(sd: Mapping[str, np.ndarray]) -> dict:
    return {
        "hand_shape_process": {"shape_embed": _lin(sd, "hand_shape_process.shape_embed")},
        "obj_embed_process": {"embedding": _lin(sd, "obj_embed_process.embedding")},
        "input_process": {"poseEmbedding": _lin(sd, "input_process.poseEmbedding")},
        "obj_input_process": {"poseEmbedding": _lin(sd, "obj_input_process.poseEmbedding")},
    }


def convert_g_state_dict(
    state_dict: Mapping[str, Any], num_layers: int = 8, num_heads: int = 4
) -> dict:
    """Reference InterationSegmentMDM state_dict -> {'params': ...} for
    models/mdm_g.InteractionSegmentMDM."""
    sd = _to_numpy(state_dict)
    params = _common_cond(sd)
    params.update(
        {
            "embed_timestep": {
                "time_embed_0": _lin(sd, "embed_timestep.time_embed.0"),
                "time_embed_1": _lin(sd, "embed_timestep.time_embed.2"),
            },
            "embed_text": _lin(sd, "embed_text"),
            "input_merge": _merge(sd, "input_merge"),
            "seqTransEncoder": _trunk(sd, "seqTransEncoder", num_layers, num_heads),
            "output_process": {"poseFinal": _lin(sd, "output_process.poseFinal")},
        }
    )
    return {"params": params}


def convert_r_state_dict(
    state_dict: Mapping[str, Any], num_layers: int = 8, num_heads: int = 4
) -> dict:
    """Reference SegmentRefineModel state_dict -> {'params': ...} for
    models/refine_r.SegmentRefineNet (MANO buffers are rebuilt, not ported)."""
    sd = _to_numpy(state_dict)
    params = _common_cond(sd)
    params.update(
        {
            "h2o_dist_input_process": {
                "poseEmbedding": _lin(sd, "h2o_dist_input_process.poseEmbedding")
            },
            "input_merge": _merge(sd, "input_merge"),
            "seqTransEncoder": _trunk(sd, "seqTransEncoder", num_layers, num_heads),
            "output_process": {"poseFinal": _lin(sd, "output_process.poseFinal")},
        }
    )
    return {"params": params}


def convert_encoder_state_dict(
    state_dict: Mapping[str, Any], num_layers: int = 2, num_heads: int = 4
) -> dict:
    """Reference SegmentEncoder state_dict -> variables for models/encoder
    (params + the zero classification_token buffer collection)."""
    sd = _to_numpy(state_dict)
    params = _common_cond(sd)
    params.update(
        {
            "input_merge": _merge(sd, "input_merge"),
            "seqTransEncoder": _trunk(sd, "seqTransEncoder", num_layers, num_heads),
            "output_process": {
                "fc0": _lin(sd, "output_process.poseFinal.0"),
                "fc1": _lin(sd, "output_process.poseFinal.2"),
                "fc2": _lin(sd, "output_process.poseFinal.4"),
            },
        }
    )
    return {
        "params": params,
        "buffers": {"classification_token": sd["classification_token"]},
    }


def load_reference_checkpoint(path: str, kind: str, **kwargs) -> dict:
    """Load a reference .pt file and convert. kind: 'g' | 'r' | 'encoder'."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if not isinstance(sd, dict):
        sd = sd.state_dict()
    sd = {k: v for k, v in sd.items() if not k.startswith("clip_model.")}
    conv = {"g": convert_g_state_dict, "r": convert_r_state_dict, "encoder": convert_encoder_state_dict}
    return conv[kind](sd, **kwargs)
