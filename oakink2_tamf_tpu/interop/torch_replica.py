"""Torch replicas of the reference network math, with the reference's exact
state_dict key names.

The reference modules themselves (src/oakink2_tamf/model/*.py) import CLIP and
manotorch, which aren't installable here — these replicas reproduce ONLY the
forward math and parameter naming so that a real reference checkpoint can be
(a) loaded into torch and executed, and (b) converted through
`interop.torch_port` into the flax models, then the two compared numerically.
Used by tests/test_torch_port.py, tests/test_clip_parity.py, and
scripts/verify_parity.py.

Reference sources:
- G:       model/interaction_segment_mdm.py:134-174 (forward), :34-117 (init)
- R:       model/segment_refine_model.py:71-97 (init), :170-216 (forward)
- encoder: model/segment_encoder.py:17-70 (3 cond tokens + trailing zero cls
           buffer, cls latent -> 3-layer MLP head over 70 actions)
- CLIP:    OpenAI CLIP text tower key names (token_embedding,
           positional_embedding, transformer.resblocks.N.*, ln_final,
           text_projection), quick-gelu MLP.

This module requires torch at import time; it is never imported by the
package's compute paths (jax-only) — only by tests and the parity harness.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import torch
import torch.nn as tnn


def pe_table(d: int, max_len: int = 5000) -> torch.Tensor:
    """The sinusoidal PE buffer (reference mdm.py PositionalEncoding)."""
    pe = np.zeros((max_len, d), np.float32)
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float32) * (-np.log(10000.0) / d))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return torch.from_numpy(pe)


class TorchRefG(tnn.Module):
    """Reference InterationSegmentMDM math (mdm.py:134-174), batch-first,
    text_emb injected directly (CLIP runs outside), same state_dict keys."""

    def __init__(self, d: int = 512, heads: int = 4, ff: int = 1024, layers: int = 8):
        super().__init__()
        self.d = d
        self.hand_shape_process = tnn.Module()
        self.hand_shape_process.shape_embed = tnn.Linear(10, d)
        self.obj_embed_process = tnn.Module()
        self.obj_embed_process.embedding = tnn.Linear(768, d)
        self.input_process = tnn.Module()
        self.input_process.poseEmbedding = tnn.Linear(99, d)
        self.obj_input_process = tnn.Module()
        self.obj_input_process.poseEmbedding = tnn.Linear(9, d)
        self.input_merge = tnn.Sequential(tnn.Linear(2 * d, d), tnn.SiLU(), tnn.Linear(d, d))
        self.embed_timestep = tnn.Module()
        self.embed_timestep.time_embed = tnn.Sequential(
            tnn.Linear(d, d), tnn.SiLU(), tnn.Linear(d, d)
        )
        self.embed_text = tnn.Linear(512, d)
        layer = tnn.TransformerEncoderLayer(
            d_model=d, nhead=heads, dim_feedforward=ff, dropout=0.0,
            activation="gelu", batch_first=True,
        )
        self.seqTransEncoder = tnn.TransformerEncoder(layer, num_layers=layers)
        self.output_process = tnn.Module()
        self.output_process.poseFinal = tnn.Linear(d, 99)
        self.register_buffer("pe", pe_table(d))

    def forward(self, x, t, text_emb, hand_side, shape, obj_traj, obj_embedding):
        d = self.d
        emb_t = self.embed_timestep.time_embed(self.pe[t])  # [bs, d]
        emb_text = self.embed_text(text_emb)
        e0 = torch.zeros(d)
        e0[0] = 1.0
        emb_hs = hand_side.float()[:, None] * e0[None]
        emb_shape = self.hand_shape_process.shape_embed(shape.mean(dim=1))
        emb_obj = self.obj_embed_process.embedding(obj_embedding.mean(dim=1))
        emb = torch.stack([emb_t, emb_text, emb_hs, emb_shape, emb_obj], dim=1)

        hand = self.input_process.poseEmbedding(x)  # [bs, L, d]
        obj = self.obj_input_process.poseEmbedding(obj_traj).mean(dim=1)  # [bs, L, d]
        merged = self.input_merge(torch.cat([hand, obj], dim=-1))

        seq = torch.cat([emb, merged], dim=1)
        seq = seq + self.pe[: seq.shape[1]][None]
        out = self.seqTransEncoder(seq)[:, 5:]
        return self.output_process.poseFinal(out)


class TorchRefR(tnn.Module):
    """Reference SegmentRefineModel NETWORK math (segment_refine_model.py:
    71-97, 170-216): 3 cond tokens (no text/timestep), 3-stream input merge
    with the h2o feature, residual output — same state_dict key names."""

    def __init__(self, d: int = 512, heads: int = 4, ff: int = 1024, layers: int = 8):
        super().__init__()
        self.d = d
        self.hand_shape_process = tnn.Module()
        self.hand_shape_process.shape_embed = tnn.Linear(10, d)
        self.obj_embed_process = tnn.Module()
        self.obj_embed_process.embedding = tnn.Linear(768, d)
        self.input_process = tnn.Module()
        self.input_process.poseEmbedding = tnn.Linear(99, d)
        self.obj_input_process = tnn.Module()
        self.obj_input_process.poseEmbedding = tnn.Linear(9, d)
        self.h2o_dist_input_process = tnn.Module()
        self.h2o_dist_input_process.poseEmbedding = tnn.Linear(778, d)
        self.input_merge = tnn.Sequential(tnn.Linear(3 * d, d), tnn.SiLU(), tnn.Linear(d, d))
        layer = tnn.TransformerEncoderLayer(
            d_model=d, nhead=heads, dim_feedforward=ff, dropout=0.0,
            activation="gelu", batch_first=True,
        )
        self.seqTransEncoder = tnn.TransformerEncoder(layer, num_layers=layers)
        self.output_process = tnn.Module()
        self.output_process.poseFinal = tnn.Linear(d, 99)
        self.register_buffer("pe", pe_table(d))

    def forward(self, x_in, h2o, hand_side, shape, obj_traj, obj_embedding):
        d = self.d
        e0 = torch.zeros(d)
        e0[0] = 1.0
        emb_hs = hand_side.float()[:, None] * e0[None]
        emb_shape = self.hand_shape_process.shape_embed(shape.mean(dim=1))
        emb_obj = self.obj_embed_process.embedding(obj_embedding.mean(dim=1))
        emb = torch.stack([emb_hs, emb_shape, emb_obj], dim=1)  # [bs, 3, d]

        hand = self.input_process.poseEmbedding(x_in)
        obj = self.obj_input_process.poseEmbedding(obj_traj).mean(dim=1)
        h2o_e = self.h2o_dist_input_process.poseEmbedding(h2o)
        merged = self.input_merge(torch.cat([hand, obj, h2o_e], dim=-1))

        seq = torch.cat([emb, merged], dim=1)
        seq = seq + self.pe[: seq.shape[1]][None]
        out = self.seqTransEncoder(seq)[:, 3:]
        return x_in + self.output_process.poseFinal(out)  # residual (ref :216)


class TorchRefEncoder(tnn.Module):
    """Reference SegmentEncodeModel math (segment_encoder.py:17-70): 3 cond
    tokens + L motion frames + trailing zero cls buffer; cls latent is the FID
    encoding, a Linear/SiLU/Linear/SiLU/Linear head gives 70-action logits."""

    def __init__(self, d: int = 64, heads: int = 4, ff: int = 128,
                 layers: int = 2, out_dim: int = 70):
        super().__init__()
        self.d = d
        self.hand_shape_process = tnn.Module()
        self.hand_shape_process.shape_embed = tnn.Linear(10, d)
        self.obj_embed_process = tnn.Module()
        self.obj_embed_process.embedding = tnn.Linear(768, d)
        self.input_process = tnn.Module()
        self.input_process.poseEmbedding = tnn.Linear(99, d)
        self.obj_input_process = tnn.Module()
        self.obj_input_process.poseEmbedding = tnn.Linear(9, d)
        self.input_merge = tnn.Sequential(tnn.Linear(2 * d, d), tnn.SiLU(), tnn.Linear(d, d))
        layer = tnn.TransformerEncoderLayer(
            d_model=d, nhead=heads, dim_feedforward=ff, dropout=0.0,
            activation="gelu", batch_first=True,
        )
        self.seqTransEncoder = tnn.TransformerEncoder(layer, num_layers=layers)
        self.output_process = tnn.Module()
        self.output_process.poseFinal = tnn.Sequential(
            tnn.Linear(d, d), tnn.SiLU(), tnn.Linear(d, d), tnn.SiLU(), tnn.Linear(d, out_dim)
        )
        self.register_buffer("classification_token", torch.zeros(1, 1, d))
        self.register_buffer("pe", pe_table(d))

    def forward(self, x, hand_side, shape, obj_traj, obj_embedding):
        d = self.d
        bs = x.shape[0]
        e0 = torch.zeros(d)
        e0[0] = 1.0
        emb_hs = hand_side.float()[:, None] * e0[None]
        emb_shape = self.hand_shape_process.shape_embed(shape.mean(dim=1))
        emb_obj = self.obj_embed_process.embedding(obj_embedding.mean(dim=1))
        emb = torch.stack([emb_hs, emb_shape, emb_obj], dim=1)  # [bs, 3, d]

        hand = self.input_process.poseEmbedding(x)
        obj = self.obj_input_process.poseEmbedding(obj_traj).mean(dim=1)
        merged = self.input_merge(torch.cat([hand, obj], dim=-1))

        cls = self.classification_token.expand(bs, 1, d)
        seq = torch.cat([emb, merged, cls], dim=1)
        seq = seq + self.pe[: seq.shape[1]][None]
        out = self.seqTransEncoder(seq)
        encoding = out[:, -1]
        return encoding, self.output_process.poseFinal(encoding)


class QuickGELU(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TorchResBlock(tnn.Module):
    def __init__(self, d: int, heads: int):
        super().__init__()
        self.attn = tnn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_1 = tnn.LayerNorm(d)
        # OpenAI CLIP parameter naming: mlp.c_fc / mlp.c_proj
        self.mlp = tnn.Sequential(
            OrderedDict(
                [("c_fc", tnn.Linear(d, d * 4)), ("gelu", QuickGELU()),
                 ("c_proj", tnn.Linear(d * 4, d))]
            )
        )
        self.ln_2 = tnn.LayerNorm(d)

    def forward(self, x, mask):
        h = self.ln_1(x)
        h, _ = self.attn(h, h, h, attn_mask=mask, need_weights=False)
        x = x + h
        return x + self.mlp(self.ln_2(x))


class TorchClipText(tnn.Module):
    """OpenAI CLIP text tower structure with matching parameter names."""

    def __init__(self, vocab: int = 49408, ctx: int = 77, d: int = 512,
                 heads: int = 8, layers: int = 12, embed_dim: int = 512):
        super().__init__()
        self.token_embedding = tnn.Embedding(vocab, d)
        self.positional_embedding = tnn.Parameter(torch.randn(ctx, d) * 0.01)
        self.transformer = tnn.Module()
        self.transformer.resblocks = tnn.ModuleList(
            [TorchResBlock(d, heads) for _ in range(layers)]
        )
        self.ln_final = tnn.LayerNorm(d)
        self.text_projection = tnn.Parameter(torch.randn(d, embed_dim) * d**-0.5)
        mask = torch.full((ctx, ctx), float("-inf"))
        mask.triu_(1)
        self.register_buffer("causal", mask)

    def forward(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding[None]
        for blk in self.transformer.resblocks:
            x = blk(x, self.causal)
        x = self.ln_final(x)
        eot = tokens.argmax(dim=-1)
        feats = x[torch.arange(x.shape[0]), eot]
        return feats @ self.text_projection


def infer_trunk_dims(sd) -> dict:
    """Infer (latent_dim, ff_size, num_layers) from a reference G/R/encoder
    state_dict. num_heads is NOT recoverable from shapes — every reference
    arch YAML pins 4 (config/arch_mdm.yml:9, arch_mdm_l.yml:9,
    arch_refine.yml, arch_encoder.yml:9)."""
    d = int(sd["input_process.poseEmbedding.weight"].shape[0])
    ff = int(sd["seqTransEncoder.layers.0.linear1.weight"].shape[0])
    layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("seqTransEncoder.layers.")
    )
    return {"d": d, "ff": ff, "layers": layers, "heads": 4}
