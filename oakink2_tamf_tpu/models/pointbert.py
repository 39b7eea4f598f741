"""PointBERT object encoder (PointTransformer) in JAX/flax.

Re-design of reference model/pointbert/{point_encoder,dvae,misc}.py — the
network that turns an 8192-point object cloud into the 768-d `obj_embedding`
conditioning vector (cls + maxpool concat of a trans_dim=384 ViT;
point_encoder.py:103-183, PointTransformer_8192point_2layer.yaml).

The reference never calls this at train time (embeddings are precomputed
offline and downloaded, README.md:118-126); this module provides that offline
pipeline natively:
- `farthest_point_sampling`: iterative FPS as a lax.scan (replacing
  misc.fps / pointnet2_ops CUDA);
- `knn_group`: top-k grouping with center normalization (dvae.Group);
- `MiniPointNet`: the two-stage shared-MLP + maxpool group tokenizer
  (dvae.Encoder; BatchNorm runs in inference mode = affine with running
  stats, since the tower is frozen for embedding extraction);
- `PointTransformer`: 12-layer pre-LN ViT with per-block positional
  re-injection (blocks receive x + pos at EVERY layer — point_encoder.py:199),
  cls/cls_pos tokens, final [cls | maxpool] concat -> 768.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


# ---------------------------------------------------------------------------
# Grouping ops
# ---------------------------------------------------------------------------


def farthest_point_sampling(xyz: jax.Array, n_samples: int) -> jax.Array:
    """FPS indices [B, n_samples] over xyz [B, N, 3] (deterministic, starts at
    point 0). lax.scan keeps the whole loop on device."""
    B, N, _ = xyz.shape

    def single(pts):
        def body(carry, _):
            min_d, last_idx = carry
            last = pts[last_idx]
            d = jnp.sum((pts - last) ** 2, axis=-1)
            min_d = jnp.minimum(min_d, d)
            nxt = jnp.argmax(min_d).astype(jnp.int32)
            return (min_d, nxt), last_idx

        init = (jnp.full((N,), jnp.inf, pts.dtype), jnp.int32(0))
        (_, _), idx = jax.lax.scan(body, init, None, length=n_samples)
        return idx

    return jax.vmap(single)(xyz)


def knn_group(xyz: jax.Array, centers: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """For each center, its k nearest points; neighborhoods are center-relative.
    xyz [B,N,3], centers [B,G,3] -> (neigh [B,G,k,3], idx [B,G,k])."""

    def single(pts, ctr):
        d = jnp.sum((ctr[:, None, :] - pts[None, :, :]) ** 2, axis=-1)  # [G, N]
        _, idx = jax.lax.top_k(-d, k)
        neigh = jnp.take(pts, idx, axis=0)  # [G, k, 3]
        return neigh - ctr[:, None, :], idx

    return jax.vmap(single)(xyz, centers)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


class MiniPointNet(nn.Module):
    """dvae.Encoder: shared MLP -> maxpool -> concat -> shared MLP -> maxpool."""

    encoder_channel: int = 256

    @nn.compact
    def __call__(self, groups: jax.Array, *, train: bool = False) -> jax.Array:
        """groups [B, G, K, 3] -> tokens [B, G, C]."""
        B, G, K, _ = groups.shape
        x = groups.reshape(B * G, K, 3)
        x = nn.Dense(128, name="conv1a")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Dense(256, name="conv1b")(x)
        g = jnp.max(x, axis=1, keepdims=True)  # [BG, 1, 256]
        x = jnp.concatenate([jnp.broadcast_to(g, x.shape), x], axis=-1)  # [BG, K, 512]
        x = nn.Dense(512, name="conv2a")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn2")(x)
        x = nn.relu(x)
        x = nn.Dense(self.encoder_channel, name="conv2b")(x)
        x = jnp.max(x, axis=1)  # [BG, C]
        return x.reshape(B, G, self.encoder_channel)


class ViTBlock(nn.Module):
    """Pre-LN ViT block with the reference's attention parameterization
    (point_encoder.py:32-78): a FUSED qkv projection WITHOUT bias
    (qkv_bias=False) and an out projection WITH bias — laid out so the torch
    checkpoint's `attn.qkv.weight` [3C, C] maps 1:1 onto the `qkv` kernel."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        B, N, C = x.shape
        hd = C // self.num_heads
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        qkv = nn.Dense(3 * C, use_bias=False, name="qkv")(h)
        # torch layout: output dims factor as (3, heads, head_dim)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, hd]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * hd**-0.5
        attn = jax.nn.softmax(attn, axis=-1)
        h = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        h = nn.Dense(C, name="proj")(h)
        x = x + self._drop_path(h, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        return x + self._drop_path(h, deterministic)

    def _drop_path(self, h, deterministic):
        if deterministic or self.drop_path <= 0.0:
            return h
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (h.shape[0],) + (1,) * (h.ndim - 1))
        return h * mask / keep


@dataclasses.dataclass(frozen=True)
class PointBertConfig:
    """PointTransformer_8192point_2layer.yaml values."""

    trans_dim: int = 384
    depth: int = 12
    drop_path_rate: float = 0.1
    num_heads: int = 6
    group_size: int = 32
    num_group: int = 512
    encoder_dims: int = 256


class PointTransformer(nn.Module):
    cfg: PointBertConfig = PointBertConfig()

    @nn.compact
    def __call__(self, pts: jax.Array, *, train: bool = False) -> jax.Array:
        """pts [B, N, 3] -> object embedding [B, 2*trans_dim] (=768)."""
        cfg = self.cfg
        fps_idx = farthest_point_sampling(pts, cfg.num_group)
        centers = jnp.take_along_axis(pts, fps_idx[..., None], axis=1)  # [B, G, 3]
        neigh, _ = knn_group(pts, centers, cfg.group_size)

        tokens = MiniPointNet(cfg.encoder_dims, name="encoder")(neigh, train=train)
        tokens = nn.Dense(cfg.trans_dim, name="reduce_dim")(tokens)

        B = pts.shape[0]
        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.trans_dim))
        cls_pos = self.param("cls_pos", nn.initializers.normal(1.0), (1, 1, cfg.trans_dim))

        pos = nn.Dense(128, name="pos_fc1")(centers)
        pos = nn.gelu(pos, approximate=False)
        pos = nn.Dense(cfg.trans_dim, name="pos_fc2")(pos)

        x = jnp.concatenate([jnp.broadcast_to(cls_token, (B, 1, cfg.trans_dim)), tokens], axis=1)
        pos = jnp.concatenate([jnp.broadcast_to(cls_pos, (B, 1, cfg.trans_dim)), pos], axis=1)

        dpr = np.linspace(0.0, cfg.drop_path_rate, cfg.depth)
        for i in range(cfg.depth):
            # positional embedding re-injected at every block (point_encoder.py:199)
            x = ViTBlock(
                cfg.trans_dim, cfg.num_heads, drop_path=float(dpr[i]), name=f"block_{i}"
            )(x + pos, deterministic=not train)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)

        return jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)], axis=-1)


def compute_object_embedding(
    variables, pts: np.ndarray, cfg: PointBertConfig = PointBertConfig()
) -> np.ndarray:
    """Offline embedding extraction for one object cloud [N, 3] -> [768]."""
    model = PointTransformer(cfg)
    out = jax.jit(lambda v, p: model.apply(v, p, train=False))(
        variables, jnp.asarray(pts)[None]
    )
    return np.asarray(out[0])


# ---------------------------------------------------------------------------
# Pretrained-checkpoint port (torch -> flax)
# ---------------------------------------------------------------------------


def convert_pointbert_state_dict(
    sd: dict, cfg: PointBertConfig = PointBertConfig()
) -> dict:
    """Convert a reference Point-BERT torch state_dict (numpy values, keys as
    in model/pointbert/point_encoder.py:103-144 after the
    `module.point_encoder.` strip of point_encoder.load_checkpoint:146-153)
    into this module's {params, batch_stats} variable tree.

    Layout rules: Conv1d(k=1) [out,in,1] -> Dense kernel w[:,:,0].T;
    Linear [out,in] -> kernel w.T; BatchNorm1d running stats -> batch_stats.
    """

    def dense(prefix):
        w = sd[prefix + ".weight"]
        out = {"kernel": (w[:, :, 0] if w.ndim == 3 else w).T}
        if prefix + ".bias" in sd:
            out["bias"] = sd[prefix + ".bias"]
        return out

    def bn(prefix):
        p = {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}
        s = {"mean": sd[prefix + ".running_mean"], "var": sd[prefix + ".running_var"]}
        return p, s

    bn1_p, bn1_s = bn("encoder.first_conv.1")
    bn2_p, bn2_s = bn("encoder.second_conv.1")
    params: dict = {
        "encoder": {
            "conv1a": dense("encoder.first_conv.0"),
            "bn1": bn1_p,
            "conv1b": dense("encoder.first_conv.3"),
            "conv2a": dense("encoder.second_conv.0"),
            "bn2": bn2_p,
            "conv2b": dense("encoder.second_conv.3"),
        },
        "reduce_dim": dense("reduce_dim"),
        "cls_token": sd["cls_token"],
        "cls_pos": sd["cls_pos"],
        "pos_fc1": dense("pos_embed.0"),
        "pos_fc2": dense("pos_embed.2"),
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    for i in range(cfg.depth):
        pre = f"blocks.blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": {"scale": sd[pre + ".norm1.weight"], "bias": sd[pre + ".norm1.bias"]},
            "qkv": dense(pre + ".attn.qkv"),
            "proj": dense(pre + ".attn.proj"),
            "norm2": {"scale": sd[pre + ".norm2.weight"], "bias": sd[pre + ".norm2.bias"]},
            "mlp_fc1": dense(pre + ".mlp.fc1"),
            "mlp_fc2": dense(pre + ".mlp.fc2"),
        }
    batch_stats = {"encoder": {"bn1": bn1_s, "bn2": bn2_s}}
    params = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    batch_stats = jax.tree.map(lambda a: np.asarray(a, np.float32), batch_stats)
    return {"params": params, "batch_stats": batch_stats}


def load_pointbert_checkpoint(
    pt_path: str, cfg: PointBertConfig = PointBertConfig()
) -> dict:
    """Load the reference's pretrained Point-BERT torch checkpoint (the file
    README.md:118-126 has users download; wrapped as ckpt['state_dict'] with
    `module.point_encoder.` prefixes, checkpoint.py usage at
    point_encoder.py:146-153) and port the weights."""
    import torch

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt.state_dict()
    out = {}
    for k, v in sd.items():
        if k.startswith("module.point_encoder."):
            k = k[len("module.point_encoder."):]
        elif k.startswith("point_encoder."):
            k = k[len("point_encoder."):]
        if isinstance(v, torch.Tensor):
            out[k] = v.detach().cpu().float().numpy()
    return convert_pointbert_state_dict(out, cfg)
