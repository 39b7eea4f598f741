"""Golden parity for the Point-BERT port: a torch replica of the reference
PointTransformer (same state_dict key names as model/pointbert/point_encoder.py
after the `module.point_encoder.` strip — encoder.first_conv.*, reduce_dim,
cls_token/cls_pos, pos_embed.*, blocks.blocks.N.*, norm) is converted through
convert_pointbert_state_dict and must match the flax tower's embeddings.

The reference's FPS starts at a random index (misc.fps); the replica pins the
start to index 0 to match the JAX implementation — everything downstream is
identical, so weight-port correctness is fully exercised.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

from oakink2_tamf_tpu.models import pointbert as PB

CFG = PB.PointBertConfig(
    trans_dim=48, depth=2, drop_path_rate=0.0, num_heads=4,
    group_size=8, num_group=16, encoder_dims=24,
)


def torch_fps_start0(xyz, npoint):
    B, N, _ = xyz.shape
    centroids = torch.zeros(B, npoint, dtype=torch.long)
    distance = torch.full((B, N), 1e10)
    farthest = torch.zeros(B, dtype=torch.long)  # reference: randint (pinned to 0 here)
    bi = torch.arange(B)
    for i in range(npoint):
        centroids[:, i] = farthest
        centroid = xyz[bi, farthest, :].view(B, 1, 3)
        dist = torch.sum((xyz - centroid) ** 2, -1)
        distance = torch.min(distance, dist)
        farthest = torch.max(distance, -1)[1]
    return centroids


class TorchGroup(tnn.Module):
    def __init__(self, num_group, group_size):
        super().__init__()
        self.num_group, self.group_size = num_group, group_size

    def forward(self, xyz):
        B, N, _ = xyz.shape
        idx0 = torch_fps_start0(xyz, self.num_group)
        center = torch.gather(xyz, 1, idx0[..., None].expand(-1, -1, 3))
        d = torch.cdist(center, xyz) ** 2
        _, idx = torch.topk(d, self.group_size, dim=-1, largest=False)
        neigh = torch.gather(
            xyz[:, None].expand(-1, self.num_group, -1, -1), 2,
            idx[..., None].expand(-1, -1, -1, 3),
        )
        return neigh - center.unsqueeze(2), center


class TorchEncoder(tnn.Module):
    """dvae.Encoder with matching Sequential indices."""

    def __init__(self, encoder_channel):
        super().__init__()
        self.first_conv = tnn.Sequential(
            tnn.Conv1d(3, 128, 1), tnn.BatchNorm1d(128), tnn.ReLU(inplace=True),
            tnn.Conv1d(128, 256, 1),
        )
        self.second_conv = tnn.Sequential(
            tnn.Conv1d(512, 512, 1), tnn.BatchNorm1d(512), tnn.ReLU(inplace=True),
            tnn.Conv1d(512, encoder_channel, 1),
        )
        self.encoder_channel = encoder_channel

    def forward(self, point_groups):
        bs, g, n, c = point_groups.shape
        pg = point_groups.reshape(bs * g, n, c)
        feature = self.first_conv(pg.transpose(2, 1))
        fg = torch.max(feature, dim=2, keepdim=True)[0]
        feature = torch.cat([fg.expand(-1, -1, n), feature], dim=1)
        feature = self.second_conv(feature)
        return torch.max(feature, dim=2)[0].reshape(bs, g, self.encoder_channel)


class TorchBlock(tnn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, dim * 3, bias=False)
        self.attn.proj = tnn.Linear(dim, dim)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)
        self.num_heads = num_heads

    def forward(self, x):
        B, N, C = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(B, N, 3, self.num_heads, C // self.num_heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * (C // self.num_heads) ** -0.5
        a = a.softmax(dim=-1)
        h = (a @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.attn.proj(h)
        h = self.norm2(x)
        return x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(h)))


class TorchPointTransformer(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.group_divider = TorchGroup(cfg.num_group, cfg.group_size)
        self.encoder = TorchEncoder(cfg.encoder_dims)
        self.reduce_dim = tnn.Linear(cfg.encoder_dims, cfg.trans_dim)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, cfg.trans_dim))
        self.cls_pos = tnn.Parameter(torch.randn(1, 1, cfg.trans_dim))
        self.pos_embed = tnn.Sequential(
            tnn.Linear(3, 128), tnn.GELU(), tnn.Linear(128, cfg.trans_dim)
        )
        self.blocks = tnn.Module()
        self.blocks.blocks = tnn.ModuleList(
            [TorchBlock(cfg.trans_dim, cfg.num_heads) for _ in range(cfg.depth)]
        )
        self.norm = tnn.LayerNorm(cfg.trans_dim)

    def forward(self, pts):
        neighborhood, center = self.group_divider(pts)
        tok = self.reduce_dim(self.encoder(neighborhood))
        cls = self.cls_token.expand(tok.size(0), -1, -1)
        cpos = self.cls_pos.expand(tok.size(0), -1, -1)
        pos = self.pos_embed(center)
        x = torch.cat((cls, tok), dim=1)
        pos = torch.cat((cpos, pos), dim=1)
        for blk in self.blocks.blocks:
            x = blk(x + pos)
        x = self.norm(x)
        return torch.cat([x[:, 0], x[:, 1:].max(1)[0]], dim=-1)


def _randomized_torch_model(seed=0):
    torch.manual_seed(seed)
    m = TorchPointTransformer(CFG).eval()
    # perturb all params + BN running stats so the port is meaningfully tested
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for p in m.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=g))
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm1d):
                mod.running_mean.add_(0.3 * torch.randn(mod.running_mean.shape, generator=g))
                mod.running_var.mul_(
                    torch.exp(0.3 * torch.randn(mod.running_var.shape, generator=g))
                )
    return m


def test_pointbert_port_matches_torch():
    tm = _randomized_torch_model()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = PB.convert_pointbert_state_dict(sd, CFG)

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(2, 128, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(pts)).numpy()
    out = np.asarray(PB.PointTransformer(CFG).apply(variables, jnp.asarray(pts), train=False))

    assert out.shape == ref.shape == (2, 2 * CFG.trans_dim)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_pointbert_checkpoint_file_roundtrip(tmp_path):
    """load_pointbert_checkpoint handles the reference's on-disk format:
    ckpt['state_dict'] with module.point_encoder. prefixes."""
    tm = _randomized_torch_model(seed=5)
    wrapped = {
        "state_dict": {
            "module.point_encoder." + k: v for k, v in tm.state_dict().items()
        }
    }
    fp = tmp_path / "pointbert.pt"
    torch.save(wrapped, fp)

    variables = PB.load_pointbert_checkpoint(str(fp), CFG)
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(1, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(pts)).numpy()
    out = np.asarray(PB.PointTransformer(CFG).apply(variables, jnp.asarray(pts), train=False))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
