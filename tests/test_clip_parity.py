"""Golden parity for the CLIP text tower: a torch replica of the OpenAI CLIP
text transformer (same state_dict key names: token_embedding,
positional_embedding, transformer.resblocks.N.*, ln_final, text_projection)
is converted through load_openai_clip_text_params and must match the flax
tower's features exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

from oakink2_tamf_tpu.models import clip_text as C


class QuickGELU(tnn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class TorchResBlock(tnn.Module):
    def __init__(self, d, heads):
        super().__init__()
        from collections import OrderedDict

        self.attn = tnn.MultiheadAttention(d, heads, batch_first=True)
        self.ln_1 = tnn.LayerNorm(d)
        # OpenAI CLIP parameter naming: mlp.c_fc / mlp.c_proj
        self.mlp = tnn.Sequential(
            OrderedDict(
                [("c_fc", tnn.Linear(d, d * 4)), ("gelu", QuickGELU()), ("c_proj", tnn.Linear(d * 4, d))]
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

    def __init__(self, vocab, ctx, d, heads, layers, embed_dim):
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


def test_clip_text_tower_parity(monkeypatch, tmp_path):
    # shrink the tower so the test stays fast; converter layer count patched
    vocab, ctx, d, heads, layers, embed = 512, 77, 64, 8, 3, 32
    monkeypatch.setattr(C, "LAYERS", layers)
    monkeypatch.setattr(C, "HEADS", heads)

    torch.manual_seed(0)
    ref = TorchClipText(vocab, ctx, d, heads, layers, embed).eval()

    pt = tmp_path / "clip.pt"
    torch.save(ref.state_dict(), str(pt))
    variables = C.load_openai_clip_text_params(str(pt))

    model = C.ClipTextEncoder(
        vocab_size=vocab, context_length=ctx, width=d, heads=heads,
        layers=layers, embed_dim=embed,
    )

    rng = np.random.default_rng(0)
    tokens = np.zeros((2, ctx), np.int64)
    for i in range(2):
        n = rng.integers(5, 20)
        tokens[i, 0] = vocab - 2  # SOT-ish
        tokens[i, 1 : n - 1] = rng.integers(1, vocab - 2, size=n - 2)
        tokens[i, n - 1] = vocab - 1  # EOT = max id
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(tokens)).numpy()

    out = model.apply(variables, jnp.asarray(tokens.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-5)
