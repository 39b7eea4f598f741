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

from oakink2_tamf_tpu.interop.torch_replica import TorchClipText
from oakink2_tamf_tpu.models import clip_text as C


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
