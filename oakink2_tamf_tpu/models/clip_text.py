"""Frozen CLIP ViT-B/32 text tower in JAX + tokenizer + embedding cache.

The reference conditions G on CLIP text features and re-encodes the prompts
through the frozen fp16 torch CLIP on every denoise step
(interaction_segment_mdm.py:84-132). Here:

- `ClipTextEncoder` is the text transformer (vocab 49408, ctx 77, width 512,
  12 layers, 8 heads, causal mask, ln_final, text_projection, features taken
  at the EOT position) as a flax module;
- weights load from an OpenAI CLIP checkpoint (torch .pt state_dict, host-side
  conversion) when provided; otherwise a fixed-seed deterministic init stands
  in (same shapes, so a later weight drop-in changes nothing structurally);
- `ClipTokenizer` is the byte-BPE tokenizer when the merges file
  (bpe_simple_vocab_16e6.txt.gz) is available, else a deterministic hashing
  fallback with identical framing (SOT/EOT ids, truncate, zero-pad);
- tokenization mirrors the reference's context trick: 20 tokens + SOT/EOT,
  zero-padded to 77 (mdm.py:111-132);
- `TextEmbedCache` encodes each distinct prompt once per run — the tower is
  frozen, so per-step re-encoding is pure recompute.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

VOCAB_SIZE = 49408
CONTEXT_LENGTH = 77
WIDTH = 512
HEADS = 8
LAYERS = 12
EMBED_DIM = 512
SOT = 49406
EOT = 49407


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------


@functools.lru_cache()
def _bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _basic_clean(text: str) -> str:
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    import re

    return re.sub(r"\s+", " ", text).strip()


class ClipTokenizer:
    """CLIP byte-BPE tokenizer. With `bpe_path` (the standard merges .txt.gz)
    behaves exactly like openai/CLIP SimpleTokenizer; without it, falls back to
    a deterministic word-hash scheme with the same id framing (documented
    deviation — checkpoint-parity evaluation requires the real merges file)."""

    def __init__(self, bpe_path: str | None = None):
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        import re

        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"""
            if False
            else r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
            re.IGNORECASE,
        )

        self.bpe_ranks: dict[tuple[str, str], int] = {}
        self.encoder: dict[str, int] = {}
        self.cache = {"<|startoftext|>": "<|startoftext|>", "<|endoftext|>": "<|endoftext|>"}
        self.has_bpe = False
        if bpe_path and os.path.isfile(bpe_path):
            from ..utils.integrity import verify_pinned

            verify_pinned(bpe_path, what="CLIP BPE merges")
            merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
            merges = merges[1 : 49152 - 256 - 2 + 1]
            merge_pairs = [tuple(m.split()) for m in merges]
            vocab = list(_bytes_to_unicode().values())
            vocab = vocab + [v + "</w>" for v in vocab]
            for m in merge_pairs:
                vocab.append("".join(m))
            vocab.extend(["<|startoftext|>", "<|endoftext|>"])
            self.encoder = dict(zip(vocab, range(len(vocab))))
            self.bpe_ranks = dict(zip(merge_pairs, range(len(merge_pairs))))
            self.has_bpe = True

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        text = _whitespace_clean(_basic_clean(text)).lower()
        ids: list[int] = []
        for token in self.pat.findall(text):
            if self.has_bpe:
                tok = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
                ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
            else:
                # deterministic fallback: stable hash into the BPE id range
                h = 0
                for ch in token:
                    h = (h * 131 + ord(ch)) % (VOCAB_SIZE - 2 - 1)
                ids.append(1 + h)
        return ids

    def tokenize(
        self, texts: str | Sequence[str], context_length: int = CONTEXT_LENGTH, truncate: bool = True
    ) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        result = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            tokens = [SOT] + self.encode(text) + [EOT]
            if len(tokens) > context_length:
                if not truncate:
                    raise RuntimeError(f"input too long for context {context_length}")
                tokens = tokens[: context_length - 1] + [EOT]
            result[i, : len(tokens)] = tokens
        return result


def tokenize_for_tamf(tokenizer: ClipTokenizer, texts: Sequence[str]) -> np.ndarray:
    """The reference framing (mdm.py:111-132): context 22 (=20+SOT/EOT) with
    truncation, then zero-pad to the full 77."""
    ctx = 22
    toks = tokenizer.tokenize(texts, context_length=ctx, truncate=True)
    pad = np.zeros((toks.shape[0], CONTEXT_LENGTH - ctx), dtype=toks.dtype)
    return np.concatenate([toks, pad], axis=1)


# ---------------------------------------------------------------------------
# Text transformer
# ---------------------------------------------------------------------------


class _QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


class _ResidualAttentionBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, attn_mask):
        h = nn.LayerNorm(name="ln_1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.width, out_features=self.width,
            deterministic=True, name="attn",
        )(h, h, mask=attn_mask)
        x = x + h
        h = nn.LayerNorm(name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="mlp_fc")(h)
        h = _QuickGELU()(h)
        h = nn.Dense(self.width, name="mlp_proj")(h)
        return x + h


class ClipTextEncoder(nn.Module):
    vocab_size: int = VOCAB_SIZE
    context_length: int = CONTEXT_LENGTH
    width: int = WIDTH
    heads: int = HEADS
    layers: int = LAYERS
    embed_dim: int = EMBED_DIM

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens [bs, 77] int32 -> text features [bs, 512]."""
        tok_emb = nn.Embed(self.vocab_size, self.width, name="token_embedding")(tokens)
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok_emb + pos_emb[None]

        # causal mask [1, 1, ctx, ctx]
        causal = jnp.tril(jnp.ones((self.context_length, self.context_length), bool))
        mask = causal[None, None]

        for i in range(self.layers):
            x = _ResidualAttentionBlock(self.width, self.heads, name=f"resblock_{i}")(x, mask)
        x = nn.LayerNorm(name="ln_final")(x)

        # features at the EOT token (highest id position)
        eot_idx = jnp.argmax(tokens, axis=-1)
        feats = jnp.take_along_axis(x, eot_idx[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width**-0.5), (self.width, self.embed_dim)
        )
        return feats @ proj


def load_openai_clip_text_params(pt_path: str) -> dict:
    """Convert the text-tower weights of an OpenAI CLIP checkpoint (torch
    state_dict / jit archive) into this module's param tree."""
    import torch

    sd = torch.load(pt_path, map_location="cpu")
    if not isinstance(sd, dict):  # jit archive
        sd = sd.state_dict()
    sd = {k: v.float().numpy() for k, v in sd.items() if isinstance(v, torch.Tensor)}

    p: dict = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "ln_final": {"scale": sd["ln_final.weight"], "bias": sd["ln_final.bias"]},
        "text_projection": sd["text_projection"],
    }
    width = sd["positional_embedding"].shape[1]
    heads = HEADS
    head_dim = width // heads
    for i in range(LAYERS):
        pre = f"transformer.resblocks.{i}."
        w_in = sd[pre + "attn.in_proj_weight"]  # [3w, w]
        b_in = sd[pre + "attn.in_proj_bias"]
        wq, wk, wv = np.split(w_in, 3, axis=0)
        bq, bk, bv = np.split(b_in, 3, axis=0)

        def qkv(w, b):
            # torch [out, in] -> flax MHA kernel [in, heads, head_dim]
            return {
                "kernel": w.T.reshape(width, heads, head_dim),
                "bias": b.reshape(heads, head_dim),
            }

        p[f"resblock_{i}"] = {
            "ln_1": {"scale": sd[pre + "ln_1.weight"], "bias": sd[pre + "ln_1.bias"]},
            "ln_2": {"scale": sd[pre + "ln_2.weight"], "bias": sd[pre + "ln_2.bias"]},
            "attn": {
                "query": qkv(wq, bq),
                "key": qkv(wk, bk),
                "value": qkv(wv, bv),
                "out": {
                    "kernel": sd[pre + "attn.out_proj.weight"].T.reshape(heads, head_dim, width),
                    "bias": sd[pre + "attn.out_proj.bias"],
                },
            },
            "mlp_fc": {"kernel": sd[pre + "mlp.c_fc.weight"].T, "bias": sd[pre + "mlp.c_fc.bias"]},
            "mlp_proj": {"kernel": sd[pre + "mlp.c_proj.weight"].T, "bias": sd[pre + "mlp.c_proj.bias"]},
        }
    return {"params": p}


BPE_FILENAME = "bpe_simple_vocab_16e6.txt.gz"


def find_bpe_path(explicit: str | None = None, near: str | None = None) -> str | None:
    """Locate the OpenAI CLIP BPE merges file: explicit path, $TAMF_CLIP_BPE,
    next to `near` (e.g. the checkpoint), the repo asset dir, or the standard
    openai/CLIP and our cache locations.

    An EXPLICITLY configured path (argument or env var) that doesn't exist is
    an error — silently falling through to a different merges file would
    tokenize with weights the user didn't choose."""
    if explicit and not os.path.isfile(explicit):
        raise FileNotFoundError(f"clip bpe_path set but not found: {explicit}")
    env = os.environ.get("TAMF_CLIP_BPE")
    if env and not os.path.isfile(env):
        raise FileNotFoundError(f"$TAMF_CLIP_BPE set but not found: {env}")
    candidates = [explicit, env]
    if near:
        candidates.append(os.path.join(os.path.dirname(os.path.abspath(near)), BPE_FILENAME))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates += [
        os.path.join(os.path.dirname(here), "asset", "clip", BPE_FILENAME),
        os.path.expanduser(os.path.join("~", ".cache", "clip", BPE_FILENAME)),
        os.path.expanduser(os.path.join("~", ".cache", "tamf", BPE_FILENAME)),
    ]
    for c in candidates:
        if c and os.path.isfile(c):
            return c
    return None


class FrozenClipText:
    """Frozen text encoder + tokenizer + per-prompt embedding cache.

    With a pretrained checkpoint, the REAL byte-BPE merges file is mandatory:
    the hash-fallback tokenizer produces confidently wrong token ids, so
    pretrained weights would emit garbage text features silently. Pass
    `allow_hash_tokenizer=True` only for structural tests."""

    def __init__(
        self,
        checkpoint_path: str | None = None,
        bpe_path: str | None = None,
        seed: int = 0,
        allow_hash_tokenizer: bool = False,
    ):
        bpe_found = find_bpe_path(bpe_path, near=checkpoint_path)
        self.tokenizer = ClipTokenizer(bpe_found)
        self.model = ClipTextEncoder()
        if checkpoint_path and not os.path.isfile(checkpoint_path):
            # an EXPLICITLY configured checkpoint that is missing must raise
            # (same contract as core/mano.get_mano_model and
            # models/losses.load_contact_assets): a typo'd path silently
            # training/evaluating on random-init CLIP features is exactly
            # the corruption this class exists to refuse
            raise FileNotFoundError(
                f"clip.checkpoint_path was set but does not exist: "
                f"{checkpoint_path!r}. Leave it unset for a random-init "
                "smoke run, or point it at the real CLIP ViT-B/32 weights."
            )
        if checkpoint_path and os.path.isfile(checkpoint_path):
            if not self.tokenizer.has_bpe and not allow_hash_tokenizer:
                raise RuntimeError(
                    "FrozenClipText: pretrained CLIP weights require the real BPE "
                    f"merges file ({BPE_FILENAME}); the hash-fallback tokenizer would "
                    "produce wrong token ids and therefore wrong text features. "
                    "Provide clip.bpe_path / $TAMF_CLIP_BPE, place the file next to "
                    "the checkpoint, or pass allow_hash_tokenizer=True (tests only). "
                    f"(searched: explicit, env, checkpoint dir, asset/clip/, ~/.cache/clip/)"
                )
            from ..utils.integrity import verify_pinned

            verify_pinned(checkpoint_path, what="CLIP checkpoint")
            self.variables = load_openai_clip_text_params(checkpoint_path)
            self.pretrained = True
        else:
            dummy = jnp.zeros((1, CONTEXT_LENGTH), jnp.int32)
            self.variables = self.model.init(jax.random.PRNGKey(seed), dummy)
            self.pretrained = False
            if not self.tokenizer.has_bpe:
                import logging

                logging.getLogger(__name__).warning(
                    "CLIP BPE merges not found — using the deterministic hash "
                    "tokenizer (fine for random-init smoke runs, NOT for parity)"
                )
        self._apply = jax.jit(lambda tokens: self.model.apply(self.variables, tokens))
        self._cache: dict[str, np.ndarray] = {}

    def encode_text(self, texts: Sequence[str]) -> np.ndarray:
        """[bs] strings -> [bs, 512] float32, cached per distinct prompt."""
        missing = [t for t in dict.fromkeys(texts) if t not in self._cache]
        if missing:
            toks = tokenize_for_tamf(self.tokenizer, missing)
            feats = np.asarray(self._apply(jnp.asarray(toks)))
            for t, f in zip(missing, feats):
                self._cache[t] = f
        return np.stack([self._cache[t] for t in texts], axis=0)
