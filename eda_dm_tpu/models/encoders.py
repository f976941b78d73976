"""Conditioning encoders (class / text) — FP32, never quantized.

Reference: /root/reference/ldm/modules/encoders/modules.py (ClassEmbedder:21,
FrozenCLIPEmbedder:137).  The class embedder is a flax Embed producing a
length-1 cross-attention context; the CLIP text encoder wraps the
transformers Flax CLIP model (weights must be available locally — this
environment has no network egress, so loading is gated).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class ClassEmbedder(nn.Module):
    """encoders/modules.py:21-33: label → (B, 1, embed_dim) context.

    The ImageNet pipeline uses ``n_classes + 1`` embeddings with index
    ``n_classes`` acting as the unconditional token
    (scripts/sample_diffusion_ldm_imagenet.py conditioning setup).
    """

    embed_dim: int = 512
    n_classes: int = 1000

    @nn.compact
    def __call__(self, labels: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(self.n_classes, self.embed_dim,
                       name="embedding")(labels)
        return emb[:, None, :]


def class_embedder_state_dict_to_params(state_dict) -> dict:
    w = state_dict["embedding.weight"]
    arr = np.asarray(getattr(w, "numpy", lambda: w)()
                     if hasattr(w, "numpy") else w, dtype=np.float32)
    return {"embedding": {"embedding": arr}}


class FrozenCLIPTextEncoder:
    """SD v1 text conditioning (FrozenCLIPEmbedder, modules.py:137-165):
    tokenizer(max_length=77) → CLIPTextModel last_hidden_state.

    Wraps the transformers Flax CLIP text model.  ``model_path`` must point
    at a local checkout of openai/clip-vit-large-patch14 (no network here);
    construction raises a clear error otherwise.
    """

    def __init__(self, model_path: str = "openai/clip-vit-large-patch14",
                 max_length: int = 77):
        try:
            from transformers import CLIPTokenizer, FlaxCLIPTextModel
            self.tokenizer = CLIPTokenizer.from_pretrained(
                model_path, local_files_only=True)
            self.model = FlaxCLIPTextModel.from_pretrained(
                model_path, local_files_only=True)
        except Exception as e:       # pragma: no cover - environment-specific
            raise RuntimeError(
                "FrozenCLIPTextEncoder needs a local CLIP checkpoint at "
                f"'{model_path}' (no network egress): {e}") from e
        self.max_length = max_length

    def encode(self, prompts: Sequence[str]) -> jnp.ndarray:
        batch = self.tokenizer(list(prompts), truncation=True,
                               max_length=self.max_length,
                               padding="max_length", return_tensors="np")
        out = self.model(input_ids=batch["input_ids"],
                         attention_mask=None)
        return jnp.asarray(out.last_hidden_state)


class BERTEmbedder(nn.Module):
    """BERT-style text encoder over token ids → (B, T, n_embed) context.

    Port of the reference's ``BERTEmbedder``
    (/root/reference/ldm/modules/encoders/modules.py:80-103) and the subset
    of its vendored x_transformers stack it actually instantiates
    (ldm/modules/x_transformer.py): ``TransformerWrapper(num_tokens,
    max_seq_len, attn_layers=Encoder(dim, depth))`` — learned token +
    absolute position embeddings (x_transformer.py:25-36,548-570), pre-norm
    ('a','f')-pattern layers with plain residuals (AttentionLayers,
    x_transformer.py:370-539), default 8-head/64-dim attention with bias-free
    q/k/v (Attention, x_transformer.py:215-345), GELU feed-forward at mult 4
    (FeedForward, x_transformer.py:194-211), and a final LayerNorm with
    ``return_embeddings=True`` (no logit head).

    Tokenization (the reference's optional HF ``BERTTokenizer``) is the
    caller's job — pass int32 token ids.  Used by upstream LDM text2img
    configs; unused by the five benchmark tasks, included for completeness.
    """

    n_embed: int
    n_layer: int
    vocab_size: int = 30522
    max_seq_len: int = 77
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        d = self.n_embed
        h = nn.Embed(self.vocab_size, d, name="token_emb")(tokens)
        pos = nn.Embed(self.max_seq_len, d, name="pos_emb")(
            jnp.arange(tokens.shape[1]))
        h = h + pos[None]
        inner = self.heads * self.dim_head
        scale = self.dim_head ** -0.5
        for i in range(self.n_layer):
            ja, jf = 2 * i, 2 * i + 1      # torch attn_layers.layers indices
            # attention sublayer (pre-norm + residual)
            a = nn.LayerNorm(epsilon=1e-5, name=f"norm_{ja}")(h)
            q = nn.Dense(inner, use_bias=False, name=f"attn_{ja}_q")(a)
            k = nn.Dense(inner, use_bias=False, name=f"attn_{ja}_k")(a)
            v = nn.Dense(inner, use_bias=False, name=f"attn_{ja}_v")(a)
            b, n, _ = q.shape
            q = q.reshape(b, n, self.heads, self.dim_head)
            k = k.reshape(b, n, self.heads, self.dim_head)
            v = v.reshape(b, n, self.heads, self.dim_head)
            dots = jnp.einsum("bihd,bjhd->bhij", q, k,
                              preferred_element_type=jnp.float32) * scale
            attn = jax.nn.softmax(dots, axis=-1)
            o = jnp.einsum("bhij,bjhd->bihd", attn, v,
                           preferred_element_type=jnp.float32)
            o = o.reshape(b, n, inner)
            h = h + nn.Dense(d, name=f"attn_{ja}_out")(o)
            # feed-forward sublayer
            f = nn.LayerNorm(epsilon=1e-5, name=f"norm_{jf}")(h)
            f = nn.Dense(4 * d, name=f"ff_{jf}_1")(f)
            f = nn.Dense(d, name=f"ff_{jf}_2")(jax.nn.gelu(f))
            h = h + f
        return nn.LayerNorm(epsilon=1e-5, name="norm")(h)


def bert_state_dict_to_params(state_dict) -> dict:
    """Reference BERTEmbedder state_dict → flax params for
    :class:`BERTEmbedder` (transformer.* keys, x_transformer.py layout)."""
    def arr(v):
        return np.asarray(getattr(v, "numpy", lambda: v)()
                          if hasattr(v, "numpy") else v, dtype=np.float32)

    p: dict = {}
    pre = "transformer."
    for key, v in state_dict.items():
        if not key.startswith(pre):
            continue
        k = key[len(pre):]
        v = arr(v)
        if k == "token_emb.weight":
            p["token_emb"] = {"embedding": v}
        elif k == "pos_emb.emb.weight":
            p["pos_emb"] = {"embedding": v}
        elif k.startswith("norm."):
            p.setdefault("norm", {})["scale" if k.endswith("weight")
                                     else "bias"] = v
        elif k.startswith("attn_layers.layers."):
            parts = k.split(".")
            j, slot, rest = int(parts[2]), parts[3], parts[4:]
            leaf = "scale" if rest[-1] == "weight" else "bias"
            if slot == "0":                       # pre-norm LayerNorm
                p.setdefault(f"norm_{j}", {})[leaf] = v
            elif rest[0] in ("to_q", "to_k", "to_v"):
                name = f"attn_{j}_{rest[0][-1]}"
                p.setdefault(name, {})["kernel"] = v.T
            elif rest[0] == "to_out":
                leaf = "kernel" if rest[-1] == "weight" else "bias"
                p.setdefault(f"attn_{j}_out", {})[leaf] = \
                    v.T if leaf == "kernel" else v
            elif rest[0] == "net":                # FeedForward
                leaf = "kernel" if rest[-1] == "weight" else "bias"
                name = f"ff_{j}_1" if rest[1] == "0" else f"ff_{j}_2"
                p.setdefault(name, {})[leaf] = v.T if leaf == "kernel" else v
    return p


class _TinyTextModule(nn.Module):
    """Small causal-free transformer producing (B, T, context_dim)."""

    context_dim: int
    vocab: int
    depth: int = 2
    heads: int = 4

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        d = self.context_dim
        h = nn.Embed(self.vocab, d, name="tok")(ids)
        h = h + self.param("pos", nn.initializers.normal(0.02),
                           (1, ids.shape[1], d))
        for i in range(self.depth):
            a = nn.LayerNorm(name=f"ln1_{i}")(h)
            a = nn.SelfAttention(num_heads=self.heads, name=f"attn_{i}")(a)
            h = h + a
            f = nn.LayerNorm(name=f"ln2_{i}")(h)
            f = nn.Dense(4 * d, name=f"fc1_{i}")(f)
            f = nn.Dense(d, name=f"fc2_{i}")(jax.nn.gelu(f))
            h = h + f
        return nn.LayerNorm(name="ln_f")(h)


class TinyTextEncoder:
    """CLIP-shaped stand-in text encoder (random weights, no tokenizer
    files): crc32 hash-tokenization → tiny flax transformer →
    (B, 77, context_dim) context rows.

    Exercises the full SD/COCO conditioning path — CFG calib assembly, PLMS
    sampling, transformer-block reconstruction — without the (undownloadable
    here) openai/clip-vit-large-patch14 weights.  Same ``encode`` interface
    as :class:`FrozenCLIPTextEncoder`.
    """

    def __init__(self, context_dim: int = 768, max_length: int = 77,
                 vocab: int = 4096, seed: int = 0):
        self.max_length = max_length
        self.vocab = vocab
        self.module = _TinyTextModule(context_dim=context_dim, vocab=vocab)
        ids = jnp.zeros((1, max_length), jnp.int32)
        self.params = self.module.init(jax.random.PRNGKey(seed), ids)
        self._fn = jax.jit(lambda p, i: self.module.apply(p, i))

    def tokenize(self, prompts: Sequence[str]) -> np.ndarray:
        import zlib
        out = np.zeros((len(prompts), self.max_length), np.int32)
        for r, p in enumerate(prompts):
            toks = [zlib.crc32(w.encode()) % (self.vocab - 2) + 2
                    for w in p.lower().split()][: self.max_length - 2]
            row = [1] + toks + [0] * (self.max_length - 1 - len(toks))
            out[r] = row
        return out

    def encode(self, prompts: Sequence[str]) -> jnp.ndarray:
        return self._fn(self.params, jnp.asarray(self.tokenize(prompts)))


class BERTTextEncoder:
    """BERTEmbedder wrapped behind the same ``encode(prompts)`` interface
    as FrozenCLIP/TinyTextEncoder (hash tokenization, no vocab files).

    The reference's BERTEmbedder path (modules.py:80-103) tokenizes with an
    optional HF BERTTokenizer; in weightless environments this wrapper
    substitutes crc32 hash ids so the full-size BERT context stack can run
    end-to-end.  Pass ``params`` converted from a torch checkpoint
    (bert_state_dict_to_params) for real-weights use with your own ids.
    """

    def __init__(self, context_dim: int = 1280, n_layer: int = 32,
                 max_length: int = 77, seed: int = 0, params=None):
        self.max_length = max_length
        self.module = BERTEmbedder(n_embed=context_dim, n_layer=n_layer,
                                   max_seq_len=max_length)
        ids = jnp.zeros((1, max_length), jnp.int32)
        self.params = params or self.module.init(jax.random.PRNGKey(seed),
                                                 ids)
        self._fn = jax.jit(lambda p, i: self.module.apply(p, i))

    def tokenize(self, prompts: Sequence[str]) -> np.ndarray:
        import zlib
        out = np.zeros((len(prompts), self.max_length), np.int32)
        for r, p in enumerate(prompts):
            toks = [zlib.crc32(w.encode()) % 30520 + 2
                    for w in p.lower().split()][: self.max_length - 2]
            out[r] = [1] + toks + [0] * (self.max_length - 1 - len(toks))
        return out

    def encode(self, prompts: Sequence[str]) -> jnp.ndarray:
        return self._fn(self.params, jnp.asarray(self.tokenize(prompts)))
