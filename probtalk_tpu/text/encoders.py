"""Flax text encoders: BERT, CLIP-text, T5-encoder — the reference's
non-GPT-2 text foundation models (``data_utils/foundation_models.py:46-68``:
bert-base-uncased 768-d, openai/clip-vit-base-patch32 text tower 512-d,
t5-base encoder 768-d; used in ``get_textfeat`` via
``CLIPModel.text_model(input_ids)`` / ``T5ForConditionalGeneration
.encoder(input_ids)`` — note the reference loads bert but its
``get_textfeat`` raises NotImplementedError for it; here bert rides the
same generic last-hidden-state path).

Each model maps token ids -> last hidden states; weights convert from the
matching HF torch state dict (golden-tested vs random-init torch models at
1e-4 — pretrained weights are not downloadable in this environment, so
conversion + architecture parity is the deliverable, same contract as
``audio/wav2vec2.py``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


# ---------------------------------------------------------------------------
# BERT (bert-base-uncased: 12 layers, 768-d, post-LN, eps 1e-12)
# ---------------------------------------------------------------------------

class BertLayer(nn.Module):
    dim: int = 768
    heads: int = 12
    ffn: int = 3072

    @nn.compact
    def __call__(self, x):
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, deterministic=True,
            force_fp32_for_softmax=True, name="attn")(x, x)
        x = nn.LayerNorm(epsilon=1e-12, name="attn_ln")(x + h)
        h = nn.Dense(self.ffn, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-12, name="out_ln")(x + h)


class BertEncoder(nn.Module):
    vocab: int = 30522
    dim: int = 768
    layers: int = 12
    heads: int = 12
    ffn: int = 3072
    max_pos: int = 512
    type_vocab: int = 2

    @nn.compact
    def __call__(self, ids):
        """(B, L) int ids -> (B, L, dim) last hidden states."""
        wte = self.param("wte", nn.initializers.normal(0.02),
                         (self.vocab, self.dim))
        wpe = self.param("wpe", nn.initializers.normal(0.02),
                         (self.max_pos, self.dim))
        wtt = self.param("wtt", nn.initializers.normal(0.02),
                         (self.type_vocab, self.dim))
        h = jnp.take(wte, ids, axis=0) + wpe[: ids.shape[1]][None] + wtt[0]
        h = nn.LayerNorm(epsilon=1e-12, name="emb_ln")(h)
        for i in range(self.layers):
            h = BertLayer(self.dim, self.heads, self.ffn,
                          name=f"layer_{i}")(h)
        return h


def convert_hf_bert(hf_state_dict: dict) -> dict:
    """Map a torch ``BertModel`` state dict onto BertEncoder params."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)())
          for k, v in hf_state_dict.items()}
    dim = sd["embeddings.word_embeddings.weight"].shape[1]
    p: dict = {
        "wte": jnp.asarray(sd["embeddings.word_embeddings.weight"]),
        "wpe": jnp.asarray(sd["embeddings.position_embeddings.weight"]),
        "wtt": jnp.asarray(sd["embeddings.token_type_embeddings.weight"]),
        "emb_ln": {"scale": jnp.asarray(sd["embeddings.LayerNorm.weight"]),
                   "bias": jnp.asarray(sd["embeddings.LayerNorm.bias"])},
    }
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in sd:
        b = f"encoder.layer.{i}"
        heads = _infer_heads(dim)
        hd = dim // heads
        attn = {}
        for hf_n, fx_n in (("query", "query"), ("key", "key"),
                           ("value", "value")):
            attn[fx_n] = {
                "kernel": jnp.asarray(
                    sd[f"{b}.attention.self.{hf_n}.weight"].T.reshape(
                        dim, heads, hd)),
                "bias": jnp.asarray(
                    sd[f"{b}.attention.self.{hf_n}.bias"].reshape(heads, hd)),
            }
        attn["out"] = {
            "kernel": jnp.asarray(
                sd[f"{b}.attention.output.dense.weight"].T.reshape(
                    heads, hd, dim)),
            "bias": jnp.asarray(sd[f"{b}.attention.output.dense.bias"]),
        }
        p[f"layer_{i}"] = {
            "attn": attn,
            "attn_ln": {
                "scale": jnp.asarray(
                    sd[f"{b}.attention.output.LayerNorm.weight"]),
                "bias": jnp.asarray(
                    sd[f"{b}.attention.output.LayerNorm.bias"])},
            "fc1": {"kernel": jnp.asarray(
                        sd[f"{b}.intermediate.dense.weight"].T),
                    "bias": jnp.asarray(sd[f"{b}.intermediate.dense.bias"])},
            "fc2": {"kernel": jnp.asarray(sd[f"{b}.output.dense.weight"].T),
                    "bias": jnp.asarray(sd[f"{b}.output.dense.bias"])},
            "out_ln": {"scale": jnp.asarray(
                           sd[f"{b}.output.LayerNorm.weight"]),
                       "bias": jnp.asarray(sd[f"{b}.output.LayerNorm.bias"])},
        }
        i += 1
    return {"params": p}


def _infer_heads(dim: int) -> int:
    """bert/clip head counts scale with width: 64-d heads."""
    return max(dim // 64, 1)


# ---------------------------------------------------------------------------
# CLIP text tower (clip-vit-base-patch32: 12 layers, 512-d, pre-LN, causal,
# quick-gelu, eps 1e-5)
# ---------------------------------------------------------------------------

def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class ClipTextLayer(nn.Module):
    dim: int = 512
    heads: int = 8
    ffn: int = 2048

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, deterministic=True,
            force_fp32_for_softmax=True, name="attn")(h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        h = nn.Dense(self.ffn, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.dim, name="fc2")(h)
        return x + h


class ClipTextEncoder(nn.Module):
    vocab: int = 49408
    dim: int = 512
    layers: int = 12
    heads: int = 8
    ffn: int = 2048
    max_pos: int = 77

    @nn.compact
    def __call__(self, ids):
        """(B, L) -> (B, L, dim): the reference's
        ``CLIPModel.text_model(input_ids)`` last hidden state."""
        wte = self.param("wte", nn.initializers.normal(0.02),
                         (self.vocab, self.dim))
        wpe = self.param("wpe", nn.initializers.normal(0.02),
                         (self.max_pos, self.dim))
        h = jnp.take(wte, ids, axis=0) + wpe[: ids.shape[1]][None]
        mask = nn.make_causal_mask(ids)
        for i in range(self.layers):
            h = ClipTextLayer(self.dim, self.heads, self.ffn,
                              name=f"layer_{i}")(h, mask)
        return nn.LayerNorm(epsilon=1e-5, name="final_ln")(h)


def convert_hf_clip_text(hf_state_dict: dict) -> dict:
    """Map a torch ``CLIPTextModel`` (or the ``text_model.``-prefixed slice
    of a full ``CLIPModel``) state dict onto ClipTextEncoder params."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)())
          for k, v in hf_state_dict.items()}
    pref = "text_model." if any(k.startswith("text_model.") for k in sd) \
        else ""
    dim = sd[f"{pref}embeddings.token_embedding.weight"].shape[1]
    heads = _infer_heads(dim)
    hd = dim // heads
    p: dict = {
        "wte": jnp.asarray(sd[f"{pref}embeddings.token_embedding.weight"]),
        "wpe": jnp.asarray(
            sd[f"{pref}embeddings.position_embedding.weight"]),
        "final_ln": {
            "scale": jnp.asarray(sd[f"{pref}final_layer_norm.weight"]),
            "bias": jnp.asarray(sd[f"{pref}final_layer_norm.bias"])},
    }
    i = 0
    while f"{pref}encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        b = f"{pref}encoder.layers.{i}"
        attn = {}
        for hf_n, fx_n in (("q_proj", "query"), ("k_proj", "key"),
                           ("v_proj", "value")):
            attn[fx_n] = {
                "kernel": jnp.asarray(
                    sd[f"{b}.self_attn.{hf_n}.weight"].T.reshape(
                        dim, heads, hd)),
                "bias": jnp.asarray(
                    sd[f"{b}.self_attn.{hf_n}.bias"].reshape(heads, hd)),
            }
        attn["out"] = {
            "kernel": jnp.asarray(
                sd[f"{b}.self_attn.out_proj.weight"].T.reshape(
                    heads, hd, dim)),
            "bias": jnp.asarray(sd[f"{b}.self_attn.out_proj.bias"]),
        }
        p[f"layer_{i}"] = {
            "attn": attn,
            "ln1": {"scale": jnp.asarray(sd[f"{b}.layer_norm1.weight"]),
                    "bias": jnp.asarray(sd[f"{b}.layer_norm1.bias"])},
            "ln2": {"scale": jnp.asarray(sd[f"{b}.layer_norm2.weight"]),
                    "bias": jnp.asarray(sd[f"{b}.layer_norm2.bias"])},
            "fc1": {"kernel": jnp.asarray(sd[f"{b}.mlp.fc1.weight"].T),
                    "bias": jnp.asarray(sd[f"{b}.mlp.fc1.bias"])},
            "fc2": {"kernel": jnp.asarray(sd[f"{b}.mlp.fc2.weight"].T),
                    "bias": jnp.asarray(sd[f"{b}.mlp.fc2.bias"])},
        }
        i += 1
    return {"params": p}


# ---------------------------------------------------------------------------
# T5 encoder (t5-base: 12 blocks, 768-d, RMSNorm pre-LN, relative position
# bias in block 0 shared across blocks, no attention scaling, ReLU FF)
# ---------------------------------------------------------------------------

class T5RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("scale", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * w


def t5_relative_bucket(rel_pos, num_buckets: int = 32,
                       max_distance: int = 128):
    """HF T5Attention._relative_position_bucket, bidirectional=True."""
    nb = num_buckets // 2
    ret = (rel_pos > 0).astype(jnp.int32) * nb
    n = jnp.abs(rel_pos)
    max_exact = nb // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, nb - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5Attention(nn.Module):
    dim: int = 768
    heads: int = 12
    head_dim: int = 64

    @nn.compact
    def __call__(self, x, pos_bias):
        b, L, _ = x.shape
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, name="q")(x)
        k = nn.Dense(inner, use_bias=False, name="k")(x)
        v = nn.Dense(inner, use_bias=False, name="v")(x)
        q = q.reshape(b, L, self.heads, self.head_dim)
        k = k.reshape(b, L, self.heads, self.head_dim)
        v = v.reshape(b, L, self.heads, self.head_dim)
        # T5 does NOT scale scores by sqrt(d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) + pos_bias
        w = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, L, inner)
        return nn.Dense(self.dim, use_bias=False, name="o")(o)


class T5Encoder(nn.Module):
    vocab: int = 32128
    dim: int = 768
    layers: int = 12
    heads: int = 12
    head_dim: int = 64
    ffn: int = 3072
    num_buckets: int = 32

    @nn.compact
    def __call__(self, ids):
        """(B, L) -> (B, L, dim): the reference's
        ``T5ForConditionalGeneration.encoder(input_ids)``."""
        wte = self.param("wte", nn.initializers.normal(1.0),
                         (self.vocab, self.dim))
        h = jnp.take(wte, ids, axis=0)
        L = ids.shape[1]
        # shared relative position bias, computed once (block 0's table)
        rel = jnp.arange(L)[None, :] - jnp.arange(L)[:, None]   # k - q
        buckets = t5_relative_bucket(rel, self.num_buckets)
        table = self.param("rel_bias", nn.initializers.normal(1.0),
                           (self.num_buckets, self.heads))
        pos_bias = jnp.take(table, buckets, axis=0)            # (L, L, H)
        pos_bias = pos_bias.transpose(2, 0, 1)[None]           # (1, H, L, L)
        for i in range(self.layers):
            r = T5RMSNorm(self.dim, name=f"block_{i}_ln0")(h)
            h = h + T5Attention(self.dim, self.heads, self.head_dim,
                                name=f"block_{i}_attn")(r, pos_bias)
            r = T5RMSNorm(self.dim, name=f"block_{i}_ln1")(h)
            r = nn.Dense(self.ffn, use_bias=False,
                         name=f"block_{i}_wi")(r)
            r = nn.relu(r)
            r = nn.Dense(self.dim, use_bias=False,
                         name=f"block_{i}_wo")(r)
            h = h + r
        return T5RMSNorm(self.dim, name="final_ln")(h)


def convert_hf_t5_encoder(hf_state_dict: dict) -> dict:
    """Map a torch ``T5EncoderModel`` (or the ``encoder.``-slice of
    ``T5ForConditionalGeneration``) state dict onto T5Encoder params."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)())
          for k, v in hf_state_dict.items()}
    shared = ("shared.weight" if "shared.weight" in sd
              else "encoder.embed_tokens.weight")
    p: dict = {
        "wte": jnp.asarray(sd[shared]),
        "rel_bias": jnp.asarray(
            sd["encoder.block.0.layer.0.SelfAttention"
               ".relative_attention_bias.weight"]),
        "final_ln": {
            "scale": jnp.asarray(sd["encoder.final_layer_norm.weight"])},
    }
    i = 0
    while f"encoder.block.{i}.layer.0.SelfAttention.q.weight" in sd:
        b = f"encoder.block.{i}"
        for n in "qkvo":
            p[f"block_{i}_attn"] = p.get(f"block_{i}_attn", {})
            p[f"block_{i}_attn"][n] = {"kernel": jnp.asarray(
                sd[f"{b}.layer.0.SelfAttention.{n}.weight"].T)}
        p[f"block_{i}_ln0"] = {"scale": jnp.asarray(
            sd[f"{b}.layer.0.layer_norm.weight"])}
        p[f"block_{i}_wi"] = {"kernel": jnp.asarray(
            sd[f"{b}.layer.1.DenseReluDense.wi.weight"].T)}
        p[f"block_{i}_wo"] = {"kernel": jnp.asarray(
            sd[f"{b}.layer.1.DenseReluDense.wo.weight"].T)}
        p[f"block_{i}_ln1"] = {"scale": jnp.asarray(
            sd[f"{b}.layer.1.layer_norm.weight"])}
        i += 1
    return {"params": p}


# ---------------------------------------------------------------------------
# embed-fn factories (the data.text plug-in surface)
# ---------------------------------------------------------------------------

_MODELS = {"bert": (BertEncoder, 768), "clip": (ClipTextEncoder, 512),
           "t5": (T5Encoder, 768)}


def make_text_encoder_encode_fn(kind: str, variables=None, seed: int = 0,
                                **model_kw):
    """-> fn(list[int]) -> (n_tokens, dim) last hidden states (sentence-
    level contextual encode — the reference's per-sentence forward in
    get_textfeat). Unlike the causal GPT-2 path, bert/t5 attention is
    bidirectional, so trailing pad tokens would leak into real positions;
    sentences are therefore encoded at their EXACT length (one compile per
    distinct sentence length — preprocessing-time cost only)."""
    cls, dim = _MODELS[kind]
    model = cls(**model_kw)
    if variables is None:
        variables = jax.jit(model.init)(jax.random.key(seed),
                                        jnp.zeros((1, 4), jnp.int32))
    apply = jax.jit(lambda v, ids: model.apply(v, ids))

    def encode(ids):
        ids = list(ids) or [0]
        # exact length (bert/t5 attention is bidirectional: pad tokens
        # would leak into real positions) — one compile per length seen
        arr = jnp.asarray(np.asarray(ids, np.int32)[None])
        return np.asarray(apply(variables, arr)[0], np.float32)

    return encode


def make_text_encoder_embed_fn(kind: str, variables=None, seed: int = 0,
                               tokenize_fn=None, **model_kw):
    """-> fn(word) -> (dim,): word tokens encoded and mean-pooled (the
    word-isolation variant; see text.gpt2.make_gpt2_embed_fn for the
    contextual-vs-isolated tradeoff note)."""
    cls, dim = _MODELS[kind]
    model = cls(**model_kw)
    encode = make_text_encoder_encode_fn(kind, variables, seed, **model_kw)
    if tokenize_fn is None:
        vocab = model.vocab

        def tokenize_fn(word: str):
            return [b % vocab for b in word.lower().encode("utf-8")] or [0]

    def embed(word: str) -> np.ndarray:
        states = encode(tokenize_fn(word))
        return states.mean(0).astype(np.float32)

    return embed
