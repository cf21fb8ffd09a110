"""GPT-2 text encoder in flax, with HF weight conversion.

Capability of the reference's *default* text foundation model: the hub
builds ``GPT2Model.from_pretrained("gpt2")`` both for ``text_name='gpt2'``
and as the fallback branch (``data_utils/foundation_models.py:47-51,64-67``)
and mean-pools ``last_hidden_state`` over a word's tokens to produce the
768-d per-word feature splatted across the word's frames
(``foundation_models.py:157-165`` with ``get_textfeat``).

This is the standard GPT-2 small architecture: learned token + position
embeddings, pre-LN blocks (LN -> causal self-attention -> residual,
LN -> 4x GELU MLP -> residual), final LN. Weights convert from a torch
``GPT2Model`` state dict via ``convert_hf_gpt2`` (HF ``Conv1D`` stores
kernels already (in, out) — no transpose).

TPU notes: one fused qkv matmul per block (maps onto the MXU as a single
(T, d)x(d, 3d) tile), f32 softmax, causal mask built with ``jnp.tril`` on
a static length => jit-friendly for any fixed word-batch shape.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class GPT2Block(nn.Module):
    dim: int = 768
    heads: int = 12
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train
        b, t, d = x.shape
        hd = self.dim // self.heads

        h = nn.LayerNorm(epsilon=1e-5, name="ln_1", dtype=jnp.float32)(x)
        qkv = nn.Dense(3 * self.dim, name="c_attn")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, self.heads, hd)
        k = k.reshape(b, t, self.heads, hd)
        v = v.reshape(b, t, self.heads, hd)
        # (B, H, Tq, Tk) scores, f32 softmax, causal mask
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        mask = jnp.tril(jnp.ones((t, t), bool))
        scores = jnp.where(mask, scores.astype(jnp.float32), -1e9)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = nn.Dropout(self.dropout, deterministic=det)(attn)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, d)
        ctx = nn.Dense(self.dim, name="c_proj")(ctx)
        x = x + nn.Dropout(self.dropout, deterministic=det)(ctx)

        h = nn.LayerNorm(epsilon=1e-5, name="ln_2", dtype=jnp.float32)(x)
        h = nn.Dense(4 * self.dim, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=True)        # HF gelu_new (tanh approx)
        h = nn.Dense(self.dim, name="mlp_proj")(h)
        return x + nn.Dropout(self.dropout, deterministic=det)(h)


class GPT2Encoder(nn.Module):
    """Token ids (B, T) int32 -> (B, T, dim) last hidden states."""

    vocab: int = 50257
    dim: int = 768
    layers: int = 12
    heads: int = 12
    max_pos: int = 1024
    dropout: float = 0.1

    @nn.compact
    def __call__(self, ids, train: bool = False):
        wte = self.param("wte", nn.initializers.normal(0.02),
                         (self.vocab, self.dim))
        wpe = self.param("wpe", nn.initializers.normal(0.02),
                         (self.max_pos, self.dim))   # HF initializer_range
        # major-dim jnp.take gather (fast on TPU; it's the MINOR-dim
        # take_along_axis that serializes)
        h = jnp.take(wte, ids, axis=0) + wpe[: ids.shape[1]][None]
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        for i in range(self.layers):
            h = GPT2Block(self.dim, self.heads, self.dropout,
                          name=f"block_{i}")(h, train)
        return nn.LayerNorm(epsilon=1e-5, name="ln_f", dtype=jnp.float32)(h)


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def convert_hf_gpt2(hf_state_dict: dict) -> dict:
    """Map a torch ``GPT2Model`` state dict onto GPT2Encoder params.

    HF GPT-2 uses ``Conv1D`` modules whose weights are stored (in, out) —
    exactly flax ``Dense`` kernel layout, so attention/MLP kernels pass
    through untransposed.
    """

    def np_(t):
        return np.asarray(getattr(t, "numpy", lambda: t)())

    sd = {k: np_(v) for k, v in hf_state_dict.items()}
    p: dict = {"wte": jnp.asarray(sd["wte.weight"]),
               "wpe": jnp.asarray(sd["wpe.weight"])}

    def dense(prefix):
        return {"kernel": jnp.asarray(sd[f"{prefix}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    def ln(prefix):
        return {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    i = 0
    while f"h.{i}.ln_1.weight" in sd:
        p[f"block_{i}"] = {
            "ln_1": ln(f"h.{i}.ln_1"),
            "c_attn": dense(f"h.{i}.attn.c_attn"),
            "c_proj": dense(f"h.{i}.attn.c_proj"),
            "ln_2": ln(f"h.{i}.ln_2"),
            "mlp_fc": dense(f"h.{i}.mlp.c_fc"),
            "mlp_proj": dense(f"h.{i}.mlp.c_proj"),
        }
        i += 1
    p["ln_f"] = ln("ln_f")
    return {"params": p}


def make_gpt2_encode_fn(variables=None, seed: int = 0, pad_to: int = 64,
                        **model_kw):
    """-> fn(list[int]) -> (n_tokens, dim) per-token last hidden states —
    the sentence-level encoder of the reference's ``get_textfeat_bin``
    (foundation_models.py:277-280: whole-sentence GPT-2 forward, one state
    per token). The sentence is always encoded WHOLE: the pad bucket
    doubles from ``pad_to`` until the sentence fits (one compiled program
    per bucket size, capped at the model's max_pos); causality makes
    trailing-pad truncation exact."""
    import numpy as _np

    model = GPT2Encoder(**model_kw)
    if variables is None:
        # jitted init: eager flax init dispatches per-op over a remote
        # device link (minutes for a 12-layer stack)
        variables = jax.jit(model.init)(jax.random.key(seed),
                                        jnp.zeros((1, 4), jnp.int32))
    apply = jax.jit(lambda v, ids: model.apply(v, ids))

    def encode(ids):
        ids = list(ids) or [0]
        if len(ids) > model.max_pos:
            raise ValueError(
                f"sentence of {len(ids)} tokens exceeds the model's "
                f"max_pos {model.max_pos}")
        bucket = pad_to
        while bucket < len(ids):
            bucket *= 2
        bucket = min(bucket, model.max_pos)
        arr = _np.zeros((1, bucket), _np.int32)
        arr[0, : len(ids)] = ids
        return _np.asarray(apply(variables, jnp.asarray(arr))[0][: len(ids)],
                           _np.float32)

    return encode


def make_gpt2_embed_fn(variables=None, tokenize_fn=None, dim: int = 768,
                       seed: int = 0, pad_to: int = 16, **model_kw):
    """-> fn(word) -> (dim,) embedding: GPT-2 last hidden states mean-pooled
    over the word's tokens. Plug into
    ``data.text.text_features(embed_fn=...)``.

    DELIBERATE DEVIATION from the reference's ``get_textfeat``
    (foundation_models.py:157-159): the reference mean-pools hidden states
    taken from a whole-sentence contextual forward, so the same word gets
    different features per sentence; this fn encodes each word in
    ISOLATION (context-free, cacheable — one forward per unique word
    instead of per sentence). For reference-faithful contextual features
    use the sentence-level path: ``data.text.text_features_tokens`` with
    ``make_gpt2_encode_fn`` (golden-tested vs torch).

    ``tokenize_fn(word) -> list[int]`` should be a real BPE tokenizer when
    its vocab files are locally available; the default byte-level fallback
    keeps the path runnable offline (ids = utf-8 bytes, mod vocab).
    """
    model = GPT2Encoder(dim=dim, **model_kw)
    if variables is None:
        variables = jax.jit(model.init)(jax.random.key(seed),
                                        jnp.zeros((1, 4), jnp.int32))
    if tokenize_fn is None:
        vocab = model.vocab

        def tokenize_fn(word: str):
            return [b % vocab for b in word.lower().encode("utf-8")] or [0]

    # Static-shape bucketing: pad every word to ``pad_to`` tokens so ONE
    # XLA program serves all words (per-length shapes would recompile).
    # Causal attention makes this exact — trailing pad tokens cannot
    # influence the first n positions, and pooling masks them out.
    def _masked_mean(h, n):
        mask = (jnp.arange(h.shape[0]) < n)[:, None]
        return (h * mask).sum(0) / n

    apply = jax.jit(lambda v, ids, n: _masked_mean(model.apply(v, ids)[0], n))

    def embed(word: str) -> np.ndarray:
        toks = tokenize_fn(word)
        chunks = [toks[i:i + pad_to] for i in range(0, len(toks), pad_to)] \
            or [[0]]
        pooled = np.zeros(model.dim, np.float64)
        for c in chunks:                     # long words: chunked pooling
            ids = np.zeros((1, pad_to), np.int32)
            ids[0, :len(c)] = c
            pooled += np.asarray(
                apply(variables, jnp.asarray(ids), np.float32(len(c)))
            ) * len(c)
        return (pooled / len(toks or [0])).astype(np.float32)

    return embed
