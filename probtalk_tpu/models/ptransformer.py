"""PTransformer: masked product-code transformer with MaskGit sampling.

Capability of the reference's ``nets/inpainting/PTransformer.py:394-704``:
a transformer decoder over the flattened (time x group) PQ-code grid that
  * embeds code tokens (+1 mask id), adds a sinusoidal time PE repeated per
    group plus a "product PE" over the G group slots,
  * runs N decoder layers (self-attn + cross-attn to the fused
    motion/audio/text condition + FFN), each sublayer followed by a
    speaker-conditioned stylization (FiLM-style scale/shift, zero-init out),
  * projects to per-code logits,
  * samples non-autoregressively with MaskGit (iterative confidence-based
    remasking, Gumbel top-k, cosine schedule) or autoregressively.

TPU-first redesign:
  * sampling loops are ``lax.fori_loop`` bodies over static shapes — the
    whole T-iteration MaskGit decode compiles to ONE XLA computation.
  * attention uses dot-product attention that XLA fuses; softmax/layernorm
    in f32, matmuls can run bf16.
  * the train mask-ratio curriculum reproduces the reference's exact top-k
    count under jit (shape-static: sort + traced-threshold compare instead
    of scatter); a bernoulli same-expectation variant remains as an option.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def sinusoidal_table(max_len: int, dim: int) -> np.ndarray:
    """Classic sin/cos position table, row 0 reserved as PAD=0
    (layout matches reference PositionalEncoding, PTransformer.py:214-249)."""
    pos = np.arange(max_len)[:, None]
    j = np.arange(dim)[None, :]
    angle = pos / np.power(10000, 2.0 * (j // 2) / dim)
    table = np.zeros((max_len, dim), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return np.concatenate([np.zeros((1, dim), np.float32), table], axis=0)


class PositionalEncoding(nn.Module):
    """Sinusoidal (frozen) or learned positional embedding of length+1 rows."""

    dim: int
    max_len: int = 1800
    sine: bool = True

    @nn.compact
    def __call__(self, length: int):
        """Returns (length, dim) encodings for positions 1..length."""
        if self.sine:
            table = sinusoidal_table(self.max_len, self.dim)
            return jnp.asarray(table[1: length + 1])
        emb = self.param("embedding", nn.initializers.zeros, (self.max_len + 1, self.dim))
        return emb[1: length + 1]


class StylizationBlock(nn.Module):
    """FiLM-style speaker conditioning: LN(x) * (1+scale) + shift -> SiLU ->
    zero-init Linear (reference StylizationBlock_V3 'sb' branch,
    PTransformer.py:69-79,134-140). Output REPLACES the sublayer output
    (zero at init => identity residual branches at init)."""

    dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, label_embed, train: bool = False):
        # x: (B, L, C); label_embed: (B, C)
        h = nn.silu(label_embed)
        h = nn.Dense(self.dim * 2, name="emb")(h)[:, None, :]
        scale, shift = jnp.split(h, 2, axis=-1)
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(x) * (1 + scale) + shift
        y = nn.silu(y)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.Dense(self.dim, kernel_init=nn.initializers.zeros, name="out")(y)


class StyledDecoderLayer(nn.Module):
    """Post-LN decoder layer with optional per-sublayer stylization
    (reference DeepSupervisionLayer, PTransformer.py:284-372)."""

    dim: int
    heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.1
    styled: bool = True
    dtype: Optional[jnp.dtype] = None   # bf16 compute, f32 params/norms
    # Pallas blockwise attention for long (>window) eval sequences —
    # O(L*block) attention memory instead of the full (L, L) tensor
    # (ops/flash_attention.py; param-compatible with the XLA module)
    flash: bool = False

    @nn.compact
    def __call__(self, x, cond, label_embed, causal_mask=None, train: bool = False):
        det = not train

        def attn(name, needs_mask=False):
            if self.flash and not train and not needs_mask:
                from probtalk_tpu.ops.flash_attention import (
                    FlashMultiHeadAttention,
                )

                return FlashMultiHeadAttention(
                    num_heads=self.heads, qkv_features=self.dim, name=name)
            return nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.dim,
                dropout_rate=self.dropout, deterministic=det, name=name,
                force_fp32_for_softmax=True, dtype=self.dtype,
            )

        # self-attention
        h = attn("self_attn", needs_mask=causal_mask is not None)(
            x, x, mask=causal_mask)
        if self.styled:
            h = StylizationBlock(self.dim, name="style_1")(h, label_embed, train)
        h = nn.Dropout(self.dropout, deterministic=det)(h)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x + h)

        # cross-attention to condition
        h = attn("cross_attn")(x, cond)
        if self.styled:
            h = StylizationBlock(self.dim, name="style_2")(h, label_embed, train)
        h = nn.Dropout(self.dropout, deterministic=det)(h)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x + h)

        # FFN
        h = nn.Dense(self.ffn_dim, name="linear1", dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=det)(h)
        h = nn.Dense(self.dim, name="linear2", dtype=self.dtype)(h)
        if self.styled:
            h = StylizationBlock(self.dim, name="style_3")(h, label_embed, train)
        h = nn.Dropout(self.dropout, deterministic=det)(h)
        return nn.LayerNorm(dtype=jnp.float32, name="norm3")(x + h)


def exact_keep_mask(key, b: int, n: int, keep_frac):
    """(b, n) bool mask with exactly floor(keep_frac * n) True per row —
    the reference's rand.topk(r) scatter (PTransformer.py:566-570) as a
    shape-static sort + traced-threshold compare (jit-safe for traced
    keep_frac)."""
    u = jax.random.uniform(key, (b, n))
    r = jnp.floor(keep_frac * n).astype(jnp.int32)
    desc = -jnp.sort(-u, axis=-1)
    thr = desc[:, jnp.clip(r - 1, 0, n - 1)]
    return (u >= thr[:, None]) & (r > 0)


def gamma_schedule(mode: str):
    """MaskGit keep-fraction schedules (reference gamma_func,
    PTransformer.py:578-588)."""
    if mode == "linear":
        return lambda r: 1.0 - r
    if mode == "cosine":
        return lambda r: jnp.cos(r * jnp.pi / 2)
    if mode == "square":
        return lambda r: 1.0 - r ** 2
    if mode == "cubic":
        return lambda r: 1.0 - r ** 3
    raise ValueError(mode)


class PTransformer(nn.Module):
    """Masked product-code model over the (T, G) PQ-code grid."""

    groups: int = 4
    condi_dim: int = 768
    dim: int = 512
    layers: int = 6
    num_code: int = 128
    n_classes: int = 4
    heads: int = 8
    identity: bool = True        # per-sublayer speaker stylization
    maskgit: bool = True
    sine_pe: bool = True
    max_len: int = 1800
    choice_temperature: float = 4.5
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None   # bf16 compute option
    remat: bool = False  # per-layer activation checkpointing (HBM <-> FLOPs)
    flash: bool = False  # Pallas blockwise attention (long-T maskgit eval;
    #                      causal AR decode stays on XLA attention)
    # train-time corruption: 'topk' = reference-exact count
    # (floor(gamma(epoch_ratio)*N) tokens kept per sample, gamma linear —
    # random_token, PTransformer.py:559-576); 'bernoulli' = same expected
    # count via per-token coin flips (round-2 behavior, higher variance)
    train_mask_mode: str = "topk"

    @property
    def mask_id(self) -> int:
        return self.num_code

    def setup(self):
        self.tok_emb = nn.Embed(self.num_code + 1, self.dim, name="tok_emb")
        self.class_embed = nn.Embed(self.n_classes, self.dim, name="class_embed")
        self.condi_emb = nn.Dense(self.dim, name="condi_emb")
        self.time_pe = PositionalEncoding(self.dim, self.max_len, self.sine_pe, name="PE")
        self.product_pe = PositionalEncoding(self.dim, self.groups, self.sine_pe,
                                             name="product_PE")
        # remat: recompute each decoder layer's activations in backward
        # instead of storing them — long-window training at ~2/3 the
        # activation HBM for one extra forward of FLOPs
        layer_cls = (nn.remat(StyledDecoderLayer, static_argnums=(5,))
                     if self.remat else StyledDecoderLayer)
        self.decoder = [
            layer_cls(self.dim, self.heads, styled=self.identity,
                      dropout=self.dropout, dtype=self.dtype,
                      flash=self.flash, name=f"layer_{i}")
            for i in range(self.layers)
        ]
        self.out_hidden = nn.Dense(512, name="out_hidden")
        self.out_proj = nn.Dense(self.num_code, name="out_proj")
        if not self.maskgit:
            self.start_emb = self.param("start_emb", nn.initializers.normal(0.02),
                                        (1, 1, self.dim))

    # ------------------------------------------------------------------
    def _pe(self, t: int):
        """Flattened (T*G) PE = time PE (repeated per group) + product PE."""
        tpe = self.time_pe(t)                                   # (T, C)
        gpe = self.product_pe(self.groups)                      # (G, C)
        x_pe = (tpe[:, None, :] + gpe[None, :, :]).reshape(t * self.groups, -1)
        return x_pe, tpe

    def _backbone(self, tok_embeds, label, condition, *, causal=False,
                  train: bool = False):
        """tok_embeds: (B, T*G, C) WITH PE already added; condition (B, T, Cc)."""
        b, L, _ = tok_embeds.shape
        t = condition.shape[1]
        _, tpe = self._pe(t)
        cond = self.condi_emb(condition) + tpe[None]
        label_embed = self.class_embed(label)
        mask = None
        if causal:
            mask = nn.make_causal_mask(jnp.zeros((b, L)))
        x = tok_embeds.astype(jnp.float32)
        for layer in self.decoder:
            x = layer(x, cond, label_embed, mask, train)
        h = nn.relu(self.out_hidden(x))
        return self.out_proj(h)                                  # (B, T*G, K)

    def logits(self, codes, label, condition, train: bool = False):
        """codes (B, T, G) int -> logits (B, T, G, K)
        (reference tokens_to_logits, PTransformer.py:657-694)."""
        b, t, g = codes.shape
        x = self.tok_emb(codes).reshape(b, t * g, self.dim)
        x_pe, _ = self._pe(t)
        out = self._backbone(x + x_pe[None], label, condition, train=train)
        return out.reshape(b, t, g, self.num_code)

    def __call__(self, codes, label, condition, epoch_ratio=1.0,
                 train: bool = False):
        """Training forward: mask-curriculum corruption then logits
        (reference forward, PTransformer.py:443-504)."""
        b, t, g = codes.shape
        if self.maskgit:
            if train:
                keep = gamma_schedule("linear")(epoch_ratio)
                key = self.make_rng("mask")
                if self.train_mask_mode == "topk":
                    # exact count over the flattened (T*G) grid — r identical
                    # across the batch (reference random_token,
                    # PTransformer.py:559-576)
                    keep_mask = exact_keep_mask(key, b, t * g, keep)
                    keep_mask = keep_mask.reshape(b, t, g)
                else:
                    keep_mask = jax.random.uniform(key, codes.shape) < keep
                codes = jnp.where(keep_mask, codes, self.mask_id)
            x = self.tok_emb(codes).reshape(b, t * g, self.dim)
            x_pe, _ = self._pe(t)
            return self._backbone(x + x_pe[None], label, condition,
                                  train=train).reshape(b, t, g, self.num_code)
        # autoregressive variant: shift right with learned start token
        x = self.tok_emb(codes).reshape(b, t * g, self.dim)
        x_pe, _ = self._pe(t)
        x = x + x_pe[None]
        x = jnp.concatenate([jnp.tile(self.start_emb, (b, 1, 1)), x[:, :-1]], axis=1)
        return self._backbone(x, label, condition, causal=True,
                              train=train).reshape(b, t, g, self.num_code)

    # ------------------------------------------------------------------
    # MaskGit sampling (reference sample_good, PTransformer.py:590-642)
    # ------------------------------------------------------------------
    def sample(self, key, label, condition, steps: int = 8, mode: str = "cosine"):
        """Iterative non-AR decode. condition: (B, T, Cc). Returns (B, T, G).

        Compiles to a single fori_loop — all shapes static.
        """
        b, t, _ = condition.shape
        g = self.groups
        n = t * g
        gamma = gamma_schedule(mode)
        x_pe, _ = self._pe(t)

        def logits_of(ids):
            x = self.tok_emb(ids.reshape(b, t, g)).reshape(b, n, self.dim)
            return self._backbone(x + x_pe[None], label, condition).reshape(b, n, -1)

        init_ids = jnp.full((b, n), self.mask_id, jnp.int32)
        init_unknown = jnp.full((b,), n, jnp.float32)

        def body(i, carry):
            ids, k = carry
            k, k_samp, k_gumbel = jax.random.split(k, 3)
            lg = logits_of(ids).astype(jnp.float32)
            sampled = jax.random.categorical(k_samp, lg, axis=-1).astype(jnp.int32)
            unknown = ids == self.mask_id
            sampled = jnp.where(unknown, sampled, ids)

            ratio = (i + 1).astype(jnp.float32) / steps
            mask_ratio = gamma(ratio)
            probs = jax.nn.softmax(lg, axis=-1)
            sel = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
            sel = jnp.where(unknown, sel, jnp.inf)

            mask_len = jnp.floor(init_unknown * mask_ratio)[:, None]
            mask_len = jnp.clip(
                mask_len, 0.0, jnp.sum(unknown, axis=-1, keepdims=True) - 1.0
            )
            temperature = self.choice_temperature * (1.0 - ratio)
            gumbel = jax.random.gumbel(k_gumbel, sel.shape)
            confidence = jnp.log(sel) + temperature * gumbel
            sorted_conf = jnp.sort(confidence, axis=-1)
            cut = jnp.take_along_axis(sorted_conf, mask_len.astype(jnp.int32), axis=-1)
            masking = confidence < cut
            ids = jnp.where(masking, self.mask_id, sampled)
            return ids, k

        ids, _ = jax.lax.fori_loop(0, steps, body, (init_ids, key))
        # No mask ids can survive the loop: at the final iteration
        # ratio=1 so every gamma schedule gives mask_ratio ~ 0,
        # mask_len floors to 0, and the cut lands below the minimum
        # confidence — masking is all-False (the reference likewise
        # returns cur_ids straight after its loop, PTransformer.py:642).
        # A former defensive greedy fill here cost a 9th full forward
        # (~12% of the sampler) for a provable no-op; removed (round 5).
        return ids.reshape(b, t, g)

    def sample_max(self, label, condition):
        """One-shot greedy decode (reference sample_max, PTransformer.py:644-655)."""
        b, t, _ = condition.shape
        ids = jnp.full((b, t, self.groups), self.mask_id, jnp.int32)
        lg = self.logits(ids, label, condition)
        return jnp.argmax(lg, axis=-1).astype(jnp.int32)

    def sample_ar(self, key, label, condition):
        """Autoregressive decode over the T*G grid (reference predict,
        PTransformer.py:506-557). O(N) sequential forwards — kept for
        capability parity with maskgit=False configs."""
        b, t, _ = condition.shape
        g = self.groups
        n = t * g

        def body(i, carry):
            ids, k = carry
            k, ks = jax.random.split(k)
            lg = self.__call__(ids.reshape(b, t, g), label, condition)
            lg_i = lg.reshape(b, n, -1)[:, i]
            tok = jax.random.categorical(ks, lg_i, axis=-1).astype(jnp.int32)
            return ids.at[:, i].set(tok), k

        ids = jnp.zeros((b, n), jnp.int32)
        ids, _ = jax.lax.fori_loop(0, n, body, (ids, key))
        return ids.reshape(b, t, g)
