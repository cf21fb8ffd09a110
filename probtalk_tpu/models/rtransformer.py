"""RTransformer: the refiner network.

Capability of the reference's ``nets/inpainting/RTransformer.py:181-230``:
input conv 376->512, sinusoidal PE, condition = [wav2vec audio 768 | mask
one-hot 2] -> conv 512, 6 styled decoder layers (speaker FiLM), output head
512 -> 1024 -> 376. Regresses final continuous motion from the VQ-decoded
preliminary motion blended with known context.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from probtalk_tpu.models.ptransformer import PositionalEncoding, StyledDecoderLayer


class RTransformer(nn.Module):
    in_dim: int = 376
    condi_dim: int = 768
    dim: int = 512
    layers: int = 6
    heads: int = 8
    n_classes: int = 4
    use_label: bool = True
    motion_context: bool = True
    max_len: int = 1800
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None   # bf16 compute option
    remat: bool = False  # per-layer activation checkpointing
    flash: bool = False  # Pallas blockwise attention (long-clip eval)

    @nn.compact
    def __call__(self, x, audio, mask, label, train: bool = False):
        """x: (B, T, C) blended input motion; audio: (B, T, Ca);
        mask: (B, T, 1) known-context indicator; label: (B,) speaker ids.
        Returns (B, T, C) refined motion."""
        t = x.shape[1]
        pe = PositionalEncoding(self.dim, self.max_len, name="PE")(t)[None]
        h = nn.Dense(self.dim, name="input_conv")(x) + pe

        cond = audio
        if self.motion_context:
            onehot = jnp.concatenate([1.0 - mask, mask], axis=-1)
            cond = jnp.concatenate([cond, onehot], axis=-1)
        cond = nn.Dense(self.dim, name="audio_conv")(cond) + pe

        if self.use_label:
            label_embed = nn.Embed(self.n_classes, self.dim, name="class_embed")(label)
        else:
            label_embed = jnp.zeros((x.shape[0], self.dim), x.dtype)
        layer_cls = (StyledDecoderLayer if not self.remat else
                     nn.remat(StyledDecoderLayer, static_argnums=(5,)))
        for i in range(self.layers):
            h = layer_cls(
                self.dim, self.heads, styled=self.use_label,
                dropout=self.dropout, dtype=self.dtype, flash=self.flash,
                name=f"layer_{i}",
            )(h, cond, label_embed, None, train)

        out = nn.Dense(1024, name="out_hidden")(h)
        out = nn.relu(out)
        return nn.Dense(self.in_dim, name="out_proj")(out)
