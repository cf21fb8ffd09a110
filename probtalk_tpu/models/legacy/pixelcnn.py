"""Gated PixelCNN over the (T/4, 2) body+hand code grid (s2g_body_pixel).

Capability of the reference's ``nets/spg/gated_pixelcnn_v2.py:24-177``: a
class- and audio-conditioned masked-conv autoregressive prior over the
legacy VQ code grid, with vertical/horizontal gated stacks, plus the
sequential ``generate`` sampler.

Causality is built from asymmetric padding instead of in-place kernel
masking (the torch version zeroes kernel rows at forward time, which is
hostile to jit): mask-A (first layer) sees strictly-previous rows/columns,
mask-B includes the current position.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


class GatedMaskedConv(nn.Module):
    """One vertical+horizontal gated masked conv block
    (reference GatedMaskedConv2, gated_pixelcnn_v2.py:24-87)."""

    dim: int
    kernel: int = 3
    mask_a: bool = False
    residual: bool = True
    n_classes: int = 4
    bh_model: bool = True

    @nn.compact
    def __call__(self, x_v, x_h, label):
        k2 = self.kernel // 2
        # class conditioning, broadcast over the grid
        cond = nn.Embed(self.n_classes, 2 * self.dim, name="class_cond")(label)
        cond = cond[:, None, None, :]

        if self.mask_a:
            # strictly previous rows: kernel height k2, top-pad k2
            h_vert = nn.Conv(self.dim * 2, (max(k2, 1), 3 if self.bh_model else 1),
                             padding=[(max(k2, 1), 0), (1, 1)] if self.bh_model
                             else [(max(k2, 1), 0), (0, 0)],
                             name="vert_stack")(x_v)[:, : x_v.shape[1]]
        else:
            # rows i-k2 .. i inclusive
            h_vert = nn.Conv(self.dim * 2, (k2 + 1, 3 if self.bh_model else 1),
                             padding=[(k2, 0), (1, 1)] if self.bh_model
                             else [(k2, 0), (0, 0)],
                             name="vert_stack")(x_v)[:, : x_v.shape[1]]

        def gate(u):
            a, b = jnp.split(u, 2, axis=-1)
            return jnp.tanh(a) * nn.sigmoid(b)

        out_v = gate(h_vert + cond)

        if self.bh_model:
            if self.mask_a:
                # strictly previous column only: shift right by one
                xs = jnp.pad(x_h, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :-1]
                h_horiz = nn.Conv(self.dim * 2, (1, 1), name="horiz_stack")(xs)
            else:
                # columns j-1 .. j
                h_horiz = nn.Conv(self.dim * 2, (1, 2),
                                  padding=[(0, 0), (1, 0)],
                                  name="horiz_stack")(x_h)[:, :, : x_h.shape[2]]
            v2h = nn.Conv(self.dim * 2, (1, 1), name="vert_to_horiz")(h_vert)
            out = gate(v2h + h_horiz + cond)
            out_h = nn.Conv(self.dim, (1, 1), name="horiz_resid")(out)
            if self.residual:
                out_h = out_h + x_h
        else:
            out_v2 = nn.Conv(self.dim, (1, 1), name="horiz_resid")(out_v)
            out_v = out_v2 + x_v if self.residual else out_v2
            out_h = out_v
        return out_v, out_h


class GatedPixelCNN2D(nn.Module):
    """AR prior over (B, H=T/4, W=2) code grids
    (reference GatedPixelCNN, gated_pixelcnn_v2.py:90-177)."""

    num_codes: int = 2048
    dim: int = 64
    layers: int = 15
    n_classes: int = 4
    audio: bool = True
    bh_model: bool = True

    def setup(self):
        self.embedding = nn.Embed(self.num_codes, self.dim, name="embedding")
        if self.audio:
            self.embedding_aud = nn.Dense(self.dim, name="embedding_aud")
            self.fusion_v = nn.Dense(self.dim, name="fusion_v")
            self.fusion_h = nn.Dense(self.dim, name="fusion_h")
        self.blocks = [
            GatedMaskedConv(self.dim, kernel=7 if i == 0 else 3,
                            mask_a=(i == 0), residual=(i != 0),
                            n_classes=self.n_classes, bh_model=self.bh_model,
                            name=f"layer_{i}")
            for i in range(self.layers)
        ]
        self.out_hidden = nn.Dense(512, name="out_hidden")
        self.out_proj = nn.Dense(self.num_codes, name="out_proj")

    def __call__(self, codes, label, audio=None):
        """codes: (B, H, W) int; audio: (B, H, Ca) at code rate.
        -> logits (B, H, W, num_codes)."""
        x = self.embedding(codes)                      # (B, H, W, dim)
        if self.audio and audio is not None:
            a = self.embedding_aud(audio)[:, :, None, :]  # (B, H, 1, dim)
            a = jnp.broadcast_to(a, x.shape)
            x_v = self.fusion_v(jnp.concatenate([x, a], -1))
            x_h = self.fusion_h(jnp.concatenate([x, a], -1))
        else:
            x_v = x_h = x
        for blk in self.blocks:
            x_v, x_h = blk(x_v, x_h, label)
        h = nn.relu(self.out_hidden(x_h))
        return self.out_proj(h)

    def generate(self, key, label, shape, audio=None):
        """Sequential AR sampling over the grid (reference generate,
        gated_pixelcnn_v2.py:155-177) as one fori_loop."""
        b = label.shape[0]
        hgt, wdt = shape

        def body(i, carry):
            codes, k = carry
            r, c = i // wdt, i % wdt
            k, ks = jax.random.split(k)
            logits = self.__call__(codes, label, audio)
            tok = jax.random.categorical(ks, logits[:, r, c], axis=-1)
            return codes.at[:, r, c].set(tok.astype(jnp.int32)), k

        codes = jnp.zeros((b, hgt, wdt), jnp.int32)
        codes, _ = jax.lax.fori_loop(0, hgt * wdt, body, (codes, key))
        return codes
