"""GatedPixelCNN-1D decoder option for the predictor.

Capability of the reference's ``nets/inpainting/gated_pixelcnn_1d.GatedPixelCNN``
(selected over the PTransformer at ``predictornet.py:56-58``): an
autoregressive masked-conv decoder over the (T/8, groups) PQ-code grid,
conditioned on the fused motion/audio/text features (injected after the
first masked layer through LayerNorm MLP fusions) and the speaker id
(per-layer class embeddings).

Shares the causal masked-conv math with the legacy TalkSHOW prior
(``models/legacy/pixelcnn.GatedMaskedConv`` — asymmetric padding instead
of the torch version's forward-time kernel zeroing). Sampling runs the
full-grid forward under a ``fori_loop`` over positions; causality makes
this equal to the reference's grow-the-prefix loop (``predict``,
gated_pixelcnn_1d.py:267-290) with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from probtalk_tpu.models.legacy.pixelcnn import GatedMaskedConv


class _FusionMLP(nn.Module):
    """Dense -> LayerNorm -> LeakyReLU(0.1) -> Dropout(0.1)
    (reference fusion/fusion2/fusion3 heads)."""

    features: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, name="fc")(x)
        x = nn.LayerNorm(name="ln")(x)
        x = nn.leaky_relu(x, 0.1)
        return nn.Dropout(0.1, deterministic=not train)(x)


class GatedPixelCNN1D(nn.Module):
    """AR decoder over (B, Tc, G) code grids -> (B, Tc, G, num_code)."""

    groups: int = 4
    condi_dim: int = 1024
    dim: int = 512
    layers: int = 10
    num_code: int = 128
    n_classes: int = 4

    def setup(self):
        assert self.groups > 1, "grouped (2D-grid) decoding only"
        # reference: fusion -> 512, fusion2/3 -> 512 with dim hard-wired to
        # 512 (Linear(1024, 512)); generalized here to follow `dim`
        self.fusion = _FusionMLP(512, name="fusion")
        self.fusion2 = _FusionMLP(self.dim, name="fusion2")
        self.fusion3 = _FusionMLP(self.dim, name="fusion3")
        # +1: the MaskGit-style mask token shares the embedding table
        self.state_embedding = nn.Embed(self.num_code + 1, self.dim,
                                        name="state_embedding")
        self.blocks = [
            GatedMaskedConv(self.dim, kernel=7 if i == 0 else 3,
                            mask_a=(i == 0), residual=(i != 0),
                            n_classes=self.n_classes, name=f"ar_{i}")
            for i in range(self.layers)
        ]
        self.out_hidden = nn.Dense(512, name="out_hidden")
        self.out_proj = nn.Dense(self.num_code, name="out_proj")

    def __call__(self, codes, label, condition, epoch_ratio=1.0,
                 train: bool = False):
        """codes (B, Tc, G) int (mask id = num_code); condition (B, Tc, Cc);
        label (B,) speaker ids -> logits (B, Tc, G, num_code)."""
        cond = self.fusion(condition, train)               # (B, Tc, 512)
        x = self.state_embedding(codes)                    # (B, Tc, G, dim)
        cond_g = jnp.broadcast_to(cond[:, :, None, :],
                                  x.shape[:3] + (cond.shape[-1],))
        x_v, x_h = x, x
        for i, blk in enumerate(self.blocks):
            if i == 1:
                x_v = self.fusion2(jnp.concatenate([x_v, cond_g], -1), train)
                x_h = self.fusion3(jnp.concatenate([x_h, cond_g], -1), train)
            x_v, x_h = blk(x_v, x_h, label)
        return self.out_proj(nn.relu(self.out_hidden(x_h)))

    def sample(self, key, label, condition, steps: int = 0):
        """AR sampling over the grid (row-major: time outer, group inner).
        `steps` accepted for PTransformer surface-compat and ignored."""
        b, tc = condition.shape[0], condition.shape[1]
        g = self.groups

        def body(i, carry):
            codes, k = carry
            r, c = i // g, i % g
            k, ks = jax.random.split(k)
            logits = self.__call__(codes, label, condition)
            tok = jax.random.categorical(ks, logits[:, r, c], axis=-1)
            return codes.at[:, r, c].set(tok.astype(jnp.int32)), k

        codes = jnp.zeros((b, tc, g), jnp.int32)
        codes, _ = jax.lax.fori_loop(0, tc * g, body, (codes, key))
        return codes
