"""s2g_face: speech -> face (jaw + expression) generator.

Capability of the reference's face branch (``nets/smplx_face.py:25-193``,
``nets/spg/s2g_face.py:139-225``): frozen wav2vec2 features -> 256-d
projection -> speaker-conditioned conv middle -> two conv decoder heads
regressing jaw rotation (6d) and 100-d expression. LayerNorm convs.

The audio encoder lives outside (precomputed wav2vec features or the flax
Wav2Vec2Encoder); this module is the trainable generator.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class LNConv(nn.Module):
    """conv k3 + LayerNorm + leaky relu (the face branch's norm='ln' blocks)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3,), padding="SAME", name="conv")(x)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm")(h)
        return nn.leaky_relu(h, negative_slope=0.2)


class FaceGenerator(nn.Module):
    jaw_dim: int = 6          # 6d jaw rotation
    expression_dim: int = 100
    hidden: int = 256
    n_classes: int = 4
    identity: bool = True

    @nn.compact
    def __call__(self, aud_feat, speaker=None, train: bool = False):
        """aud_feat: (B, T, 768) wav2vec features -> (B, T, jaw+expr)."""
        h = nn.Dense(self.hidden, name="audio_feature_map")(aud_feat)
        # speaker-conditioned middle (the reference's audio_middle with id)
        for i in range(2):
            h = LNConv(self.hidden, name=f"middle_{i}")(h)
        if self.identity and speaker is not None:
            emb = nn.Embed(self.n_classes, self.hidden * 2, name="id_embed")(speaker)
            scale, shift = jnp.split(emb[:, None, :], 2, axis=-1)
            h = h * (1 + scale) + shift

        jaw = h
        for i in range(3):
            jaw = LNConv(64, name=f"jaw_dec_{i}")(jaw)
        jaw = nn.Conv(self.jaw_dim, (1,), name="jaw_out")(jaw)

        expr = h
        for i in range(3):
            expr = LNConv(self.hidden, name=f"expr_dec_{i}")(expr)
        expr = nn.Conv(self.expression_dim, (1,), name="expr_out")(expr)

        return jnp.concatenate([jaw, expr], axis=-1)


def face_loss(pred, gt, jaw_dim: int = 6):
    """MSE jaw + MSE expression (+ velocity), the reference's face objective
    (nets/smplx_face.py training losses)."""
    jaw = jnp.mean((pred[..., :jaw_dim] - gt[..., :jaw_dim]) ** 2)
    expr = jnp.mean((pred[..., jaw_dim:] - gt[..., jaw_dim:]) ** 2)
    vel = jnp.mean(jnp.abs(jnp.diff(pred, axis=-2) - jnp.diff(gt, axis=-2)))
    return jaw + expr + vel, {"jaw_loss": jaw, "exp_loss": expr, "velocity_loss": vel}
