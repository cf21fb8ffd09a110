"""Exact-architecture Speech2Gesture and LS3DCG baselines.

Architecture-faithful flax twins of the reference GAN baselines, built for
golden forward-parity against the running torch reference (weights mapped
by ``convert.torch_checkpoint.convert_{speech2gesture,ls3dcg}_*``):

  * Speech2Gesture — ``nets/speech2gesture.py:120-606``: 2-D spectrogram
    CNN audio encoder + 1-D conv UNet, pre-pose MLP, optional VAE pose
    template, LSGAN patch discriminator over motion differences.
  * LS3DCG — ``nets/LS3DCG.py:29-309``: shared conv encoder with maxpool
    pyramid + three skip-connected decoders (face/body/hand), LSGAN
    discriminator over [motion | audio] with a sigmoid head.

Layout is channel-last (B, T, C). Padding notes carried from the torch
source: the reference's ``Conv1d_tf``/``Conv2d_tf`` implement TF "SAME"
(flax's "SAME"), and its lowercase ``padding='valid'`` never matches the
``"VALID"`` branch — i.e. every ConvNormRelu is effectively SAME except
the one uppercase ``'VALID'`` layer in the 2-D audio encoder.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

class CNR(nn.Module):
    """Conv(SAME/VALID) + BatchNorm + LeakyReLU(0.2) — the reference's
    speech2gesture.ConvNormRelu (1d and 2d)."""

    features: int
    kernel: Sequence[int] = (3,)
    strides: Sequence[int] = (1,)
    padding: str = "SAME"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, tuple(self.kernel), tuple(self.strides),
                    padding=self.padding, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="norm")(x)
        return nn.leaky_relu(x, 0.2)


def nearest_resize_time(x, t_out: int):
    """torch F.interpolate(mode='nearest') along the time axis (axis 1):
    index floor(i * T_in / t_out)."""
    t_in = x.shape[1]
    if t_in == t_out:
        return x
    idx = jnp.floor(jnp.arange(t_out) * (t_in / t_out)).astype(jnp.int32)
    return x[:, idx]


def repeat_upsample_time(x, t_out: int):
    """torch repeat_interleave(2, time)[:t_out] (speech2gesture UnetUp)."""
    return jnp.repeat(x, 2, axis=1)[:, :t_out]


class SeqEncoder1DExact(nn.Module):
    """(B, T_in, C_in) -> (B, C_out): the reference's SeqEncoder1D
    (``nets/layers.py:454-512``) — conv+BN+ReLU stack halving T / doubling C
    per its exact layer schedule (torch-symmetric padding (k-s)//2)."""

    c_in: int
    c_out: int
    t_in: int
    min_layer_nums: int = 0

    @staticmethod
    def schedule(c_in, c_out, t_in, min_layer_nums=0):
        layers, cur_c, cur_t = [], c_in, t_in
        while cur_c < c_out or cur_t > 1:
            if cur_t > 4:
                ks, st = 4, 2
            elif cur_t > 1:
                ks, st = cur_t, cur_t
            else:
                ks, st = 3, 1
            layers.append((min(c_out, cur_c * 2), ks, st))
            cur_c = min(cur_c * 2, c_out)
            cur_t = cur_t // 2 if cur_t > 4 else (1 if cur_t > 1 else cur_t)
        while len(layers) < min_layer_nums:
            layers.append((c_out, 1, 1))
        return layers

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (f, k, s) in enumerate(
                self.schedule(self.c_in, self.c_out, self.t_in,
                              self.min_layer_nums)):
            pad = (k - s) // 2
            x = nn.Conv(f, (k,), (s,), padding=[(pad, pad)],
                        name=f"l{i}/conv")(x)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"l{i}/norm")(x)
            x = nn.relu(x)
        return x.reshape(x.shape[0], -1)


# ---------------------------------------------------------------------------
# Speech2Gesture (nets/speech2gesture.py)
# ---------------------------------------------------------------------------

class S2GAudioEncoder(nn.Module):
    """2-D spectrogram CNN + 1-D UNet (reference AudioEncoder,
    speech2gesture.py:161-222). Input (B, T_spec, F); output (B, T, 256)."""

    @nn.compact
    def __call__(self, spectrogram, time_steps: int, train: bool = False):
        h = spectrogram[..., None]                       # (B, T, F, 1)
        plan = [(64, 1, "SAME"), (64, 2, "SAME"), (128, 1, "SAME"),
                (128, 2, "SAME"), (256, 1, "SAME"), (256, 2, "SAME"),
                (256, 1, "SAME"), (256, 1, "VALID")]
        for i, (f, s, pad) in enumerate(plan):
            k = (4, 4) if s == 2 else (3, 3)
            h = CNR(f, k, (s, s), padding=pad, name=f"first_{i}")(h, train)
        # bilinear to (time_steps, 1): torch align_corners=False == jax
        # half-pixel linear with antialias off
        b, _, _, c = h.shape
        h = jax.image.resize(h, (b, time_steps, 1, c), method="linear",
                             antialias=False)[:, :, 0]   # (B, T, 256)

        x2 = CNR(256, name="down1_0")(h, train)
        x2 = CNR(256, name="down1_1")(x2, train)
        skips = [x2]
        hh = x2
        for i in range(5):                               # down2..down6
            hh = CNR(256, (4,), (2,), name=f"down{i + 2}")(hh, train)
            skips.append(hh)
        x = skips[-1]
        for i in range(5):                               # up1..up5
            skip = skips[-(i + 2)]
            x = repeat_upsample_time(x, skip.shape[1]) + skip
            x = CNR(256, name=f"up{i + 1}")(x, train)
        return x


class S2GGenerator(nn.Module):
    """Reference Generator (speech2gesture.py:225-325): audio encoder +
    pre-pose MLP (+ optional VAE template) -> conv decoder -> poses."""

    pose_dim: int
    n_poses: int = 88
    n_pre_poses: int = 4
    use_template: bool = False
    template_length: int = 0

    @nn.compact
    def __call__(self, in_spec, pre_poses, gt_poses=None, template=None,
                 time_steps=None, train: bool = False, rng=None):
        t = time_steps if time_steps is not None else self.n_poses
        mu = var = None
        if self.use_template:
            if gt_poses is not None:
                enc = SeqEncoder1DExact(self.pose_dim, 64, self.n_poses,
                                        name="pose_encoder")(gt_poses, train)
                mu = nn.Dense(self.template_length, name="mu_fc")(enc)
                var = nn.Dense(self.template_length, name="var_fc")(enc)
                eps = jax.random.normal(rng, mu.shape) if rng is not None \
                    else jnp.zeros_like(mu)
                template = mu + jnp.exp(0.5 * var) * eps
            elif template is None:
                template = jax.random.normal(
                    rng, (in_spec.shape[0], self.template_length))

        audio_feat = S2GAudioEncoder(name="audio_encoder")(
            in_spec, t, train)                           # (B, T, 256)

        pp = pre_poses.reshape(pre_poses.shape[0], -1)
        pp = nn.Dense(32, name="pre_fc0")(pp)
        pp = nn.BatchNorm(use_running_average=not train, name="pre_bn")(pp)
        pp = nn.relu(pp)
        pp = nn.Dense(16, name="pre_fc1")(pp)
        pp = jnp.repeat(pp[:, None], t, axis=1)          # (B, T, 16)

        feats = [audio_feat, pp]
        if self.use_template:
            feats.append(jnp.repeat(template[:, None], t, axis=1))
        h = jnp.concatenate(feats, axis=-1)
        for i in range(4):
            h = CNR(256, name=f"dec_{i}")(h, train)
        out = nn.Conv(self.pose_dim, (1,), name="final_out")(h)
        return (out, template, mu, var) if train or gt_poses is not None \
            else out


class S2GDiscriminator(nn.Module):
    """Reference Discriminator (speech2gesture.py:325-340): LSGAN patch D.
    Input: motion differences (B, T-1, pose_dim) -> (B, T', 1) logits."""

    @nn.compact
    def __call__(self, motion_diff, train: bool = False):
        h = nn.Conv(64, (4,), (2,), padding="SAME", name="c0")(motion_diff)
        h = nn.leaky_relu(h, 0.2)
        h = CNR(128, (4,), (2,), name="c1")(h, train)
        h = CNR(256, (4,), (1,), name="c2")(h, train)
        return nn.Conv(1, (4,), (1,), padding="SAME", name="out")(h)


def s2g_gan_losses(pred_poses, gt_poses, d_apply, kp_weight: float = 1.0,
                   gan_weight: float = 1.0, mu=None, var=None,
                   kl_tolerance: float = 0.02):
    """The reference's LSGAN loss set (speech2gesture.py:420-460):
    D trains on pose DIFFERENCES; G gets L1 + LSGAN + (optional) KL.
    d_apply(x) -> logits. Returns (d_loss, g_loss, dict)."""
    gt_motion = gt_poses[:, 1:] - gt_poses[:, :-1]
    pr_motion = pred_poses[:, 1:] - pred_poses[:, :-1]

    dis_real = d_apply(gt_motion)
    dis_fake = d_apply(jax.lax.stop_gradient(pr_motion))
    d_loss = jnp.mean((dis_real - 1.0) ** 2) + jnp.mean(dis_fake ** 2)

    l1 = jnp.mean(jnp.abs(pred_poses - gt_poses))
    gen_logits = d_apply(pr_motion)
    gen_err = jnp.mean((gen_logits - 1.0) ** 2)
    g_loss = kp_weight * l1 + gan_weight * gen_err
    out = {"dis": d_loss, "l1_loss": l1, "gen": gen_err}
    if mu is not None:
        kld = jnp.maximum(
            jnp.mean(-0.5 * jnp.sum(1 + var - mu ** 2 - jnp.exp(var), -1)),
            kl_tolerance)
        g_loss = g_loss + kld
        out["kld_loss"] = kld
    return d_loss, g_loss, out


# ---------------------------------------------------------------------------
# LS3DCG (nets/LS3DCG.py)
# ---------------------------------------------------------------------------

class LS3DCGDecoderHead(nn.Module):
    """Skip-connected decoder (reference Deocoder, LS3DCG.py:29-58)."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x, x1, x2, x3, train: bool = False):
        c = self.in_ch
        x = nearest_resize_time(x, x3.shape[1])
        x = jnp.concatenate([x, x3], axis=-1)
        x = CNR(c // 2, name="up1_0")(x, train)
        x = CNR(c // 2, name="up1_1")(x, train)
        x = repeat_upsample_time(x, x.shape[1] * 2)
        x = nearest_resize_time(x, x2.shape[1])
        x = jnp.concatenate([x, x2], axis=-1)
        x = CNR(c // 4, name="up2_0")(x, train)
        x = CNR(c // 4, name="up2_1")(x, train)
        x = repeat_upsample_time(x, x.shape[1] * 2)
        x = nearest_resize_time(x, x1.shape[1])
        x = jnp.concatenate([x, x1], axis=-1)
        x = CNR(c // 8, name="up3_0")(x, train)
        x = CNR(c // 8, name="up3_1")(x, train)
        return nn.Conv(self.out_ch, (1,), name="up3_out")(x)


class LS3DCGGenerator(nn.Module):
    """Reference Generator (LS3DCG.py:61-131): shared maxpool conv pyramid
    + face/body/hand decoders. Input audio (B, T, 64); output
    (B, T, jaw+exp + body + hand) in the reference's channel order."""

    each_dim: Sequence[int] = (6, 90, 180, 100)

    @nn.compact
    def __call__(self, aud, train: bool = False):
        def pool(h):
            return nn.max_pool(h, (2,), strides=(2,))

        x1 = CNR(64, name="down1_0")(aud, train)
        x1 = CNR(128, name="down1_1")(x1, train)
        x2 = CNR(128, name="down2_0")(pool(x1), train)
        x2 = CNR(256, name="down2_1")(x2, train)
        x3 = CNR(256, name="down3_0")(pool(x2), train)
        x3 = CNR(512, name="down3_1")(x3, train)
        x = CNR(512, name="down4_0")(pool(x3), train)
        x = CNR(1024, name="down4_1")(x, train)
        x = repeat_upsample_time(x, x.shape[1] * 2)

        jaw, body, hand, exp = self.each_dim
        face = LS3DCGDecoderHead(1024, jaw + exp, name="face_decoder")(
            x, x1, x2, x3, train)
        body_o = LS3DCGDecoderHead(1024, body, name="body_decoder")(
            x, x1, x2, x3, train)
        hand_o = LS3DCGDecoderHead(1024, hand, name="hand_decoder")(
            x, x1, x2, x3, train)
        return jnp.concatenate([face, body_o, hand_o], axis=-1)


class LS3DCGDiscriminator(nn.Module):
    """Reference Discriminator (LS3DCG.py:134-155): conv + maxpool stack
    with a sigmoid head; input [motion | audio] (B, T, C)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        def pool(h):
            return nn.max_pool(h, (2,), strides=(2,))

        h = CNR(128, name="c0")(x, train)
        h = CNR(256, name="c1")(h, train)
        h = pool(h)
        h = CNR(256, name="c2")(h, train)
        h = CNR(512, name="c3")(h, train)
        h = pool(h)
        h = CNR(512, name="c4")(h, train)
        h = CNR(1024, name="c5")(h, train)
        h = pool(h)
        h = nn.Conv(1, (1,), name="out")(h)
        return jax.nn.sigmoid(h)


def ls3dcg_losses(pred, gt_poses_bh, jaw, expression, aud, d_apply,
                  each_dim=(6, 90, 180, 100), kp_weight: float = 1.0,
                  gan_weight: float = 1.0):
    """Reference get_loss (LS3DCG.py:229-280): per-part L1/MSE + LSGAN on
    [body+hand | audio]. pred is generator output (channel order
    [jaw|exp|body|hand]); gt_poses_bh the c_index-selected channels."""
    jd, bd, hd, ed = each_dim
    gt_aud = jnp.concatenate([gt_poses_bh, aud], axis=-1)
    pred_bh = pred[..., jd + ed:]
    pred_aud = jnp.concatenate([pred_bh, aud], axis=-1)

    dis_real = d_apply(gt_aud)
    dis_fake = d_apply(jax.lax.stop_gradient(pred_aud))
    d_loss = jnp.mean((dis_real - 1.0) ** 2) + jnp.mean(dis_fake ** 2)

    jaw_loss = jnp.mean(jnp.abs(pred[..., :jd] - jaw))
    face_loss = jnp.mean((pred[..., jd:jd + ed] - expression) ** 2)
    body_loss = jnp.mean(jnp.abs(pred[..., jd + ed:jd + ed + bd] -
                                 gt_poses_bh[..., :bd]))
    hand_loss = jnp.mean(jnp.abs(pred[..., jd + ed + bd:] -
                                 gt_poses_bh[..., bd:]))
    l1 = jaw_loss + face_loss + body_loss + hand_loss
    gen_err = jnp.mean((d_apply(pred_aud) - 1.0) ** 2)
    g_loss = kp_weight * l1 + gan_weight * gen_err
    return d_loss, g_loss, {
        "dis": d_loss, "gen": gen_err, "jaw_loss": jaw_loss,
        "face_loss": face_loss, "body_loss": body_loss,
        "hand_loss": hand_loss,
    }
