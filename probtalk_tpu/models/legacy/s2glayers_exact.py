"""Exact-architecture twin of the s2glayers VAE-template GAN generator.

Rebuilds ``nets/spg/s2glayers.py:157-522`` — the Speech2Gesture-era
Generator/Discriminator pair with the **w_pre GRU continuity path**
(``s2glayers.py:192-201,424-466``): a single-step GRU whose initial hidden
state is an encoding of the previous window's last pose, seeding the first
UNet time frame so consecutive windows join smoothly. This was the one
reference code path with no equivalent in the rebuild (ROADMAP r3); the
class itself is dormant upstream (imported by ``nets/smplx_body_vq.py:10``
but never instantiated, and no call site passes ``w_pre=True``), carried
here for full surface parity and golden-tested against the running torch
class (tests/test_torch_parity_s2glayers.py).

Layout is channel-last (B, T, C). Padding notes: the s2glayers *function*
``ConvNormRelu`` routes through ``Conv1d_tf`` whose lowercase
``padding='valid'`` branch is commented out upstream — every such conv is
effectively TF-"SAME" (flax "SAME"). The ``nets/layers.py`` ConvNormRelu
*class* (used via SeqTranslator1D) pads ``(k-s)//2`` — identical to SAME
at k=3, s=1 — and uses plain ReLU with a pre-activation residual add.

TPU notes: the GRU is one cell step (no scan); everything else is convs
XLA fuses; BN stays f32.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class CNRf(nn.Module):
    """The s2glayers ConvNormRelu FUNCTION (s2glayers.py:117-155):
    Conv1d_tf(SAME) + BatchNorm + LeakyReLU(0.2)."""

    features: int
    k: int = 3
    s: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.features, (self.k,), (self.s,), padding="SAME",
                    name="conv")(x)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         dtype=jnp.float32, name="norm")(h)
        return nn.leaky_relu(h, 0.2)


class CNRc(nn.Module):
    """The nets/layers.py ConvNormRelu CLASS at k=3,s=1 (layers.py:25-152):
    conv + BN (+ residual pre-activation) + ReLU."""

    features: int
    residual: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(self.features, (3,), padding=1, name="conv")(x)
        h = nn.BatchNorm(use_running_average=not train, epsilon=1e-5,
                         dtype=jnp.float32, name="norm")(h)
        if self.residual:
            if x.shape[-1] == self.features:
                h = h + x
            else:
                h = h + nn.Conv(self.features, (3,), padding=1,
                                name="res")(x)
        return nn.relu(h)


class SeqTranslator1DExact(nn.Module):
    """nets/layers.py SeqTranslator1D (layers.py:799-839): a stack of
    residual CNRc blocks, first block changing channel count."""

    features: int
    layers: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for i in range(self.layers):
            h = CNRc(self.features, name=f"block_{i}")(h, train)
        return h


class UNetS2G(nn.Module):
    """s2glayers UNet (s2glayers.py:171-214): 3-conv stem, optional
    GRU-seeded first frame (w_pre), 5 stride-2 downs, 5 interp-add ups.

    Returns (out, x2_0) like the torch forward."""

    dim: int

    @nn.compact
    def __call__(self, x1, pre_pose=None, w_pre: bool = False,
                 train: bool = False):
        h = CNRf(x1.shape[-1], name="down1_0")(x1, train)
        h = CNRf(self.dim, name="down1_1")(h, train)
        x2_0 = CNRf(self.dim, name="down1_2")(h, train)

        if w_pre:
            # single GRU step: input = first frame of the stem output,
            # initial hidden = previous window's pose encoding last frame
            # (s2glayers.py:194-197). Output replaces frame 0.
            h0 = pre_pose[:, -1]                         # (B, dim)
            _, y = nn.GRUCell(features=self.dim, name="gru")(h0, x2_0[:, 0])
            x2 = jnp.concatenate([y[:, None], x2_0[:, 1:]], axis=1)
        else:
            x2 = x2_0

        skips = [x2]
        hh = x2
        for i in range(5):                               # down2..down6
            hh = CNRf(self.dim, k=4, s=2, name=f"down{i + 2}")(hh, train)
            skips.append(hh)
        x = skips[-1]
        for i in range(5):                               # up1..up5 (UnetUp)
            skip = skips[-(i + 2)]
            b, _, c = x.shape
            x = jax.image.resize(x, (b, skip.shape[1], c), method="linear",
                                 antialias=False) + skip
            x = CNRf(self.dim, name=f"up{i + 1}")(x, train)
        return x, x2_0


class AudioEncoderS2G(nn.Module):
    """s2glayers AudioEncoder (s2glayers.py:216-299). pose=True: conv stem
    -> VAE reparam to 128ch -> concat per-step template -> UNet(common);
    pose=False ('speech encoder'): conv stem -> UNet(256)."""

    pose: bool
    template_length: int = 0
    common_dim: int = 512

    @nn.compact
    def __call__(self, spect, template=None, pre_pose=None,
                 w_pre: bool = False, train: bool = False, rng=None):
        mu = var = None
        if self.pose:
            out = SeqTranslator1DExact(256, layers=4,
                                       name="first_net")(spect, train)
            out = nn.Dropout(0.1, deterministic=not train)(out)
            mu = nn.Conv(128, (1,), name="mu_fc")(out)
            var = nn.Conv(128, (1,), name="var_fc")(out)
            eps = (jax.random.normal(rng, mu.shape) if rng is not None
                   else jnp.zeros_like(mu))
            audio = mu + jnp.exp(0.5 * var) * eps        # __reparam
            x1 = jnp.concatenate([audio, template], axis=-1)
            x1, x2_0 = UNetS2G(self.common_dim, name="unet")(
                x1, pre_pose=pre_pose, w_pre=w_pre, train=train)
        else:
            x1 = SeqTranslator1DExact(256, layers=4,
                                      name="first_net")(spect, train)
            x1 = nn.Dropout(0.1, deterministic=not train)(x1)
            x1, x2_0 = UNetS2G(256, name="unet")(x1, train=train)
        return x1, (mu, var), x2_0


def _renorm_55x5(pre_pose):
    """The eval-time w_pre renormalization (s2glayers.py:446-451): the
    275 non-expression channels viewed as 55 joints x 5, L2-normalizing
    each leading 3-vector and trailing 2-vector."""
    b, t, c = pre_pose.shape
    v = pre_pose.reshape(b, t, c // 5, 5)
    n3 = v[..., :3] / jnp.maximum(
        jnp.linalg.norm(v[..., :3], axis=-1, keepdims=True), 1e-12)
    n2 = v[..., 3:5] / jnp.maximum(
        jnp.linalg.norm(v[..., 3:5], axis=-1, keepdims=True), 1e-12)
    return jnp.concatenate([n3, n2], axis=-1).reshape(b, t, c)


class GeneratorS2GL(nn.Module):
    """s2glayers Generator (s2glayers.py:303-495), both decoder forms
    (separate per-part heads, and the fused 6x512 stack at
    ``separate=False``).

    each_dim: (jaw, body, hand, expression) channel split of pose_dim.
    Returns poses (B, T, pose_dim) at eval; at train additionally the
    template and its (mu, var) plus the aux tuple, mirroring the torch
    return arity."""

    pose_dim: int
    each_dim: Sequence[int]
    n_poses: int = 60
    use_template: bool = True
    template_length: int = 64
    separate: bool = True
    expression: bool = True
    common_dim: int = 256

    @nn.compact
    def __call__(self, in_spec, pre_poses=None, gt_poses=None, template=None,
                 time_steps: Optional[int] = None, w_pre: bool = False,
                 norm: bool = True, train: bool = False,
                 branch_train: Optional[bool] = None, rng=None):
        """``branch_train`` picks the torch ``self.training`` branch
        independently of BN/dropout mode (the reference's constructor
        ``training`` flag vs module train()/eval() are separate knobs,
        s2glayers.py:313,429); None follows ``train``."""
        bt = train if branch_train is None else branch_train
        gen_length = time_steps if time_steps is not None else self.n_poses
        mu = var = pre_pose = None
        k_t = k_a = None
        if rng is not None:
            k_t, k_a = jax.random.split(rng)

        if self.use_template:
            if bt:
                if w_pre:
                    in_spec = in_spec[:, 15:, :]
                    pre_pose = SeqTranslator1DExact(
                        self.common_dim, layers=5, name="pre_pose_encoder")(
                            gt_poses[:, 14:15, :-50], train)
                    enc_in = gt_poses[:, 15:, :-50]
                else:
                    enc_in = gt_poses[:, :, :-50]
                pose_enc = SeqTranslator1DExact(
                    self.common_dim, layers=3, name="pose_encoder")(
                        enc_in, train)
                mu = nn.Conv(self.template_length, (1,),
                             name="mu_fc")(pose_enc)
                var = nn.Conv(self.template_length, (1,),
                              name="var_fc")(pose_enc)
                eps = (jax.random.normal(k_t, mu.shape) if k_t is not None
                       else jnp.zeros_like(mu))
                template = mu + jnp.exp(0.5 * var) * eps
            elif pre_poses is not None:
                if w_pre:
                    pp = pre_poses[:, -1:, :-50]
                    if norm:
                        pp = _renorm_55x5(pp)
                    pre_pose = SeqTranslator1DExact(
                        self.common_dim, layers=5,
                        name="pre_pose_encoder")(pp, train)
                # torch ALWAYS redraws the template here — a caller-passed
                # template is discarded (s2glayers.py:449,453)
                b = in_spec.shape[0]
                template = (jax.random.normal(
                    k_t, (b, gen_length, self.template_length))
                    if k_t is not None else
                    jnp.zeros((b, gen_length, self.template_length)))
            elif gt_poses is not None:
                # s2glayers.py:458 — template from pre_pose_encoder over the
                # non-expression gt channels. Upstream this branch is dead
                # bit-rot: it leaves torch's ``pre_pose`` unbound
                # (UnboundLocalError at the audio_encoder call) and yields a
                # common_dim-wide template where the UNet stem was built for
                # template_length. The declared dataflow is carried; the
                # flax twin runs it because conv in-widths are inferred.
                template = SeqTranslator1DExact(
                    self.common_dim, layers=5,
                    name="pre_pose_encoder")(gt_poses[:, :, :-50], train)
            elif template is None:
                b = in_spec.shape[0]
                template = (jax.random.normal(
                    k_t, (b, gen_length, self.template_length))
                    if k_t is not None else
                    jnp.zeros((b, gen_length, self.template_length)))

        a_t_f, (mu2, var2), x2_0 = AudioEncoderS2G(
            pose=True, template_length=self.template_length,
            common_dim=self.common_dim, name="audio_encoder")(
                in_spec, template=template, pre_pose=pre_pose, w_pre=w_pre,
                train=train, rng=k_a)
        s_f, _, _ = AudioEncoderS2G(
            pose=False, template_length=self.template_length,
            name="speech_encoder")(in_spec, train=train)

        if self.separate:
            out = []
            n_dec = 4 if self.expression else 3
            widths = [64, self.common_dim, self.common_dim, 256]
            for i in range(n_dec):
                src = s_f if i in (0, 3) else a_t_f
                mid = src
                for j in range(3):
                    mid = CNRf(widths[i], name=f"decoder_{i}_{j}")(mid, train)
                mid = nn.Conv(self.each_dim[i], (1,),
                              name=f"final_out_{i}")(mid)
                out.append(mid)
            out = jnp.concatenate(out, axis=-1)
        else:
            # fused form (s2glayers.py:408-417,483-485): 6x CNR(512) over
            # a_t_f + one pose_dim head. Upstream declares decoder_in=320
            # (s2glayers.py:373) but a_t_f is common_dim(=256)-wide, so the
            # torch original crashes if ever run with separate=False; the
            # flax twin infers the in-width and carries the declared stack.
            mid = a_t_f
            for j in range(6):
                mid = CNRf(512, name=f"decoder_{j}")(mid, train)
            out = nn.Conv(self.pose_dim, (1,), name="final_out")(mid)

        if bt:
            if w_pre:
                return out, template, mu, var, (mu2, var2, x2_0, pre_pose)
            return out, template, mu, var, (mu2, var2, None, None)
        return out


class DiscriminatorS2GL(nn.Module):
    """s2glayers Discriminator (s2glayers.py:498-512): Conv1d_tf k4 s2 +
    LeakyReLU + CNRf(down) + CNRf(k4,s1) + 1-ch conv head."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(64, (4,), (2,), padding="SAME", name="c0")(x)
        h = nn.leaky_relu(h, 0.2)
        h = CNRf(128, k=4, s=2, name="cnr1")(h, train)
        h = CNRf(256, k=4, s=1, name="cnr2")(h, train)
        return nn.Conv(1, (4,), (1,), padding="SAME", name="out")(h)
