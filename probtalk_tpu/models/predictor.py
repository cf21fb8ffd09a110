"""PredictorNet: audio/text/motion-context -> PQ-code logits / samples.

Capability of the reference's ``nets/inpainting/predictornet.py`` +
``gated_pixelcnn_1d.GatedConv``: a 10-layer gated-conv motion-context
encoder (strides at layers 2/4/6 => T/8, channels 128->512), fused with
256-d audio/text condition streams, decoded by the PTransformer (MaskGit).

Channel-last (B, T, C) throughout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from probtalk_tpu.models.ptransformer import PTransformer


class GatedConv1D(nn.Module):
    """conv -> tanh(a)*sigmoid(b) gate, with optional residual
    res1x1(out) + strided_conv(x) (reference gated_pixelcnn_1d.py:38-82)."""

    features: int
    kernel: int = 3
    stride: int = 1
    residual: bool = True

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        if self.kernel == 4:
            padding = [(1, 1)]
        else:
            padding = [(pad, pad)]
        h = nn.Conv(self.features * 2, (self.kernel,), strides=(self.stride,),
                    padding=padding, name="vert_stack")(x)
        a, b = jnp.split(h, 2, axis=-1)
        out = jnp.tanh(a) * nn.sigmoid(b)
        if self.residual:
            res = nn.Conv(self.features, (1,), name="res")(out)
            if self.stride == 2 or x.shape[-1] != self.features:
                skip = nn.Conv(self.features, (self.kernel,), strides=(self.stride,),
                               padding=padding, name="skip")(x)
            else:
                skip = x
            out = res + skip
        return out


class MotionContextEncoder(nn.Module):
    """[masked motion | mask] (B, T, C+1) -> (B, T/8, dim) context
    (reference predictornet.py:31-49)."""

    dim: int = 512
    layers: int = 10

    @nn.compact
    def __call__(self, masked_motion, mask):
        h = jnp.concatenate([masked_motion, mask], axis=-1)
        h = nn.Conv(self.dim // 4, (1,), name="motion_embedding")(h)
        d = self.dim // 4
        for i in range(self.layers):
            if i == 0:
                kernel, stride = 7, 1
            elif i in (2, 4, 6):
                kernel, stride = 4, 2
                if i in (4, 6):
                    d *= 2
            else:
                kernel, stride = 3, 1
            h = GatedConv1D(d, kernel, stride, residual=True, name=f"enc_{i}")(h)
        return h


class PredictorNet(nn.Module):
    """Full predictor: motion-context + audio + text condition -> PTransformer.

    use_audio / use_text toggle the 256-d condition streams (the encoders
    themselves live in the train wrapper stage, mirroring the reference's
    AudEnc/TextEnc split at predictor.py:67-70).
    """

    mot_dim: int = 376
    num_code: int = 128
    dim: int = 512
    enc_layers: int = 10
    dec_layers: int = 6
    n_classes: int = 4
    groups: int = 4
    identity: bool = True
    maskgit: bool = True
    maskgit_T: int = 8
    motion_context: bool = True
    use_audio: bool = True
    use_text: bool = False
    decoder_type: str = "transformer"   # 'transformer' | 'pixel'
    dtype: object = None   # bf16 compute option for the decoder
    train_mask_mode: str = "topk"       # see PTransformer.train_mask_mode

    def setup(self):
        if self.motion_context:
            self.motion_enc = MotionContextEncoder(self.dim, self.enc_layers)
        condi_dim = (self.dim if self.motion_context else 0)
        condi_dim += 256 * int(self.use_audio) + 256 * int(self.use_text)
        if self.decoder_type == "pixel":
            # the reference's alternative decoder (predictornet.py:56-58)
            from probtalk_tpu.models.pixel_decoder import GatedPixelCNN1D

            self.decoder = GatedPixelCNN1D(
                groups=self.groups, condi_dim=condi_dim, dim=512,
                layers=self.enc_layers, num_code=self.num_code,
                n_classes=self.n_classes,
            )
        else:
            self.decoder = PTransformer(
                groups=self.groups, condi_dim=condi_dim, dim=512,
                layers=self.dec_layers, num_code=self.num_code,
                n_classes=self.n_classes, identity=self.identity,
                maskgit=self.maskgit, dtype=self.dtype,
                train_mask_mode=self.train_mask_mode,
            )

    def _condition(self, masked_motion, mask, audio, text):
        parts = []
        if self.motion_context:
            parts.append(self.motion_enc(masked_motion, mask))
        if audio is not None:
            parts.append(audio)
        if text is not None:
            parts.append(text)
        return jnp.concatenate(parts, axis=-1)

    def __call__(self, masked_motion, codes, mask, label, audio=None, text=None,
                 epoch_ratio=1.0, train: bool = False):
        """Training: per-code logits (B, T/8, G, K)
        (reference predictornet.py:76-103)."""
        cond = self._condition(masked_motion, mask, audio, text)
        return self.decoder(codes, label, cond, epoch_ratio, train=train)

    def sample(self, key, masked_motion, mask, label, audio=None, text=None):
        """Inference: MaskGit decode (or pixelcnn AR) -> codes (B, T/8, G)."""
        cond = self._condition(masked_motion, mask, audio, text)
        if self.decoder_type == "pixel" or self.maskgit:
            return self.decoder.sample(key, label, cond, steps=self.maskgit_T)
        return self.decoder.sample_ar(key, label, cond)

    def sample_max(self, masked_motion, mask, label, audio=None, text=None):
        """Deterministic one-shot greedy decode (reference sample_max,
        PTransformer.py:644-655): all tokens masked, one forward, argmax.
        The noise-free path for converted-checkpoint equivalence
        (scripts/converted_det.py)."""
        assert self.decoder_type != "pixel", "greedy decode is PTransformer-only"
        cond = self._condition(masked_motion, mask, audio, text)
        return self.decoder.sample_max(label, cond)
