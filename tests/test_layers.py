"""Generic layer library tests."""

import jax
import jax.numpy as jnp
import numpy as np

from probtalk_tpu.models.layers import (
    SeqEncoder1D, SeqDecoder1D, SeqTranslator1D, SeqEncoderRNN, SeqDecoderRNN,
    Audio2Pose, UNet1D,
)

B, T = 2, 16


def test_seq_encoder_decoder_roundtrip_shapes(rng):
    x = jnp.asarray(rng.normal(size=(B, T, 12)).astype(np.float32))
    enc = SeqEncoder1D(features=16, depth=2)
    v = enc.init(jax.random.key(0), x)
    h = enc.apply(v, x)
    assert h.shape == (B, T // 4, 16)
    dec = SeqDecoder1D(out_dim=12, features=16, depth=2)
    vd = dec.init(jax.random.key(1), h)
    y = dec.apply(vd, h)
    assert y.shape == (B, T, 12)


def test_translator_preserves_length(rng):
    x = jnp.asarray(rng.normal(size=(B, T, 8)).astype(np.float32))
    m = SeqTranslator1D(out_dim=10, features=16, layers=2)
    v = m.init(jax.random.key(0), x)
    assert m.apply(v, x).shape == (B, T, 10)


def test_rnn_layers(rng):
    x = jnp.asarray(rng.normal(size=(B, T, 8)).astype(np.float32))
    enc = SeqEncoderRNN(hidden=16)
    v = enc.init(jax.random.key(0), x)
    h = enc.apply(v, x)
    assert h.shape == (B, T, 16)
    dec = SeqDecoderRNN(out_dim=5, hidden=16)
    vd = dec.init(jax.random.key(1), h)
    assert dec.apply(vd, h).shape == (B, T, 5)


def test_audio2pose_and_unet(rng):
    aud = jnp.asarray(rng.normal(size=(B, T, 8)).astype(np.float32))
    m = Audio2Pose(pose_dim=20, features=16)
    v = m.init(jax.random.key(0), aud)
    assert m.apply(v, aud).shape == (B, T, 20)
    u = UNet1D(features=16, depth=2, out_dim=6)
    vu = u.init(jax.random.key(1), aud)
    assert u.apply(vu, aud).shape == (B, T, 6)
