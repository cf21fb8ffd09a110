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


class TestExtendedVariants:
    """2D / RNN / Graph layer variants (reference nets/layers.py:211-931;
    note the reference's own UNet2D/SeqDecoder2D raise NotImplementedError
    and its Graph classes reference an undefined GraphConvNormRelu)."""

    def test_seq_encoder_2d(self, rng):
        from probtalk_tpu.models.layers import SeqEncoder2D

        m = SeqEncoder2D(c_in=2, t_in=16, c_out=64, num_joints=12)
        x = jnp.asarray(rng.normal(size=(2, 16, 12, 2)).astype(np.float32))
        v = m.init(jax.random.key(0), x)
        out = m.apply(v, x)
        assert out.shape == (2, 64)

    def test_seq_translator_2d(self, rng):
        from probtalk_tpu.models.layers import SeqTranslator2D

        m = SeqTranslator2D()
        x = jnp.asarray(rng.normal(size=(1, 75, 64)).astype(np.float32))
        v = m.init(jax.random.key(0), x)
        out = m.apply(v, x)
        assert out.shape[0] == 1 and out.shape[-1] == 108

    def test_seq_translator_rnn(self, rng):
        from probtalk_tpu.models.layers import SeqTranslatorRNN

        m = SeqTranslatorRNN(c_out=10, hidden=16)
        x = jnp.asarray(rng.normal(size=(2, 7, 5)).astype(np.float32))
        f0 = jnp.zeros((2, 1, 10), jnp.float32)
        v = m.init(jax.random.key(0), x, f0)
        out = m.apply(v, x, f0)
        assert out.shape == (2, 7, 10)

    def test_graph_encoder(self, rng):
        from probtalk_tpu.models.layers import SeqEncoderGraph

        vjoints = 8
        adj = np.stack([np.eye(vjoints, dtype=np.float32),
                        (rng.random((vjoints, vjoints)) > 0.7).astype(np.float32)])
        adj /= np.maximum(adj.sum(-1, keepdims=True), 1)
        m = SeqEncoderGraph(c_out=64, channels=(16, 32), num_parts=2)
        x = jnp.asarray(rng.normal(size=(2, 16, vjoints, 2)).astype(np.float32))
        v = m.init(jax.random.key(0), x, jnp.asarray(adj))
        out = m.apply(v, x, jnp.asarray(adj))
        assert out.shape == (2, 64)
        assert np.isfinite(np.asarray(out)).all()

    def test_tcn_reexport(self, rng):
        from probtalk_tpu.models.layers import TCN

        m = TCN([16, 16])
        x = jnp.asarray(rng.normal(size=(2, 20, 8)).astype(np.float32))
        v = m.init(jax.random.key(0), x)
        out = m.apply(v, x)
        assert out.shape == (2, 20, 16)

    def test_resblock_fc(self, rng):
        from probtalk_tpu.models.layers import ResBlockFC

        m = ResBlockFC(fc_dim=32)
        x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
        v = m.init(jax.random.key(0), x)
        assert m.apply(v, x).shape == (4, 32)
