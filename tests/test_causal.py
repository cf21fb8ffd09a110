"""Streaming/causal conv stack tests: chunked == full-sequence outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from probtalk_tpu.models.causal import CausalEncoder, CausalDecoder
from probtalk_tpu.core import body_parts as bp


def test_causal_encoder_shapes(rng):
    enc = CausalEncoder(hiddens=32, res_layers=1)
    x = jnp.asarray(rng.normal(size=(2, 16, 20)).astype(np.float32))
    v = enc.init(jax.random.key(0), x)
    h, states = enc.apply(v, x)
    assert h.shape == (2, 4, 32)
    assert len(states) == 3


def test_streaming_matches_full(rng):
    """Chunked decoding with carried state == one-shot decoding (the point
    of the causal variant: no lookahead, exact continuation)."""
    dec = CausalDecoder(out_dim=10, hiddens=16, res_layers=1)
    h = jnp.asarray(rng.normal(size=(1, 8, 16)).astype(np.float32))
    v = dec.init(jax.random.key(0), h)

    full, _ = dec.apply(v, h)

    out1, st = dec.apply(v, h[:, :4])
    out2, _ = dec.apply(v, h[:, 4:], st)
    chunked = jnp.concatenate([out1, out2], axis=1)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               atol=1e-5)


def test_encoder_streaming_matches_full(rng):
    enc = CausalEncoder(hiddens=16, res_layers=1)
    x = jnp.asarray(rng.normal(size=(1, 16, 10)).astype(np.float32))
    v = enc.init(jax.random.key(0), x)
    full, _ = enc.apply(v, x)
    out1, st = enc.apply(v, x[:, :8])
    out2, _ = enc.apply(v, x[:, 8:], st)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([out1, out2], 1)), np.asarray(full), atol=1e-5)


def test_new_body_part_fns(rng):
    full = jnp.asarray(rng.normal(size=(3, 165)).astype(np.float32))
    out = np.asarray(bp.sit2stand(full))
    assert out.shape == (3, 165)
    np.testing.assert_allclose(
        out[:, 9:12], np.tile([3.0747, -0.0158, -0.0152], (3, 1)), atol=1e-4)
    gt = jnp.asarray(rng.normal(size=(3, 165)).astype(np.float32))
    out2 = np.asarray(bp.poses2poses(full, gt))
    assert out2.shape == (3, 165)
    # lower body from gt's FIRST row, repeated (lower_body.py:157-166)
    np.testing.assert_allclose(out2[:, 3:18],
                               np.tile(np.asarray(gt)[0:1, 3:18], (3, 1)),
                               atol=1e-6)


def test_audio_extras(rng):
    from probtalk_tpu.data import audio as A

    x = rng.normal(size=32000).astype(np.float32)
    chunks = A.audio_chunking(x, frame_rate=30, chunk_size=1600)
    assert chunks.shape[1] == 1600 and chunks.shape[0] == 60
    feat, split = A.mfcc_sepa(x, split_sec=1.0)
    assert feat.shape[1] == 64 and split > 0
    mel = A.mel_chunked(x, chunk_sec=0.5)
    assert mel.shape[1] == 64 and np.all(np.isfinite(mel))
