"""Fully-compiled streaming generation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probtalk_tpu.models.vqvae import VQVAE
from probtalk_tpu.streaming import make_streaming_generate, pad_to_windows
from probtalk_tpu.train.stages import PredictorStage, RefinerStage
from probtalk_tpu.train.state import create_train_state, adamw

CM, CA, W = 40, 24, 16


@pytest.fixture(scope="module")
def stages():
    vq = VQVAE(in_dim=CM, embedding_dim=32, num_codes=8, groups=4, hiddens=32,
               res_layers=1)
    x = jnp.zeros((1, W, CM), jnp.float32)
    vq_vars = vq.init({"params": jax.random.key(0), "quant": jax.random.key(1)},
                      x, train=True)
    pred = PredictorStage(mot_dim=CM, num_code=8, groups=4, dec_layers=1,
                          aud_dim=CA)
    mask = jnp.zeros((1, W, 1), jnp.float32)
    codes0 = jnp.zeros((1, W // 8, 4), jnp.int32)
    spk = jnp.zeros((1,), jnp.int32)
    aud = jnp.zeros((1, W, CA), jnp.float32)
    pred_state = create_train_state(pred, (x, codes0, mask, spk, aud),
                                    jax.random.key(2), adamw(1e-4),
                                    init_kwargs={"train": True})
    ref = RefinerStage(in_dim=CM, aud_dim=CA, layers=1)
    ref_state = create_train_state(ref, (x, aud, mask, spk), jax.random.key(3),
                                   adamw(1e-4), init_kwargs={"train": True})
    return vq, vq_vars, pred, pred_state, ref, ref_state


class TestPadding:
    def test_pad_to_windows(self):
        aud = jnp.zeros((1, 25, 4))
        p, k = pad_to_windows(aud, window=16, step=12)
        assert k == 1 and p.shape[1] == 28
        p, k = pad_to_windows(jnp.zeros((1, 10, 4)), 16, 12)
        assert k == 0 and p.shape[1] == 16


class TestStreaming:
    def test_short_and_long(self, stages, rng):
        gen = make_streaming_generate(*stages, window=W, overlap=4)
        spk = jnp.zeros((1,), jnp.int32)
        short = gen(jax.random.key(0),
                    jnp.asarray(rng.normal(size=(1, 10, CA)).astype(np.float32)),
                    spk)
        assert short.shape == (1, 10, CM)
        long = gen(jax.random.key(0),
                   jnp.asarray(rng.normal(size=(1, 45, CA)).astype(np.float32)),
                   spk)
        assert long.shape == (1, 45, CM)
        assert np.all(np.isfinite(np.asarray(long)))

    def test_deterministic_per_key(self, stages, rng):
        gen = make_streaming_generate(*stages, window=W, overlap=4)
        aud = jnp.asarray(rng.normal(size=(1, 40, CA)).astype(np.float32))
        spk = jnp.zeros((1,), jnp.int32)
        a = gen(jax.random.key(5), aud, spk)
        b = gen(jax.random.key(5), aud, spk)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
