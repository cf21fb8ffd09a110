"""PQ-VAE model tests: shapes, train step learning, multi-device sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probtalk_tpu.models.vqvae import VQVAE
from probtalk_tpu.train.state import create_train_state, adamw
from probtalk_tpu.train.steps import make_vq_train_step, make_eval_recon_fn

# tiny config for CPU tests
TINY = dict(in_dim=376, embedding_dim=64, num_codes=16, groups=4, hiddens=64,
            res_layers=1)


@pytest.fixture(scope="module")
def model_and_state():
    model = VQVAE(**TINY)
    x = jnp.zeros((2, 16, 376), jnp.float32)
    state = create_train_state(model, (x,), jax.random.key(0), adamw(1e-3),
                               init_kwargs={"train": True})
    return model, state


class TestShapes:
    def test_forward_shapes(self, model_and_state, rng):
        model, state = model_and_state
        x = jnp.asarray(rng.normal(size=(2, 16, 376)).astype(np.float32))
        variables = {"params": state.params, **state.mutables}
        pred, commit, idx = model.apply(variables, x, train=False)
        assert pred.shape == (2, 16, 376)
        assert idx.shape == (2, 2, 4)  # T/8, G groups
        assert commit.shape == ()

    def test_decode_codes(self, model_and_state, rng):
        model, state = model_and_state
        idx = jnp.asarray(rng.integers(0, 16, size=(2, 2, 4)).astype(np.int32))
        variables = {"params": state.params, **state.mutables}
        out = model.apply(variables, idx, train=False, method=model.decode_codes)
        assert out.shape == (2, 16, 376)

    def test_encode_matches_decode_codes(self, model_and_state, rng):
        model, state = model_and_state
        x = jnp.asarray(rng.normal(size=(1, 16, 376)).astype(np.float32))
        variables = {"params": state.params, **state.mutables}
        _, quant, idx = model.apply(variables, x, train=False, method=model.encode)
        pred_direct = model.apply(variables, quant, train=False, method=model.decode)
        pred_codes = model.apply(variables, idx, train=False, method=model.decode_codes)
        np.testing.assert_allclose(
            np.asarray(pred_direct), np.asarray(pred_codes), atol=1e-5
        )


class TestTraining:
    def test_loss_decreases(self, rng):
        model = VQVAE(**TINY)
        x = jnp.asarray(rng.normal(size=(4, 16, 376)).astype(np.float32) * 0.1)
        state = create_train_state(model, (x,), jax.random.key(1), adamw(3e-3),
                                   init_kwargs={"train": True})
        step = make_vq_train_step(model)
        key = jax.random.key(0)
        first = last = None
        for i in range(30):
            key, k = jax.random.split(key)
            state, metrics = step(state, {"poses_fbhe": x}, k)
            if i == 0:
                first = float(metrics["loss"])
            last = float(metrics["loss"])
        assert last < first, (first, last)
        assert int(state.step) == 30
        # quantizer state actually updated
        assert int(state.mutables["quant"]["pq"].counter) == 30

    def test_eval_recon_fn(self, model_and_state, rng):
        model, state = model_and_state
        recon = make_eval_recon_fn(model)
        x = jnp.asarray(rng.normal(size=(1, 16, 376)).astype(np.float32))
        pred, l1, idx = recon(state, x)
        assert pred.shape == x.shape and np.isfinite(float(l1))


class TestSharded:
    def test_data_parallel_train_step(self, rng):
        from probtalk_tpu.parallel import make_mesh, shard_batch, replicate

        model = VQVAE(**TINY)
        x = np.asarray(rng.normal(size=(8, 16, 376)), np.float32)
        state = create_train_state(model, (jnp.asarray(x[:1]),), jax.random.key(2),
                                   adamw(1e-3), init_kwargs={"train": True})
        mesh = make_mesh()
        assert mesh.shape["data"] == 8
        state = replicate(state, mesh)
        batch = shard_batch({"poses_fbhe": x}, mesh)
        step = make_vq_train_step(model, donate=False)
        new_state, metrics = step(state, batch, jax.random.key(3))
        assert np.isfinite(float(metrics["loss"]))
        # params remain replicated
        leaf = jax.tree_util.tree_leaves(new_state.params)[0]
        assert leaf.sharding.is_fully_replicated
