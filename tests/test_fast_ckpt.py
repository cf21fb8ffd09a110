"""FastCkpt: flat-npz save/restore roundtrip for TrainStates."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probtalk_tpu.models.vqvae import VQVAE
from probtalk_tpu.train.fast_ckpt import FastCkpt
from probtalk_tpu.train.state import adamw, create_train_state


@pytest.mark.smoke
def test_roundtrip_trainstate(tmp_path):
    vq = VQVAE(in_dim=12, embedding_dim=8, num_codes=4, groups=2, hiddens=8,
               res_layers=1)
    x = jnp.zeros((2, 16, 12), jnp.float32)
    state = create_train_state(vq, (x,), jax.random.key(0), adamw(1e-3),
                               init_kwargs={"train": True})
    ck = FastCkpt(str(tmp_path / "vq"))
    assert ck.restore(state) == (None, -1)

    ck.save(41, state)
    restored, step = ck.restore(state)
    assert step == 41
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # latest save wins (single slot), atomic tmp is cleaned up
    ck.save(42, state)
    assert ck.restore(state)[1] == 42
    assert not any(f.endswith(".tmp.npz") for f in os.listdir(tmp_path))


@pytest.mark.smoke
def test_structure_mismatch_raises(tmp_path):
    ck = FastCkpt(str(tmp_path / "s"))
    ck.save(0, {"a": jnp.zeros(3), "b": jnp.ones(2)})
    with pytest.raises(ValueError, match="structure changed"):
        ck.restore({"a": jnp.zeros(3)})
