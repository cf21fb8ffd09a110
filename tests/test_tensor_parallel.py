"""Tensor-parallel sharding: TP-sharded step == replicated step.

Megatron-style column/row splits expressed as NamedSharding placements
(parallel/tp.py); XLA SPMD inserts the collectives. Verified on the
8-device virtual CPU mesh as a (2 data x 4 model) grid.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from probtalk_tpu.parallel import (
    make_mesh, replicate, shard_batch, tp_shard_state,
)
from probtalk_tpu.train.stages import PredictorStage, make_predictor_train_step
from probtalk_tpu.train.state import adamw, create_train_state
from probtalk_tpu.models.vqvae import VQVAE

CM, CA, T, BS = 40, 24, 16, 8


@pytest.fixture(scope="module")
def setup():
    vq = VQVAE(in_dim=CM, embedding_dim=32, num_codes=8, groups=4, hiddens=32,
               res_layers=1)
    x = jnp.zeros((1, T, CM), jnp.float32)
    vq_vars = vq.init({"params": jax.random.key(0), "quant": jax.random.key(1)},
                      x, train=True)
    stage = PredictorStage(mot_dim=CM, num_code=8, groups=4, dec_layers=2,
                           aud_dim=CA)
    state = create_train_state(
        stage,
        (x, jnp.zeros((1, T // 8, 4), jnp.int32), jnp.zeros((1, T, 1)),
         jnp.zeros((1,), jnp.int32), jnp.zeros((1, T, CA))),
        jax.random.key(2), adamw(1e-4), init_kwargs={"train": True})
    step = make_predictor_train_step(stage, vq, vq_vars, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "poses_fbhe": rng.normal(size=(BS, T, CM)).astype(np.float32),
        "aud_feat": rng.normal(size=(BS, T, CA)).astype(np.float32),
        "speaker": np.zeros((BS,), np.int32),
        "epoch_ratio": np.float32(0.7),
    }
    return state, step, batch


def test_tp_rules_hit_decoder_params(setup):
    from probtalk_tpu.parallel.tp import _path_str, tp_spec

    state, _, _ = setup
    hits = []
    def visit(path, x):
        p = _path_str(path)
        if tp_spec(p, x.ndim) != jax.sharding.PartitionSpec():
            hits.append(p)
    jax.tree_util.tree_map_with_path(visit, state.params)
    assert any("attn" in h for h in hits)
    assert any("linear1" in h or "fc1" in h for h in hits)


def test_tp_step_matches_replicated(setup):
    state, step, batch = setup
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")

    # replicated baseline on a pure-dp mesh
    mesh_dp = make_mesh(data=8, devices=devices)
    s_rep = replicate(state, mesh_dp)
    b_rep = shard_batch(batch, mesh_dp)
    out_rep, m_rep = step(s_rep, b_rep, jax.random.key(1))

    # 2 data x 4 model: params TP-sharded, same math
    mesh_tp = make_mesh(data=2, model=4, devices=devices)
    s_tp = tp_shard_state(replicate(state, mesh_tp), mesh_tp)
    b_tp = shard_batch(batch, mesh_tp)
    out_tp, m_tp = step(s_tp, b_tp, jax.random.key(1))

    np.testing.assert_allclose(float(m_rep["loss"]), float(m_tp["loss"]),
                               rtol=2e-5, atol=2e-5)
    # updated params agree
    a = jax.tree_util.tree_leaves(out_rep.params)
    b = jax.tree_util.tree_leaves(out_tp.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-4, atol=5e-5)
