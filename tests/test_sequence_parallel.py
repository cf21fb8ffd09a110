"""Sequence-sharded refinement == unsharded forward (same program,
partitioned by XLA over the 8-device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from probtalk_tpu.parallel import make_mesh
from probtalk_tpu.parallel.sequence import make_sequence_parallel_refine
from probtalk_tpu.train.stages import RefinerStage
from probtalk_tpu.train.state import create_train_state, adamw

CM, CA = 24, 16


def test_sequence_sharded_matches_unsharded(rng):
    t = 64  # sharded 8 frames/device
    stage = RefinerStage(in_dim=CM, aud_dim=CA, layers=2)
    x = jnp.asarray(rng.normal(size=(1, t, CM)).astype(np.float32))
    aud = jnp.asarray(rng.normal(size=(1, t, CA)).astype(np.float32))
    mask = jnp.zeros((1, t, 1), jnp.float32)
    spk = jnp.zeros((1,), jnp.int32)
    state = create_train_state(stage, (x, aud, mask, spk), jax.random.key(0),
                               adamw(1e-4), init_kwargs={"train": True})
    variables = {"params": state.params, **state.mutables}

    ref = stage.apply(variables, x, aud, mask, spk, train=False)

    mesh = make_mesh()
    run = make_sequence_parallel_refine(stage, mesh)
    out = run(variables, x, aud, mask, spk)

    # time axis stays sharded (trailing None may be normalized away)
    assert tuple(out.sharding.spec)[:2] == (None, "data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
