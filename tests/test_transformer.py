"""PTransformer / predictor / refiner tests on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probtalk_tpu.models.ptransformer import (
    PTransformer,
    exact_keep_mask,
    sinusoidal_table,
)
from probtalk_tpu.models.predictor import MotionContextEncoder
from probtalk_tpu.models.rtransformer import RTransformer

B, T, G, K, C = 2, 8, 4, 16, 32   # T = code timesteps; C = condition dim
DIMS = dict(groups=G, condi_dim=C, dim=32, layers=2, num_code=K, n_classes=4,
            heads=4)


@pytest.fixture(scope="module")
def pt_and_vars():
    model = PTransformer(**DIMS)
    codes = jnp.zeros((B, T, G), jnp.int32)
    cond = jnp.zeros((B, T, C), jnp.float32)
    label = jnp.zeros((B,), jnp.int32)
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1)},
        codes, label, cond, train=True,
    )
    return model, variables


class TestSinusoidalPE:
    def test_table_properties(self):
        t = sinusoidal_table(100, 64)
        assert t.shape == (101, 64)
        np.testing.assert_array_equal(t[0], 0)  # PAD row
        # row 1 = position 0: sin(0)=0, cos(0)=1
        np.testing.assert_allclose(t[1, 0::2], 0, atol=1e-6)
        np.testing.assert_allclose(t[1, 1::2], 1, atol=1e-6)


class TestPTransformer:
    def test_train_logits_shape(self, pt_and_vars, rng):
        model, variables = pt_and_vars
        codes = jnp.asarray(rng.integers(0, K, (B, T, G)).astype(np.int32))
        cond = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
        label = jnp.asarray(rng.integers(0, 4, (B,)).astype(np.int32))
        logits = model.apply(variables, codes, label, cond, 0.9, train=True,
                             rngs={"mask": jax.random.key(2),
                                   "dropout": jax.random.key(3)})
        assert logits.shape == (B, T, G, K)
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_maskgit_sample_valid_codes(self, pt_and_vars, rng):
        model, variables = pt_and_vars
        cond = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
        label = jnp.zeros((B,), jnp.int32)
        ids = model.apply(variables, jax.random.key(5), label, cond, 4,
                          method=model.sample)
        ids = np.asarray(ids)
        assert ids.shape == (B, T, G)
        assert ids.min() >= 0 and ids.max() < K  # no mask ids survive

    def test_sample_jits(self, pt_and_vars, rng):
        model, variables = pt_and_vars
        cond = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
        label = jnp.zeros((B,), jnp.int32)
        f = jax.jit(lambda v, k, c: model.apply(v, k, label, c, 4, method=model.sample))
        ids1 = f(variables, jax.random.key(1), cond)
        ids2 = f(variables, jax.random.key(1), cond)
        np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))

    def test_sample_max(self, pt_and_vars, rng):
        model, variables = pt_and_vars
        cond = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
        ids = model.apply(variables, jnp.zeros((B,), jnp.int32), cond,
                          method=model.sample_max)
        assert np.asarray(ids).shape == (B, T, G)


class TestExactKeepMask:
    """Reference random_token parity: exactly floor(gamma*N) tokens kept per
    sample (PTransformer.py:559-576), shape-static under jit."""

    def test_exact_count_per_row(self):
        for frac in (0.0, 0.13, 0.5, 0.99, 1.0):
            m = np.asarray(exact_keep_mask(jax.random.key(3), 4, 92, frac))
            assert (m.sum(-1) == int(np.floor(frac * 92))).all(), frac

    def test_traced_frac_under_jit(self):
        f = jax.jit(lambda fr: exact_keep_mask(jax.random.key(0), 8, 64, fr))
        m = np.asarray(f(jnp.float32(0.5)))
        assert (m.sum(-1) == 32).all()
        assert np.asarray(f(jnp.float32(0.0))).sum() == 0

    def test_rows_differ(self):
        m = np.asarray(exact_keep_mask(jax.random.key(5), 8, 64, 0.5))
        assert not all((m[0] == m[i]).all() for i in range(1, 8))


class TestMotionContextEncoder:
    def test_downsamples_8x(self, rng):
        enc = MotionContextEncoder(dim=32, layers=10)
        x = jnp.asarray(rng.normal(size=(2, 32, 20)).astype(np.float32))
        mask = jnp.ones((2, 32, 1), jnp.float32)
        variables = enc.init(jax.random.key(0), x, mask)
        out = enc.apply(variables, x, mask)
        assert out.shape == (2, 4, 32)  # T/8, dim


class TestRTransformer:
    def test_forward_shape(self, rng):
        model = RTransformer(in_dim=40, condi_dim=24, dim=32, layers=2, heads=4)
        x = jnp.asarray(rng.normal(size=(2, 16, 40)).astype(np.float32))
        aud = jnp.asarray(rng.normal(size=(2, 16, 24)).astype(np.float32))
        mask = jnp.zeros((2, 16, 1), jnp.float32)
        label = jnp.zeros((2,), jnp.int32)
        variables = model.init(jax.random.key(0), x, aud, mask, label)
        out = model.apply(variables, x, aud, mask, label)
        assert out.shape == (2, 16, 40)
        assert np.all(np.isfinite(np.asarray(out)))


class TestRemat:
    def test_remat_identical_outputs_and_grads(self, rng):
        """remat=True is numerically identical (same params) — it only
        changes what the backward pass stores vs recomputes."""
        import jax
        import jax.numpy as jnp
        from probtalk_tpu.models.rtransformer import RTransformer

        kw = dict(in_dim=20, condi_dim=16, dim=32, layers=2, heads=4,
                  max_len=64, dropout=0.0)
        plain = RTransformer(**kw)
        ckpt = RTransformer(remat=True, **kw)
        x = jnp.asarray(rng.normal(size=(2, 12, 20)), jnp.float32)
        aud = jnp.asarray(rng.normal(size=(2, 12, 16)), jnp.float32)
        m = jnp.zeros((2, 12, 1), jnp.float32)
        lab = jnp.zeros((2,), jnp.int32)
        v = plain.init(jax.random.key(0), x, aud, m, lab)

        a = plain.apply(v, x, aud, m, lab)
        b = ckpt.apply(v, x, aud, m, lab)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

        ga = jax.grad(lambda p: (plain.apply({"params": p}, x, aud, m, lab) ** 2).mean())(v["params"])
        gb = jax.grad(lambda p: (ckpt.apply({"params": p}, x, aud, m, lab) ** 2).mean())(v["params"])
        for la, lb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=1e-5)

    def test_ptransformer_remat_logits(self, rng):
        import jax
        import jax.numpy as jnp
        from probtalk_tpu.models.ptransformer import PTransformer

        kw = dict(groups=2, condi_dim=16, dim=32, layers=2, num_code=8,
                  heads=4, max_len=64, dropout=0.0)
        plain = PTransformer(**kw)
        ckpt = PTransformer(remat=True, **kw)
        codes = jnp.asarray(rng.integers(0, 8, (2, 6, 2)), jnp.int32)
        cond = jnp.asarray(rng.normal(size=(2, 6, 16)), jnp.float32)
        lab = jnp.zeros((2,), jnp.int32)
        v = plain.init(jax.random.key(0), codes, lab, cond,
                       method=plain.logits)
        a = plain.apply(v, codes, lab, cond, method=plain.logits)
        b = ckpt.apply(v, codes, lab, cond, method=ckpt.logits)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
