"""Tests for the PQ/RQ quantizers: assignment correctness vs brute force,
EMA learning dynamics, STE gradients, multi-device psum consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probtalk_tpu.ops.pq_lookup import pq_nearest_codes, _pq_nearest_codes_xla
from probtalk_tpu.quant import (
    pq_init,
    pq_forward_train,
    pq_forward_eval,
    pq_lookup_codes,
)
from probtalk_tpu.quant.rq import rq_forward_eval, rq_forward_train, rq_lookup_codes

G, K, D = 4, 32, 16
E = G * D


@pytest.fixture
def state():
    return pq_init(jax.random.key(0), G, K, D)


def brute_force_assign(x, codebooks):
    # x (N, G, D), codebooks (G, K, D)
    idx = np.zeros(x.shape[:2], np.int32)
    for g in range(x.shape[1]):
        d2 = ((x[:, g, None, :] - codebooks[g][None]) ** 2).sum(-1)
        idx[:, g] = d2.argmin(-1)
    return idx


class TestLookup:
    def test_xla_matches_brute_force(self, rng, state):
        x = rng.normal(size=(50, G, D)).astype(np.float32)
        idx, quant = _pq_nearest_codes_xla(jnp.asarray(x), state.codebooks)
        expect = brute_force_assign(x, np.asarray(state.codebooks))
        np.testing.assert_array_equal(np.asarray(idx), expect)
        np.testing.assert_allclose(
            np.asarray(quant), np.asarray(state.codebooks)[np.arange(G), expect], atol=1e-6
        )

    def test_pallas_interpret_matches_xla(self, rng, state):
        # Pallas kernel in interpret mode (CPU) vs XLA reference
        from jax.experimental.pallas import tpu as pltpu
        from probtalk_tpu.ops.pq_lookup import _pq_nearest_codes_pallas

        x = jnp.asarray(rng.normal(size=(40, G, D)).astype(np.float32))
        with pltpu.force_tpu_interpret_mode():
            idx_p, quant_p = _pq_nearest_codes_pallas(x, state.codebooks, tile_n=16)
        idx_x, quant_x = _pq_nearest_codes_xla(x, state.codebooks)
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
        np.testing.assert_allclose(np.asarray(quant_p), np.asarray(quant_x), atol=1e-5)


class TestPQTrain:
    def test_eval_roundtrip_on_codewords(self, state):
        # quantizing exact codewords returns themselves
        sel = jnp.stack([state.codebooks[g, :7] for g in range(G)], axis=1)  # (7, G, D)
        x = sel.reshape(1, 7, E)
        quant, idx = pq_forward_eval(state, x)
        np.testing.assert_allclose(np.asarray(quant), np.asarray(x), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx[0]), np.tile(np.arange(7)[:, None], (1, G)))

    def test_lookup_codes_inverts_eval(self, rng, state):
        x = jnp.asarray(rng.normal(size=(2, 9, E)).astype(np.float32))
        quant, idx = pq_forward_eval(state, x)
        decoded = pq_lookup_codes(state, idx)
        np.testing.assert_allclose(np.asarray(decoded), np.asarray(quant), atol=1e-6)

    def test_ema_moves_codebooks_toward_data(self, rng):
        st = pq_init(jax.random.key(1), 2, 8, 4)
        # two tight clusters per group
        centers = rng.normal(size=(8, 2, 4)).astype(np.float32) * 3
        key = jax.random.key(2)
        x0 = centers[np.random.default_rng(3).integers(0, 8, 256)]  # (256, 2, 4)
        x = jnp.asarray(x0.reshape(1, 256, 8))
        losses = []
        for i in range(60):
            key, k = jax.random.split(key)
            _, st, commit, _ = pq_forward_train(st, x, k, decay=0.9)
            losses.append(float(commit))
        assert losses[-1] < losses[0] * 0.1, (losses[0], losses[-1])

    def test_ste_gradient_passthrough(self, rng, state):
        x = jnp.asarray(rng.normal(size=(1, 6, E)).astype(np.float32))

        def loss_fn(x):
            ste, _, commit, _ = pq_forward_train(state, x, jax.random.key(0))
            return jnp.sum(ste * 2.0) + commit

        g = jax.grad(loss_fn)(x)
        # STE: d(sum(2*ste))/dx = 2 everywhere; commit adds 2*c/N*(x-q)
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(np.asarray(g), 2.0, atol=0.5)

    def test_noise_ratio_randomizes_codes(self, rng, state):
        x = jnp.asarray(rng.normal(size=(1, 64, E)).astype(np.float32))
        _, _, _, idx0 = pq_forward_train(state, x, jax.random.key(5), noise_ratio=0.0)
        _, _, _, idx1 = pq_forward_train(state, x, jax.random.key(5), noise_ratio=0.9)
        frac_diff = np.mean(np.asarray(idx0) != np.asarray(idx1))
        assert frac_diff > 0.5

    def test_multidevice_psum_consistency(self, rng):
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        n_dev = len(jax.devices())
        assert n_dev == 8, "conftest should provide 8 virtual devices"
        st = pq_init(jax.random.key(0), 2, 8, 4)
        x = jnp.asarray(rng.normal(size=(8, 16, 8)).astype(np.float32))
        mesh = Mesh(np.array(jax.devices()), ("data",))

        def step(st, xs):
            _, new_st, commit, _ = pq_forward_train(
                st, xs, jax.random.key(7), axis_name="data", use_pallas=False
            )
            return new_st, commit

        sharded = shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=(P(), P()),
            check_rep=False,
        )
        new_st, _ = jax.jit(sharded)(st, x)
        # single-device equivalent on the full batch
        _, ref_st, _, _ = pq_forward_train(st, x, jax.random.key(7), use_pallas=False)
        np.testing.assert_allclose(
            np.asarray(new_st.ema_counts), np.asarray(ref_st.ema_counts), rtol=1e-4
        )


class TestRQ:
    def test_eval_improves_with_depth(self, rng):
        st = pq_init(jax.random.key(3), 1, 64, 16)
        x = jnp.asarray(rng.normal(size=(1, 32, 16)).astype(np.float32))
        errs = []
        for depths in (1, 2, 4):
            quant, idx = rq_forward_eval(st, x, depths)
            assert idx.shape == (1, 32, depths)
            errs.append(float(jnp.mean((quant - x) ** 2)))
        assert errs[2] <= errs[1] <= errs[0]

    def test_lookup_sums(self, rng):
        st = pq_init(jax.random.key(3), 1, 64, 16)
        x = jnp.asarray(rng.normal(size=(1, 8, 16)).astype(np.float32))
        quant, idx = rq_forward_eval(st, x, 3)
        decoded = rq_lookup_codes(st, idx)
        np.testing.assert_allclose(np.asarray(decoded), np.asarray(quant), atol=1e-5)

    def test_train_reduces_commit(self, rng):
        st = pq_init(jax.random.key(4), 1, 16, 8)
        x = jnp.asarray(rng.normal(size=(1, 128, 8)).astype(np.float32))
        key = jax.random.key(0)
        first = last = None
        for i in range(40):
            key, k = jax.random.split(key)
            _, st, commit, _ = rq_forward_train(st, x, k, depths=2, decay=0.9)
            if i == 0:
                first = float(commit)
            last = float(commit)
        assert last < first


class TestKmeansInit:
    def test_kmeans_finds_separated_clusters(self, rng):
        import jax
        from probtalk_tpu.quant.pq import kmeans

        centers = np.asarray([[0, 0], [10, 10], [-10, 5]], np.float32)
        pts = np.concatenate([
            c + 0.1 * rng.normal(size=(50, 2)).astype(np.float32)
            for c in centers
        ])
        means, bins = kmeans(jax.random.key(0), jnp.asarray(pts), 3, 20)
        means = np.asarray(means)
        # every true center has a centroid within 0.5
        for c in centers:
            assert np.min(np.linalg.norm(means - c, axis=-1)) < 0.5
        assert float(np.asarray(bins).sum()) == 150

    def test_pq_init_kmeans_state_shapes(self, rng):
        import jax
        from probtalk_tpu.quant.pq import pq_init_kmeans, pq_forward_eval

        x = rng.normal(size=(32, 8, 16)).astype(np.float32)
        st = pq_init_kmeans(jax.random.key(1), jnp.asarray(x), groups=4,
                            num_codes=8)
        assert st.codebooks.shape == (4, 8, 4)
        assert st.ema_counts.shape == (4, 8)
        q, idx = pq_forward_eval(st, jnp.asarray(x))
        assert q.shape == x.shape
        # kmeans centroids quantize the init data far better than random
        from probtalk_tpu.quant.pq import pq_init

        st_rand = pq_init(jax.random.key(2), 4, 8, 4)
        q_rand, _ = pq_forward_eval(st_rand, jnp.asarray(x))
        err_km = float(jnp.mean((q - x) ** 2))
        err_rand = float(jnp.mean((q_rand - x) ** 2))
        assert err_km < err_rand
