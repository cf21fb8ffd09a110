"""Predictor / refiner stage train-step tests around a tiny frozen VQ."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probtalk_tpu.models.vqvae import VQVAE
from probtalk_tpu.train.stages import (
    PredictorStage,
    RefinerStage,
    make_predictor_train_step,
    make_predictor_infer_fn,
    make_refiner_train_step,
    make_refiner_infer_fn,
    sample_context_mask,
)
from probtalk_tpu.train.state import create_train_state, adamw

CM = 40    # motion dim (tiny)
CA = 24    # audio dim
T = 16
B = 2

VQ_TINY = dict(in_dim=CM, embedding_dim=32, num_codes=8, groups=4, hiddens=32,
               res_layers=1)


@pytest.fixture(scope="module")
def frozen_vq():
    model = VQVAE(**VQ_TINY)
    x = jnp.zeros((1, T, CM), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "quant": jax.random.key(1)}, x, train=True
    )
    return model, variables


class TestContextMask:
    def test_window_properties(self):
        m = sample_context_mask(jax.random.key(0), 64, 40, context_len=10,
                                mode="bernoulli")
        m = np.asarray(m)[..., 0]
        assert m.shape == (64, 40)
        row_sums = m.sum(-1)
        assert set(np.unique(row_sums)) <= {0.0, 10.0}
        # windows are contiguous
        for row in m[row_sums == 10]:
            on = np.nonzero(row)[0]
            assert on[-1] - on[0] == 9

    def test_bank_mode_zeroes_first_64_rows(self):
        # reference semantics (predictor.py:227): rows < 64 unconditioned,
        # every later row carries exactly one contiguous 30-frame window
        m = sample_context_mask(jax.random.key(1), 128, 180, context_len=30)
        m = np.asarray(m)[..., 0]
        assert m[:64].sum() == 0.0
        row_sums = m[64:].sum(-1)
        assert (row_sums == 30.0).all()
        for row in m[64:]:
            on = np.nonzero(row)[0]
            assert on[-1] - on[0] == 29

    def test_bank_mode_small_batch_scales(self):
        # default zero_rows=None scales the reference's half-batch
        # unconditioning to any bs: bs//2 rows zero, the rest windowed
        m = sample_context_mask(jax.random.key(2), 8, 180, context_len=30)
        m = np.asarray(m)[..., 0]
        assert m[:4].sum() == 0.0
        assert (m[4:].sum(-1) == 30.0).all()

    def test_bank_mode_literal_64_small_batch_all_zero(self):
        # zero_rows=64 is the reference's literal mask[:64]=0
        # (predictor.py:226): at bs<=64 it zeroes the whole batch — the
        # parity ablation pins this to match the running torch wrappers
        m = sample_context_mask(jax.random.key(2), 8, 180, context_len=30,
                                zero_rows=64)
        assert float(np.asarray(m).sum()) == 0.0


class TestPredictorStage:
    def test_train_step_learns(self, frozen_vq, rng):
        vq_model, vq_vars = frozen_vq
        stage = PredictorStage(mot_dim=CM, num_code=8, groups=4, dec_layers=1,
                               aud_dim=CA)
        gt = jnp.asarray(rng.normal(size=(B, T, CM)).astype(np.float32))
        aud = jnp.asarray(rng.normal(size=(B, T, CA)).astype(np.float32))
        spk = jnp.zeros((B,), jnp.int32)
        mask = jnp.zeros((B, T, 1), jnp.float32)
        codes0 = jnp.zeros((B, T // 8, 4), jnp.int32)
        state = create_train_state(
            stage, (gt * mask, codes0, mask, spk, aud),
            jax.random.key(2), adamw(3e-3),
            init_kwargs={"train": True},
        )
        step = make_predictor_train_step(stage, vq_model, vq_vars, donate=False)
        batch = {"poses_fbhe": gt, "aud_feat": aud, "speaker": spk,
                 "epoch_ratio": 0.5}
        key = jax.random.key(0)
        first = last = None
        for i in range(15):
            key, k = jax.random.split(key)
            state, metrics = step(state, batch, k)
            if i == 0:
                first = float(metrics["loss"])
            last = float(metrics["loss"])
        assert np.isfinite(last)
        assert last < first  # memorizing 2 samples must reduce CE

        infer = make_predictor_infer_fn(stage, vq_model, vq_vars)
        blended, codes = infer(state, jax.random.key(9), gt, mask, spk, aud)
        assert blended.shape == gt.shape
        assert codes.shape == (B, T // 8, 4)
        assert int(codes.max()) < 8

    def test_sample_max_deterministic(self, rng):
        """Greedy decode (reference sample_max, PTransformer.py:644-655):
        keyless, deterministic, in-range — the converted-checkpoint
        equivalence path (scripts/converted_det.py)."""
        stage = PredictorStage(mot_dim=CM, num_code=8, groups=4, dec_layers=1,
                               aud_dim=CA)
        aud = jnp.asarray(rng.normal(size=(B, T, CA)).astype(np.float32))
        spk = jnp.zeros((B,), jnp.int32)
        mask = jnp.zeros((B, T, 1), jnp.float32)
        x0 = jnp.zeros((B, T, CM), jnp.float32)
        codes0 = jnp.zeros((B, T // 8, 4), jnp.int32)
        v = stage.init(jax.random.key(2), x0, codes0, mask, spk, aud,
                       train=False)
        f = jax.jit(lambda v, a: stage.apply(v, x0, mask, spk, a,
                                             method=stage.sample_max))
        c1, c2 = f(v, aud), f(v, aud)
        assert c1.shape == (B, T // 8, 4)
        assert bool((c1 == c2).all())
        assert 0 <= int(c1.min()) and int(c1.max()) < 8


class TestRefinerStage:
    def test_train_step_learns(self, frozen_vq, rng):
        vq_model, vq_vars = frozen_vq
        stage = RefinerStage(in_dim=CM, aud_dim=CA, layers=1)
        gt = jnp.asarray(rng.normal(size=(B, T, CM)).astype(np.float32))
        aud = jnp.asarray(rng.normal(size=(B, T, CA)).astype(np.float32))
        spk = jnp.zeros((B,), jnp.int32)
        mask = jnp.zeros((B, T, 1), jnp.float32)
        state = create_train_state(
            stage, (gt, aud, mask, spk), jax.random.key(3), adamw(3e-3),
            init_kwargs={"train": True},
        )
        step = make_refiner_train_step(stage, vq_model, vq_vars, donate=False,
                                       each_dim=[4, 12, 16, 8])  # tiny 40ch split
        batch = {"poses_fbhe": gt, "aud_feat": aud, "speaker": spk}
        key = jax.random.key(1)
        hist = []
        for i in range(24):
            key, k = jax.random.split(key)
            state, metrics = step(state, batch, k)
            hist.append(float(metrics["loss"]))
        assert np.all(np.isfinite(hist))
        # per-step masks are random -> compare window means, not endpoints
        assert np.mean(hist[-6:]) < np.mean(hist[2:8]), hist

        infer = make_refiner_infer_fn(stage)
        out = infer(state, gt, aud, mask, spk)
        assert out.shape == gt.shape


class TestTorchFullReinit:
    """torch_full_reinit matches torch's nn.Embedding/Linear defaults
    (init-parity arm of the FGD campaign; PTransformer.py:420-441)."""

    def test_embedding_bias_and_attention_rules(self):
        from probtalk_tpu.train.state import torch_full_reinit

        stage = PredictorStage(mot_dim=CM, num_code=8, groups=4, aud_dim=CA,
                               dec_layers=1)
        x = jnp.zeros((B, T, CM), jnp.float32)
        codes = jnp.zeros((B, T // 8, 4), jnp.int32)
        mask = jnp.zeros((B, T, 1), jnp.float32)
        spk = jnp.zeros((B,), jnp.int32)
        aud = jnp.zeros((B, T, CA), jnp.float32)
        variables = stage.init(
            {"params": jax.random.key(0), "quant": jax.random.key(1),
             "dropout": jax.random.key(2)},
            x, codes, mask, spk, aud, train=True)
        params = variables["params"]
        new = torch_full_reinit(params, jax.random.key(9))

        flat = dict(jax.tree_util.tree_flatten_with_path(new)[0])
        old = dict(jax.tree_util.tree_flatten_with_path(params)[0])

        def by_suffix(d, *names):
            return {p: v for p, v in d.items()
                    if [str(getattr(k, "key", "")) for k in p][-len(names):]
                    == list(names)}

        # Embed tables resampled to unit variance (torch nn.Embedding)
        embs = {p: v for p, v in by_suffix(flat, "embedding").items()}
        assert embs
        for p, v in embs.items():
            assert 0.8 < float(jnp.std(v)) < 1.2, (p, float(jnp.std(v)))

        # non-attention biases with a sibling kernel: uniform in
        # (-1/sqrt(fan_in), 1/sqrt(fan_in)), not all zero
        touched = 0
        for p, v in by_suffix(flat, "bias").items():
            names = [str(getattr(k, "key", "")) for k in p]
            if any("attn" in n for n in names):
                # torch MHA zeroes in_proj/out_proj biases — must stay zero
                assert float(jnp.abs(v).max()) == 0.0, p
                continue
            kp = p[:-1] + (jax.tree_util.DictKey("kernel"),)
            if kp in flat and v.size > 4:
                fan_in = int(np.prod(flat[kp].shape[:-1]))
                bound = (1.0 / fan_in) ** 0.5
                assert float(jnp.abs(v).max()) <= bound + 1e-6, p
                assert float(jnp.abs(v).max()) > 0.0, p
                touched += 1
        assert touched >= 3

        # attention kernels untouched (xavier~lecun variance already match)
        for p, v in flat.items():
            names = [str(getattr(k, "key", "")) for k in p]
            if any("attn" in n for n in names) and names[-1] == "kernel":
                assert jnp.array_equal(v, old[p]), p
