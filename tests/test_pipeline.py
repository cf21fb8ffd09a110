"""End-to-end pipeline tests: sliding-window generation + eval harness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probtalk_tpu.models.vqvae import VQVAE
from probtalk_tpu.pipeline import HolisticPipeline, splice_face
from probtalk_tpu.train.stages import PredictorStage, RefinerStage
from probtalk_tpu.train.state import create_train_state, adamw

CM, CA = 40, 24
W = 16     # tiny window
VQ_TINY = dict(in_dim=CM, embedding_dim=32, num_codes=8, groups=4, hiddens=32,
               res_layers=1)


@pytest.fixture(scope="module")
def pipeline():
    vq = VQVAE(**VQ_TINY)
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
    return HolisticPipeline(vq, vq_vars, pred, pred_state, ref, ref_state,
                            window=W, overlap=4, refine_window=W)


class TestPipeline:
    def test_short_clip(self, pipeline, rng):
        aud = jnp.asarray(rng.normal(size=(10, CA)).astype(np.float32))
        out = pipeline.generate(jax.random.key(0), aud,
                                jnp.zeros((2,), jnp.int32), B=2)
        assert out.shape == (2, 10, CM)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_long_clip_sliding_windows(self, pipeline, rng):
        t = 40  # forces 3 windows with context feedback
        aud = jnp.asarray(rng.normal(size=(t, CA)).astype(np.float32))
        out = pipeline.generate(jax.random.key(1), aud,
                                jnp.zeros((1,), jnp.int32), B=1)
        assert out.shape == (1, t, CM)
        assert np.all(np.isfinite(np.asarray(out)))
        assert pipeline.timers.frames > 0 and pipeline.timers.fps > 0

    def test_diversity_across_samples(self, pipeline, rng):
        aud = jnp.asarray(rng.normal(size=(W, CA)).astype(np.float32))
        out = pipeline.generate(jax.random.key(2), aud,
                                jnp.zeros((4,), jnp.int32), B=4)
        flat = np.asarray(out).reshape(4, -1)
        assert not np.allclose(flat[0], flat[1])  # MaskGit sampling diversifies


class TestSpliceFace:
    def test_overwrites_jaw_and_expression(self, rng):
        body = jnp.asarray(rng.normal(size=(2, 8, 376)).astype(np.float32))
        face = jnp.asarray(rng.normal(size=(2, 8, 106)).astype(np.float32))
        out = np.asarray(splice_face(body, face))
        assert out.shape == (2, 8, 376)
        np.testing.assert_array_equal(out[..., :6], np.asarray(face)[..., :6])
        np.testing.assert_array_equal(out[..., -100:], np.asarray(face)[..., 6:])
        np.testing.assert_array_equal(out[..., 6:276], np.asarray(body)[..., 6:276])


class TestHarness:
    def test_run_harness_plumbing(self, pipeline, rng):
        from probtalk_tpu.cli.test_holistic import (
            pipeline_generate_fn, run_harness, unfold_windows,
        )
        from probtalk_tpu.data.dataset import ClipData

        w = unfold_windows(np.zeros((200, 5), np.float32), 90, 90)
        assert w.shape == (2, 90, 5)

        clip = ClipData(
            poses=rng.normal(size=(40, 330)).astype(np.float32),
            expression=rng.normal(size=(40, 100)).astype(np.float32),
            aud_feat=rng.normal(size=(40, CA)).astype(np.float32),
            betas=np.zeros(300, np.float32), speaker=0,
        )
        res = run_harness(pipeline_generate_fn(pipeline), [clip],
                          np.zeros(430, np.float32),
                          np.ones(430, np.float32), evaluator=None, B=2,
                          verbose=False)
        assert res["clips"] == 1
        assert res["fps"] > 0
        assert np.isfinite(res["diversity_fbhe"])


class TestContinuation:
    def test_continue_generation(self, pipeline, rng):
        from probtalk_tpu.pipeline import continue_generation

        prev = jnp.asarray(rng.normal(size=(1, 20, CM)).astype(np.float32))
        aud = jnp.asarray(rng.normal(size=(25, CA)).astype(np.float32))
        out = continue_generation(pipeline, jax.random.key(0), prev, aud,
                                  jnp.zeros((1,), jnp.int32), num_pre=4)
        assert out.shape == (1, 25, CM)
        assert np.all(np.isfinite(np.asarray(out)))


class TestCodeEval:
    def test_masked_code_ce(self, pipeline, rng):
        from probtalk_tpu.train.stages import make_predictor_code_eval_fn

        evaluate = make_predictor_code_eval_fn(
            pipeline.predictor_stage, pipeline.vq_model, pipeline.vq_variables)
        gt = jnp.asarray(rng.normal(size=(2, W, CM)).astype(np.float32))
        aud = jnp.asarray(rng.normal(size=(2, W, CA)).astype(np.float32))
        ce = evaluate(pipeline.predictor_state, jax.random.key(1), gt,
                      jnp.zeros((2,), jnp.int32), aud)
        assert np.isfinite(float(ce)) and float(ce) > 0


class TestAllInOne:
    def test_forward_type_dispatch(self, pipeline, rng):
        from probtalk_tpu.ai1 import AllInOneModel
        from probtalk_tpu.models.face import FaceGenerator

        face = FaceGenerator(hidden=16, jaw_dim=4, expression_dim=8)
        aud768 = jnp.asarray(rng.normal(size=(1, 10, 768)).astype(np.float32))
        fv = face.init(jax.random.key(0), aud768, jnp.zeros((1,), jnp.int32))

        ai1 = AllInOneModel(pipeline, face_model=None)
        aud = rng.normal(size=(10, CA)).astype(np.float32)
        out = ai1(forward_type="infer_on_audio", aud_feat=aud, speaker=0, B=2)
        assert out.shape == (2, 10, CM)

        w_aud = jnp.asarray(rng.normal(size=(2, W, CA)).astype(np.float32))
        ctx = jnp.zeros((2, W, CM), jnp.float32)
        mask = jnp.zeros((2, W, 1), jnp.float32)
        out2 = ai1(forward_type="infer_on_batch", aud_feat=w_aud,
                   gt_poses=ctx, mask=mask, speaker=jnp.zeros((2,), jnp.int32))
        assert out2.shape == (2, W, CM)

        import pytest as _pytest
        with _pytest.raises(ValueError):
            ai1(forward_type="nope")


class TestSeamSmoothing:
    def test_gaussian_smooth_around(self, rng):
        from probtalk_tpu.pipeline import gaussian_smooth_around

        x = jnp.asarray(rng.normal(size=(2, 60, 10)).astype(np.float32))
        out = np.asarray(gaussian_smooth_around(x, [30], 2, 8))
        xn = np.asarray(x)
        # untouched: outside the +-10 seam region, and channels <2 / >=8
        np.testing.assert_array_equal(out[:, :20], xn[:, :20])
        np.testing.assert_array_equal(out[:, 40:], xn[:, 40:])
        np.testing.assert_array_equal(out[..., :2], xn[..., :2])
        np.testing.assert_array_equal(out[..., 8:], xn[..., 8:])
        # smoothed region changed and has lower local variation
        assert not np.allclose(out[:, 25:35, 2:8], xn[:, 25:35, 2:8])
        tv = lambda a: np.abs(np.diff(a, axis=1)).mean()
        assert tv(out[:, 22:38, 2:8]) < tv(xn[:, 22:38, 2:8])

    def test_generate_smooth_seams_flag(self, pipeline, rng):
        t = 40
        aud = jnp.asarray(rng.normal(size=(t, CA)).astype(np.float32))
        out = pipeline.generate(jax.random.key(3), aud,
                                jnp.zeros((1,), jnp.int32), B=1,
                                smooth_seams=True)
        assert out.shape == (1, t, CM)
        assert np.isfinite(np.asarray(out)).all()


class TestInpaint:
    def test_inpaint_clip_keeps_known_frames(self, pipeline, rng):
        from probtalk_tpu.cli.visualise_inpaint import (
            build_inpaint_mask, inpaint_clip,
        )
        from probtalk_tpu.data.dataset import ClipData

        m = build_inpaint_mask(50, pre_frames=5, interior_keep=0.5,
                               rng=np.random.default_rng(0))
        assert m[:5].all() and m[45:].all()
        assert 0 < m[5:45].sum() < 40

        clip = ClipData(
            poses=rng.normal(size=(40, 330)).astype(np.float32),
            expression=rng.normal(size=(40, 100)).astype(np.float32),
            aud_feat=rng.normal(size=(40, CA)).astype(np.float32),
            betas=np.zeros(300, np.float32), speaker=0,
        )
        # the tiny pipeline has CM=40 channels; inpaint only needs shapes
        # consistent between gt_fbhe and pipeline mot_dim — use a fake
        # compose by truncating: here we instead run with the real 376 dim
        # is impossible, so check mask plumbing via generate_window directly
        import jax
        import jax.numpy as jnp

        gt = jnp.asarray(rng.normal(size=(2, W, CM)).astype(np.float32))
        mask = jnp.zeros((2, W, 1), jnp.float32).at[:, :4].set(1.0)
        refined, _, _ = pipeline.generate_window(
            jax.random.key(0), jnp.zeros((2, W, CA)), jnp.zeros((2,), jnp.int32),
            gt * mask, mask)
        # known frames pass through unrefined (pipeline blends with mask)
        np.testing.assert_allclose(np.asarray(refined[:, :4]),
                                   np.asarray(gt[:, :4] * 1.0), atol=1e-5)
