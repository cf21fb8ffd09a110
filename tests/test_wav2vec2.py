"""Wav2Vec2 flax encoder tests (tiny config) + HF converter mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from probtalk_tpu.audio.wav2vec2 import (
    Wav2Vec2Encoder, FeatureExtractor, convert_hf_wav2vec2, _CONV_LAYERS,
)


class TestFeatureExtractor:
    def test_downsample_320x(self, rng):
        fe = FeatureExtractor()
        x = jnp.asarray(rng.normal(size=(1, 3200)).astype(np.float32))
        v = fe.init(jax.random.key(0), x)
        out = fe.apply(v, x)
        assert out.shape[-1] == 512
        # total stride 320, VALID conv edges: ~S/320 frames
        assert 5 <= out.shape[1] <= 10


class TestEncoder:
    def test_fps_alignment(self, rng):
        enc = Wav2Vec2Encoder(dim=64, layers=2, heads=4, conv_pos_kernel=16,
                              conv_pos_groups=4)
        x = jnp.asarray(rng.normal(size=(1, 16000)).astype(np.float32))
        v = enc.init(jax.random.key(0), x, n_frames=30)
        out = enc.apply(v, x, n_frames=30)
        assert out.shape == (1, 30, 64)   # 1s -> 30 motion frames
        assert np.all(np.isfinite(np.asarray(out)))

    def test_native_rate_without_alignment(self, rng):
        enc = Wav2Vec2Encoder(dim=64, layers=1, heads=4, conv_pos_kernel=16,
                              conv_pos_groups=4)
        x = jnp.asarray(rng.normal(size=(1, 16000)).astype(np.float32))
        v = enc.init(jax.random.key(0), x)
        out = enc.apply(v, x)
        assert 45 <= out.shape[1] <= 50   # ~50 fps native

    def test_spec_augment_train_path(self, rng):
        """train=True samples a time mask and substitutes the learned
        embedding — output must differ from eval; eval path must not
        require (or create) the masked_spec_embed param."""
        enc = Wav2Vec2Encoder(dim=64, layers=1, heads=4, conv_pos_kernel=16,
                              conv_pos_groups=4, dropout=0.0)
        x = jnp.asarray(rng.normal(size=(2, 16000)).astype(np.float32))
        v = enc.init({"params": jax.random.key(0),
                      "spec_augment": jax.random.key(1),
                      "dropout": jax.random.key(9)},
                     x, n_frames=60, train=True)
        assert "masked_spec_embed" in v["params"]
        masked = enc.apply(v, x, n_frames=60, train=True,
                           rngs={"spec_augment": jax.random.key(2),
                                 "dropout": jax.random.key(8)})
        plain = enc.apply(v, x, n_frames=60)
        assert not np.allclose(np.asarray(masked), np.asarray(plain))
        # eval init has no spec-augment param at all
        v_eval = enc.init(jax.random.key(0), x, n_frames=60)
        assert "masked_spec_embed" not in v_eval["params"]


class TestComputeMaskSpans:
    def test_span_statistics(self):
        from probtalk_tpu.audio.wav2vec2 import compute_mask_spans

        # reference envelope: T=180 at mask_prob 0.05, length 10, min 2
        # -> num_mask = max(2, floor(0.9 + u)) = 2 spans of 10 always;
        # without-replacement starts => 11..20 masked frames per row
        m = np.asarray(jax.jit(
            lambda k: compute_mask_spans(k, 64, 180, 0.05, 10, 2)
        )(jax.random.key(0)))
        assert m.shape == (64, 180) and m.dtype == bool
        counts = m.sum(1)
        assert counts.min() >= 11 and counts.max() <= 20
        assert len({r.tobytes() for r in m}) > 1   # rows differ

    def test_degenerate_lengths(self):
        from probtalk_tpu.audio.wav2vec2 import compute_mask_spans

        m = compute_mask_spans(jax.random.key(0), 2, 5, 0.05, 10, 2)
        assert not np.asarray(m).any()             # window < mask_length


class TestHFConverter:
    def test_mapping_from_synthetic_state_dict(self, rng):
        """Build an HF-shaped numpy state dict and check the converted tree
        loads into the module (full wav2vec2-base geometry)."""
        dim, heads, ffn, layers = 768, 12, 3072, 2
        sd = {}
        for i, (d, k, s) in enumerate(_CONV_LAYERS):
            cin = 1 if i == 0 else 512
            sd[f"feature_extractor.conv_layers.{i}.conv.weight"] = \
                rng.normal(size=(d, cin, k)).astype(np.float32)
        sd["feature_extractor.conv_layers.0.layer_norm.weight"] = np.ones(512, np.float32)
        sd["feature_extractor.conv_layers.0.layer_norm.bias"] = np.zeros(512, np.float32)
        sd["feature_projection.layer_norm.weight"] = np.ones(512, np.float32)
        sd["feature_projection.layer_norm.bias"] = np.zeros(512, np.float32)
        sd["feature_projection.projection.weight"] = rng.normal(size=(dim, 512)).astype(np.float32)
        sd["feature_projection.projection.bias"] = np.zeros(dim, np.float32)
        sd["encoder.pos_conv_embed.conv.weight"] = rng.normal(size=(dim, dim // 16, 128)).astype(np.float32)
        sd["encoder.pos_conv_embed.conv.bias"] = np.zeros(dim, np.float32)
        sd["encoder.layer_norm.weight"] = np.ones(dim, np.float32)
        sd["encoder.layer_norm.bias"] = np.zeros(dim, np.float32)
        for i in range(layers):
            b = f"encoder.layers.{i}"
            for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[f"{b}.attention.{p}.weight"] = rng.normal(size=(dim, dim)).astype(np.float32)
                sd[f"{b}.attention.{p}.bias"] = np.zeros(dim, np.float32)
            sd[f"{b}.layer_norm.weight"] = np.ones(dim, np.float32)
            sd[f"{b}.layer_norm.bias"] = np.zeros(dim, np.float32)
            sd[f"{b}.feed_forward.intermediate_dense.weight"] = rng.normal(size=(ffn, dim)).astype(np.float32)
            sd[f"{b}.feed_forward.intermediate_dense.bias"] = np.zeros(ffn, np.float32)
            sd[f"{b}.feed_forward.output_dense.weight"] = rng.normal(size=(dim, ffn)).astype(np.float32)
            sd[f"{b}.feed_forward.output_dense.bias"] = np.zeros(dim, np.float32)
            sd[f"{b}.final_layer_norm.weight"] = np.ones(dim, np.float32)
            sd[f"{b}.final_layer_norm.bias"] = np.zeros(dim, np.float32)

        variables = convert_hf_wav2vec2(sd)
        enc = Wav2Vec2Encoder(dim=dim, layers=layers, heads=heads)
        x = jnp.asarray(rng.normal(size=(1, 8000)).astype(np.float32) * 0.1)
        out = enc.apply(variables, x, n_frames=15)
        assert out.shape == (1, 15, dim)
        assert np.all(np.isfinite(np.asarray(out)))


class TestMatmulFeatureExtractor:
    def test_matmul_matches_conv(self, rng):
        """The im2col/matmul feature extractor (`impl='matmul'`, the TPU
        MXU path) computes the same function as the XLA-conv formulation
        on the SAME param tree — both group-norm (wav2vec2) and
        layer-norm+bias (HuBERT) modes."""
        x = jnp.asarray(rng.normal(size=(2, 3210)).astype(np.float32))
        for mode, bias in (("group", False), ("layer", True)):
            conv = FeatureExtractor(impl="conv", norm_mode=mode,
                                    conv_bias=bias)
            v = conv.init(jax.random.key(1), x)
            a = conv.apply(v, x)
            mm = FeatureExtractor(impl="matmul", norm_mode=mode,
                                  conv_bias=bias)
            b = mm.apply(v, x)   # identical tree: kernel (k, C, O) [+ bias]
            assert a.shape == b.shape
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=2e-5)

    def test_param_tree_identical(self):
        x = jnp.zeros((1, 3200), jnp.float32)
        va = FeatureExtractor(impl="conv").init(jax.random.key(0), x)
        vb = FeatureExtractor(impl="matmul").init(jax.random.key(0), x)
        sa = jax.tree.map(lambda t: t.shape, va)
        sb = jax.tree.map(lambda t: t.shape, vb)
        assert sa == sb


class TestBF16Compute:
    def test_bf16_close_to_f32(self, rng):
        """dtype=bf16 runs the same params and stays within bf16 tolerance
        of the f32 path (norms/softmax pinned f32)."""
        import jax
        import jax.numpy as jnp

        from probtalk_tpu.audio.wav2vec2 import Wav2Vec2Encoder

        f32 = Wav2Vec2Encoder(layers=2)
        wav = jnp.asarray(0.1 * rng.normal(size=(1, 8000)), jnp.float32)
        v = f32.init(jax.random.key(0), wav, n_frames=15)
        a = f32.apply(v, wav, n_frames=15)
        b16 = Wav2Vec2Encoder(layers=2, dtype=jnp.bfloat16)
        b = b16.apply(v, wav, n_frames=15)
        assert b.dtype == jnp.float32        # output cast back
        denom = float(jnp.abs(a).mean())
        assert float(jnp.abs(a - b).mean()) / denom < 0.05


class TestInt8FeatureExtractor:
    def test_int8_close_to_f32(self, rng):
        """The dynamically-quantized serving arms (`impl='int8'` direct
        conv with per-sample activation scales; `impl='int8mm'` im2col
        with exact per-output-row scales) run the SAME param tree as
        'conv' and stay within int8 quantization tolerance — int8mm
        strictly finer-grained, both bounded at 10% mean relative."""
        x = jnp.asarray(rng.normal(size=(2, 3210)).astype(np.float32))
        for mode, bias in (("group", False), ("layer", True)):
            conv = FeatureExtractor(impl="conv", norm_mode=mode,
                                    conv_bias=bias)
            v = conv.init(jax.random.key(1), x)
            a = conv.apply(v, x)
            scale = float(jnp.abs(a).mean())
            errs = {}
            for impl in ("int8", "int8mm"):
                b = FeatureExtractor(impl=impl, norm_mode=mode,
                                     conv_bias=bias).apply(v, x)
                assert a.shape == b.shape
                errs[impl] = float(jnp.abs(a - b).mean()) / scale
                assert errs[impl] < 0.10, (mode, impl, errs[impl])
            assert errs["int8mm"] <= errs["int8"] * 1.05, errs
    def test_fold_matches_conv(self, rng):
        """impl='fold' (phase-folded matmuls) == the conv path on the SAME
        param tree — exact at the default (f32) compute dtype like every
        other impl, bf16-tolerance with dtype=bfloat16 (the measured
        ablation arm). Covers both FE norm modes (stride-2 layers only
        differ)."""
        x = jnp.asarray(rng.normal(size=(2, 3210)).astype(np.float32))
        for mode, bias in (("group", False), ("layer", True)):
            conv = FeatureExtractor(impl="conv", norm_mode=mode,
                                    conv_bias=bias)
            v = conv.init(jax.random.key(1), x)
            a = conv.apply(v, x)
            f32 = FeatureExtractor(impl="fold", norm_mode=mode,
                                   conv_bias=bias).apply(v, x)
            np.testing.assert_allclose(np.asarray(a), np.asarray(f32),
                                       rtol=0, atol=2e-5)
            b16 = FeatureExtractor(impl="fold", norm_mode=mode,
                                   conv_bias=bias,
                                   dtype=jnp.bfloat16).apply(v, x)
            scale = float(jnp.abs(a).mean())
            err = float(jnp.abs(a - b16.astype(jnp.float32)).mean())
            assert err / scale < 0.05, (mode, err / scale)
