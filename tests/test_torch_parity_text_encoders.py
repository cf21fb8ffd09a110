"""Golden parity: flax BERT / CLIP-text / T5-encoder vs HF torch.

The reference's non-GPT-2 text foundation models
(``data_utils/foundation_models.py:46-68``; used in ``get_textfeat`` as
``CLIPModel.text_model(input_ids)`` and
``T5ForConditionalGeneration.encoder(input_ids)``). Random-init torch
models at reduced width golden-test architecture + converter (no
downloads available here — the same contract as the wav2vec2/GPT-2
goldens).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from probtalk_tpu.text.encoders import (  # noqa: E402
    BertEncoder,
    ClipTextEncoder,
    T5Encoder,
    convert_hf_bert,
    convert_hf_clip_text,
    convert_hf_t5_encoder,
    make_text_encoder_embed_fn,
)

B, L = 2, 11


def ids_np(rng, vocab):
    return rng.integers(0, vocab, size=(B, L)).astype(np.int64)


class TestBertParity:
    def test_matches_hf(self, rng):
        from transformers import BertConfig, BertModel

        torch.manual_seed(0)
        hf = BertModel(BertConfig(
            vocab_size=100, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=256,
            max_position_embeddings=64))
        hf.eval()
        ids = ids_np(rng, 100)
        with torch.no_grad():
            golden = hf(torch.from_numpy(ids)).last_hidden_state.numpy()

        model = BertEncoder(vocab=100, dim=128, layers=2, heads=2, ffn=256,
                            max_pos=64)
        out = np.asarray(model.apply(convert_hf_bert(hf.state_dict()),
                                     jnp.asarray(ids)))
        assert out.shape == golden.shape
        np.testing.assert_allclose(out, golden, atol=1e-4, rtol=1e-3)


class TestClipTextParity:
    def test_matches_hf(self, rng):
        from transformers import CLIPTextConfig, CLIPTextModel

        torch.manual_seed(0)
        hf = CLIPTextModel(CLIPTextConfig(
            vocab_size=100, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=256,
            max_position_embeddings=32))
        hf.eval()
        ids = ids_np(rng, 100)
        with torch.no_grad():
            golden = hf(torch.from_numpy(ids)).last_hidden_state.numpy()

        model = ClipTextEncoder(vocab=100, dim=128, layers=2, heads=2,
                                ffn=256, max_pos=32)
        out = np.asarray(model.apply(convert_hf_clip_text(hf.state_dict()),
                                     jnp.asarray(ids)))
        assert out.shape == golden.shape
        np.testing.assert_allclose(out, golden, atol=1e-4, rtol=1e-3)


class TestT5EncoderParity:
    def test_matches_hf(self, rng):
        from transformers import T5Config, T5EncoderModel

        torch.manual_seed(0)
        hf = T5EncoderModel(T5Config(
            vocab_size=100, d_model=128, num_layers=2, num_heads=4,
            d_kv=32, d_ff=256))
        hf.eval()
        ids = ids_np(rng, 100)
        with torch.no_grad():
            golden = hf(torch.from_numpy(ids)).last_hidden_state.numpy()

        model = T5Encoder(vocab=100, dim=128, layers=2, heads=4, head_dim=32,
                          ffn=256)
        out = np.asarray(model.apply(convert_hf_t5_encoder(hf.state_dict()),
                                     jnp.asarray(ids)))
        assert out.shape == golden.shape
        np.testing.assert_allclose(out, golden, atol=1e-4, rtol=1e-3)

    def test_long_range_buckets(self, rng):
        """Relative-position buckets beyond max_exact hit the log branch."""
        from transformers import T5Config, T5EncoderModel

        torch.manual_seed(1)
        hf = T5EncoderModel(T5Config(
            vocab_size=50, d_model=64, num_layers=1, num_heads=2,
            d_kv=32, d_ff=128))
        hf.eval()
        ids = rng.integers(0, 50, size=(1, 40)).astype(np.int64)
        with torch.no_grad():
            golden = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
        model = T5Encoder(vocab=50, dim=64, layers=1, heads=2, head_dim=32,
                          ffn=128)
        out = np.asarray(model.apply(convert_hf_t5_encoder(hf.state_dict()),
                                     jnp.asarray(ids)))
        np.testing.assert_allclose(out, golden, atol=1e-4, rtol=1e-3)


class TestEmbedFnSurface:
    def test_word_embed_shapes(self):
        for kind, dim in (("bert", 32),):
            fn = make_text_encoder_embed_fn(
                kind, vocab=64, dim=dim, layers=1, heads=1, ffn=64,
                max_pos=64)
            v = fn("hello")
            assert v.shape == (dim,) and np.isfinite(v).all()

    def test_make_text_embed_fn_accepts_flax_variables(self):
        """data.text.make_text_embed_fn routes flax variables for
        bert/clip/t5 (the loud-fallback contract's weights path)."""
        import jax

        from probtalk_tpu.data.text import make_text_embed_fn

        model = ClipTextEncoder(vocab=64, dim=32, layers=1, heads=1, ffn=64,
                                max_pos=16)
        variables = jax.jit(model.init)(jax.random.key(0),
                                        jnp.zeros((1, 4), jnp.int32))
        fn, _ = make_text_embed_fn("clip", variables=variables, vocab=64,
                                   dim=32, layers=1, heads=1, ffn=64,
                                   max_pos=16)
        v = fn("hi")
        assert v.shape == (32,) and np.isfinite(v).all()
