"""Golden parity: flax GPT2Encoder vs HF torch GPT2Model.

The reference's *default* text foundation model is GPT-2
(``data_utils/foundation_models.py:47-51,64-67``); per-word features are
mean-pooled last hidden states (``foundation_models.py:157-159``). A
random-init ``GPT2Model(GPT2Config(...))`` (no download) is golden-tested
against ``text.gpt2.GPT2Encoder`` with weights mapped by
``convert_hf_gpt2``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from probtalk_tpu.text.gpt2 import (  # noqa: E402
    GPT2Encoder, convert_hf_gpt2, make_gpt2_embed_fn,
)

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def hf_small():
    """4-layer GPT-2 (full 768-d width) — random init, eval mode."""
    from transformers import GPT2Config, GPT2Model

    torch.manual_seed(0)
    cfg = GPT2Config(n_layer=4, n_positions=128, vocab_size=1000)
    model = GPT2Model(cfg)
    model.eval()
    return model


class TestGPT2Parity:
    def test_last_hidden_matches_hf(self, hf_small, rng):
        ids = rng.integers(0, 1000, size=(2, 17))
        with torch.no_grad():
            golden = hf_small(torch.from_numpy(ids)).last_hidden_state.numpy()

        variables = convert_hf_gpt2(hf_small.state_dict())
        flax_model = GPT2Encoder(vocab=1000, layers=4, max_pos=128)
        out = np.asarray(flax_model.apply(
            variables, jnp.asarray(ids, jnp.int32)))

        assert out.shape == golden.shape
        np.testing.assert_allclose(out, golden, atol=1e-4, rtol=1e-4)

    def test_causality(self, hf_small, rng):
        """Changing a future token must not change earlier hidden states."""
        variables = convert_hf_gpt2(hf_small.state_dict())
        flax_model = GPT2Encoder(vocab=1000, layers=4, max_pos=128)
        ids = rng.integers(0, 1000, size=(1, 12))
        a = np.asarray(flax_model.apply(variables, jnp.asarray(ids, jnp.int32)))
        ids2 = ids.copy()
        ids2[0, -1] = (ids2[0, -1] + 7) % 1000
        b = np.asarray(flax_model.apply(variables, jnp.asarray(ids2, jnp.int32)))
        np.testing.assert_allclose(a[0, :-1], b[0, :-1], atol=1e-5)
        assert np.abs(a[0, -1] - b[0, -1]).max() > 1e-4

    def test_embed_fn_matches_hf_pooling(self, hf_small):
        """make_gpt2_embed_fn == torch mean-pooled last_hidden_state for the
        same token ids (the reference's per-word feature)."""
        variables = convert_hf_gpt2(hf_small.state_dict())

        def tok(word):
            return [b % 1000 for b in word.lower().encode()] or [0]

        embed = make_gpt2_embed_fn(variables, tokenize_fn=tok,
                                   vocab=1000, layers=4, max_pos=128)
        for word in ("ocean", "Come"):
            ids = torch.tensor([tok(word)])
            with torch.no_grad():
                golden = hf_small(ids).last_hidden_state[0].mean(0).numpy()
            np.testing.assert_allclose(embed(word), golden,
                                       atol=1e-4, rtol=1e-4)

    def test_text_features_with_gpt2(self, hf_small, tmp_path):
        """End-to-end: transcript -> per-frame GPT-2 features."""
        from probtalk_tpu.data import text as T

        path = tmp_path / "t.txt"
        path.write_text("Transcript: Come in.\n"
                        "  0.000 |   0.300 | Come | 97%\n"
                        "  0.300 |   0.500 | in | 95%\n")
        words = T.parse_transcript(str(path))
        variables = convert_hf_gpt2(hf_small.state_dict())
        embed = make_gpt2_embed_fn(variables, vocab=1000, layers=4,
                                   max_pos=128)
        feat = T.text_features(words, n_frames=30, embed_fn=embed)
        assert feat.shape == (30, 768)
        assert np.abs(feat[0]).sum() > 0          # word frames carry features
        assert np.abs(feat[-1]).sum() == 0        # silence is zeros


class TestTextFeatBin:
    def test_token_level_features_match_hf(self, hf_small, tmp_path):
        """text_features_tokens == the reference's get_textfeat_bin
        semantics with a torch GPT-2: whole-sentence encode, per-token
        interval splat scaled by confidence."""
        import numpy as np
        from probtalk_tpu.data import text as T
        from probtalk_tpu.text.gpt2 import make_gpt2_encode_fn

        path = tmp_path / "t.txt"
        path.write_text("Transcript: Come in.\n"
                        "  0.000 |   0.300 | Come | 80%\n"
                        "  0.300 |   0.500 | in | 50%\n")
        sents = T.parse_sentences(str(path))
        assert sents[0][0] == "Come in."
        assert sents[0][1][1][3] == 0.5

        def tok(word):
            return [b % 1000 for b in word.lower().encode()] or [0]

        variables = convert_hf_gpt2(hf_small.state_dict())
        encode = make_gpt2_encode_fn(variables, vocab=1000, layers=4,
                                     max_pos=128)
        feat = T.text_features_tokens(sents, n_frames=30, encode_fn=encode,
                                      tokenize_fn=tok)
        assert feat.shape == (30, 768)

        # golden: torch forward over the same flat token ids
        flat = tok("come") + tok("in")
        with torch.no_grad():
            states = hf_small(torch.tensor([flat])).last_hidden_state[0].numpy()
        # frame 0 carries the first token of 'Come' at confidence 0.8
        np.testing.assert_allclose(feat[0], states[0] * 0.8,
                                   atol=1e-4, rtol=1e-4)
        # frames in (0.3, 0.5)s carry 'in' tokens at confidence 0.5;
        # frame 9 (0.3s) starts the 'in' interval
        np.testing.assert_allclose(feat[9], states[4] * 0.5,
                                   atol=1e-4, rtol=1e-4)
        # trailing silence is zeros (no pad vector given)
        assert np.abs(feat[-1]).sum() == 0

    def test_long_sentence_whole_context(self, hf_small):
        """Sentences longer than the pad bucket keep whole-sentence
        attention (bucket doubles instead of chunking) and match torch."""
        import numpy as np
        from probtalk_tpu.text.gpt2 import make_gpt2_encode_fn

        variables = convert_hf_gpt2(hf_small.state_dict())
        encode = make_gpt2_encode_fn(variables, pad_to=16, vocab=1000,
                                     layers=4, max_pos=128)
        ids = list(range(2, 47))          # 45 tokens > pad_to=16
        states = encode(ids)
        assert states.shape == (45, 768)
        with torch.no_grad():
            golden = hf_small(torch.tensor([ids])).last_hidden_state[0].numpy()
        np.testing.assert_allclose(states, golden, atol=1e-4, rtol=1e-4)

        with pytest.raises(ValueError):
            encode(list(range(300)))      # > max_pos
