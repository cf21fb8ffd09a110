"""Golden parity: flax Speech2TextEncoder vs HF torch Speech2TextModel.

The reference's third audio foundation model (loaded at
``data_utils/foundation_models.py:38-41`` but never wired to feature
extraction upstream); here the encoder is complete + golden-tested.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from probtalk_tpu.audio.speech2text import (  # noqa: E402
    Speech2TextEncoder,
    convert_hf_speech2text,
    make_s2t_feature_fn,
)

FEATS, T = 24, 52


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Speech2TextConfig, Speech2TextModel

    torch.manual_seed(0)
    cfg = Speech2TextConfig(
        d_model=64, encoder_layers=2, encoder_attention_heads=1,
        decoder_layers=1, decoder_attention_heads=1,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        input_feat_per_channel=FEATS, num_conv_layers=2,
        conv_kernel_sizes=(5, 5), conv_channels=64, vocab_size=100,
        max_source_positions=600)
    model = Speech2TextModel(cfg)
    model.eval()
    return model


class TestS2TParity:
    def test_encoder_matches_hf(self, hf_model, rng):
        feats = rng.normal(size=(1, T, FEATS)).astype(np.float32)
        with torch.no_grad():
            golden = hf_model.encoder(
                input_features=torch.from_numpy(feats)
            ).last_hidden_state.numpy()

        variables = convert_hf_speech2text(hf_model.state_dict())
        model = Speech2TextEncoder(dim=64, layers=2, heads=1, ffn=128,
                                   in_feats=FEATS, conv_channels=64,
                                   max_pos=600)
        out = np.asarray(model.apply(variables,
                                     jnp.asarray(feats)))
        assert out.shape == golden.shape
        np.testing.assert_allclose(out, golden, atol=1e-4, rtol=1e-3)

    def test_feature_fn_surface(self, hf_model):
        variables = convert_hf_speech2text(hf_model.state_dict())
        fn = make_s2t_feature_fn(variables, dim=64, layers=2, heads=1,
                                 ffn=128, in_feats=FEATS, conv_channels=64,
                                 max_pos=600)
        feat = fn(np.zeros(16000, np.float32))
        assert feat.shape == (30, 64)
        assert np.isfinite(feat).all()
