"""Golden parity: flax HubertEncoder vs HF torch HubertModel.

VERDICT round-2 item 3: the reference's ``encoder_choice='hubert'``
frontend (``data_utils/foundation_models.py:23-27``,
``data_utils/utils.py:162-176``). A random-init HF ``HubertModel`` with
hubert-large's STRUCTURAL flags (layer-norm convs + conv bias + stable
pre-LN encoder) at reduced width golden-tests the architecture + converter
without downloads; a full-width config test covers the real 1024-d shape.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from probtalk_tpu.audio.hubert import (  # noqa: E402
    HUBERT_LARGE, HubertEncoder, convert_hf_hubert, make_hubert_feature_fn,
)
from probtalk_tpu.audio.wav2vec2 import Wav2Vec2Encoder  # noqa: E402

# hubert-large's structural flags at reduced width (fast on the 1-core box)
SMALL = dict(hidden_size=256, num_hidden_layers=3, num_attention_heads=4,
             intermediate_size=512, feat_extract_norm="layer",
             conv_bias=True, do_stable_layer_norm=True)


@pytest.fixture(scope="module")
def hf_small():
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(0)
    model = HubertModel(HubertConfig(**SMALL))
    model.eval()
    return model


def torch_patched_forward(model, wav, n_frames):
    """The reference's 50->30 fps patch applied to HubertModel
    (nets/spg/wav2vec.py:95-143 pattern; hubert rides the same
    last_hidden_state path, data_utils/utils.py:162-176)."""
    with torch.no_grad():
        x = torch.from_numpy(wav)[None]
        h = model.feature_extractor(x)
        h = torch.nn.functional.interpolate(
            h, size=n_frames, align_corners=False, mode="linear")
        h = h.transpose(1, 2)
        h = model.feature_projection(h)
        out = model.encoder(h)[0]
    return out.numpy()


class TestHubertParity:
    def test_encoder_matches_hf_30fps(self, hf_small, rng):
        wav = (0.1 * rng.normal(size=32000)).astype(np.float32)  # 2 s
        n_frames = 60
        golden = torch_patched_forward(hf_small, wav, n_frames)

        variables = convert_hf_hubert(hf_small.state_dict(), heads=4)
        model = HubertEncoder(dim=256, layers=3, heads=4, ffn=512)
        out = np.asarray(model.apply(
            variables, jnp.asarray(wav)[None], n_frames=n_frames))

        assert out.shape == golden.shape == (1, n_frames, 256)
        np.testing.assert_allclose(out, golden, atol=1e-4, rtol=1e-3)

    def test_native_50fps_matches_hf_full_forward(self, hf_small, rng):
        wav = (0.1 * rng.normal(size=16000)).astype(np.float32)
        with torch.no_grad():
            golden = hf_small(
                torch.from_numpy(wav)[None]).last_hidden_state.numpy()

        variables = convert_hf_hubert(hf_small.state_dict(), heads=4)
        out = np.asarray(HubertEncoder(dim=256, layers=3, heads=4, ffn=512)
                         .apply(variables, jnp.asarray(wav)[None],
                                n_frames=None))
        np.testing.assert_allclose(out, golden, atol=1e-4, rtol=1e-3)

    def test_large_architecture_dims(self):
        """The default factory is the real hubert-large shape (1024-d —
        the reference's aud_d, foundation_models.py:27)."""
        m = HubertEncoder()
        assert isinstance(m, Wav2Vec2Encoder)
        assert (m.dim, m.layers, m.heads, m.ffn) == (1024, 24, 16, 4096)
        assert m.stable_layer_norm and m.conv_bias and m.norm_mode == "layer"
        assert HUBERT_LARGE["dim"] == 1024

    def test_feature_fn_surface(self, hf_small):
        variables = convert_hf_hubert(hf_small.state_dict(), heads=4)
        fn = make_hubert_feature_fn(variables, dim=256, layers=3, heads=4,
                                    ffn=512)
        feat = fn(np.zeros(16000, np.float32))
        assert feat.shape == (30, 256)
        assert np.isfinite(feat).all()
