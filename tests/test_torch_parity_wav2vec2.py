"""Golden parity: flax Wav2Vec2Encoder vs HF torch Wav2Vec2Model.

VERDICT round-1 item 4: transformers is installed, so a random-init HF
``Wav2Vec2Model(Wav2Vec2Config())`` (no download) can be golden-tested.
The torch side reproduces the reference's patched forward
(``nets/spg/wav2vec.py:95-143``): feature_extractor -> 50->30 fps linear
interpolation -> feature_projection -> encoder, eval mode (no spec
augment). The flax side is ``audio.wav2vec2.Wav2Vec2Encoder`` with weights
mapped by ``convert_hf_wav2vec2``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from probtalk_tpu.audio.wav2vec2 import (  # noqa: E402
    Wav2Vec2Encoder, convert_hf_wav2vec2, make_wav2vec_feature_fn,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(0)
    cfg = Wav2Vec2Config()           # wav2vec2-base: 12 layers, 768-d
    model = Wav2Vec2Model(cfg)
    model.eval()
    return model


def torch_reference_forward(model, wav, n_frames):
    """The reference's patched forward (nets/spg/wav2vec.py:95-143),
    eval mode: interpolate between feature extractor and projection."""
    with torch.no_grad():
        x = torch.from_numpy(wav)[None]
        h = model.feature_extractor(x)            # (B, 512, T50)
        h = torch.nn.functional.interpolate(
            h, size=n_frames, align_corners=False, mode="linear")
        h = h.transpose(1, 2)                     # (B, T30, 512)
        h, _ = model.feature_projection(h)
        out = model.encoder(h)[0]
    return out.numpy()


class TestWav2Vec2Parity:
    def test_encoder_matches_hf(self, hf_model, rng):
        wav = (0.1 * rng.normal(size=32000)).astype(np.float32)  # 2 s
        n_frames = 60                                            # 30 fps
        golden = torch_reference_forward(hf_model, wav, n_frames)

        variables = convert_hf_wav2vec2(hf_model.state_dict())
        flax_model = Wav2Vec2Encoder()
        out = np.asarray(flax_model.apply(
            variables, jnp.asarray(wav)[None], n_frames=n_frames))

        assert out.shape == golden.shape == (1, n_frames, 768)
        np.testing.assert_allclose(out, golden, atol=1e-4, rtol=1e-3)

    def test_native_50fps_matches_hf_full_forward(self, hf_model, rng):
        """Without interpolation the encoder must equal the stock HF
        last_hidden_state (sanity that the patch is the ONLY deviation)."""
        wav = (0.1 * rng.normal(size=16000)).astype(np.float32)
        with torch.no_grad():
            golden = hf_model(torch.from_numpy(wav)[None]).last_hidden_state.numpy()

        variables = convert_hf_wav2vec2(hf_model.state_dict())
        out = np.asarray(Wav2Vec2Encoder().apply(
            variables, jnp.asarray(wav)[None], n_frames=None))
        np.testing.assert_allclose(out, golden, atol=1e-4, rtol=1e-3)

    def test_feature_fn_surface(self, hf_model):
        variables = convert_hf_wav2vec2(hf_model.state_dict())
        fn = make_wav2vec_feature_fn(variables)
        wav = np.zeros(16000, np.float32)
        feat = fn(wav)
        assert feat.shape == (30, 768)
        assert np.isfinite(feat).all()

    def test_spec_augment_substitution_matches_reference(self, hf_model, rng):
        """The reference's TRAIN-time branch (nets/spg/wav2vec.py:117-127):
        masked time steps are replaced by the learned masked_spec_embed
        between feature projection and encoder. Fixed mask on both sides
        (the reference samples host-side with numpy; the substitution
        semantics are what must match)."""
        wav = (0.1 * rng.normal(size=32000)).astype(np.float32)
        n_frames = 60
        mask = np.zeros((1, n_frames), bool)
        mask[0, 5:15] = True
        mask[0, 40:50] = True

        with torch.no_grad():
            x = torch.from_numpy(wav)[None]
            h = hf_model.feature_extractor(x)
            h = torch.nn.functional.interpolate(
                h, size=n_frames, align_corners=False, mode="linear")
            h = h.transpose(1, 2)
            h, _ = hf_model.feature_projection(h)
            h[torch.from_numpy(mask)] = hf_model.masked_spec_embed
            golden = hf_model.encoder(h)[0].numpy()

        variables = convert_hf_wav2vec2(hf_model.state_dict())
        out = np.asarray(Wav2Vec2Encoder().apply(
            variables, jnp.asarray(wav)[None], n_frames=n_frames,
            mask_time_indices=jnp.asarray(mask)))
        np.testing.assert_allclose(out, golden, atol=1e-4, rtol=1e-3)
