"""HuBERT acoustic encoder (flax) — the reference's ``encoder_choice=
'hubert'`` frontend (``data_utils/foundation_models.py:23-27``:
facebook/hubert-large-ls960-ft, 1024-d; used through the same
last-hidden-state + 30 fps interpolation path as wav2vec2,
``data_utils/utils.py:162-176``).

HuBERT shares the wav2vec2 trunk; the -large checkpoint differs
structurally in three ways, all carried by ``Wav2Vec2Encoder`` options:
  * feature extractor: layer-norm after every conv, with conv biases
    (HF ``feat_extract_norm='layer'``, ``conv_bias=True``)
  * encoder: pre-LN layers with one final layer norm
    (HF ``do_stable_layer_norm=True``)
  * width: 1024-d, 24 layers, 16 heads, 4096 FFN

Weight conversion reuses ``convert_hf_wav2vec2`` (HF ``HubertModel`` keys
are layout-identical; biases/norms auto-detected).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from probtalk_tpu.audio.wav2vec2 import Wav2Vec2Encoder, convert_hf_wav2vec2

HUBERT_LARGE = dict(dim=1024, layers=24, heads=16, ffn=4096,
                    norm_mode="layer", conv_bias=True,
                    stable_layer_norm=True)


def HubertEncoder(**overrides) -> Wav2Vec2Encoder:
    """hubert-large-ls960-ft-architecture encoder (overridable)."""
    return Wav2Vec2Encoder(**{**HUBERT_LARGE, **overrides})


def convert_hf_hubert(hf_state_dict: dict, heads: int = 16) -> dict:
    """Map a torch ``HubertModel`` state dict onto HubertEncoder params."""
    return convert_hf_wav2vec2(hf_state_dict, heads=heads)


def make_hubert_feature_fn(variables=None, fps: float = 30.0,
                           sr: int = 16000, seed: int = 0, **model_kw):
    """-> fn(wav (S,)) -> (n_frames, 1024) features at motion fps — the
    'hubert' plug-in for ``preprocess_clip(audio_feat='hubert',
    wav2vec_fn=...)`` (reference: data_utils/utils.py:162-176)."""
    model = HubertEncoder(**model_kw)
    if variables is None:
        # jitted init: eager flax init is minutes-slow over a remote link
        variables = jax.jit(
            lambda r, x: model.init(r, x, n_frames=30)
        )(jax.random.key(seed), jnp.zeros((1, sr), jnp.float32))

    def feature_fn(wav: np.ndarray) -> np.ndarray:
        n = max(int(len(wav) / sr * fps), 1)
        out = model.apply(variables, jnp.asarray(wav, jnp.float32)[None],
                          n_frames=n)
        return np.asarray(out[0])

    return feature_fn
