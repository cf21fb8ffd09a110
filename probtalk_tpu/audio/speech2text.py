"""Speech2Text (fairseq s2t-transformer) encoder in flax.

The reference's third audio foundation model
(``data_utils/foundation_models.py:38-41``: facebook/s2t-small-
librispeech-asr via ``Speech2TextForConditionalGeneration``). NOTE the
reference only LOADS it — no ``get_mfcc_ta`` branch extracts features
with it (``data_utils/utils.py:158-176``) and ``nets/base.py:107``
hard-codes aud_d=768 for it (s2t-small is actually 256-d); this module
completes the capability the reference stubs: fbank features ->
subsampled encoder states -> motion-fps interpolation.

Architecture (HF ``Speech2TextEncoder``):
  * Conv1dSubsampler: two stride-2 GLU convs (T/4 subsampling)
  * embed_scale = sqrt(d); fairseq sinusoidal positions (offset 2)
  * pre-LN transformer layers (ReLU FFN) + final layer norm
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def fairseq_sinusoidal(num_pos: int, dim: int,
                       padding_idx: int = 1) -> np.ndarray:
    """fairseq SinusoidalPositionalEmbedding table: [sin half | cos half],
    padding row zeroed (HF Speech2TextSinusoidalPositionalEmbedding)."""
    half = dim // 2
    emb = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    ang = np.arange(num_pos)[:, None] * emb[None, :]
    table = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((num_pos, 1))], axis=1)
    table[padding_idx] = 0.0
    return table.astype(np.float32)


class Conv1dSubsampler(nn.Module):
    """(B, T, F) fbank -> (B, T/4, d): two k=5 s=2 convs with GLU."""

    dim: int = 256
    mid: int = 1024
    in_feats: int = 80
    kernels: tuple = (5, 5)

    @nn.compact
    def __call__(self, x):
        h = x
        for i, k in enumerate(self.kernels):
            out_ch = self.mid if i < len(self.kernels) - 1 else self.dim * 2
            h = nn.Conv(out_ch, (k,), strides=(2,), padding=[(k // 2, k // 2)],
                        name=f"conv_{i}")(h)
            a, b = jnp.split(h, 2, axis=-1)
            h = a * nn.sigmoid(b)                     # GLU over channels
        return h


class S2TLayer(nn.Module):
    dim: int = 256
    heads: int = 4
    ffn: int = 2048

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, deterministic=True,
            force_fp32_for_softmax=True, name="attn")(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        h = nn.Dense(self.ffn, name="fc1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.dim, name="fc2")(h)
        return x + h


class Speech2TextEncoder(nn.Module):
    """s2t-small-librispeech-asr encoder (d=256, 12 layers, 4 heads)."""

    dim: int = 256
    layers: int = 12
    heads: int = 4
    ffn: int = 2048
    in_feats: int = 80
    conv_channels: int = 1024
    max_pos: int = 6000
    pad_offset: int = 2   # fairseq positions start at padding_idx + 1

    @nn.compact
    def __call__(self, features):
        """features: (B, T, in_feats) log-mel fbank -> (B, T/4, dim)."""
        h = Conv1dSubsampler(self.dim, mid=self.conv_channels,
                             in_feats=self.in_feats,
                             name="subsampler")(features)
        h = h * np.sqrt(self.dim)                     # embed_scale
        t = h.shape[1]
        table = fairseq_sinusoidal(self.max_pos + self.pad_offset, self.dim)
        h = h + jnp.asarray(table[self.pad_offset: self.pad_offset + t])[None]
        for i in range(self.layers):
            h = S2TLayer(self.dim, self.heads, self.ffn,
                         name=f"layer_{i}")(h)
        return nn.LayerNorm(epsilon=1e-5, name="final_ln")(h)


def convert_hf_speech2text(hf_state_dict: dict) -> dict:
    """Map a torch ``Speech2TextModel`` / ``...ForConditionalGeneration``
    state dict's encoder onto Speech2TextEncoder params."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)())
          for k, v in hf_state_dict.items()}
    pref = "model.encoder." if any(k.startswith("model.encoder.")
                                   for k in sd) else "encoder."
    dim = sd[f"{pref}layers.0.self_attn.q_proj.bias"].shape[0]
    p: dict = {"subsampler": {}}
    i = 0
    while f"{pref}conv.conv_layers.{i}.weight" in sd:
        w = sd[f"{pref}conv.conv_layers.{i}.weight"]   # (out, in, k)
        p["subsampler"][f"conv_{i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 1, 0)),
            "bias": jnp.asarray(sd[f"{pref}conv.conv_layers.{i}.bias"]),
        }
        i += 1
    p["final_ln"] = {"scale": jnp.asarray(sd[f"{pref}layer_norm.weight"]),
                     "bias": jnp.asarray(sd[f"{pref}layer_norm.bias"])}
    li = 0
    while f"{pref}layers.{li}.self_attn.q_proj.weight" in sd:
        b = f"{pref}layers.{li}"
        heads = max(dim // 64, 1)
        hd = dim // heads
        attn = {}
        for hf_n, fx_n in (("q_proj", "query"), ("k_proj", "key"),
                           ("v_proj", "value")):
            attn[fx_n] = {
                "kernel": jnp.asarray(
                    sd[f"{b}.self_attn.{hf_n}.weight"].T.reshape(
                        dim, heads, hd)),
                "bias": jnp.asarray(
                    sd[f"{b}.self_attn.{hf_n}.bias"].reshape(heads, hd)),
            }
        attn["out"] = {
            "kernel": jnp.asarray(
                sd[f"{b}.self_attn.out_proj.weight"].T.reshape(
                    heads, hd, dim)),
            "bias": jnp.asarray(sd[f"{b}.self_attn.out_proj.bias"]),
        }
        p[f"layer_{li}"] = {
            "attn": attn,
            "ln1": {"scale": jnp.asarray(
                        sd[f"{b}.self_attn_layer_norm.weight"]),
                    "bias": jnp.asarray(
                        sd[f"{b}.self_attn_layer_norm.bias"])},
            "ln2": {"scale": jnp.asarray(
                        sd[f"{b}.final_layer_norm.weight"]),
                    "bias": jnp.asarray(sd[f"{b}.final_layer_norm.bias"])},
            "fc1": {"kernel": jnp.asarray(sd[f"{b}.fc1.weight"].T),
                    "bias": jnp.asarray(sd[f"{b}.fc1.bias"])},
            "fc2": {"kernel": jnp.asarray(sd[f"{b}.fc2.weight"].T),
                    "bias": jnp.asarray(sd[f"{b}.fc2.bias"])},
        }
        li += 1
    return {"params": p}


def make_s2t_feature_fn(variables=None, fps: float = 30.0, sr: int = 16000,
                        seed: int = 0, **model_kw):
    """-> fn(wav (S,)) -> (n_frames, dim) — the 'speech2text' plug-in for
    ``preprocess_clip``: 80-mel log-fbank (10 ms hop) -> encoder -> linear
    interpolation to motion fps (same alignment contract as
    wav2vec/hubert, data_utils/utils.py:162-176)."""
    from probtalk_tpu.data import audio as audio_lib
    from probtalk_tpu.utils.interp import resize_time

    model = Speech2TextEncoder(**model_kw)
    if variables is None:
        variables = jax.jit(model.init)(
            jax.random.key(seed),
            jnp.zeros((1, 100, model.in_feats), jnp.float32))
    apply = jax.jit(functools.partial(
        lambda v, x, n: resize_time(model.apply(v, x), n)),
        static_argnums=(2,))

    def feature_fn(wav: np.ndarray) -> np.ndarray:
        fb = audio_lib.log_mel(np.asarray(wav, np.float32), sr=sr,
                               hop=sr // 100, n_mels=model.in_feats)
        n = max(int(len(wav) / sr * fps), 1)
        out = apply(variables, jnp.asarray(fb, jnp.float32)[None], n)
        return np.asarray(out[0])

    return feature_fn
