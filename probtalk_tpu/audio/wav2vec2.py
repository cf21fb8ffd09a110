"""Wav2Vec2-base acoustic encoder in flax, with motion-fps alignment.

Capability of the reference's patched HF Wav2Vec2
(``nets/spg/wav2vec.py:14-151``): the standard wav2vec2-base architecture
(7-layer strided conv feature extractor, 12-layer transformer encoder,
768-d) with the reference's key modification — the feature-extractor output
is linearly interpolated from its native ~50 fps to the motion fps (30)
BEFORE the transformer encoder, so acoustic tokens align 1:1 with motion
frames.

Weights convert from a HuggingFace ``Wav2Vec2Model`` state dict via
``convert_hf_wav2vec2`` (facebook/wav2vec2-base-960h); with no checkpoint
available the module still runs (random init) for shape-complete pipelines.

TPU notes: all convs channel-last; GELU fused by XLA; attention in f32
softmax. Frame count is static per window length => fully jit-compatible.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

# wav2vec2-base feature extractor schedule: (dim, kernel, stride)
_CONV_LAYERS = [(512, 10, 5)] + [(512, 3, 2)] * 4 + [(512, 2, 2)] * 2
_FE_DOWNSAMPLE = 320  # total stride: 16kHz -> 50 fps


def compute_mask_spans(key: jax.Array, batch: int, length: int,
                       mask_prob: float, mask_length: int,
                       min_masks: int = 0) -> jax.Array:
    """SpecAugment span sampler -> (batch, length) bool mask. Jit-safe,
    static shapes.

    Capability of the reference's host-side numpy sampler
    (``nets/spg/wav2vec.py:14-72`` ``_compute_mask_indices``, no padding
    mask — the patched model never passes one): the span count uses the
    same stochastic rounding ``floor(mask_prob*length/mask_length + u)``
    with one shared uniform draw per batch (the reference computes
    ``all_num_mask`` once), floored at ``min_masks``; span starts are
    drawn per row WITHOUT replacement from ``[0, length - mask_length)``
    (``np.random.choice(sz - min_len, ...)`` — exclusive: the reference
    never masks a span touching the final frame).
    The reference's final trim-to-min-count across rows only equalizes
    overlap-dedup differences (every row already shares ``num_mask``);
    it is dropped here — masked-position counts may differ across rows
    by span overlap, which the substitution semantics don't care about.

    Documented deviation at degenerate lengths: for ``length <=
    mask_length`` this returns an EMPTY mask (no full span fits), where
    the reference's ``min_len = min(mask_length, sz - 1)`` fallback
    shrinks the span and still masks. Production windows (60/180 frames
    vs mask_length 10) never enter this regime; short-window training
    would need the fallback replicated.
    """
    if mask_length < 1 or length <= mask_length:  # no valid start exists
        return jnp.zeros((batch, length), bool)
    mean_spans = mask_prob * length / mask_length
    n_max = max(int(np.floor(mean_spans)) + 1, min_masks)
    n_starts = length - mask_length  # choice(sz - min_len): exclusive bound
    n_max = min(n_max, n_starts)
    k_round, k_starts = jax.random.split(key)
    u = jax.random.uniform(k_round, ())
    num = jnp.maximum(jnp.floor(mean_spans + u).astype(jnp.int32), min_masks)
    num = jnp.minimum(num, n_max)

    starts = jax.vmap(
        lambda k: jax.random.choice(k, n_starts, (n_max,), replace=False)
    )(jax.random.split(k_starts, batch))                     # (B, n_max)
    valid = (jnp.arange(n_max) < num)[None, :, None]         # (1, n_max, 1)
    t = jnp.arange(length)[None, None, :]                    # (1, 1, T)
    s = starts[:, :, None]                                   # (B, n_max, 1)
    span = (t >= s) & (t < s + mask_length) & valid
    return span.any(axis=1)


def _conv_patches(x: jax.Array, k: int, s: int) -> jax.Array:
    """(B, T, C) -> (B, T_out, k*C) VALID-conv patches, tap-major — the
    layout that matches a (k, C, O) conv kernel reshaped to (k*C, O)."""
    t_out = (x.shape[1] - k) // s + 1
    cols = [x[:, j:j + s * t_out:s, :] for j in range(k)]
    return jnp.concatenate(cols, axis=-1)


class _PatchConv(nn.Module):
    """Strided VALID 1-D conv as an im2col matmul.

    Param tree (``kernel`` (k, C, O) [+ ``bias``]) is identical to
    ``nn.Conv``, so converted HF checkpoints load unchanged. Measured
    2x SLOWER than XLA's native conv lowering on real TPU (the
    materialized k*C patch tensors cost more HBM traffic than the conv
    saves — W2V_FE_BENCH.json, scripts/bench_w2v_fe.py); kept as the
    measured ablation arm, default stays ``impl='conv'``."""

    features: int
    kernel: int
    stride: int
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, cin, self.features))
        patches = _conv_patches(x, self.kernel, self.stride)
        w2 = w.reshape(self.kernel * cin, self.features)
        if self.dtype is not None:
            patches = patches.astype(self.dtype)
            w2 = w2.astype(self.dtype)
        y = patches @ w2
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class _FoldConv(nn.Module):
    """Stride-2 VALID conv as phase-folded matmuls: x (B, T, C) reshaped to
    (B, T/2, 2C) turns a k=2 conv into ONE plain matmul and a k=3 conv into
    two (the second on the one-row-shifted view) — no im2col patch blowup,
    and plain dots reach the full bf16 MXU rate that XLA's conv lowering
    does not (W2V_FE_BENCH.json). Param tree identical to ``nn.Conv``."""

    features: int
    kernel: int
    stride: int
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        assert self.stride == 2 and self.kernel in (2, 3), \
            (self.stride, self.kernel)
        b, t, c = x.shape
        k, o = self.kernel, self.features
        w = self.param("kernel", nn.initializers.lecun_normal(), (k, c, o))
        t_out = (t - k) // 2 + 1
        # rows of the folded view needed: t_out (+1 for the k=3 tail tap)
        rows = t_out + (1 if k == 3 else 0)
        xp = jnp.pad(x, ((0, 0), (0, 2 * rows - t), (0, 0))) \
            if 2 * rows > t else x[:, :2 * rows]
        xr = xp.reshape(b, rows, 2 * c)
        if self.dtype is not None:
            xr = xr.astype(self.dtype)
        w01 = w[:2].reshape(2 * c, o).astype(xr.dtype)   # [W0; W1]
        y = xr[:, :t_out] @ w01
        if k == 3:
            w2 = w[2].astype(xr.dtype)                   # tap x[2t+2]
            y = y + xr[:, 1:t_out + 1, :c] @ w2
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (o,))
            y = y + bias.astype(y.dtype)
        return y


class _Int8Conv(nn.Module):
    """Strided VALID 1-D conv in dynamically-quantized int8.

    The FE weights are frozen at serving time, so quantization costs
    nothing to calibrate: per-output-channel weight scales and a
    per-tensor activation scale are computed on the fly (both are cheap
    reductions XLA fuses), the conv runs int8 x int8 -> int32 on the MXU
    (2x the bf16 rate, 4x less HBM traffic than f32), and the result is
    rescaled to f32. Param tree (``kernel`` (k, C, O) [+ ``bias``]) is
    identical to ``nn.Conv`` — converted HF checkpoints load unchanged.
    Accuracy is bounded by the per-tensor activation quantization;
    measured against the f32 conv in scripts/bench_w2v_fe.py."""

    features: int
    kernel: int
    stride: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, cin, self.features))
        xs = (jnp.max(jnp.abs(x), axis=(1, 2), keepdims=True) / 127.0
              + 1e-12)                                    # (B, 1, 1)
        ws = jnp.max(jnp.abs(w), axis=(0, 1)) / 127.0 + 1e-12   # (O,)
        xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
        wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wq, window_strides=(self.stride,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (xs * ws)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


class _Int8PatchConv(nn.Module):
    """im2col int8 conv with PER-OUTPUT-ROW activation scales.

    The conv contraction mixes k time taps, so a direct int8 conv can only
    carry one activation scale per sample (``_Int8Conv``). Materializing
    the (B, T_out, k*C) patches makes each output row its own contraction,
    so each gets its own exact scale — finer quantization at the cost of
    patch HBM traffic (int8 patches are 4x smaller than the f32 ones that
    made impl='matmul' lose, W2V_FE_BENCH.json). Param tree identical to
    ``nn.Conv``."""

    features: int
    kernel: int
    stride: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, cin, self.features))
        patches = _conv_patches(x, self.kernel, self.stride)  # (B, To, k*C)
        xs = (jnp.max(jnp.abs(patches), axis=-1, keepdims=True) / 127.0
              + 1e-12)                                        # (B, To, 1)
        ws = jnp.max(jnp.abs(w), axis=(0, 1)) / 127.0 + 1e-12  # (O,)
        pq = jnp.clip(jnp.round(patches / xs), -127, 127).astype(jnp.int8)
        wq = jnp.clip(jnp.round(w / ws), -127, 127
                      ).astype(jnp.int8).reshape(self.kernel * cin,
                                                 self.features)
        y = jax.lax.dot_general(
            pq, wq, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (xs * ws)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


class FeatureExtractor(nn.Module):
    """Raw waveform (B, S) -> (B, S/320, 512).

    norm_mode 'group': group-norm on the first conv only (wav2vec2-base);
    'layer': layer-norm after EVERY conv (HuBERT / *-large models, HF
    feat_extract_norm='layer'), usually with conv biases."""

    dtype: Optional[jnp.dtype] = None   # bf16 compute option (norms stay f32)
    norm_mode: str = "group"
    conv_bias: bool = False
    # Conv-formulation study (W2V_FE_BENCH.json, real TPU, B=16 x 6 s):
    # 'conv':   XLA convs — f32-exact AND the fastest (8.8 ms); the default
    # 'matmul': im2col matmuls — 2x slower (materialized patches, HBM-bound)
    # 'fold':   phase-folded bf16 matmuls (k=2 -> one dot, k=3 -> two) —
    #           1.5x slower despite bf16 MXU rate (relayout-bound)
    # 'int8':   dynamically-quantized int8 convs (conv_1..6; frozen-weight
    #           serving arm — 2x MXU rate, 4x less HBM; see _Int8Conv)
    # A fused Pallas conv+GELU kernel was also measured (16.7 ms, the
    # sublane-strided phase split relayouts) and removed. XLA's 1-D conv
    # lowering wins on this stack; the alternates stay as tested ablations.
    impl: str = "conv"

    @nn.compact
    def __call__(self, x):
        h = x[..., None]
        for i, (dim, k, s) in enumerate(_CONV_LAYERS):
            if self.impl == "fold" and i > 0:
                # dtype=None means f32 like every other impl (the measured
                # ablation arm runs it with dtype=bfloat16 for the MXU rate)
                h = _FoldConv(dim, k, s, use_bias=self.conv_bias,
                              dtype=self.dtype, name=f"conv_{i}")(h)
            elif self.impl in ("int8", "int8mm") and i > 0:
                # conv_0 stays native: cin=1/k=10 has no MXU upside and the
                # raw waveform is the one input whose dynamic range matters
                cls = _Int8Conv if self.impl == "int8" else _Int8PatchConv
                h = cls(dim, k, s, use_bias=self.conv_bias,
                        name=f"conv_{i}")(h)
            elif self.impl == "matmul":
                h = _PatchConv(dim, k, s, use_bias=self.conv_bias,
                               dtype=self.dtype, name=f"conv_{i}")(h)
            else:
                h = nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                            use_bias=self.conv_bias,
                            dtype=self.dtype, name=f"conv_{i}")(h)
            if self.norm_mode == "layer":
                h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                 name=f"conv_ln_{i}")(h)
                h = h.astype(self.dtype or h.dtype)
            elif i == 0:
                h = nn.GroupNorm(num_groups=dim, epsilon=1e-5,
                                 dtype=jnp.float32, name="gn_0")(h)
                h = h.astype(self.dtype or h.dtype)
            h = nn.gelu(h, approximate=False)   # HF uses exact (erf) GELU
        return h


class TransformerLayer(nn.Module):
    """post-LN (wav2vec2-base) or pre-LN (``pre_ln=True``: HuBERT-large /
    HF do_stable_layer_norm) encoder layer."""

    dim: int = 768
    heads: int = 12
    ffn: int = 3072
    dropout: float = 0.1
    pre_ln: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        det = not train

        def attn(y):
            return nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.dim,
                dropout_rate=self.dropout, deterministic=det,
                force_fp32_for_softmax=True, dtype=self.dtype,
                name="attn")(y, y)

        def ffwd(y):
            h = nn.Dense(self.ffn, dtype=self.dtype, name="fc1")(y)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
            return nn.Dropout(self.dropout, deterministic=det)(h)

        ln1 = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=jnp.float32)
        ln2 = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=jnp.float32)
        cast = lambda y: y.astype(self.dtype or y.dtype)

        if self.pre_ln:
            h = attn(cast(ln1(x)))
            x = x + nn.Dropout(self.dropout, deterministic=det)(h)
            x = x + ffwd(cast(ln2(x)))
            return cast(x)
        h = attn(x)
        h = nn.Dropout(self.dropout, deterministic=det)(h)
        x = cast(ln1(x + h))
        h = ffwd(x)
        return cast(ln2(x + h))


class Wav2Vec2Encoder(nn.Module):
    """Waveform -> (B, n_frames, 768) features at the target motion fps."""

    dim: int = 768
    layers: int = 12
    heads: int = 12
    ffn: int = 3072
    conv_pos_kernel: int = 128
    conv_pos_groups: int = 16
    dropout: float = 0.1
    norm_mode: str = "group"        # feature-extractor norm mode
    conv_bias: bool = False
    stable_layer_norm: bool = False  # pre-LN encoder + final LN (HuBERT-large)
    dtype: Optional[jnp.dtype] = None   # bf16 compute (f32 params/norms)
    fe_impl: str = "conv"            # feature-extractor conv impl (see above)
    fe_dtype: Optional[jnp.dtype] = None  # FE-only compute dtype override
    #   (None -> follow `dtype`; the bench's fe-bf16 arm runs a bf16 FE
    #   under an otherwise-f32 encoder)
    # SpecAugment (train-time only; the reference's patched model applies
    # it between feature projection and encoder, nets/spg/wav2vec.py:117-137,
    # with the HF wav2vec2-base config values)
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_min_masks: int = 2          # reference passes min_masks=2
    mask_feature_prob: float = 0.0   # HF base default: feature masking off
    mask_feature_length: int = 10

    @nn.compact
    def __call__(self, waveform, n_frames: Optional[int] = None,
                 train: bool = False, mask_time_indices=None):
        """waveform: (B, S) at 16 kHz; n_frames: motion frame count (e.g.
        S/16000*30). None keeps the native 50 fps.

        train=True additionally applies SpecAugment time masking (needs an
        'spec_augment' rng). ``mask_time_indices`` (B, n_frames) bool
        overrides the sampled mask — applied even at train=False, matching
        HF's explicit-mask semantics (used by the golden parity test)."""
        feat = FeatureExtractor(dtype=self.fe_dtype or self.dtype,
                                norm_mode=self.norm_mode,
                                conv_bias=self.conv_bias, impl=self.fe_impl,
                                name="feature_extractor")(waveform)

        # 50 fps -> motion fps alignment (the reference's core patch,
        # nets/spg/wav2vec.py:98-101: interpolate BETWEEN the feature
        # extractor and the feature projection). jax linear resize uses
        # half-pixel centers == torch align_corners=False.
        if n_frames is not None and n_frames != feat.shape[1]:
            b, t, c = feat.shape
            # antialias=False: torch F.interpolate(mode='linear') samples
            # half-pixel centers with NO lowpass on downsample
            feat = jax.image.resize(feat, (b, n_frames, c), method="linear",
                                    antialias=False)

        feat = nn.LayerNorm(epsilon=1e-5, name="feat_norm", dtype=jnp.float32)(feat)
        feat = feat.astype(self.dtype or feat.dtype)
        feat = nn.Dense(self.dim, dtype=self.dtype, name="feat_proj")(feat)

        # SpecAugment: learned-embedding substitution on masked time steps
        # (+ optional channel zeroing), the reference's train-time branch
        # (wav2vec.py:117-137). The param only materializes when the branch
        # runs, so inference checkpoints/inits are unchanged.
        if mask_time_indices is not None or (train and self.mask_time_prob > 0):
            emb = self.param("masked_spec_embed",
                             nn.initializers.uniform(scale=1.0), (self.dim,))
            if mask_time_indices is None:
                mask_time_indices = compute_mask_spans(
                    self.make_rng("spec_augment"), feat.shape[0],
                    feat.shape[1], self.mask_time_prob,
                    self.mask_time_length, self.mask_min_masks)
            feat = jnp.where(mask_time_indices[..., None],
                             emb.astype(feat.dtype), feat)
        if train and self.mask_feature_prob > 0:
            fmask = compute_mask_spans(
                self.make_rng("spec_augment"), feat.shape[0], feat.shape[2],
                self.mask_feature_prob, self.mask_feature_length)
            feat = jnp.where(fmask[:, None, :], jnp.zeros((), feat.dtype),
                             feat)

        # grouped conv positional embedding
        pos = nn.Conv(self.dim, (self.conv_pos_kernel,),
                      feature_group_count=self.conv_pos_groups,
                      padding=[(self.conv_pos_kernel // 2,
                                self.conv_pos_kernel // 2)],
                      dtype=self.dtype, name="pos_conv")(feat)
        if self.conv_pos_kernel % 2 == 0:
            pos = pos[:, :-1]
        h = feat + nn.gelu(pos, approximate=False)
        enc_norm = nn.LayerNorm(epsilon=1e-5, name="enc_norm",
                                dtype=jnp.float32)
        if not self.stable_layer_norm:
            # post-LN stack: LN after the pos-conv add (wav2vec2-base)
            h = enc_norm(h)
            h = h.astype(self.dtype or h.dtype)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        for i in range(self.layers):
            h = TransformerLayer(self.dim, self.heads, self.ffn,
                                 pre_ln=self.stable_layer_norm,
                                 dtype=self.dtype, name=f"layer_{i}")(h, train)
        if self.stable_layer_norm:
            # pre-LN stack: the same LN applies AFTER the layers
            # (HF Wav2Vec2/HubertEncoderStableLayerNorm)
            h = enc_norm(h)
        return h.astype(jnp.float32)


# ---------------------------------------------------------------------------
# HF weight conversion
# ---------------------------------------------------------------------------

def convert_hf_wav2vec2(hf_state_dict: dict, heads: int = 12) -> dict:
    """Map a torch ``Wav2Vec2Model`` OR ``HubertModel`` state dict onto
    Wav2Vec2Encoder params (the two share key layout; HuBERT adds conv
    biases and per-conv layer norms, auto-detected).

    Accepts tensors or numpy arrays keyed by HF names
    (feature_extractor.conv_layers.*, encoder.layers.*, ...).
    """

    def np_(t):
        return np.asarray(getattr(t, "numpy", lambda: t)())

    p: dict = {}

    def put(path, arr):
        node = p
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(arr)

    sd = {k: np_(v) for k, v in hf_state_dict.items()}
    layer_norm_convs = "feature_extractor.conv_layers.1.layer_norm.weight" in sd
    for i in range(len(_CONV_LAYERS)):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
        put(f"feature_extractor/conv_{i}/kernel", w.transpose(2, 1, 0))
        if f"feature_extractor.conv_layers.{i}.conv.bias" in sd:
            put(f"feature_extractor/conv_{i}/bias",
                sd[f"feature_extractor.conv_layers.{i}.conv.bias"])
        if layer_norm_convs:
            put(f"feature_extractor/conv_ln_{i}/scale",
                sd[f"feature_extractor.conv_layers.{i}.layer_norm.weight"])
            put(f"feature_extractor/conv_ln_{i}/bias",
                sd[f"feature_extractor.conv_layers.{i}.layer_norm.bias"])
    if not layer_norm_convs:
        put("feature_extractor/gn_0/scale",
            sd["feature_extractor.conv_layers.0.layer_norm.weight"])
        put("feature_extractor/gn_0/bias",
            sd["feature_extractor.conv_layers.0.layer_norm.bias"])
    put("feat_norm/scale", sd["feature_projection.layer_norm.weight"])
    put("feat_norm/bias", sd["feature_projection.layer_norm.bias"])
    put("feat_proj/kernel", sd["feature_projection.projection.weight"].T)
    put("feat_proj/bias", sd["feature_projection.projection.bias"])
    if "masked_spec_embed" in sd:      # SpecAugment substitution embedding
        put("masked_spec_embed", sd["masked_spec_embed"])

    # pos conv may be stored weight-normed: legacy (weight_g/weight_v) or
    # torch>=2.1 parametrizations (original0/original1)
    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.weight_g" in sd:
        g, v = sd[f"{pc}.weight_g"], sd[f"{pc}.weight_v"]
        w = g * v / np.linalg.norm(v, axis=(0, 1), keepdims=True)
    elif f"{pc}.parametrizations.weight.original0" in sd:
        g = sd[f"{pc}.parametrizations.weight.original0"]
        v = sd[f"{pc}.parametrizations.weight.original1"]
        w = g * v / np.linalg.norm(v, axis=(0, 1), keepdims=True)
    else:
        w = sd[f"{pc}.weight"]
    put("pos_conv/kernel", w.transpose(2, 1, 0))
    put("pos_conv/bias", sd[f"{pc}.bias"])
    put("enc_norm/scale", sd["encoder.layer_norm.weight"])
    put("enc_norm/bias", sd["encoder.layer_norm.bias"])

    n_layers = 0
    while f"encoder.layers.{n_layers}.final_layer_norm.weight" in sd:
        n_layers += 1
    dim = sd["feature_projection.projection.bias"].shape[0]
    head_dim = dim // heads
    for i in range(n_layers):
        base = f"encoder.layers.{i}"
        for hf_n, fx_n in (("q_proj", "query"), ("k_proj", "key"), ("v_proj", "value")):
            wq = sd[f"{base}.attention.{hf_n}.weight"].T.reshape(dim, heads, head_dim)
            bq = sd[f"{base}.attention.{hf_n}.bias"].reshape(heads, head_dim)
            put(f"layer_{i}/attn/{fx_n}/kernel", wq)
            put(f"layer_{i}/attn/{fx_n}/bias", bq)
        wo = sd[f"{base}.attention.out_proj.weight"].T.reshape(heads, head_dim, dim)
        put(f"layer_{i}/attn/out/kernel", wo)
        put(f"layer_{i}/attn/out/bias", sd[f"{base}.attention.out_proj.bias"])
        put(f"layer_{i}/norm1/scale", sd[f"{base}.layer_norm.weight"])
        put(f"layer_{i}/norm1/bias", sd[f"{base}.layer_norm.bias"])
        put(f"layer_{i}/fc1/kernel", sd[f"{base}.feed_forward.intermediate_dense.weight"].T)
        put(f"layer_{i}/fc1/bias", sd[f"{base}.feed_forward.intermediate_dense.bias"])
        put(f"layer_{i}/fc2/kernel", sd[f"{base}.feed_forward.output_dense.weight"].T)
        put(f"layer_{i}/fc2/bias", sd[f"{base}.feed_forward.output_dense.bias"])
        put(f"layer_{i}/norm2/scale", sd[f"{base}.final_layer_norm.weight"])
        put(f"layer_{i}/norm2/bias", sd[f"{base}.final_layer_norm.bias"])
    return {"params": p}


def make_wav2vec_feature_fn(variables=None, fps: float = 30.0,
                            sr: int = 16000, seed: int = 0, **model_kw):
    """-> fn(wav (S,)) -> (n_frames, 768) features at motion fps — the
    plug-in for ``preprocess_clip(audio_feat='wav2vec', wav2vec_fn=...)``
    (reference frontend: data_utils/utils.py:145 with encoder_choice
    'wav2vec'). Pass ``variables`` converted from a HF checkpoint via
    ``convert_hf_wav2vec2``; random init otherwise."""
    model = Wav2Vec2Encoder(**model_kw)
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
