"""Torch reference checkpoints -> probtalk_tpu variables.

Lets users of the reference (feifeifeiliu/probtalk) bring their trained
torch checkpoints (``torch.save({'generator': {...}})`` nested dicts,
``trainer/Trainer.py:201-216``) into this framework. Golden parity is
enforced by tests/test_torch_parity.py, which runs the actual reference
modules with random weights and compares outputs after conversion.

Layout conventions converted here:
  torch Conv1d weight (Cout, Cin, K)      -> flax Conv kernel (K, Cin, Cout)
  torch ConvTranspose1d (Cin, Cout, K)    -> flax ConvTranspose (K, Cin, Cout)
  torch BatchNorm weight/bias             -> params scale/bias
        running_mean/var                  -> batch_stats mean/var
  torch Linear weight (Cout, Cin)         -> flax Dense kernel (Cin, Cout)
  packed torch MultiheadAttention in_proj -> flax q/k/v (Cin, H, Dh)
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp


def _np(t):
    return np.asarray(getattr(t, "detach", lambda: t)().cpu().numpy()
                      if hasattr(t, "detach") else t)


class _Tree:
    """Nested dict builder with path puts."""

    def __init__(self):
        self.params: Dict = {}
        self.batch_stats: Dict = {}

    @staticmethod
    def _put(root, path, value):
        node = root
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(value)

    def conv(self, sd, src, dst):
        self._put(self.params, f"{dst}/kernel", _np(sd[f"{src}.weight"]).transpose(2, 1, 0))
        if f"{src}.bias" in sd:
            self._put(self.params, f"{dst}/bias", _np(sd[f"{src}.bias"]))

    def conv2d(self, sd, src, dst):
        # torch (O, I, KH, KW) -> flax (KH, KW, I, O)
        self._put(self.params, f"{dst}/kernel",
                  _np(sd[f"{src}.weight"]).transpose(2, 3, 1, 0))
        if f"{src}.bias" in sd:
            self._put(self.params, f"{dst}/bias", _np(sd[f"{src}.bias"]))

    def conv_t(self, sd, src, dst):
        # torch ConvTranspose1d (Cin, Cout, K); flax ConvTranspose kernel
        # (K, Cin, Cout) applied UNflipped on the dilated input, while torch
        # applies the flipped kernel — flip K to match.
        w = _np(sd[f"{src}.weight"]).transpose(2, 0, 1)[::-1].copy()
        self._put(self.params, f"{dst}/kernel", w)
        if f"{src}.bias" in sd:
            self._put(self.params, f"{dst}/bias", _np(sd[f"{src}.bias"]))

    def bn(self, sd, src, dst):
        self._put(self.params, f"{dst}/scale", _np(sd[f"{src}.weight"]))
        self._put(self.params, f"{dst}/bias", _np(sd[f"{src}.bias"]))
        self._put(self.batch_stats, f"{dst}/mean", _np(sd[f"{src}.running_mean"]))
        self._put(self.batch_stats, f"{dst}/var", _np(sd[f"{src}.running_var"]))

    def linear(self, sd, src, dst):
        self._put(self.params, f"{dst}/kernel", _np(sd[f"{src}.weight"]).T)
        if f"{src}.bias" in sd:
            self._put(self.params, f"{dst}/bias", _np(sd[f"{src}.bias"]))

    def cnr(self, sd, src, dst, residual=False, transpose=False):
        """torch ConvNormRelu -> flax ConvNormRelu (conv + norm [+ residual])."""
        (self.conv_t if transpose else self.conv)(sd, f"{src}.conv", f"{dst}/conv")
        self.bn(sd, f"{src}.norm", f"{dst}/norm")
        if residual and f"{src}.residual_layer.weight" in sd:
            (self.conv_t if transpose else self.conv)(
                sd, f"{src}.residual_layer", f"{dst}/residual")

    def res_stack(self, sd, src, dst, layers=2):
        """torch Res_CNR_Stack -> flax ResCNRStack."""
        for i in range(layers):
            self.cnr(sd, f"{src}._layers.{i}", f"{dst}/layer_{i}")
        self.conv(sd, f"{src}.conv", f"{dst}/conv")
        self.bn(sd, f"{src}.norm", f"{dst}/norm")


def load_reference_checkpoint(path: str) -> dict:
    """torch.load a reference ckpt on CPU -> the 'generator' dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    return ckpt.get("generator", ckpt)


# ---------------------------------------------------------------------------
# VQVAE_SC (s2g_body_vqt)
# ---------------------------------------------------------------------------

def convert_vqvae(sd: dict, groups: int = 4, res_layers: int = 2) -> dict:
    """Reference ``VQVAE_SC`` state dict (the 'VQ' entry of an s2g_body_vqt
    checkpoint) -> variables for ``probtalk_tpu.models.vqvae.VQVAE``."""
    from probtalk_tpu.quant.pq import PQState

    sd = {k: v for k, v in sd.items()}
    t = _Tree()

    # encoder (reference EncoderSC, vqvae_1d_sc.py:197-235)
    t.cnr(sd, "encoder.project", "encoder/project")
    for i in (1, 2, 3, 4):
        t.res_stack(sd, f"encoder._enc_{i}", f"encoder/enc_{i}", res_layers)
    for i in (1, 2, 3):
        t.cnr(sd, f"encoder._down_{i}", f"encoder/down_{i}", residual=True)
    t.conv(sd, "encoder.pre_vq_conv", "encoder/pre_vq_conv")

    # decoder (reference DecoderSC, vqvae_1d_sc.py:238-274)
    t.conv(sd, "decoder.aft_vq_conv", "decoder/aft_vq_conv")
    for i in (1, 2, 3, 4):
        t.res_stack(sd, f"decoder._dec_{i}", f"decoder/dec_{i}", res_layers)
    for i in (2, 3, 4):
        t.cnr(sd, f"decoder._up_{i}", f"decoder/up_{i}", residual=True,
              transpose=True)
    t.conv(sd, "decoder.project", "decoder/project")

    # quantizer state (embeddings_{g} + EMA hiddens)
    codebooks = np.stack([_np(sd[f"vq_layer.embeddings_{g}"]) for g in range(groups)])
    ema_dw = np.stack([_np(sd[f"vq_layer.ema_dw.{g}.hidden"]) for g in range(groups)]) \
        if f"vq_layer.ema_dw.0.hidden" in sd else np.zeros_like(codebooks)
    ema_counts = np.stack(
        [_np(sd[f"vq_layer.ema_cluster_size.{g}.hidden"]) for g in range(groups)]
    ) if f"vq_layer.ema_cluster_size.0.hidden" in sd else \
        np.zeros(codebooks.shape[:2], np.float32)
    quant = PQState(
        codebooks=jnp.asarray(codebooks),
        ema_counts=jnp.asarray(ema_counts),
        ema_dw=jnp.asarray(ema_dw),
        # torch tracks the EMA counter as a python attr not saved in the
        # ckpt; a large value makes the bias correction ~1 (converged ckpt)
        counter=jnp.asarray(100000, jnp.int32),
    )
    return {"params": t.params, "batch_stats": t.batch_stats,
            "quant": {"pq": quant}}


# ---------------------------------------------------------------------------
# ConditionEncoder (AudEnc/TextEnc of the predictor)
# ---------------------------------------------------------------------------

def convert_condition_encoder(sd: dict, prefix: str = "") -> dict:
    """Reference ``ConditionEncoder`` (vqvae_1d_sc.py:70-91) -> flax
    ConditionEncoder variables."""
    t = _Tree()
    p = prefix
    t.conv(sd, f"{p}feature_map.0", "feature_map")
    t.bn(sd, f"{p}feature_map.1", "fm_norm")
    for i in (1, 2, 3):
        t.cnr(sd, f"{p}_down_{i}", f"down_{i - 1}", residual=True)
    return {"params": t.params, "batch_stats": t.batch_stats}


# ---------------------------------------------------------------------------
# transformer stacks (PTransformer / RTransformer)
# ---------------------------------------------------------------------------

def _mha(t: _Tree, sd, src, dst, dim: int, heads: int = 8):
    """torch nn.MultiheadAttention (packed in_proj) -> flax MHA q/k/v/out."""
    dh = dim // heads
    w = _np(sd[f"{src}.in_proj_weight"])
    b = _np(sd[f"{src}.in_proj_bias"])
    for i, name in enumerate(("query", "key", "value")):
        t._put(t.params, f"{dst}/{name}/kernel",
               w[i * dim:(i + 1) * dim].T.reshape(dim, heads, dh))
        t._put(t.params, f"{dst}/{name}/bias",
               b[i * dim:(i + 1) * dim].reshape(heads, dh))
    t._put(t.params, f"{dst}/out/kernel",
           _np(sd[f"{src}.out_proj.weight"]).T.reshape(heads, dh, dim))
    t._put(t.params, f"{dst}/out/bias", _np(sd[f"{src}.out_proj.bias"]))


def _ln(t: _Tree, sd, src, dst):
    t._put(t.params, f"{dst}/scale", _np(sd[f"{src}.weight"]))
    t._put(t.params, f"{dst}/bias", _np(sd[f"{src}.bias"]))


def _style_block(t: _Tree, sd, src, dst):
    """StylizationBlock_V3 'sb' branch (PTransformer.py:69-79,134-140)."""
    t.linear(sd, f"{src}.emb_layers_2.1", f"{dst}/emb")
    _ln(t, sd, f"{src}.norm_2", f"{dst}/norm")
    t.linear(sd, f"{src}.out_layers_2.2", f"{dst}/out")


def _styled_layer(t: _Tree, sd, src, dst, dim: int, heads: int = 8,
                  styled: bool = True):
    """DeepSupervisionLayer (PTransformer.py:284-372) -> StyledDecoderLayer."""
    _mha(t, sd, f"{src}.self_attn", f"{dst}/self_attn", dim, heads)
    _mha(t, sd, f"{src}.multihead_attn", f"{dst}/cross_attn", dim, heads)
    t.linear(sd, f"{src}.linear1", f"{dst}/linear1")
    t.linear(sd, f"{src}.linear2", f"{dst}/linear2")
    for i in (1, 2, 3):
        _ln(t, sd, f"{src}.norm{i}", f"{dst}/norm{i}")
    if styled:
        for i in (1, 2, 3):
            _style_block(t, sd, f"{src}.style_gourp_{i}", f"{dst}/style_{i}")


def _conv1x1_as_dense(t: _Tree, sd, src, dst):
    """torch Conv1d kernel-1 -> flax Dense."""
    w = _np(sd[f"{src}.weight"])[:, :, 0].T
    t._put(t.params, f"{dst}/kernel", w)
    if f"{src}.bias" in sd:
        t._put(t.params, f"{dst}/bias", _np(sd[f"{src}.bias"]))


def convert_rtransformer(sd: dict, layers: int = 6, dim: int = 512,
                         use_label: bool = True) -> dict:
    """Reference RTransformer (RTransformer.py:181-230) -> our RTransformer
    variables. Key prefix: '' (pass the RTransformer sub-dict)."""
    t = _Tree()
    _conv1x1_as_dense(t, sd, "input_conv", "input_conv")
    _conv1x1_as_dense(t, sd, "audio_conv", "audio_conv")
    if use_label:
        t._put(t.params, "class_embed/embedding", _np(sd["class_embed.weight"]))
    for i in range(layers):
        _styled_layer(t, sd, f"transformer_decoder.layers.{i}", f"layer_{i}",
                      dim, styled=use_label)
    _conv1x1_as_dense(t, sd, "output_conv.0", "out_hidden")
    _conv1x1_as_dense(t, sd, "output_conv.2", "out_proj")
    return {"params": t.params, "batch_stats": t.batch_stats}


def convert_ptransformer(sd: dict, layers: int = 6, dim: int = 512,
                         styled: bool = True, prefix: str = "") -> dict:
    """Reference PTransformer (PTransformer.py:394-504) -> our PTransformer
    variables (sinusoidal PEs are recomputed, not copied)."""
    t = _Tree()
    p = prefix
    t._put(t.params, "tok_emb/embedding", _np(sd[f"{p}tok_emb.weight"]))
    t._put(t.params, "class_embed/embedding", _np(sd[f"{p}class_embed.weight"]))
    _conv1x1_as_dense(t, sd, f"{p}condi_emb", "condi_emb")
    for i in range(layers):
        _styled_layer(t, sd, f"{p}transformer_decoder.layers.{i}", f"layer_{i}",
                      dim, styled=styled)
    _conv1x1_as_dense(t, sd, f"{p}output_conv.0", "out_hidden")
    _conv1x1_as_dense(t, sd, f"{p}output_conv.2", "out_proj")
    return {"params": t.params, "batch_stats": t.batch_stats}


# ---------------------------------------------------------------------------
# PredictorNet / full stages
# ---------------------------------------------------------------------------

def _gated_conv(t: _Tree, sd, src, dst):
    """gated_pixelcnn_1d.GatedConv -> GatedConv1D (vert_stack + res + skip)."""
    t.conv(sd, f"{src}.vert_stack", f"{dst}/vert_stack")
    if f"{src}.res.weight" in sd:
        t.conv(sd, f"{src}.res", f"{dst}/res")
    if f"{src}.conv.weight" in sd:  # strided skip (Identity otherwise)
        t.conv(sd, f"{src}.conv", f"{dst}/skip")


def convert_predictor_net(sd: dict, enc_layers: int = 10, dec_layers: int = 6,
                          dim: int = 512, styled: bool = True) -> dict:
    """Reference PredictorNet (predictornet.py:13-112) -> our PredictorNet
    variables (motion-context gated convs + PTransformer decoder)."""
    t = _Tree()
    t.conv(sd, "motion_embedding", "motion_enc/motion_embedding")
    for i in range(enc_layers):
        _gated_conv(t, sd, f"enc.{i}", f"motion_enc/enc_{i}")
    dec = convert_ptransformer(sd, dec_layers, dim, styled, prefix="decoder.")
    t.params["decoder"] = dec["params"]
    if dec["batch_stats"]:
        t.batch_stats["decoder"] = dec["batch_stats"]
    return {"params": t.params, "batch_stats": t.batch_stats}


def convert_predictor_stage(gen: dict, **kw) -> dict:
    """Full s2g_body_predictor checkpoint 'generator' dict
    ({'AudEnc', 'Predictor', 'TextEnc', ...}, predictor.py:128-143) ->
    PredictorStage variables."""
    out_p: Dict = {}
    out_b: Dict = {}
    net = convert_predictor_net(gen["Predictor"], **kw)
    out_p["net"] = net["params"]
    if net["batch_stats"]:
        out_b["net"] = net["batch_stats"]
    if "AudEnc" in gen and gen["AudEnc"]:
        aud = convert_condition_encoder(gen["AudEnc"])
        out_p["aud_enc"] = aud["params"]
        out_b["aud_enc"] = aud["batch_stats"]
    if "TextEnc" in gen and gen["TextEnc"]:
        txt = convert_condition_encoder(gen["TextEnc"])
        out_p["text_enc"] = txt["params"]
        out_b["text_enc"] = txt["batch_stats"]
    return {"params": out_p, "batch_stats": out_b}


def convert_refiner_stage(gen: dict, layers: int = 6) -> dict:
    """s2g_body_refiner checkpoint 'generator' dict ({'RTransformer'
    under 'HFTransformer'/'RTransformer' naming, refiner.py:137-156}) ->
    RefinerStage variables."""
    key = "RTransformer" if "RTransformer" in gen else "HFTransformer"
    rt = convert_rtransformer(gen[key], layers=layers)
    return {"params": {"net": rt["params"]},
            "batch_stats": ({"net": rt["batch_stats"]} if rt["batch_stats"] else {})}


# ---------------------------------------------------------------------------
# legacy TalkSHOW VQVAE (s2g_body_vq)
# ---------------------------------------------------------------------------

def convert_legacy_vqvae(sd: dict, res_layers: int = 2) -> dict:
    """Reference ``nets/spg/vqvae_1d.VQVAE`` (single-codebook, T/4) ->
    ``probtalk_tpu.models.legacy.LegacyVQVAE`` variables."""
    from probtalk_tpu.quant.pq import PQState

    t = _Tree()
    t.cnr(sd, "encoder.project", "encoder/project")
    for i in (1, 2, 3):
        t.res_stack(sd, f"encoder._enc_{i}", f"encoder/enc_{i}", res_layers)
    for i in (1, 2):
        t.cnr(sd, f"encoder._down_{i}", f"encoder/down_{i}", residual=True)
    t.conv(sd, "encoder.pre_vq_conv", "encoder/pre_vq_conv")

    t.conv(sd, "decoder.aft_vq_conv", "decoder/aft_vq_conv")
    for i in (1, 2, 3):
        t.res_stack(sd, f"decoder._dec_{i}", f"decoder/dec_{i}", res_layers)
    for i in (2, 3):
        t.cnr(sd, f"decoder._up_{i}", f"decoder/up_{i}", residual=True,
              transpose=True)
    t.conv(sd, "decoder.project", "decoder/project")

    emb = _np(sd["vq_layer.embeddings"])[None]          # (1, K, E)
    ema_dw = _np(sd["vq_layer.ema_dw.hidden"])[None] \
        if "vq_layer.ema_dw.hidden" in sd else np.zeros_like(emb)
    counts = _np(sd["vq_layer.ema_cluster_size.hidden"])[None] \
        if "vq_layer.ema_cluster_size.hidden" in sd else \
        np.zeros(emb.shape[:2], np.float32)
    quant = PQState(jnp.asarray(emb), jnp.asarray(counts), jnp.asarray(ema_dw),
                    jnp.asarray(100000, jnp.int32))
    return {"params": t.params, "batch_stats": t.batch_stats,
            "quant": {"vq": quant}}


# ---------------------------------------------------------------------------
# baseline families (Speech2Gesture / LS3DCG / Audio2Gestures)
# ---------------------------------------------------------------------------

def _tfcnr(t: _Tree, sd, src, dst, two_d: bool = False):
    """reference speech2gesture.ConvNormRelu Sequential(conv, bn, lrelu)."""
    (t.conv2d if two_d else t.conv)(sd, f"{src}.0", f"{dst}/conv")
    t.bn(sd, f"{src}.1", f"{dst}/norm")


def convert_speech2gesture_g(sd: dict) -> dict:
    """``nets/speech2gesture.Generator`` (use_template=False) ->
    ``models.legacy.s2g_exact.S2GGenerator`` variables."""
    t = _Tree()
    for i in range(8):
        _tfcnr(t, sd, f"audio_encoder.first_net.{i}",
               f"audio_encoder/first_{i}", two_d=True)
    _tfcnr(t, sd, "audio_encoder.down1.0", "audio_encoder/down1_0")
    _tfcnr(t, sd, "audio_encoder.down1.1", "audio_encoder/down1_1")
    for i in range(2, 7):
        _tfcnr(t, sd, f"audio_encoder.down{i}", f"audio_encoder/down{i}")
    for i in range(1, 6):
        _tfcnr(t, sd, f"audio_encoder.up{i}.conv", f"audio_encoder/up{i}")
    t.linear(sd, "pre_pose_encoder.0", "pre_fc0")
    t.bn(sd, "pre_pose_encoder.1", "pre_bn")
    t.linear(sd, "pre_pose_encoder.3", "pre_fc1")
    for i in range(4):
        _tfcnr(t, sd, f"decoder.{i}", f"dec_{i}")
    t.conv(sd, "final_out", "final_out")
    return {"params": t.params, "batch_stats": t.batch_stats}


def convert_speech2gesture_d(sd: dict) -> dict:
    """``nets/speech2gesture.Discriminator`` ->
    ``models.legacy.s2g_exact.S2GDiscriminator`` variables."""
    t = _Tree()
    t.conv(sd, "net.0", "c0")
    _tfcnr(t, sd, "net.2", "c1")
    _tfcnr(t, sd, "net.3", "c2")
    t.conv(sd, "net.4", "out")
    return {"params": t.params, "batch_stats": t.batch_stats}


# ---------------------------------------------------------------------------
# s2glayers Generator/Discriminator (the w_pre GRU continuity variant)
# ---------------------------------------------------------------------------

def _cnrc(t: _Tree, sd, src, dst):
    """nets/layers.py ConvNormRelu CLASS (conv, norm, optional
    residual_layer Sequential-of-one-conv) -> s2glayers_exact.CNRc."""
    t.conv(sd, f"{src}.conv", f"{dst}/conv")
    t.bn(sd, f"{src}.norm", f"{dst}/norm")
    if f"{src}.residual_layer.0.weight" in sd:
        t.conv(sd, f"{src}.residual_layer.0", f"{dst}/res")


def _seqtrans1d(t: _Tree, sd, src, dst, layers: int):
    """nets/layers.py SeqTranslator1D -> SeqTranslator1DExact."""
    for i in range(layers):
        _cnrc(t, sd, f"{src}.conv_layers.{i}", f"{dst}/block_{i}")


def _gru_cell(t: _Tree, sd, src, dst, hidden: int):
    """torch nn.GRU (1 layer) -> flax nn.GRUCell. torch gate order is
    [r, z, n] along the 3H axis; flax folds the hidden-side r/z biases
    into the input-side ones (its hr/hz Dense layers carry no bias), so
    b_ir += b_hr and b_iz += b_hz; the n-gate hidden bias stays separate
    (both frameworks apply it inside the reset gate product)."""
    wi = _np(sd[f"{src}.weight_ih_l0"])     # (3H, in)
    wh = _np(sd[f"{src}.weight_hh_l0"])     # (3H, H)
    bi = _np(sd[f"{src}.bias_ih_l0"])
    bh = _np(sd[f"{src}.bias_hh_l0"])
    h = hidden
    t._put(t.params, f"{dst}/ir/kernel", wi[:h].T)
    t._put(t.params, f"{dst}/ir/bias", bi[:h] + bh[:h])
    t._put(t.params, f"{dst}/iz/kernel", wi[h:2 * h].T)
    t._put(t.params, f"{dst}/iz/bias", bi[h:2 * h] + bh[h:2 * h])
    t._put(t.params, f"{dst}/in/kernel", wi[2 * h:].T)
    t._put(t.params, f"{dst}/in/bias", bi[2 * h:])
    t._put(t.params, f"{dst}/hr/kernel", wh[:h].T)
    t._put(t.params, f"{dst}/hz/kernel", wh[h:2 * h].T)
    t._put(t.params, f"{dst}/hn/kernel", wh[2 * h:].T)
    t._put(t.params, f"{dst}/hn/bias", bh[2 * h:])


def _unet_s2gl(t: _Tree, sd, src, dst, dim: int):
    p = f"{src}." if src else ""     # src='' lets a bare UNet convert
    for j in range(3):
        _tfcnr(t, sd, f"{p}down1.{j}", f"{dst}/down1_{j}")
    if f"{p}gru.weight_ih_l0" in sd:
        _gru_cell(t, sd, f"{p}gru", f"{dst}/gru", dim)
    for i in range(2, 7):
        _tfcnr(t, sd, f"{p}down{i}", f"{dst}/down{i}")
    for i in range(1, 6):
        _tfcnr(t, sd, f"{p}up{i}.conv", f"{dst}/up{i}")


def _audio_enc_s2gl(t: _Tree, sd, src, dst, pose: bool, dim: int):
    _seqtrans1d(t, sd, f"{src}.first_net", f"{dst}/first_net", 4)
    if pose:
        t.conv(sd, f"{src}.mu_fc", f"{dst}/mu_fc")
        t.conv(sd, f"{src}.var_fc", f"{dst}/var_fc")
    _unet_s2gl(t, sd, f"{src}.unet", f"{dst}/unet", dim)


def convert_s2glayers_g(sd: dict, common_dim: int = 256,
                        expression: bool = True) -> dict:
    """``nets/spg/s2glayers.Generator`` (use_template + separate form,
    s2glayers.py:303-495) -> ``models.legacy.s2glayers_exact.GeneratorS2GL``
    variables, including the w_pre GRU and pre-pose encoder."""
    t = _Tree()
    if "pose_encoder.conv_layers.0.conv.weight" in sd:
        _seqtrans1d(t, sd, "pose_encoder", "pose_encoder", 3)
        t.conv(sd, "mu_fc", "mu_fc")
        t.conv(sd, "var_fc", "var_fc")
    if "pre_pose_encoder.conv_layers.0.conv.weight" in sd:
        _seqtrans1d(t, sd, "pre_pose_encoder", "pre_pose_encoder", 5)
    _audio_enc_s2gl(t, sd, "audio_encoder", "audio_encoder", True, common_dim)
    _audio_enc_s2gl(t, sd, "speech_encoder", "speech_encoder", False, 256)
    for i in range(4 if expression else 3):
        for j in range(3):
            _tfcnr(t, sd, f"decoder.{i}.{j}", f"decoder_{i}_{j}")
        t.conv(sd, f"final_out.{i}", f"final_out_{i}")
    return {"params": t.params, "batch_stats": t.batch_stats}


def convert_s2glayers_d(sd: dict) -> dict:
    """``nets/spg/s2glayers.Discriminator`` (s2glayers.py:498-512) ->
    ``models.legacy.s2glayers_exact.DiscriminatorS2GL`` variables."""
    t = _Tree()
    t.conv(sd, "net.0", "c0")
    _tfcnr(t, sd, "net.2", "cnr1")
    _tfcnr(t, sd, "net.3", "cnr2")
    t.conv(sd, "net.4", "out")
    return {"params": t.params, "batch_stats": t.batch_stats}


def convert_ls3dcg_g(sd: dict) -> dict:
    """``nets/LS3DCG.Generator`` ->
    ``models.legacy.s2g_exact.LS3DCGGenerator`` variables."""
    t = _Tree()
    for i in range(1, 5):
        for j in range(2):
            _tfcnr(t, sd, f"encoderdecoder.down{i}.{j}", f"down{i}_{j}")
    for head in ("face", "body", "hand"):
        src = f"encoderdecoder.{head}_decoder"
        dst = f"{head}_decoder"
        for u in (1, 2, 3):
            for j in range(2):
                _tfcnr(t, sd, f"{src}.up{u}.{j}", f"{dst}/up{u}_{j}")
        t.conv(sd, f"{src}.up3.2", f"{dst}/up3_out")
    return {"params": t.params, "batch_stats": t.batch_stats}


def convert_ls3dcg_d(sd: dict) -> dict:
    """``nets/LS3DCG.Discriminator`` -> LS3DCGDiscriminator variables."""
    t = _Tree()
    for src_i, dst in ((0, "c0"), (1, "c1"), (3, "c2"), (4, "c3"),
                       (6, "c4"), (7, "c5")):
        _tfcnr(t, sd, f"net.{src_i}", dst)
    t.conv(sd, "net.9", "out")
    return {"params": t.params, "batch_stats": t.batch_stats}


def _tcn(t: _Tree, sd, src, dst, levels: int):
    """reference nets/module.ConvNet -> a2g_exact.TCN."""
    for i in range(levels):
        base = f"{src}.network.{i}"
        t.conv(sd, f"{base}.conv1", f"{dst}/block_{i}/conv1")
        t.conv(sd, f"{base}.conv2", f"{dst}/block_{i}/conv2")
        if f"{base}.downsample.weight" in sd:
            t.conv(sd, f"{base}.downsample", f"{dst}/block_{i}/downsample")


def _mlp2(t: _Tree, sd, src, dst):
    """Sequential(Linear, ReLU, Linear) head."""
    t.linear(sd, f"{src}.0", f"{dst}_0")
    t.linear(sd, f"{src}.2", f"{dst}_1")


def convert_audio2gestures(sd: dict) -> dict:
    """``nets/Audio2Gestures.Generator.net_G`` state dict (keys
    audio_enc./motion_enc./motion_dec./mapping_net.) ->
    ``models.legacy.a2g_exact.A2GGenerator`` variables. Also accepts the
    per-module state dicts with an explicit prefix."""
    t = _Tree()
    _tcn(t, sd, "audio_enc.TCN", "audio_enc/tcn", 5)
    _mlp2(t, sd, "audio_enc.share_mean", "audio_enc/share_mean")
    if "audio_enc.share_var.0.weight" in sd:
        _mlp2(t, sd, "audio_enc.share_var", "audio_enc/share_var")

    _tcn(t, sd, "motion_enc.TCN", "motion_enc/tcn", 5)
    t.linear(sd, "motion_enc.share_linear", "motion_enc/share_linear")
    t.linear(sd, "motion_enc.spec_linear", "motion_enc/spec_linear")
    _mlp2(t, sd, "motion_enc.share_mean", "motion_enc/share_mean")
    _mlp2(t, sd, "motion_enc.spec_mean", "motion_enc/spec_mean")
    if "motion_enc.share_var.0.weight" in sd:
        _mlp2(t, sd, "motion_enc.share_var", "motion_enc/share_var")
        _mlp2(t, sd, "motion_enc.spec_var", "motion_enc/spec_var")

    _tcn(t, sd, "motion_dec.TCN", "motion_dec/tcn", 5)
    _mlp2(t, sd, "motion_dec.pose_g", "motion_dec/pose_g")

    for i, j in ((0, 0), (1, 2), (2, 4)):
        t.conv(sd, f"mapping_net.net.{j}", f"mapping_net/net_{i}")
    _mlp2(t, sd, "mapping_net.spec_mean", "mapping_net/spec_mean")
    if "mapping_net.spec_var.0.weight" in sd:
        _mlp2(t, sd, "mapping_net.spec_var", "mapping_net/spec_var")
    return {"params": t.params, "batch_stats": t.batch_stats}


# ---------------------------------------------------------------------------
# GatedPixelCNN-1D predictor decoder
# ---------------------------------------------------------------------------

def convert_pixel_decoder(sd: dict, layers: int = 10) -> dict:
    """``nets/inpainting/gated_pixelcnn_1d.GatedPixelCNN`` (groups>1) ->
    ``models.pixel_decoder.GatedPixelCNN1D`` variables.

    Mask-A kernels: the torch module zeroes the causal taps in-place at
    forward time (make_causal); our flax blocks use smaller kernels with
    asymmetric padding, so the zeroed taps are sliced off here."""
    t = _Tree()
    for name in ("fusion", "fusion2", "fusion3"):
        t.linear(sd, f"{name}.0", f"{name}/fc")
        t._put(t.params, f"{name}/ln/scale", _np(sd[f"{name}.1.weight"]))
        t._put(t.params, f"{name}/ln/bias", _np(sd[f"{name}.1.bias"]))
    t._put(t.params, "state_embedding/embedding",
           _np(sd["state_embedding.weight"]))
    for i in range(layers):
        src = f"ar.{i}"
        dst = f"ar_{i}"
        t._put(t.params, f"{dst}/class_cond/embedding",
               _np(sd[f"{src}.class_cond_embedding.weight"]))
        vw = _np(sd[f"{src}.vert_stack.weight"])     # (2d, d, kh, 3)
        vb = _np(sd[f"{src}.vert_stack.bias"])
        hw = _np(sd[f"{src}.horiz_stack.weight"])    # (2d, d, 1, 2)
        hb = _np(sd[f"{src}.horiz_stack.bias"])
        if i == 0:                                   # mask-A: drop zeroed taps
            vw = vw[:, :, :-1]
            hw = hw[:, :, :, :1]
        t._put(t.params, f"{dst}/vert_stack/kernel", vw.transpose(2, 3, 1, 0))
        t._put(t.params, f"{dst}/vert_stack/bias", vb)
        t._put(t.params, f"{dst}/horiz_stack/kernel", hw.transpose(2, 3, 1, 0))
        t._put(t.params, f"{dst}/horiz_stack/bias", hb)
        t.conv2d(sd, f"{src}.vert_to_horiz", f"{dst}/vert_to_horiz")
        t.conv2d(sd, f"{src}.horiz_resid", f"{dst}/horiz_resid")
    w0 = _np(sd["output_conv.0.weight"])[:, :, 0, 0]
    t._put(t.params, "out_hidden/kernel", w0.T)
    t._put(t.params, "out_hidden/bias", _np(sd["output_conv.0.bias"]))
    w2 = _np(sd["output_conv.2.weight"])[:, :, 0, 0]
    t._put(t.params, "out_proj/kernel", w2.T)
    t._put(t.params, "out_proj/bias", _np(sd["output_conv.2.bias"]))
    return {"params": t.params}
