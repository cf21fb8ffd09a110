"""Model-name registry entries.

Capability of the reference's ``nets/__init__.py:1-9`` registry: every
``Model.model_name`` string the reference accepts maps to a builder here
(``build_model(name, config)`` -> flax module).
"""

from __future__ import annotations

from probtalk_tpu.models.registry import register_model
from probtalk_tpu.core import body_parts


def _m(config, key, default):
    try:
        return config.Model.get(key, default)
    except AttributeError:
        return default


@register_model("s2g_body_vqt")
def build_vqt(config=None):
    from probtalk_tpu.models.vqvae import VQVAE

    groups = _m(config, "groups", 4)
    return VQVAE(
        in_dim=body_parts.full_dim(True),
        embedding_dim=_m(config, "code_dim", 128) * groups,
        num_codes=_m(config, "code_num", 128), groups=groups,
        hiddens=_m(config, "hiddens", 1024),
        res_layers=_m(config, "res_layers", 2),
        q_type=_m(config, "q_type", "pro"),
    )


@register_model("s2g_body_predictor")
def build_predictor(config=None):
    from probtalk_tpu.train.stages import PredictorStage

    return PredictorStage(
        mot_dim=body_parts.full_dim(True),
        num_code=_m(config, "code_num", 128),
        groups=_m(config, "groups", 4),
        maskgit=_m(config, "maskgit", True),
        maskgit_T=_m(config, "maskgit_T", 8),
        motion_context=_m(config, "motion_context", True),
        use_audio=_m(config, "p_audio", "wav2vec") is not None,
        use_text=_m(config, "p_text", None) is not None,
        identity=_m(config, "identity", True),
        # config.Model.transformer=false selects the GatedPixelCNN-1D
        # decoder (reference predictornet.py:56-58)
        decoder_type="transformer" if _m(config, "transformer", True)
        else "pixel",
    )


@register_model("s2g_body_refiner")
def build_refiner(config=None):
    from probtalk_tpu.train.stages import RefinerStage

    return RefinerStage(
        in_dim=body_parts.full_dim(True),
        aud_dim=768 if _m(config, "r_audio", "wav2vec") == "wav2vec" else 64,
        motion_context=_m(config, "motion_context", True),
    )


@register_model("s2g_face")
def build_face(config=None):
    from probtalk_tpu.models.face import FaceGenerator

    return FaceGenerator()


@register_model("s2g_body_vq")
def build_legacy_vq(config=None):
    from probtalk_tpu.models.legacy import LegacyVQVAE

    return LegacyVQVAE(
        in_dim=270,
        num_codes=_m(config, "code_num", 2048),
    )


@register_model("s2g_body_pixel")
def build_legacy_pixel(config=None):
    from probtalk_tpu.models.legacy import GatedPixelCNN2D

    return GatedPixelCNN2D(
        num_codes=_m(config, "code_num", 2048),
        bh_model=_m(config, "bh_model", True),
    )


@register_model("s2g_body_ae")
def build_body_ae(config=None):
    from probtalk_tpu.models.legacy import BodyAE

    return BodyAE()


@register_model("s2g_LS3DCG")
def build_ls3dcg(config=None):
    from probtalk_tpu.models.legacy import LS3DCG

    return LS3DCG()


@register_model("s2g_body")
def build_audio2gestures(config=None):
    from probtalk_tpu.models.legacy import Audio2Gestures

    return Audio2Gestures()


@register_model("Audio2Gestures")
def build_audio2gestures_exact(config=None):
    """The exact-architecture A2G family (config/Audio2Gestures.json:
    model_name 'Audio2Gestures'; nets/Audio2Gestures.py Generator)."""
    from probtalk_tpu.models.legacy import A2GGenerator

    return A2GGenerator(
        out_dim=_m(config, "out_dim", 330),
        audio_hidden=_m(config, "audio_hidden_size", 32),
        pose_hidden=_m(config, "pose_hidden_size", 32),
        dropout=_m(config, "dropout", 0.2),
        with_mapping_net=_m(config, "with_mapping_net", True),
    )


@register_model("speech2gesture")
def build_speech2gesture(config=None):
    from probtalk_tpu.models.legacy import Speech2GestureG

    return Speech2GestureG()


@register_model("emb_net")
def build_emb_net(config=None):
    from probtalk_tpu.models.embedding_net import EmbeddingNet

    return EmbeddingNet()
