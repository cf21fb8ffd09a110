from probtalk_tpu.audio.wav2vec2 import Wav2Vec2Encoder, convert_hf_wav2vec2  # noqa: F401
from probtalk_tpu.audio.hubert import (  # noqa: F401
    HubertEncoder,
    convert_hf_hubert,
    make_hubert_feature_fn,
)
from probtalk_tpu.audio.speech2text import (  # noqa: F401
    Speech2TextEncoder,
    convert_hf_speech2text,
    make_s2t_feature_fn,
)
