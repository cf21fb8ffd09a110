from probtalk_tpu.audio.wav2vec2 import Wav2Vec2Encoder, convert_hf_wav2vec2  # noqa: F401
