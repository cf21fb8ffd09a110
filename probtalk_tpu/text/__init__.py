"""Text foundation models (flax) — the text branch of the reference's
foundation-model hub (``data_utils/foundation_models.py:47-67``)."""

from probtalk_tpu.text.gpt2 import (  # noqa: F401
    GPT2Encoder,
    convert_hf_gpt2,
    make_gpt2_embed_fn,
)
