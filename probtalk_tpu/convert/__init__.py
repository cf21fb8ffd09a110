from probtalk_tpu.convert.torch_checkpoint import (  # noqa: F401
    convert_vqvae, load_reference_checkpoint,
)
