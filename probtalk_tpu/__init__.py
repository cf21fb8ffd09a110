"""probtalk_tpu — a TPU-native JAX/XLA/Pallas framework for holistic co-speech
motion generation, providing the capabilities of ProbTalk (feifeifeiliu/probtalk,
CVPR 2024) rebuilt from scratch for TPU hardware.

The pipeline (reference: /root/reference/README.md, nets/inpainting/*):
  1. PQ-VAE    — conv VQ-VAE with product quantization over holistic motion
  2. Predictor — MaskGit-style non-autoregressive transformer over PQ codes
  3. Refiner   — transformer decoder regressing final continuous motion

Everything in the compute path is jit-compiled XLA; the product-quantization
argmin lookup is a fused Pallas kernel; multi-chip scaling goes through
jax.sharding.Mesh + shard_map collectives.

Layout convention: arrays are time-major channels-last (B, T, C) — the feature
axis maps onto the TPU lane dimension. (The PyTorch reference is (B, C, T).)
"""

__version__ = "0.1.0"

from probtalk_tpu.config import Config, load_config  # noqa: F401
