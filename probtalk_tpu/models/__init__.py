"""Flax model zoo.

Registry maps the reference's config ``Model.model_name`` strings to model
builders (capability of ``nets/__init__.py`` + ``nets/init_model.py``).
"""

from probtalk_tpu.models.registry import MODEL_REGISTRY, register_model, build_model  # noqa: F401
from probtalk_tpu.models import builders  # noqa: F401  (populates the registry)
