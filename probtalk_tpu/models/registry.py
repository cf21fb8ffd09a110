"""Model registry: config name -> wrapper builder.

Capability of the reference's ``nets/__init__.py:1-9`` / ``init_model``
(``nets/init_model.py:6-12``).
"""

from __future__ import annotations

MODEL_REGISTRY: dict = {}


def register_model(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn

    return deco


def build_model(name: str, *args, **kwargs):
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name](*args, **kwargs)
