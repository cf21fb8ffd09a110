"""Config system: JSON / YAML files -> nested attribute objects.

Provides the capability of the reference's ``trainer/config.py:12-55``
(``load_JsonConfig`` / ``load_YmlConfig`` with ``_BASE_`` inheritance and
recursive dict merge), redesigned as an immutable mapping so configs can be
closed over by jit-compiled functions without hashability surprises.
"""

from __future__ import annotations

import json
import os
from typing import Any, Mapping


class Config(Mapping):
    """Immutable nested attribute access over a dict.

    ``cfg.Model.code_num`` and ``cfg['Model']['code_num']`` both work.
    Missing keys raise AttributeError / KeyError; use ``cfg.get`` for defaults.
    """

    __slots__ = ("_data",)

    def __init__(self, data: dict):
        object.__setattr__(self, "_data", dict(data))

    # -- mapping protocol -------------------------------------------------
    def __getitem__(self, key):
        v = self._data[key]
        return Config(v) if isinstance(v, dict) else v

    def __iter__(self):
        return iter(self._data)

    def __len__(self):
        return len(self._data)

    # -- attribute access -------------------------------------------------
    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key) from None

    def __setattr__(self, key, value):
        raise AttributeError("Config is immutable; use .replace()")

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def replace(self, **updates) -> "Config":
        """Return a new Config with top-level keys replaced/merged."""
        merged = dict_merge(dict(self._data), updates)
        return Config(merged)

    def to_dict(self) -> dict:
        return json.loads(json.dumps(self._data))

    def __repr__(self):
        return f"Config({self._data!r})"


def dict_merge(base: dict, override: dict) -> dict:
    """Recursively merge ``override`` into ``base`` (override wins).

    Mirrors the semantics of the reference's yml ``dict_merge``
    (``trainer/config.py:25-33``): nested dicts merge, everything else
    replaces.
    """
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = dict_merge(out[k], v)
        else:
            out[k] = v
    return out


def _load_raw(path: str) -> dict:
    with open(path, "r") as f:
        text = f.read()
    if path.endswith((".yml", ".yaml")):
        import yaml  # lazy: pyyaml is only needed for yml configs

        return yaml.safe_load(text) or {}
    return json.loads(text)


def load_config(path: str) -> Config:
    """Load a JSON or YAML config, resolving ``_BASE_`` inheritance chains.

    A config may name a parent via ``_BASE_`` (path relative to the child
    file); parents are loaded recursively and the child is merged on top —
    the reference's ``get_full_ymlconfig`` behaviour (``trainer/config.py``),
    extended to JSON too.
    """
    raw = _load_raw(path)
    base_rel = raw.pop("_BASE_", None)
    if base_rel is not None:
        base_path = os.path.normpath(os.path.join(os.path.dirname(path), base_rel))
        base = load_config(base_path).to_dict()
        raw = dict_merge(base, raw)
    return Config(raw)
