"""Minimal OmegaConf-compatible config system.

The reference merges ``conf/path.yaml`` with a task YAML via OmegaConf and
snapshots the merged config into the run dir (``scripts/train.py:25-39``).
omegaconf is not available in this environment, so this module provides the
subset actually used: YAML loading, deep merge, ``${a.b}`` interpolation,
attribute access, and round-trip save — keeping the exact CLI contract
(``--config conf/*.yaml``; run dirs are self-describing).
"""

from __future__ import annotations

import copy
import re
from typing import Any, Dict, List, Optional

import yaml

_INTERP = re.compile(r"\$\{([^}]+)\}")


class Config:
    """Attribute/key access wrapper over a nested dict with interpolation."""

    def __init__(self, data: Dict[str, Any], root: Optional["Config"] = None):
        object.__setattr__(self, "_data", data)
        object.__setattr__(self, "_root", root if root is not None else self)

    # -- access ----------------------------------------------------------
    def _resolve(self, value):
        if isinstance(value, dict):
            return Config(value, self._root)
        if isinstance(value, list):
            return [self._resolve(v) for v in value]
        if isinstance(value, str) and "${" in value:
            return self._interpolate(value)
        return value

    def _interpolate(self, s: str):
        def lookup(match):
            node: Any = self._root
            for part in match.group(1).split("."):
                node = node[part]
            return str(node)

        full = _INTERP.fullmatch(s)
        if full:
            node: Any = self._root
            for part in full.group(1).split("."):
                node = node[part]
            return node
        return _INTERP.sub(lookup, s)

    def __getattr__(self, key):
        try:
            return self._resolve(self._data[key])
        except KeyError as e:
            raise AttributeError(key) from e

    def __getitem__(self, key):
        return self._resolve(self._data[key])

    def __setattr__(self, key, value):
        self._data[key] = value

    def __setitem__(self, key, value):
        self._data[key] = value

    def __contains__(self, key):
        return key in self._data

    def get(self, key, default=None):
        if key in self._data:
            return self._resolve(self._data[key])
        return default

    def keys(self):
        return self._data.keys()

    def items(self):
        return [(k, self._resolve(v)) for k, v in self._data.items()]

    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(self._data)

    def __repr__(self):
        return f"Config({self._data!r})"


def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load(*paths: str) -> Config:
    """Load and deep-merge YAML files left-to-right (later wins)."""
    merged: Dict[str, Any] = {}
    for p in paths:
        with open(p) as f:
            data = yaml.safe_load(f) or {}
        merged = _deep_merge(merged, data)
    return Config(merged)


def merge(*configs) -> Config:
    merged: Dict[str, Any] = {}
    for c in configs:
        d = c.to_dict() if isinstance(c, Config) else c
        merged = _deep_merge(merged, d)
    return Config(merged)


def save(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, default_flow_style=False, sort_keys=False)
