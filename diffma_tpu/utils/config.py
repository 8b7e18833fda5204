"""Config system: YAML + CLI flags, flags win.

Mirrors the reference's OmegaConf usage (train.py:314-325): every entry point
takes ``--config <yaml>`` plus a few boolean flags, and CLI values are merged
*over* the YAML.  The reference YAMLs (config/brain.yaml, config/pelvis.yaml)
load unmodified.  Implemented on PyYAML with a dot-access namespace; no
OmegaConf dependency.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Optional

import yaml

__all__ = ["Config", "load_config", "merge", "parse_cli"]


class Config(dict):
    """Recursive attr-dict: cfg.model, cfg["model"] both work."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get(self, name, default=None):
        return super().get(name, default)

    @staticmethod
    def _wrap(value):
        if isinstance(value, dict):
            return Config({k: Config._wrap(v) for k, v in value.items()})
        if isinstance(value, list):
            return [Config._wrap(v) for v in value]
        return value

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(v):
            if isinstance(v, dict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, list):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)


def load_config(path: str) -> Config:
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return Config._wrap(data)


def merge(base: Config, override: Optional[Dict[str, Any]]) -> Config:
    """Override values win (reference: OmegaConf.merge(yaml, cli))."""
    out = Config(dict(base))
    for k, v in (override or {}).items():
        if v is None:
            continue
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge(Config(out[k]), v)
        else:
            out[k] = Config._wrap(v)
    return out


def parse_cli(parser: argparse.ArgumentParser, argv=None) -> Config:
    """Parse args, load --config YAML, merge flags over it."""
    args = parser.parse_args(argv)
    d = {k: v for k, v in vars(args).items() if v is not None and k != "config"}
    cfg = load_config(args.config) if getattr(args, "config", None) else Config()
    return merge(cfg, d)
