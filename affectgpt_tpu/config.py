"""Experiment configuration: one YAML per experiment, four sections.

Capability-parity with the reference config system
(reference: my_affectgpt/common/config.py:9-173): a YAML file with
`model` / `datasets` / `run` / `inference` sections plus CLI dot-list
overrides (`--options a.b.c=value`), and an experiment name derived from
the YAML basename (reference: common/config.py:42-45). Implemented on
plain PyYAML with an explicit deep-merge instead of OmegaConf (not in
this environment), plus an optional `paths:` section feeding paths.py.
"""

from __future__ import annotations

import copy
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml

from affectgpt_tpu import paths


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for key, value in (override or {}).items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = _deep_merge(out[key], value)
        else:
            out[key] = value
    return out


def parse_dot_overrides(options: Optional[List[str]]) -> dict:
    """Parse ['a.b=1', 'c=[x,y]'] into a nested dict with YAML-typed values."""
    tree: dict = {}
    for opt in options or []:
        if "=" not in opt:
            raise ValueError(f"Override must look like key.path=value, got: {opt}")
        key_path, raw_value = opt.split("=", 1)
        value = yaml.safe_load(raw_value)
        node = tree
        parts = key_path.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
            if not isinstance(node, dict):
                raise ValueError(f"Override path conflict at {part} in {opt}")
        node[parts[-1]] = value
    return tree


class ConfigNode(dict):
    """Dict with attribute access and a default-aware get, for YAML subtrees."""

    def __getattr__(self, name: str) -> Any:
        try:
            value = self[name]
        except KeyError:
            raise AttributeError(name) from None
        return ConfigNode(value) if isinstance(value, dict) else value

    def get(self, key, default=None):
        value = super().get(key, default)
        return ConfigNode(value) if isinstance(value, dict) else value

    def to_dict(self) -> dict:
        return copy.deepcopy(dict(self))


@dataclass
class Config:
    """Merged experiment config.

    cfg.model / cfg.datasets / cfg.run / cfg.inference mirror the four YAML
    sections of the reference schema; cfg.name is the YAML basename and
    determines output/results directories.
    """

    model: ConfigNode = field(default_factory=ConfigNode)
    datasets: ConfigNode = field(default_factory=ConfigNode)
    run: ConfigNode = field(default_factory=ConfigNode)
    inference: ConfigNode = field(default_factory=ConfigNode)
    name: str = "experiment"
    cfg_path: Optional[str] = None

    @classmethod
    def from_file(cls, cfg_path: str, options: Optional[List[str]] = None) -> "Config":
        with open(cfg_path) as handle:
            raw = yaml.safe_load(handle) or {}
        return cls.from_dict(
            raw,
            options=options,
            name=os.path.splitext(os.path.basename(cfg_path))[0],
            cfg_path=cfg_path,
        )

    @classmethod
    def from_dict(
        cls,
        raw: Dict[str, Any],
        options: Optional[List[str]] = None,
        name: str = "experiment",
        cfg_path: Optional[str] = None,
    ) -> "Config":
        merged = _deep_merge(raw, parse_dot_overrides(options))
        if "paths" in merged:
            paths.update_from_dict(merged.pop("paths"))
        return cls(
            model=ConfigNode(merged.get("model", {}) or {}),
            datasets=ConfigNode(merged.get("datasets", {}) or {}),
            run=ConfigNode(merged.get("run", {}) or {}),
            inference=ConfigNode(merged.get("inference", {}) or {}),
            name=name,
            cfg_path=cfg_path,
        )

    @property
    def output_dir(self) -> str:
        """output/<cfg-name>/ — experiment identity from the YAML basename."""
        base = self.run.get("output_dir", "output")
        return os.path.join(base, self.name)

    @property
    def result_dir(self) -> str:
        return os.path.join("output", "results", self.name)

    def to_dict(self) -> dict:
        return {
            "model": self.model.to_dict(),
            "datasets": self.datasets.to_dict(),
            "run": self.run.to_dict(),
            "inference": self.inference.to_dict(),
        }

    def pretty(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)
