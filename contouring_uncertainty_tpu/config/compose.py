"""YAML config groups + dotted overrides (Hydra-compatible CLI surface)."""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Dict, List, Optional

import yaml

CONFIG_DIR = Path(__file__).parent / "yaml"

_ENV_RE = re.compile(r"\$\{env:([A-Za-z_][A-Za-z0-9_]*)(?:,([^}]*))?\}")


def _resolve_env(value: Any) -> Any:
    if isinstance(value, str):
        def repl(match):
            return os.environ.get(match.group(1), match.group(2) or "")

        resolved = _ENV_RE.sub(repl, value)
        return resolved
    return value


def deep_merge(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for key, value in override.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = deep_merge(out[key], value)
        else:
            out[key] = value
    return out


def _load_yaml(path: Path) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _set_dotted(cfg: Dict, dotted: str, value: Any):
    keys = dotted.split(".")
    node = cfg
    for key in keys[:-1]:
        node = node.setdefault(key, {})
        if not isinstance(node, dict):
            raise ValueError(f"Cannot override through non-dict at {key} in {dotted}")
    node[keys[-1]] = value


_NUM_RE = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _parse_value(raw: str) -> Any:
    value = yaml.safe_load(raw)
    # Hydra's override grammar parses `lr=3e-4` as a float; YAML 1.1 only
    # accepts `3.0e-4` and hands back a *string* otherwise, which would let
    # a numeric CLI override silently reach optax/jnp as str. Match Hydra.
    if isinstance(value, str) and _NUM_RE.fullmatch(value.strip()):
        return float(value)
    return value


def compose(overrides: Optional[List[str]] = None, config_dir: Path = CONFIG_DIR) -> Dict:
    """Compose the full config from default.yaml + group selections + overrides.

    `group=option` picks `config_dir/group/option.yaml` when that file exists
    (groups: data, task, task/model); anything else is a dotted override.
    """
    overrides = list(overrides or [])
    cfg = _load_yaml(config_dir / "default.yaml")

    # Two passes: group selections first (they provide defaults), then dotted
    # overrides (they win).
    group_sel: Dict[str, str] = {}
    dotted: List[str] = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override '{ov}' must look like key=value")
        # Hydra spells force-add overrides `+key=value` / `++key=value`
        # (reference tmi_scripts/*.sh use `++comet_tags=[...]`); our flat
        # config has no add-vs-override distinction, so the prefix is noise.
        ov = ov.lstrip("+")
        key, value = ov.split("=", 1)
        group_dir = config_dir / key
        option_file = group_dir / f"{value}.yaml"
        if option_file.exists():
            group_sel[key] = value
        elif group_dir.is_dir() and "." not in key:
            options = sorted(p.stem for p in group_dir.glob("*.yaml"))
            raise ValueError(
                f"Unknown option '{value}' for config group '{key}'. "
                f"Available: {options}"
            )
        else:
            dotted.append(ov)

    # Default group selections declared in default.yaml's `defaults` list.
    for entry in cfg.pop("defaults", []):
        for group, option in entry.items():
            group_sel.setdefault(group, option)

    for group in sorted(group_sel, key=lambda g: g.count("/")):
        option = group_sel[group]
        node = _load_yaml(config_dir / group / f"{option}.yaml")
        node.setdefault("name", option)
        target = cfg
        *parents, leaf = group.split("/")
        for p in parents:
            target = target.setdefault(p, {})
        target[leaf] = deep_merge(target.get(leaf, {}), node)

    for ov in dotted:
        key, value = ov.split("=", 1)
        _set_dotted(cfg, key, _parse_value(value))

    cfg = _resolve_tree(cfg)
    cfg["choices"] = group_sel
    return cfg


def _resolve_tree(node: Any) -> Any:
    if isinstance(node, dict):
        return {k: _resolve_tree(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_tree(v) for v in node]
    return _resolve_env(node)
