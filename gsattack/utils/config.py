"""Typed YAML config system — the single replacement for the reference's
two coexisting systems (Hydra/OmegaConf at `configs/config.yaml` +
argparse ParamGroups at `arguments/__init__.py`; SURVEY.md §5 calls for
unifying them).

Features mirrored from the reference's usage:
  * scene composition: `configs/config.yaml` + `configs/scene/<name>.yaml`
    merged under the `scene` key (Hydra defaults-list behavior)
  * `${dotted.path}` interpolation across the merged tree and
    `${now:%fmt}` timestamps (run-dir templating, config.yaml:65-76)
  * dotlist overrides `a.b=c` (Hydra CLI override syntax)
Attribute access via a lightweight recursive namespace.
"""

from __future__ import annotations

import os
import re
from datetime import datetime
from typing import Any, Optional, Sequence

import yaml

_INTERP = re.compile(r"\$\{([^}]+)\}")


class ConfigNode(dict):
    """dict with attribute access, recursively."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return v

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return ConfigNode({k: ConfigNode.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [ConfigNode.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> dict:
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)


def _lookup(root: dict, dotted: str):
    cur: Any = root
    for part in dotted.split("."):
        if not isinstance(cur, dict) or part not in cur:
            raise KeyError(f"interpolation ${{{dotted}}} not found")
        cur = cur[part]
    return cur


def _resolve(obj: Any, root: dict, now: datetime) -> Any:
    if isinstance(obj, dict):
        return {k: _resolve(v, root, now) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_resolve(v, root, now) for v in obj]
    if isinstance(obj, str):

        def repl(m):
            expr = m.group(1)
            if expr.startswith("now:"):
                return now.strftime(expr[4:])
            val = _lookup(root, expr)
            return str(_resolve(val, root, now))

        # Whole-string interpolation preserves the value's type.
        full = _INTERP.fullmatch(obj)
        if full and not full.group(1).startswith("now:"):
            return _resolve(_lookup(root, full.group(1)), root, now)
        return _INTERP.sub(repl, obj)
    return obj


def _parse_override_value(v: str) -> Any:
    try:
        return yaml.safe_load(v)
    except yaml.YAMLError:
        return v


def apply_overrides(cfg: dict, overrides: Sequence[str]) -> dict:
    """Hydra-style dotlist overrides: `a.b=c`."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override {ov!r} is not key=value")
        key, val = ov.split("=", 1)
        cur = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = _parse_override_value(val)
    return cfg


def load_config(
    config_dir: str = "configs",
    config_name: str = "config",
    scene: Optional[str] = None,
    overrides: Sequence[str] = (),
    now: Optional[datetime] = None,
) -> ConfigNode:
    """Load + compose + interpolate a config tree."""
    path = os.path.join(config_dir, f"{config_name}.yaml")
    with open(path) as f:
        cfg = yaml.safe_load(f) or {}

    # Hydra-style defaults list: [{"scene": "maserati"}, "_self_"]
    defaults = cfg.pop("defaults", [])
    default_scene = None
    for d in defaults:
        if isinstance(d, dict) and "scene" in d:
            default_scene = d["scene"]
    scene_name = scene or default_scene
    # Allow `scene=<name>` in overrides to pick the scene file.
    overrides = list(overrides)
    for ov in list(overrides):
        if ov.startswith("scene=") and "." not in ov.split("=")[0]:
            scene_name = ov.split("=", 1)[1]
            overrides.remove(ov)
    if scene_name:
        scene_path = os.path.join(config_dir, "scene", f"{scene_name}.yaml")
        if os.path.exists(scene_path):
            with open(scene_path) as f:
                cfg["scene"] = yaml.safe_load(f) or {}
    apply_overrides(cfg, overrides)
    resolved = _resolve(cfg, cfg, now or datetime.now())
    return ConfigNode.wrap(resolved)
