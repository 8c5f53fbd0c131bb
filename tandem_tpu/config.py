"""Training-config system: nested YAML -> flat ``SECTION.KEY`` mapping.

Behavioural spec (matches the reference's cva_mvsnet/config.py:8-49 so that
its yaml files and CLI override lists work unchanged):

* nesting collapses into dot-joined keys (``TRAIN.LR``),
* scalar strings run through ``ast.literal_eval`` so ``"1e-4"`` / ``"(1,2)"``
  arrive typed, while non-literal strings pass through untouched,
* lists become tuples (hashable, immutable hyperparameters),
* an override may only touch a key the base mapping already has — unknown
  keys are a hard error, never a silent insert.
"""

from __future__ import annotations

import os
from ast import literal_eval
from typing import Any, Dict, List, Mapping

import yaml

DEFAULT_CONFIG_FILE = os.path.join(
    os.path.dirname(__file__), "configs", "default.yaml")


def _parse_value(raw: Any) -> Any:
    """Coerce one yaml/CLI value: literal-eval strings, freeze lists."""
    value = raw
    if isinstance(value, str):
        try:
            value = literal_eval(value)
        except (ValueError, SyntaxError):
            pass  # plain string (path, name, ...) — keep as-is
    return tuple(value) if isinstance(value, list) else value


def flatten(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Collapse a nested mapping into dot-joined flat keys (iterative)."""
    flat: Dict[str, Any] = {}
    stack = [(prefix, tree)]
    while stack:
        path, node = stack.pop()
        for key, value in node.items():
            dotted = f"{path}{key}"
            if isinstance(value, Mapping):
                stack.append((dotted + ".", value))
            else:
                flat[dotted] = _parse_value(value)
    return flat


def load(fname: str) -> Dict[str, Any]:
    with open(fname, "r") as fp:
        return flatten(yaml.safe_load(fp))


def merge_from_config(config: Dict[str, Any],
                      overrides: Mapping[str, Any]) -> None:
    """Apply overrides in place; every key must already exist in config."""
    unknown = [k for k in overrides if k not in config]
    if unknown:
        raise KeyError(
            f"Refusing to merge unknown config key(s) {unknown}: overrides "
            "may only change keys present in the base config.")
    config.update(overrides)


def merge_from_file(config: Dict[str, Any], fname: str) -> None:
    merge_from_config(config, load(fname))


def merge_from_list(config: Dict[str, Any], kv_list: List[str]) -> None:
    """Apply a CLI tail of alternating KEY VALUE tokens."""
    if len(kv_list) % 2:
        raise ValueError(
            f"Override list needs alternating KEY VALUE tokens, got an odd "
            f"count ({len(kv_list)}).")
    keys, values = kv_list[0::2], kv_list[1::2]
    merge_from_config(config, {k: _parse_value(v)
                               for k, v in zip(keys, values)})


def default() -> Dict[str, Any]:
    """The full base config (every known key) from configs/default.yaml."""
    return load(DEFAULT_CONFIG_FILE)
