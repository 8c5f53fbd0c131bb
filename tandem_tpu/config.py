"""Config system: YAML tree -> flat dotted-key dict with strict merging.

Behavioural parity with the reference config system (cva_mvsnet/config.py:8-49):
nested YAML is flattened to ``SECTION.KEY`` keys, string values are parsed with
``ast.literal_eval`` when possible, lists become tuples, and merges assert that
every overridden key already exists in the base config.
"""

from __future__ import annotations

import os
from ast import literal_eval
from typing import Any, Dict, Iterable, List

import yaml

DEFAULT_CONFIG_FILE = os.path.join(os.path.dirname(__file__), "configs", "default.yaml")


def _parse_value(v: Any) -> Any:
    if isinstance(v, str):
        try:
            v = literal_eval(v)
        except (ValueError, SyntaxError):
            pass
    if isinstance(v, list):
        v = tuple(v)
    return v


def flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix=prefix + k + "."))
        else:
            out[prefix + k] = _parse_value(v)
    return out


def load(fname: str) -> Dict[str, Any]:
    with open(fname, "r") as fp:
        return flatten(yaml.safe_load(fp))


def merge_from_config(config: Dict[str, Any], overrides: Dict[str, Any]) -> None:
    for k, v in overrides.items():
        if k not in config:
            raise KeyError(f"The key {k} is not in the base config for the merge.")
        config[k] = v


def merge_from_file(config: Dict[str, Any], fname: str) -> None:
    merge_from_config(config, load(fname))


def merge_from_list(config: Dict[str, Any], kv_list: List[str]) -> None:
    if len(kv_list) % 2 != 0:
        raise ValueError("The override list must have key value pairs.")
    overrides = {
        k: _parse_value(v) for k, v in zip(kv_list[0::2], kv_list[1::2])
    }
    merge_from_config(config, overrides)


def default() -> Dict[str, Any]:
    return load(DEFAULT_CONFIG_FILE)
