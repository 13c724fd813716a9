"""Job configuration loading (the reference's S5 config source).

Reference: scripts/loaders.py:5-16 — JSON config with a path-traversal guard
(resolved path must stay under an allowed base directory), merged over
defaults (scripts/processor.py:468-481 via _merge_config). Config is a
driver-side concern; nothing here touches executors.
"""

from __future__ import annotations

import json
import os
from typing import Any

from .oracle.correction import DEFAULT_CONFIG

ENGINE_DEFAULTS: dict[str, Any] = {
    **DEFAULT_CONFIG,
    "time_col": "t",
    "value_col": "value",
    "series_key_col": "series_key",
    "tiers": ["1m", "1h", "1d"],
    "n_buckets": 32,
}


def load_config(config_path: str, base_dir: str | None = None) -> dict[str, Any]:
    """Load a JSON config; reject paths escaping ``base_dir`` (defaults to
    the path's own directory) — mirrors the reference's traversal guard."""
    base = os.path.realpath(base_dir or os.path.dirname(config_path) or ".")
    resolved = os.path.realpath(config_path)
    if not resolved.startswith(base + os.sep) and resolved != base:
        raise ValueError(f"config path {config_path!r} escapes base directory {base!r}")
    with open(resolved, encoding="utf-8") as f:
        data = json.load(f)
    if not isinstance(data, dict):
        raise ValueError("config root must be a JSON object")
    return data


def merge_config(config: dict[str, Any] | None) -> dict[str, Any]:
    """Defaults-then-overrides merge (reference _merge_config semantics)."""
    return {**ENGINE_DEFAULTS, **(config or {})}
