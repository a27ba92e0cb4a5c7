"""Layered read-only config broker (SURVEY §2.10 "Config").

Mirrors the reference's pattern (B/config.py:18-59): python-file-based
layered config where later files override earlier ones, plus an env-var hook
naming extra config files. Config execution is driver-side plain Python —
the pattern ports nearly verbatim; Spark-specific knobs ride in the same
namespace (e.g. ``spark_confs`` dict applied by the session factory).

The parser/transformer lookups the reference's ConfigBroker also carries
(B/config.py:131-145) live in their registries here
(ingestion/transformers.py, ingestion/parsers.py); this broker re-exports
them so callers see one facade, like the reference's single ConfigBroker.
"""

from __future__ import annotations

import os
from typing import Any

from .ingestion.parsers import get_parser
from .ingestion.transformers import get_transformer

ENV_CONFIG_VAR = "CDI_SPARK_CONFIG"

DEFAULTS: dict[str, Any] = {
    "table_root": "/tmp/cdi_spark_tables",
    "keep_versions": 3,
    "shuffle_partitions": None,  # None → session factory picks core count
    "spark_confs": {},
    "max_page_size": 50,
    "default_page_size": 5,
}


class ConfigBroker:
    def __init__(self, config_files: list[str] | None = None):
        self._values: dict[str, Any] = dict(DEFAULTS)
        files = list(config_files or [])
        env_file = os.environ.get(ENV_CONFIG_VAR)
        if env_file:
            files.append(env_file)
        for f in files:
            self._load_from_file(f)

    def _load_from_file(self, path: str) -> None:
        """Execute a python config file; its top-level names override
        earlier layers (the reference exec's config files the same way)."""
        # ONE dict as both globals and locals: with split scopes, a
        # comprehension or helper function in the config file can't see
        # earlier top-level names (free names resolve against globals,
        # which would be empty) — `xs = [root + s for s in ...]` would
        # NameError on `root`
        scope: dict[str, Any] = {}
        with open(path) as fh:
            exec(compile(fh.read(), path, "exec"), scope)
        for k, v in scope.items():
            if not k.startswith("_"):
                self._values[k] = v

    def get(self, key: str, default: Any = None) -> Any:
        return self._values.get(key, default)

    def __getattr__(self, key: str) -> Any:
        try:
            return self._values[key]
        except KeyError:
            raise AttributeError(key) from None

    # facade parity with the reference's broker
    get_parser = staticmethod(get_parser)
    get_transformer = staticmethod(get_transformer)
