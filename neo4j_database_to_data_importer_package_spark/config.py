"""Config resolution (C9, ``neo4j_export.py:1336-1473``).

Reference precedence: CLI > environment > .env file > defaults, with an
optional ``--env-file`` and a warning (not an error) when the named env
file is missing (``load_config``, ``:1412-1432``). Replicated without the
python-dotenv dependency (a minimal .env parser — KEY=VALUE lines, '#'
comments, optional quotes), spark-submit friendly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, fields

DEFAULTS = {
    "input_dir": "/root/testdata/sf0.001",
    "output_dir": "export",
    "format_version": "3.0",
    "single_file": "true",
    "compat_render": "false",
    "quirks": "true",
    "zip": "",
    "create_zip": "false",
}

ENV_PREFIX = "GRAPH_EXPORT_"


def parse_env_file(path: str) -> dict[str, str]:
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            v = v.strip().strip("'\"")
            out[k.strip()] = v
    return out


def _as_bool(v: str | bool) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() in ("1", "true", "yes", "on")


@dataclass
class ExportConfig:
    input_dir: str
    output_dir: str
    format_version: str
    single_file: bool
    compat_render: bool
    quirks: bool
    zip: str | None
    create_zip: bool


def load_config(
    cli_args: dict | None = None,
    env: dict | None = None,
    env_file: str | None = None,
    warn=print,
) -> ExportConfig:
    """Merge with reference precedence CLI > env > .env > defaults."""
    env = dict(os.environ if env is None else env)

    file_vals: dict[str, str] = {}
    if env_file:
        if os.path.exists(env_file):
            file_vals = parse_env_file(env_file)
        else:
            warn(f"Warning: env file not found: {env_file}")

    merged = dict(DEFAULTS)
    for key in DEFAULTS:
        env_key = ENV_PREFIX + key.upper()
        if env_key in file_vals:
            merged[key] = file_vals[env_key]
        if env_key in env:
            merged[key] = env[env_key]
        if cli_args and cli_args.get(key) is not None:
            merged[key] = cli_args[key]

    return ExportConfig(
        input_dir=str(merged["input_dir"]),
        output_dir=str(merged["output_dir"]),
        format_version=str(merged["format_version"]),
        single_file=_as_bool(merged["single_file"]),
        compat_render=_as_bool(merged["compat_render"]),
        quirks=_as_bool(merged["quirks"]),
        zip=str(merged["zip"]) or None,
        create_zip=_as_bool(merged["create_zip"]),
    )
