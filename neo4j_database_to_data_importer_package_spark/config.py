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
    # Reference connection parameters (neo4j_export.py:1423-1428). The
    # engine records them for the pluggable GraphSource seam; defaults are
    # the reference's own.
    "uri": "bolt://localhost",
    "user": "neo4j",
    "password": "password",
    "database": "",
    # "engine" keeps engine defaults; "reference" replicates the reference
    # CLI contract (zip-on-by-default, neo4j_export.py:1463).
    "profile": "engine",
}

ENV_PREFIX = "GRAPH_EXPORT_"

# The reference's own env-var names (neo4j_export.py:1423-1428). Lower
# precedence than the engine's GRAPH_EXPORT_* namespace, higher than
# defaults — so `export NEO4J_URI=...; prog -o out` behaves as documented
# in the reference README.
REFERENCE_ENV_ALIASES = {
    "uri": "NEO4J_URI",
    "user": "NEO4J_USER",
    "password": "NEO4J_PASSWORD",
    "database": "NEO4J_DATABASE",
    "output_dir": "OUTPUT_DIR",
    "format_version": "FORMAT_VERSION",
}


def _find_unescaped(s: str, q: str) -> int:
    """Index of the first ``q`` in ``s`` not preceded by an ODD run of
    backslashes (single-quoted dotenv values have no escapes, so every
    quote closes); -1 when absent. Counting the whole run matters:
    ``DIR="C:\\\\"`` ends with an escaped backslash, and python-dotenv
    closes the quote there — inspecting only the single preceding
    character would treat the quote as escaped and swallow the rest of
    the file as a multi-line value (ADVICE r03)."""
    i = 0
    while True:
        i = s.find(q, i)
        if i < 0 or q == "'":
            return i
        n_bs = 0
        j = i - 1
        while j >= 0 and s[j] == "\\":
            n_bs += 1
            j -= 1
        if n_bs % 2 == 0:
            return i
        i += 1


def parse_env_file(path: str) -> dict[str, str]:
    """python-dotenv-compatible .env parsing (the reference uses the
    library itself, ``neo4j_export.py:1412-1432``): KEY=VALUE lines,
    full-line ``#`` comments, ``export KEY=VALUE`` prefixes, inline
    ``#`` comments after unquoted values, single/double-quoted values
    including MULTI-LINE quoted values, and ``\\n``/``\\t``/``\\"``/
    ``\\\\`` escapes inside double quotes (single quotes stay literal).
    """
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        i += 1
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, _, v = line.partition("=")
        k = k.strip()
        if k.startswith("export "):
            k = k[len("export "):].strip()
        v = v.strip()
        if v[:1] in ("'", '"'):
            q = v[0]
            body = v[1:]
            while True:
                end = _find_unescaped(body, q)
                if end >= 0:
                    body = body[:end]
                    break
                if i >= len(lines):
                    break  # unterminated quote: keep what we have
                body += "\n" + lines[i]
                i += 1
            if q == '"':
                body = (
                    body.replace("\\\\", "\0")
                    .replace("\\n", "\n")
                    .replace("\\t", "\t")
                    .replace('\\"', '"')
                    .replace("\0", "\\")
                )
            out[k] = body
        else:
            for m in range(len(v)):
                if v[m] == "#" and (m == 0 or v[m - 1] in " \t"):
                    v = v[:m]
                    break
            out[k] = v.strip()
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
    uri: str = "bolt://localhost"
    user: str = "neo4j"
    password: str = "password"
    database: str | None = None
    profile: str = "engine"


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
    explicit: set[str] = set()
    for key in DEFAULTS:
        # Per layer, the reference alias (NEO4J_URI, OUTPUT_DIR, ...) is
        # consulted first so the engine's GRAPH_EXPORT_* namespace wins
        # within the same layer; env beats .env beats defaults, CLI beats
        # all — the reference's precedence (neo4j_export.py:1412-1432).
        names = [REFERENCE_ENV_ALIASES.get(key), ENV_PREFIX + key.upper()]
        for source in (file_vals, env):
            for name in names:
                if name and name in source:
                    merged[key] = source[name]
                    explicit.add(key)
        if cli_args and cli_args.get(key) is not None:
            merged[key] = cli_args[key]
            explicit.add(key)

    # Reference profile: zip is ON unless --no-zip / an explicit setting
    # said otherwise (neo4j_export.py:1463 `create_zip = not args.no_zip`).
    if str(merged["profile"]).lower() == "reference" and "create_zip" not in explicit:
        merged["create_zip"] = "true"

    return ExportConfig(
        input_dir=str(merged["input_dir"]),
        output_dir=str(merged["output_dir"]),
        format_version=str(merged["format_version"]),
        single_file=_as_bool(merged["single_file"]),
        compat_render=_as_bool(merged["compat_render"]),
        quirks=_as_bool(merged["quirks"]),
        zip=str(merged["zip"]) or None,
        create_zip=_as_bool(merged["create_zip"]),
        uri=str(merged["uri"]),
        user=str(merged["user"]),
        password=str(merged["password"]),
        database=str(merged["database"]) or None,
        profile=str(merged["profile"]).lower(),
    )
