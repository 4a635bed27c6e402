"""C9 config precedence: CLI > env > .env > defaults
(reference neo4j_export.py:1412-1432)."""

from __future__ import annotations

from neo4j_database_to_data_importer_package_spark.config import load_config


def test_defaults():
    cfg = load_config(env={})
    assert cfg.format_version == "3.0"
    assert cfg.single_file is True
    assert cfg.create_zip is False


def test_env_file_lowest(tmp_path):
    envf = tmp_path / ".env"
    envf.write_text("# comment\nGRAPH_EXPORT_OUTPUT_DIR=from_file\nGRAPH_EXPORT_FORMAT_VERSION='2.4.0'\n")
    cfg = load_config(env={}, env_file=str(envf))
    assert cfg.output_dir == "from_file"
    assert cfg.format_version == "2.4.0"


def test_env_overrides_file(tmp_path):
    envf = tmp_path / ".env"
    envf.write_text("GRAPH_EXPORT_OUTPUT_DIR=from_file\n")
    cfg = load_config(env={"GRAPH_EXPORT_OUTPUT_DIR": "from_env"}, env_file=str(envf))
    assert cfg.output_dir == "from_env"


def test_cli_overrides_env(tmp_path):
    cfg = load_config(
        cli_args={"output_dir": "from_cli"},
        env={"GRAPH_EXPORT_OUTPUT_DIR": "from_env"},
    )
    assert cfg.output_dir == "from_cli"


def test_cli_none_does_not_override():
    cfg = load_config(cli_args={"output_dir": None}, env={"GRAPH_EXPORT_OUTPUT_DIR": "from_env"})
    assert cfg.output_dir == "from_env"


def test_missing_env_file_warns_not_raises(tmp_path):
    warnings = []
    cfg = load_config(env={}, env_file=str(tmp_path / "nope.env"), warn=warnings.append)
    assert cfg.output_dir == "export"
    assert warnings and "not found" in warnings[0]


# --- Reference CLI-contract parity (neo4j_export.py:1412-1432, 1463) ---


def test_connection_defaults_match_reference():
    cfg = load_config(env={})
    assert cfg.uri == "bolt://localhost"
    assert cfg.user == "neo4j"
    assert cfg.password == "password"
    assert cfg.database is None


def test_reference_env_aliases():
    cfg = load_config(
        env={
            "NEO4J_URI": "bolt://db:7687",
            "NEO4J_USER": "alice",
            "NEO4J_PASSWORD": "s3cret",
            "NEO4J_DATABASE": "movies",
            "OUTPUT_DIR": "ref_out",
            "FORMAT_VERSION": "0.1.0",
        }
    )
    assert cfg.uri == "bolt://db:7687"
    assert cfg.user == "alice"
    assert cfg.password == "s3cret"
    assert cfg.database == "movies"
    assert cfg.output_dir == "ref_out"
    assert cfg.format_version == "0.1.0"


def test_engine_namespace_beats_reference_alias():
    cfg = load_config(
        env={"NEO4J_URI": "bolt://ref", "GRAPH_EXPORT_URI": "bolt://engine"}
    )
    assert cfg.uri == "bolt://engine"


def test_cli_beats_reference_alias():
    cfg = load_config(cli_args={"uri": "bolt://cli"}, env={"NEO4J_URI": "bolt://ref"})
    assert cfg.uri == "bolt://cli"


def test_reference_profile_zips_by_default():
    cfg = load_config(cli_args={"profile": "reference"}, env={})
    assert cfg.create_zip is True


def test_reference_profile_respects_explicit_no_zip():
    cfg = load_config(
        cli_args={"profile": "reference", "create_zip": "false"}, env={}
    )
    assert cfg.create_zip is False


def test_reference_profile_respects_env_create_zip():
    cfg = load_config(
        cli_args={"profile": "reference"},
        env={"GRAPH_EXPORT_CREATE_ZIP": "false"},
    )
    assert cfg.create_zip is False


def test_engine_profile_zip_stays_opt_in():
    cfg = load_config(env={})
    assert cfg.profile == "engine"
    assert cfg.create_zip is False


def test_env_file_dotenv_corners(tmp_path):
    """python-dotenv fidelity: export prefix, inline comments, quoted
    multi-line values, double-quote escapes, single-quote literalness."""
    from neo4j_database_to_data_importer_package_spark.config import parse_env_file

    p = tmp_path / ".env"
    p.write_text(
        "\n".join(
            [
                "# full-line comment",
                "export OUTPUT_DIR=/data/out",
                "FORMAT_VERSION=2.4.0  # inline comment",
                'NEO4J_PASSWORD="p@ss word"',
                'MULTI="line one',
                'line two"',
                "SINGLE='lit\\nerally'",
                'ESCAPED="tab\\there \\"quoted\\""',
                "ANCHOR=plain#notcomment",
            ]
        )
    )
    got = parse_env_file(str(p))
    assert got["OUTPUT_DIR"] == "/data/out"
    assert got["FORMAT_VERSION"] == "2.4.0"
    assert got["NEO4J_PASSWORD"] == "p@ss word"
    assert got["MULTI"] == "line one\nline two"
    assert got["SINGLE"] == "lit\\nerally"  # single quotes: no escapes
    assert got["ESCAPED"] == 'tab\there "quoted"'
    assert got["ANCHOR"] == "plain#notcomment"  # '#' only after whitespace


def test_env_file_trailing_escaped_backslash(tmp_path):
    """A double-quoted value ending in an escaped backslash closes at
    that quote (the backslash escapes the backslash, not the quote) —
    ADVICE r03: only the PARITY of the trailing backslash run decides.
    Verified against python-dotenv itself."""
    from neo4j_database_to_data_importer_package_spark.config import parse_env_file

    import dotenv

    cases = [
        # even trailing run: the quote closes, NEXT is NOT swallowed
        ('DIR="C:\\\\"\nNEXT=after\n', {"DIR": "C:\\", "NEXT": "after"}),
        # odd run: the quote IS escaped, value continues to the real close
        ('ODD="a\\"b"\nLAST=end\n', {"ODD": 'a"b', "LAST": "end"}),
        # interior double backslash
        ('X="mid\\\\path"\nY=1\n', {"X": "mid\\path", "Y": "1"}),
    ]
    for i, (text, expect) in enumerate(cases):
        p = tmp_path / f"case{i}.env"
        p.write_text(text)
        got = parse_env_file(str(p))
        assert got == expect, (text, got)
        assert got == dict(dotenv.dotenv_values(str(p))), text
