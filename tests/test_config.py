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
