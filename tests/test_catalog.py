"""Catalog unit tests: F4 legacy constraint-description parse and
constraint-type classification (reference neo4j_export.py:107-123, :244-252).
Driver-side string logic — no SparkSession needed.
"""

from __future__ import annotations

from neo4j_database_to_data_importer_package_spark.catalog import (
    GraphCatalog,
    classify_constraint_type,
    parse_legacy_constraint_description,
)


class TestLegacyConstraintParse:
    def test_canonical_4x_format(self):
        # The format the reference's comment documents (neo4j_export.py:114).
        d = "CONSTRAINT ON ( person:Person ) ASSERT (person.email) IS UNIQUE"
        assert parse_legacy_constraint_description(d) == ("Person", "email")

    def test_parenless_3x_format_quirk(self):
        # Neo4j 3.x emits no parens around the property; the reference's
        # split(")")[0] then never truncates — parity requires the same.
        d = "CONSTRAINT ON ( person:Person ) ASSERT person.email IS UNIQUE"
        assert parse_legacy_constraint_description(d) == (
            "Person",
            "email IS UNIQUE",
        )

    def test_non_unique_ignored(self):
        d = "CONSTRAINT ON ( person:Person ) ASSERT exists(person.name)"
        assert parse_legacy_constraint_description(d) is None

    def test_unique_is_case_sensitive_like_reference(self):
        d = "constraint on ( person:Person ) assert (person.email) is unique"
        assert parse_legacy_constraint_description(d) is None

    def test_missing_colon(self):
        assert parse_legacy_constraint_description("SOMETHING UNIQUE") is None

    def test_missing_dot_returns_none(self):
        # split(".") on a dot-less string yields one part → len < 2 → None.
        d = "CONSTRAINT ON ( person:Person ) ASSERT UNIQUE"
        assert parse_legacy_constraint_description(d) is None

    def test_empty_and_none(self):
        assert parse_legacy_constraint_description("") is None
        assert parse_legacy_constraint_description(None) is None

    def test_whitespace_stripped(self):
        d = "CONSTRAINT ON (  u:User  ) ASSERT (  u.id  ) IS UNIQUE"
        assert parse_legacy_constraint_description(d) == ("User", "id")


class TestCatalogIngestLegacy:
    def test_populates_unique_constraints(self):
        cat = GraphCatalog()
        cat.ingest_legacy_constraint_descriptions(
            [
                "CONSTRAINT ON ( p:Person ) ASSERT (p.email) IS UNIQUE",
                "CONSTRAINT ON ( p:Person ) ASSERT (p.ssn) IS UNIQUE",
                "CONSTRAINT ON ( c:Company ) ASSERT (c.vat) IS UNIQUE",
                "CONSTRAINT ON ( c:Company ) ASSERT exists(c.name)",  # skipped
            ]
        )
        assert cat.unique_constraints == {
            "Person": ["email", "ssn"],
            "Company": ["vat"],
        }

    def test_duplicates_kept_like_reference(self):
        # The reference appends unconditionally (neo4j_export.py:122).
        cat = GraphCatalog()
        d = "CONSTRAINT ON ( p:Person ) ASSERT (p.email) IS UNIQUE"
        cat.ingest_legacy_constraint_descriptions([d, d])
        assert cat.unique_constraints == {"Person": ["email", "email"]}


class TestClassify:
    def test_classify_variants(self):
        assert classify_constraint_type("UNIQUENESS") == "uniqueness"
        assert classify_constraint_type("NODE_PROPERTY_EXISTENCE") == "existence"
        assert classify_constraint_type("NODE_KEY") == "key"
        assert classify_constraint_type("") == "uniqueness"
