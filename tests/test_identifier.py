"""C1 identifier-cascade tests — one per priority tier + tie-breaks
(FIXTURES.md B1-B3; reference semantics neo4j_export.py:132-175)."""

from __future__ import annotations

import pytest

from neo4j_database_to_data_importer_package_spark.operators.identifier import (
    determine_identifier,
    uniqueness_profile,
)


@pytest.fixture(scope="module")
def client_df(spark):
    # B1: unique constraint + sentinel rows
    rows = [
        ("c1", "alice", "a@x.com", 1.0),
        ("c2", "NULL", "a@x.com", 2.0),  # legit "NULL" string in name
        (None, "bob", "b@x.com", 3.0),
        ("", "carol", "c@x.com", 4.0),
        ("NULL", "dan", "d@x.com", 5.0),
    ]
    return spark.createDataFrame(rows, "client_id string, name string, email string, balance double")


def test_tier1_unique_constraint(spark, client_df):
    ident = determine_identifier(
        client_df, "Client", sorted(client_df.columns), {"Client": ["client_id"]}
    )
    assert ident == "client_id"


def test_tier2_id_named(spark):
    df = spark.createDataFrame(
        [("g1", "A", 1.0), ("g2", "B", 2.0)],
        "globalTransactionId string, ID string, amount double",
    )
    # sorted() puts 'ID' before 'amount'/'globalTransactionId'; tier 2 matches case-insensitively
    assert determine_identifier(df, "Txn") == "ID"


def test_tier3_id_suffix_ranking(spark):
    df = spark.createDataFrame(
        [("g1", "t1", 1.0), ("g2", "t2", 2.0)],
        "globalTransactionId string, txid string, amount double",
    )
    # both end in 'id'; shortest name wins
    assert determine_identifier(df, "Txn") == "txid"


def test_tier4_uniqueness(spark):
    df = spark.createDataFrame(
        [("red", "s1", 1.0), ("red", "s2", 1.0), ("blue", "", 2.0)],
        "color string, serial string, weight double",
    )
    # color dup, weight dup, serial all-distinct excluding sentinel ""
    assert determine_identifier(df, "Widget") == "serial"


def test_tier4_sentinels_excluded(spark):
    # two "" values would collide if sentinels counted; they must not
    df = spark.createDataFrame(
        [("a", ""), ("a", ""), ("a", "x")], "color string, serial string"
    )
    assert determine_identifier(df, "W") == "serial"


def test_tier5_fallback(spark):
    df = spark.createDataFrame(
        [("red", "s1", 1.0), ("red", "s1", 1.0)],
        "color string, serial string, weight double",
    )
    # nothing unique → first sorted column
    assert determine_identifier(df, "Widget") == "color"


def test_no_properties_raises(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        determine_identifier(df, "Empty", [])


def test_approx_screen_same_answer(spark):
    df = spark.createDataFrame(
        [("red", f"s{i}", float(i % 3)) for i in range(100)],
        "color string, serial string, weight double",
    )
    exact = determine_identifier(df, "W", approx_screen=False)
    screened = determine_identifier(df, "W", approx_screen=True)
    assert exact == screened == "serial"


def test_uniqueness_profile_counts(spark, client_df):
    prof = uniqueness_profile(client_df, ["client_id", "email"])
    # client_id: non-sentinel values c1,c2 → (2,2); email: 5 values, 4 distinct
    assert prof["client_id"] == (2, 2)
    assert prof["email"] == (5, 4)
