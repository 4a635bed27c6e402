"""Dedup-family tests on synthetic corpora with planted duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neo4j_database_to_data_importer_package_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill "
    "and the birds sing in the tall green trees near the old stone bridge"
)
NEAR = BASE.replace("lazy dog", "lazy cat")  # 2-word change → high jaccard
FAR = "completely different content about spark dataframes and distributed joins at scale"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),           # exact duplicate of 0
        (2, NEAR),           # near-duplicate of 0/1
        (3, FAR),
        (4, "  " + BASE.upper() + "  "),  # normalizes to the same as 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(spark, corpus):
    res = {r["fingerprint"]: (r["keep_id"], r["n_dups"]) for r in exact_dedup(corpus).collect()}
    # 0, 1, 4 collapse (case/whitespace-normalized); 2 and 3 are singletons
    sizes = sorted(v[1] for v in res.values())
    assert sizes == [1, 1, 3]
    big = next(v for v in res.values() if v[1] == 3)
    assert big[0] == 0  # min doc_id survives


def test_ngram_jaccard_finds_near_dup(spark, corpus):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(corpus, threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_finds_near_dup(spark, corpus):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in minhash_lsh_pairs(corpus, threshold=0.5).collect()}
    # exact dups always collide in every band
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 4) in pairs
    # verified jaccard for candidates equals the exact computation
    exact = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(corpus, threshold=0.5).collect()}
    for k, v in pairs.items():
        assert exact[k] == v


def test_minhash_lsh_subset_of_exact(spark, corpus):
    lsh = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(corpus, threshold=0.5).collect()}
    exact = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(corpus, threshold=0.5).collect()}
    assert lsh <= exact


def test_simhash_properties(spark, corpus):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(corpus).collect()}
    assert all(len(s) == 128 and set(s) <= {"0", "1"} for s in sigs.values())
    assert sigs[0] == sigs[1]  # identical text → identical signature
    ham02 = sum(a != b for a, b in zip(sigs[0], sigs[2]))
    ham03 = sum(a != b for a, b in zip(sigs[0], sigs[3]))
    assert ham02 < ham03  # near-dup closer than unrelated
    # the 64-bit signature is the 128-bit signature's prefix (same
    # md5-nibble bit extraction, fewer positions)
    sigs64 = {r["doc_id"]: r["simhash"] for r in simhash_signatures(corpus, bits=64).collect()}
    assert all(sigs[d][:64] == s for d, s in sigs64.items())


def test_simhash_pairs_hamming(spark, corpus):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(corpus, max_hamming=20).collect()}
    assert pairs.get((0, 1)) == 0
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(corpus).collect()}
    for (a, b), h in pairs.items():
        assert h == sum(x != y for x, y in zip(sigs[a], sigs[b]))


def test_simhash_block_bits_derivation():
    """Corpus-sized geometry (VERDICT r09 #2): floor at 16 bits for all
    oracle scales (determinism of the driver-gated plan), widening ~4
    bits per corpus doubling past the floor, capped so the pigeonhole
    guarantee never drops below 4 blocks."""
    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        derive_simhash_block_bits,
    )

    # oracle scales: sf0.001 and sf0.01 both carry 500 docs → the floor
    assert derive_simhash_block_bits(500) == 16
    assert derive_simhash_block_bits(50) == 16
    assert derive_simhash_block_bits(0) == 16
    # monotone non-decreasing in corpus size
    widths = [derive_simhash_block_bits(n) for n in (500, 5_000, 20_000, 80_000, 10**7)]
    assert widths == sorted(widths)
    # ~4 nominal bits per doubling past the floor (entropy 0.25)
    assert derive_simhash_block_bits(5_000) == 26
    assert derive_simhash_block_bits(80_000) == 32  # saturates at bits//4
    # the cap: never fewer than min_blocks blocks
    assert derive_simhash_block_bits(10**10) == 32
    assert derive_simhash_block_bits(10**10, min_blocks=2) == 64


def test_simhash_pairs_explicit_geometry_matches_derived(spark, corpus):
    """At 5 docs the derivation lands on the 16-bit floor; passing the
    same geometry explicitly must produce the identical pair set."""
    derived = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(corpus).collect()}
    explicit = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(corpus, block_bits=16, max_hamming=12).collect()
    }
    assert derived == explicit
    assert (0, 1) in derived  # exact dup at hamming 0 always survives


def test_duplicate_span_stats(spark):
    from neo4j_database_to_data_importer_package_spark.operators.dedup import duplicate_span_stats

    shared = "one two three four five six seven eight"   # exactly one 8-gram
    rows = [
        (0, shared + " nine ten"),                        # 3 spans, 1 shared
        (1, "zz " + shared),                              # 2 spans, 1 shared
        (2, "totally unrelated words appear here in this other document now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    res = {r["doc_id"]: (r["n_spans"], r["n_dup_spans"]) for r in duplicate_span_stats(df, n=8).collect()}
    assert res[0] == (3, 1)
    assert res[1] == (2, 1)
    assert res[2] == (3, 0)


def test_contamination_check_planted(spark):
    from neo4j_database_to_data_importer_package_spark.operators.dedup import contamination_check

    shared = "alpha beta gamma delta epsilon"  # one 5-gram
    train = spark.createDataFrame(
        [(1, shared + " zeta eta"), (2, "nothing in common with the eval set here")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "prefix " + shared + " suffix")], "doc_id long, text string"
    )
    res = {r["doc_id"]: (r["n_grams"], r["n_contaminated_grams"], r["contaminated"])
           for r in contamination_check(train, ev, n=5).collect()}
    assert res[1] == (3, 1, True)
    assert res[2][1] == 0 and res[2][2] is False


def test_incremental_exact_dedup(spark):
    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        incremental_exact_dedup,
    )

    corpus = spark.createDataFrame(
        [(1, "The Quick Fox"), (2, "something else"), (3, "the quick  fox")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "  the quick fox "), (11, "brand new content")],
        "doc_id long, text string",
    )
    res = {r["doc_id"]: (r["is_dup"], r["dup_of"]) for r in incremental_exact_dedup(corpus, batch).collect()}
    assert res[10] == (True, 1)   # matches min corpus id among 1 and 3
    assert res[11] == (False, None)


def test_novelty_profile_first_seen_semantics(spark):
    from neo4j_database_to_data_importer_package_spark.operators.dedup import novelty_profile

    # doc 1 introduces everything; doc 2 repeats doc 1 verbatim (zero
    # novelty); doc 3 is half doc-1 text, half new text.
    a = "w1 w2 w3 w4 w5 w6 w7 w8"                    # 1 gram of n=8
    fresh = "x1 x2 x3 x4 x5 x6 x7 x8"
    docs = [(1, a), (2, a), (3, a + " " + fresh)]
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"])
        for r in novelty_profile(
            spark.createDataFrame(docs, "doc_id long, text string"), n=8
        ).collect()
    }
    assert got[1] == (1, 1)
    assert got[2] == (1, 0)
    # doc 3 has 9 grams; only the ones containing an x-token are novel
    assert got[3] == (9, 8)


def test_snapshot_diff_statuses(spark):
    from neo4j_database_to_data_importer_package_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_normalized_fingerprint(spark):
    from neo4j_database_to_data_importer_package_spark.operators.dedup import snapshot_diff

    # whitespace/case-only edits are NOT changes (normalized fingerprint)
    old = spark.createDataFrame([(1, "Hello  World")], "doc_id long, text string")
    new = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    assert snapshot_diff(old, new).collect()[0]["status"] == "unchanged"


# --- document-frequency cap (VERDICT r05 #2) --------------------------------

BOILER = "all rights reserved contact us at the main office for further details and terms"


@pytest.fixture(scope="module")
def boiler_corpus(spark):
    """40 docs; 12 (30%) share a boilerplate sentence but have otherwise
    unrelated bodies; docs 0/1 are genuine near-dups WITHOUT boilerplate."""
    rows = [
        (0, BASE),
        (1, NEAR),
    ]
    for i in range(2, 14):  # 12 boilerplate docs with unique bodies
        body = " ".join(f"tok{i}x{j} filler{i * 7 + j}" for j in range(20))
        rows.append((i, BOILER + " " + body))
    for i in range(14, 40):
        body = " ".join(f"uniq{i}y{j} word{i * 11 + j}" for j in range(20))
        rows.append((i, body))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_df_cap_drops_boilerplate_only_pairs(spark, boiler_corpus):
    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        containment_pairs,
    )

    # Uncapped: the shared boilerplate manufactures containment pairs
    # among docs whose bodies are unrelated (threshold low enough that
    # the 14-shingle boilerplate run beats min-set size... keep 0.2).
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(
            boiler_corpus, threshold=0.2, max_df=None
        ).collect()
    }
    boiler_pairs = {p for p in uncapped if 2 <= p[0] < 14 and 2 <= p[1] < 14}
    assert boiler_pairs, "stressor corpus must manufacture boilerplate pairs"

    # Capped at max_df=5 (< the 12-doc boilerplate df): those pairs
    # vanish; the genuine near-dup survives in the Jaccard view.
    capped = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(
            boiler_corpus, threshold=0.2, max_df=5
        ).collect()
    }
    assert not {p for p in capped if 2 <= p[0] < 14 and 2 <= p[1] < 14}

    jac = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            boiler_corpus, threshold=0.5, max_df=5
        ).collect()
    }
    assert (0, 1) in jac


def test_df_cap_equals_stopword_removed_brute_force(spark, boiler_corpus):
    """Capped result == uncapped result over the corpus with the hot
    shingles removed up front — the cap IS stopword removal, not an
    approximation."""
    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        containment_pairs,
        shingle_index,
    )

    idx = shingle_index(boiler_corpus)
    hot = [
        r["shingle"]
        for r in idx.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > 5)
        .collect()
    ]
    assert hot  # the boilerplate shingles
    capped = sorted(
        tuple(r)
        for r in containment_pairs(
            boiler_corpus, threshold=0.2, max_df=5
        ).collect()
    )

    # brute force: same operator, uncapped, on text where we can't easily
    # strip shingles — instead verify via the index-level equivalence:
    # every capped pair's stats recomputed from the hot-filtered index.
    kept = idx.filter(~F.col("shingle").isin(hot))
    sizes = {
        r["doc_id"]: r["n"]
        for r in kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    by_doc = {}
    for r in kept.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["shingle"])
    expect = []
    ids = sorted(by_doc)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(by_doc[a] & by_doc[b])
            if not inter:
                continue
            cont = inter / min(sizes[a], sizes[b])
            jacc = inter / (sizes[a] + sizes[b] - inter)
            import math

            cont_r = math.floor(cont * 1e6 + 0.5) / 1e6
            jacc_r = math.floor(jacc * 1e6 + 0.5) / 1e6
            if cont_r >= 0.2:
                expect.append((a, b, cont_r, jacc_r))
    assert capped == sorted(expect)


@pytest.fixture(scope="module")
def dup_cluster_corpus(spark):
    """A 20-member exact-dup cluster (every band bucket holds all 20)
    plus one ordinary near-dup pair — the web-boilerplate shape that
    turns an uncapped band self-join quadratic."""
    rows = [(i, FAR) for i in range(20)]
    rows += [(100, BASE), (101, BASE)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_bucket_cap_drops_degenerate_cluster(spark, dup_cluster_corpus, caplog):
    """The band self-join must carry the same no-silent-caps discipline
    as the shingle index: a bucket over max_bucket is dropped WITH a
    logged count, killing only that cluster's pairs; buckets under the
    cap are untouched (round-9 — the text twin of the embedding path's
    ``_occupancy_capped_blocks``)."""
    import logging

    # Default cap (8192) never fires on this corpus: all pairs present.
    full = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(dup_cluster_corpus, threshold=0.5).collect()
    }
    assert (100, 101) in full
    assert sum(1 for a, b in full if a < 20 and b < 20) == 20 * 19 // 2

    with caplog.at_level(
        logging.WARNING,
        logger="neo4j_database_to_data_importer_package_spark.operators.dedup",
    ):
        capped = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(
                dup_cluster_corpus, threshold=0.5, max_bucket=10
            ).collect()
        }
    # The 20-cluster occupies every one of its band buckets at 20 > 10:
    # all its pairs vanish; the 2-member bucket (occupancy 2) survives.
    assert capped == {(100, 101)}
    assert any("dropping" in r.message and "minhash_lsh_pairs" in r.message
               for r in caplog.records)


def test_simhash_bucket_cap_drops_degenerate_cluster(spark, dup_cluster_corpus):
    """Same discipline on the SimHash block join: identical docs share
    every (q, block) bucket, so a cap below the cluster size kills
    exactly the cluster's pairs."""
    full = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(dup_cluster_corpus, max_hamming=6).collect()
    }
    assert (100, 101) in full
    assert sum(1 for a, b in full if a < 20 and b < 20) == 20 * 19 // 2

    capped = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(
            dup_cluster_corpus, max_hamming=6, max_bucket=10
        ).collect()
    }
    assert capped == {(100, 101)}


def test_hot_bucket_cache_evicts_dead_sessions_and_counts_drops(
    spark, dup_cluster_corpus
):
    """Round 10 (VERDICT r09 directive #5 / ADVICE): the memoized screen
    drops entries keyed by a DEAD applicationId at insert time, and the
    per-(session, op) drop count is queryable so pipelines can assert
    on recall loss instead of scraping logs."""
    from neo4j_database_to_data_importer_package_spark.operators import dedup

    app_id = spark.sparkContext.applicationId
    stale_cache_key = ("dead-app", 0, ("q", "block"), 9)
    dedup._HOT_BUCKET_CACHE[stale_cache_key] = (("0", "x"),)
    dedup.dropped_bucket_counts[("dead-app", "simhash_pairs")] = 7
    before = dedup.dropped_bucket_counts.get((app_id, "simhash_pairs"), 0)

    # max_bucket=9 is a fresh cache key for this plan → insert path runs
    capped = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(
            dup_cluster_corpus, max_hamming=6, max_bucket=9
        ).collect()
    }
    assert capped == {(100, 101)}
    # stale-session entries evicted at insert (cache AND metric)
    assert stale_cache_key not in dedup._HOT_BUCKET_CACHE
    assert ("dead-app", "simhash_pairs") not in dedup.dropped_bucket_counts
    # this session's screen verdict is cached as literal tuples, not a
    # DataFrame (a checkpointed DataFrame's blocks die with an executor)
    live = [
        v
        for k, v in dedup._HOT_BUCKET_CACHE.items()
        if k[0] == app_id and k[3] == 9 and v is not None
    ]
    assert live and all(isinstance(v, tuple) for v in live)
    # drop metric counted for this session, queryable by (app, op)
    assert dedup.dropped_bucket_counts[(app_id, "simhash_pairs")] > before


def test_drop_metric_idempotent_across_memoized_reruns(
    spark, dup_cluster_corpus
):
    """A consumer re-run that HITS the memoized screen must not re-add
    to dropped_bucket_counts — the metric advances once per distinct
    screen per op, so an exact-count assertion (the metric's advertised
    use) holds no matter how many times the pipeline re-executes."""
    from neo4j_database_to_data_importer_package_spark.operators import dedup

    app_id = spark.sparkContext.applicationId
    simhash_pairs(dup_cluster_corpus, max_hamming=6, max_bucket=11).collect()
    after_first = dedup.dropped_bucket_counts[(app_id, "simhash_pairs")]
    simhash_pairs(dup_cluster_corpus, max_hamming=6, max_bucket=11).collect()
    assert (
        dedup.dropped_bucket_counts[(app_id, "simhash_pairs")] == after_first
    )


def test_hot_key_overflow_falls_back_to_distributed_anti_join(
    spark, dup_cluster_corpus, monkeypatch
):
    """Past _MAX_HOT_KEYS the screen must NOT pull hot keys to the
    driver (a small cap on a huge corpus makes them driver-scale):
    the cached verdict is an overflow marker, the anti-join runs
    distributed, and results + the drop metric match the tuple path."""
    from neo4j_database_to_data_importer_package_spark.operators import dedup

    app_id = spark.sparkContext.applicationId
    expected = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(
            dup_cluster_corpus, max_hamming=6, max_bucket=12
        ).collect()
    }

    monkeypatch.setattr(dedup, "_MAX_HOT_KEYS", 0)
    before = dedup.dropped_bucket_counts.get((app_id, "simhash_pairs"), 0)
    # max_bucket=13 → fresh cache key → the insert path runs under the
    # zero ceiling and every hot screen overflows
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs(
            dup_cluster_corpus, max_hamming=6, max_bucket=13
        ).collect()
    }
    assert got == expected == {(100, 101)}
    overflow = [
        v
        for k, v in dedup._HOT_BUCKET_CACHE.items()
        if k[0] == app_id and k[3] == 13
    ]
    assert overflow and overflow[0][0] == "__overflow__"
    n_recorded = (
        dedup.dropped_bucket_counts[(app_id, "simhash_pairs")] - before
    )
    assert n_recorded == overflow[0][1] > 0  # exact count, from its own job


def test_simhash_blocks_reject_single_block_geometry(spark, corpus):
    """block_bits wide enough to leave fewer than two full blocks must
    fail fast: the old max(2, ...) fallback sliced an empty/truncated
    second block, putting EVERY doc in one ('', q=1) bucket — the
    all-pairs degenerate join the blocking exists to prevent."""
    import pytest as _pytest

    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        derive_simhash_block_bits,
    )

    for bad in (65, 128):
        with _pytest.raises(ValueError, match="2 full blocks"):
            simhash_pairs(corpus, block_bits=bad).collect()
    # the derivation can never hand that geometry to the blocker:
    # min_blocks < 2 is clamped to 2 (64-bit blocks max at 128 bits)
    assert derive_simhash_block_bits(10**9, min_blocks=1) <= 64


def test_derive_block_bits_narrow_signatures_never_fail():
    """ADVICE r10: the derivation must never hand _simhash_blocks a
    failing geometry, even for signatures narrower than twice the
    16-bit floor (e.g. bits=24, where the old floor returned 16 and the
    blocker requires <= 12). Every return is bounded at bits // 2."""
    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        derive_simhash_block_bits,
    )

    for bits in (2, 3, 8, 24, 30, 31, 33, 64, 128):
        for n in (0, 10, 500, 10**5, 10**9):
            w = derive_simhash_block_bits(n, bits=bits)
            assert 1 <= w <= bits // 2, (bits, n, w)
    # the specific ADVICE repro: bits=24 at derived geometry
    assert derive_simhash_block_bits(10**6, bits=24) == 12
    # a signature too narrow for even two 1-bit blocks fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bits=1"):
        derive_simhash_block_bits(100, bits=1)


def test_simhash_min_blocks2_pigeonhole_trade(spark):
    """Unit-pin the documented large-corpus dial (VERDICT r10 #3):
    min_blocks=2 widens blocks to 64 bits (two blocks of a 128-bit
    signature), whose pigeonhole guarantee is exact only for Hamming
    <= 1 — a Hamming-2 pair split across both halves is legitimately
    missed by the band (best-effort beyond the radius, by design)."""
    from neo4j_database_to_data_importer_package_spark.operators.dedup import (
        _simhash_blocks,
        derive_simhash_block_bits,
    )

    assert derive_simhash_block_bits(10**9, min_blocks=2) == 64

    base = "10" * 64
    flip = lambda s, i: s[:i] + ("0" if s[i] == "1" else "1") + s[i + 1 :]
    sig = spark.createDataFrame(
        [
            (0, base),
            (1, flip(base, 10)),            # Hamming 1: shares the back half
            (2, flip(flip(base, 10), 70)),  # Hamming 2, one flip per half
        ],
        "doc_id long, simhash string",
    )
    blocks = _simhash_blocks(sig, bits=128, block_bits=64)
    byq = {
        (r["doc_id"], r["q"]): r["block"] for r in blocks.collect()
    }
    assert len(byq) == 6  # 3 docs x 2 blocks, no tail at 64-bit blocks
    # pigeonhole at Hamming 1: doc 1 shares block q=1 with doc 0
    assert byq[(0, 1)] == byq[(1, 1)] and byq[(0, 0)] != byq[(1, 0)]
    # the trade: Hamming 2 split across halves shares NEITHER block
    assert byq[(0, 0)] != byq[(2, 0)] and byq[(0, 1)] != byq[(2, 1)]
