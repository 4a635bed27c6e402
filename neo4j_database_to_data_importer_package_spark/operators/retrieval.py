"""Corpus retrieval / vocabulary operators (beyond-reference):
TF-IDF term ranking, BM25 scoring, vocabulary coverage (OOV rate).

These are the lexical-statistics half of a training-data pipeline
(the embedding half lives in operators/similarity.py). Everything is
built-in expressions over an exploded token stream — the explode is
linear in corpus size and the (doc, term) / (term) aggregations are
partial-aggregatable, so the plans hold at 100 TB: the only shuffles
are keyed groupBys and one join on ``term`` (vocabulary-sized, i.e.
tiny relative to the corpus).

Determinism: scores use natural log + ``round_half_up`` so DuckDB
oracles reproduce them; ranking ties break on the term/doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import round_half_up
from ..functions.text import tokens


def _term_stream(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term) stream — one row per token occurrence."""
    return df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF.

    score = tf * (ln((N+1)/(df+1)) + 1), rounded to 6 decimals; ranking
    ties break alphabetically on the term. Corpus stats (doc count, doc
    frequency) come from partial-aggregatable groupBys; the per-doc
    top-k is a window over ``id_col`` — each doc's terms are one group,
    so no single-task global sort.
    """
    tf = _term_stream(df, text_col, id_col).groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            round_half_up(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("doc_freq") + 1.0)) + 1.0),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); score(d) = Σ_t idf(t) *
    tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl)). avgdl averages over
    ALL documents. The token stream is filtered to the query terms
    BEFORE the tf aggregation, so the shuffled volume is proportional
    to query-term occurrences, not the corpus.
    """
    stream = _term_stream(df, text_col, id_col)
    q = stream.where(F.col("term").isin(query_terms))
    tf = q.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))

    dl = df.select(F.col(id_col), F.size(tokens(text_col)).alias("dl"))
    globals_ = df.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
    )

    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("doc_freq") + 0.5) / (F.col("doc_freq") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom

    scored = (
        tf.join(F.broadcast(doc_freq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(globals_))
        .groupBy(id_col)
        .agg(round_half_up(F.sum(contrib), 6).alias("bm25"))
    )
    # orderBy().limit(k) compiles to TakeOrderedAndProject — a distributed
    # partial top-k, no single-task full sort. The unpartitioned
    # row_number window then only ever sees the k surviving rows.
    topk = scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("bm25"), F.asc(id_col))
    return topk.withColumn("rank", F.row_number().over(w).cast("int")).select(
        id_col, "bm25", "rank"
    )


def vocabulary_oov(
    df: DataFrame,
    vocab_size: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-V vocab.

    Phase 1 builds the vocabulary (top ``vocab_size`` terms by corpus
    frequency, ties alphabetical) — output is V rows, broadcast to
    phase 2 regardless of corpus size. Phase 2 marks each token
    occurrence in/out of vocab and re-aggregates per doc.
    """
    stream = _term_stream(df, text_col, id_col)
    freq = stream.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        freq.orderBy(F.desc("n"), F.asc("term"))
        .limit(vocab_size)
        .select("term")
    )
    marked = stream.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "term", "left"
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        "n_oov",
        round_half_up(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
    )


def heavy_hitter_terms(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Global top-k corpus terms by occurrence count, deterministic
    tie-break on the term itself. The explode→groupBy is map-side
    partially aggregated (term counts shrink to vocabulary size before
    the shuffle). The top-k itself is ``orderBy().limit(k)`` — Spark
    plans that as TakeOrderedAndProject (per-partition partial top-k,
    merge k·partitions rows on one reducer), NOT a global sort: at web
    scale the vocabulary is 1e8+ rows and an unpartitioned
    ``row_number`` window would sort all of it in a single task (the
    anti-pattern VERDICT r03 #3 flagged; same fix as
    text_analysis.bigram_next_token_topk). Ranking the k survivors
    afterward is driver-trivial.
    """
    counts = (
        _term_stream(df, text_col, id_col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    topk = counts.orderBy(F.col("n_occurrences").desc(), F.col("term")).limit(k)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("term"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select("term", "n_occurrences", "rank")
    )


def cms_term_estimates(
    df: DataFrame,
    depth: int = 4,
    width: int = 1024,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Count-min sketch accuracy audit: build a depth×width CMS over the
    corpus term stream (deterministic md5 row hashes — no seed state),
    then read back the estimates for the ``top_k`` true heavy hitters
    next to their exact counts. The sketch is the bounded-state
    mergeable counter (depth·width longs total, regardless of corpus
    size) that replaces exact per-term counts when the vocabulary
    doesn't fit; the audit shows its overestimate directly.

    Plan (r15): ONE tokenize pass — both the sketch and the heavy-hitter
    probes derive from the per-term exact counts (guide §2.3 "aggregate
    before you shuffle"): a CMS cell's count over the token stream is
    exactly Σ count(term) over the terms hashing into the cell, so the
    sketch builds from the vocabulary-sized count table (persisted for
    its two consumers) instead of re-exploding the corpus-sized term
    stream ×depth. The pre-r15 shape tokenized the corpus twice and
    shuffled |tokens|·depth rows; identical integer results.
    """
    stream = _term_stream(df, text_col, id_col)

    def col_of(term_col, i_col):
        h = F.md5(F.concat_ws("|", i_col.cast("string"), term_col))
        return (
            F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % width
        ).cast("int")

    # Vocabulary-sized (term, count) table — cheap to cache, two
    # consumers below; cleanup is caller-scoped (the result is lazy).
    tc = (
        stream.groupBy("term")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .persist()
    )
    rows = tc.select(
        F.col("term"),
        F.col("true_count"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
    )
    sketch = (
        rows.select("i", col_of(F.col("term"), F.col("i")).alias("col"), "true_count")
        .groupBy("i", "col")
        .agg(F.sum("true_count").alias("c"))
    )
    true_counts = tc.orderBy(
        F.col("true_count").desc(), F.col("term")
    ).limit(top_k)
    probes = true_counts.select(
        "term",
        "true_count",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("i"),
    ).select(
        "term", "true_count", "i", col_of(F.col("term"), F.col("i")).alias("col")
    )
    est = (
        F.broadcast(probes)
        .join(sketch, ["i", "col"])
        .groupBy("term", "true_count")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        "term",
        "true_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("true_count")).alias("overestimate"),
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion: fuse the lexical
    (BM25) top-``k_each`` for a bag-of-words query with the dense
    (cosine) top-``k_each`` for a query vector, scoring each candidate
    ``Σ 1/(rrf_k + rank)`` over the lists it appears in — the standard
    hybrid-search merge, done entirely on the two bounded rank lists
    (document ids align with vector ids in the corpus contract).

    The expensive parts are the two retrievals, each already scale-shaped
    (BM25 shuffles only query-term occurrences; dense top-k is the
    brute/IVF operator); the fusion itself is a full-outer join of two
    ≤ k_each-row tables and a TakeOrdered — free at any corpus size.
    RRF scores are sums of exact rational doubles (1/(60+r)), so the
    fused ranking is bit-identical in any engine — no rounding needed
    before the rank.
    """
    from .similarity import brute_force_topk

    lex = bm25_topk(docs, query_terms, k=k_each, id_col=id_col).select(
        F.col(id_col), F.col("rank").alias("lex_rank")
    )
    vec = (
        brute_force_topk(
            embeddings, k=k_each, n_queries=query_vec_id + 1, id_col=vec_id_col
        )
        .filter(F.col("query_id") == query_vec_id)
        .select(
            F.col("neighbor_id").alias(id_col), F.col("rank").alias("vec_rank")
        )
    )
    fused = lex.join(vec, id_col, "full_outer").select(
        F.col(id_col),
        "lex_rank",
        "vec_rank",
        (
            F.coalesce(1.0 / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("vec_rank")), F.lit(0.0))
        ).alias("__score"),
    )
    topk = fused.orderBy(F.col("__score").desc(), F.col(id_col)).limit(k)
    w = Window.orderBy(F.col("__score").desc(), F.col(id_col))
    from ..functions.numeric import round_half_up

    return topk.withColumn(
        "fused_rank", F.row_number().over(w).cast("int")
    ).select(
        id_col,
        "lex_rank",
        "vec_rank",
        round_half_up(F.col("__score"), 6).alias("rrf_score"),
        "fused_rank",
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.3,
    max_df: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document-similarity pairs by TF-IDF-weighted cosine over the term
    inverted index — the WEIGHTED near-dup complement to shingle
    Jaccard: two docs rephrasing the same rare terminology score high
    even when word order (and hence every shingle) differs, while
    shared function words contribute almost nothing.

    score(a,b) = Σ_t w_at·w_bt / (||a||·||b||), w = tf·(ln((N+1)/(df+1))+1)
    (the same smoothed idf as ``tfidf_top_terms``). The pair join runs
    on the inverted index, so its cost is Σ df(term)² — bounded the
    same way as the shingle joins (VERDICT r05 #2): terms with document
    frequency > ``max_df`` are DROPPED with a logged count before any
    pairing (stopword semantics — they leave the weights and the norms
    together, keeping the cosine a true cosine over the kept
    vocabulary). Output (id_a, id_b, tfidf_cosine) with id_a < id_b.
    """
    import logging

    logger = logging.getLogger(__name__)
    tf = _term_stream(df, text_col, id_col).groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    hot = (
        doc_freq.filter(F.col("doc_freq") > max_df)
        .select("term")
        .localCheckpoint(eager=True)
    )
    n_hot = hot.count()
    if n_hot:
        logger.warning(
            "tfidf_cosine_pairs: dropping %d terms with df > %d",
            n_hot, max_df,
        )
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    # weights rounded to 9 dp, sums decimal-exact: both the dot products
    # and the norms are then identical under any partitioning and in the
    # SQL oracle (the dsum discipline — float sums are order-dependent)
    w = (
        tf.join(hot, "term", "left_anti")
        .join(doc_freq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            round_half_up(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("doc_freq") + 1.0)) + 1.0),
                9,
            ).alias("w"),
        )
    )
    from ..functions.numeric import dsum

    norms = w.groupBy(id_col).agg(
        F.sqrt(dsum(F.col("w") * F.col("w"), 18)).alias("nrm")
    )
    a = w.select(F.col(id_col).alias("id_a"), "term", F.col("w").alias("wa"))
    b = w.select(F.col(id_col).alias("id_b"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(dsum(F.col("wa") * F.col("wb"), 18).alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            round_half_up(
                F.col("dot") / (F.col("na") * F.col("nb")), 6
            ).alias("tfidf_cosine"),
        )
        .filter(F.col("tfidf_cosine") >= threshold)
    )


def ndcg_eval(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """nDCG@k of the single-term BM25 ranking against a term-frequency
    relevance label, per probe term — the retrieval-quality eval loop
    (is the ranker ordering the genuinely term-dense docs first?),
    using tf as the graded gain so the ideal ranking is defined by the
    data itself, no human labels needed.

    Same pruned token stream as ``bm25_topk`` (shuffle volume ∝ probe
    occurrences, not the corpus); both the actual (BM25) and ideal
    (tf-sorted) rankings are per-term windows cut at k (bounded,
    partitioned by term); per-rank DCG terms are 9-dp rounded and
    decimal-summed so the k-term sums are order- and
    engine-independent. Scores are rounded BEFORE ranking with doc-id
    tiebreaks, so ranks are stable across engines too.
    """
    from ..functions.numeric import dsum

    stream = _term_stream(df, text_col, id_col)
    tf = (
        stream.where(F.col("term").isin(query_terms))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("n_matched"))
    dl = df.select(F.col(id_col), F.size(tokens(text_col)).alias("dl"))
    globals_ = df.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("n_matched") + 0.5)
        / (F.col("n_matched") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    scored = (
        tf.join(F.broadcast(doc_freq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(globals_))
        .select(
            "term",
            F.col(id_col),
            "tf",
            round_half_up(idf * F.col("tf") * (k1 + 1.0) / denom, 6).alias(
                "score"
            ),
        )
    )
    wa = Window.partitionBy("term").orderBy(F.desc("score"), F.asc(id_col))
    wi = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc(id_col))
    gain = lambda rank: round_half_up(  # noqa: E731 — shared DCG term
        F.col("tf") / F.log2(rank + F.lit(1.0)), 9
    )
    dcg = (
        scored.withColumn("rank", F.row_number().over(wa))
        .filter(F.col("rank") <= k)
        .groupBy("term")
        .agg(dsum(gain(F.col("rank")), 9).alias("dcg"))
    )
    idcg = (
        scored.withColumn("rank", F.row_number().over(wi))
        .filter(F.col("rank") <= k)
        .groupBy("term")
        .agg(dsum(gain(F.col("rank")), 9).alias("idcg"))
    )
    return (
        doc_freq.join(dcg, "term")
        .join(idcg, "term")
        .select(
            "term",
            F.col("n_matched").cast("long").alias("n_matched"),
            round_half_up(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_k"),
        )
    )


def bloom_fp_audit(
    keys: DataFrame,
    key_col: str,
    probes: DataFrame,
    probe_col: str,
    m: int = 65536,
    k: int = 4,
) -> DataFrame:
    """Bloom-filter false-positive audit: build the k-hash/m-bit filter
    over ``keys`` as an OCCUPIED-POSITION SET (the distributed dual of
    a bitmap — set-semantics make the construction one distinct
    aggregate), probe it with known non-members, and report the
    MEASURED false-positive rate next to the load-based prediction
    (bits_set/m)^k. This is the sizing loop for bloom-pruned joins at
    100 TB (ship a bloom of the small side's keys instead of the keys
    themselves); the audit is how you pick m before trusting the
    prune, and shows when a fixed m has saturated at scale.

    Hashes are md5-derived (engine-reproducible); the probe check is
    one equi-join of probe-hash pairs against the occupied set with a
    count-k filter — no bitmaps, no UDFs, no driver state.
    """
    from ..functions.numeric import round_half_up

    def pos(col, i):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(col.cast("string"), F.lit(f":{i}"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % m
        )

    kd = keys.select(F.col(key_col).alias("key")).distinct()
    occ = (
        kd.select(
            F.explode(F.array(*[pos(F.col("key"), i) for i in range(k)])).alias("h")
        )
        .distinct()
    )
    nk = kd.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    bits = occ.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    ph = probes.select(
        F.col(probe_col).alias("p"),
        F.explode(F.array(*[pos(F.col(probe_col), i) for i in range(k)])).alias("h"),
    )
    fp = (
        ph.join(occ, "h")
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("hits"))
        .where(F.col("hits") == k)
        .agg(F.count(F.lit(1)).cast("long").alias("n_false_positives"))
    )
    np_ = probes.agg(F.count(F.lit(1)).cast("long").alias("n_probes"))
    load = F.col("n_bits_set") / F.lit(float(m))
    theo = load
    for _ in range(k - 1):
        theo = theo * load
    return (
        nk.crossJoin(F.broadcast(bits))
        .crossJoin(F.broadcast(np_))
        .crossJoin(F.broadcast(fp))
        .select(
            "n_keys",
            "n_bits_set",
            "n_probes",
            "n_false_positives",
            round_half_up(
                F.col("n_false_positives") / F.col("n_probes"), 6
            ).alias("fp_rate"),
            round_half_up(theo, 6).alias("predicted_fp_rate"),
        )
    )


def mrr_eval(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    rel_tf: int = 2,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MRR / precision@k of the single-term BM25 ranking, per probe
    term — the binary-relevance companion to [ndcg_eval]: a doc is
    "relevant" when the term occurs >= ``rel_tf`` times (term-dense,
    label-free ground truth), and the eval asks how high the FIRST
    such doc ranks (reciprocal rank) and how many fill the top k
    (precision@k) — the two numbers a search-quality dashboard leads
    with.

    Same pruned token stream and bounded per-term rank window as
    ndcg_eval (shuffle volume ∝ probe occurrences, not the corpus);
    scores are rounded before ranking with doc-id tiebreaks so ranks
    are engine-stable. A term with no relevant doc reports rank 0 /
    rr 0.0 (never NULL).

    Returns (term, n_matched, n_relevant, first_rel_rank, rr,
    precision_at_k).
    """
    stream = _term_stream(df, text_col, id_col)
    tf = (
        stream.where(F.col("term").isin(query_terms))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("n_matched"))
    dl = df.select(F.col(id_col), F.size(tokens(text_col)).alias("dl"))
    globals_ = df.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("n_matched") + 0.5)
        / (F.col("n_matched") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    scored = (
        tf.join(F.broadcast(doc_freq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(globals_))
        .select(
            "term",
            F.col(id_col),
            "tf",
            round_half_up(idf * F.col("tf") * (k1 + 1.0) / denom, 6).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("score"), F.asc(id_col))
    ranked = scored.withColumn("rank", F.row_number().over(w)).select(
        "term",
        "rank",
        (F.col("tf") >= rel_tf).cast("long").alias("rel"),
    )
    agg = ranked.groupBy("term").agg(
        F.sum("rel").cast("long").alias("n_relevant"),
        F.coalesce(
            F.min(F.when(F.col("rel") == 1, F.col("rank"))), F.lit(0)
        )
        .cast("long")
        .alias("first_rel_rank"),
        F.sum(
            F.when((F.col("rank") <= k) & (F.col("rel") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("__rel_in_k"),
    )
    return (
        doc_freq.join(agg, "term")
        .select(
            "term",
            F.col("n_matched").cast("long").alias("n_matched"),
            "n_relevant",
            "first_rel_rank",
            round_half_up(
                F.when(
                    F.col("first_rel_rank") > 0,
                    F.lit(1.0) / F.col("first_rel_rank"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("rr"),
            round_half_up(F.col("__rel_in_k") / F.lit(float(k)), 6).alias(
                "precision_at_k"
            ),
        )
    )


def posting_list_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted-index posting-list length histogram in log2 buckets —
    the index-capacity planning read-out: how many terms have 1-2
    postings (the long tail that bloats the dictionary) vs millions
    (the hot lists that need skipping/caching)? Every search-index
    sizing exercise starts from exactly this table.

    One (term, doc) distinct aggregate, one per-term df count, one
    bounded histogram rollup (buckets ≤ log2(n_docs)) with a 1-row
    totals broadcast for shares. No windows, no joins beyond the
    scalar.
    """
    postings = (
        _term_stream(df, text_col, id_col)
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    tot = dfreq.agg(
        F.count(F.lit(1)).alias("n_terms_total"),
        F.sum("df").alias("n_postings_total"),
    )
    hist = dfreq.groupBy(
        F.floor(F.log2("df")).cast("long").alias("log2_df_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("df").cast("long").alias("n_postings"),
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "log2_df_bucket",
            "n_terms",
            "n_postings",
            round_half_up(
                F.col("n_postings") / F.col("n_postings_total"), 6
            ).alias("postings_share"),
            round_half_up(
                F.col("n_terms") / F.col("n_terms_total"), 6
            ).alias("terms_share"),
        )
    )


def bm25_tfidf_rank_agreement(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ranker-agreement audit: Spearman correlation between the BM25
    and TF-IDF orderings of each probe term's matched documents — how
    much the length normalization and saturation actually change who
    ranks where (rho ≈ 1 says the simpler scorer would do; a low rho
    is the evidence file for keeping BM25).

    Both scores come off the same pruned term stream and are rounded
    before ranking (engine-stable ranks, doc-id tiebreak); ranks are
    per-term row_numbers (bounded matched sets), so Spearman reduces
    to the exact integer formula 1 − 6·Σd²/(n(n²−1)) — no float
    moments at all.

    Returns (term, n_matched, rho).
    """
    from ..functions.numeric import round_half_up

    stream = _term_stream(df, text_col, id_col)
    tf = (
        stream.where(F.col("term").isin(query_terms))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("n_matched"))
    dl = df.select(F.col(id_col), F.size(tokens(text_col)).alias("dl"))
    globals_ = df.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
    )
    bm25_idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("n_matched") + 0.5)
        / (F.col("n_matched") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    tfidf_idf = F.log(
        (F.col("n_docs") + 1.0) / (F.col("n_matched") + 1.0)
    ) + 1.0
    scored = (
        tf.join(F.broadcast(doc_freq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(globals_))
        .select(
            "term",
            F.col(id_col),
            round_half_up(
                bm25_idf * F.col("tf") * (k1 + 1.0) / denom, 6
            ).alias("s_bm25"),
            round_half_up(F.col("tf") * tfidf_idf, 6).alias("s_tfidf"),
        )
    )
    wa = Window.partitionBy("term").orderBy(
        F.desc("s_bm25"), F.asc(id_col)
    )
    wb = Window.partitionBy("term").orderBy(
        F.desc("s_tfidf"), F.asc(id_col)
    )
    ranked = scored.select(
        "term",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    d2 = (F.col("ra") - F.col("rb")) * (F.col("ra") - F.col("rb"))
    agg = ranked.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.sum(d2).cast("long").alias("sd2"),
    )
    nn = F.col("n_matched").cast("double")
    return agg.select(
        "term",
        "n_matched",
        round_half_up(
            1.0
            - 6.0 * F.col("sd2").cast("double") / (nn * (nn * nn - 1.0)),
            6,
        ).alias("rho"),
    )


def prf_expansion_terms(
    df: DataFrame,
    query_terms: list[str],
    n_rel: int = 10,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    digits: int = 6,
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Robertson–Sparck
    Jones): take the BM25 top-``n_rel`` documents as pseudo-relevant,
    weight every candidate term by the RSJ relevance weight

        w(t) = ln( ((r+0.5)(N−n−R+r+0.5)) / ((n−r+0.5)(R−r+0.5)) )

    (r = pseudo-relevant docs containing t, n = document frequency,
    R = ``n_rel``, N = corpus size) and emit the top-``k`` expansion
    terms — the classical automatic query-expansion step of a
    retrieval stack, with the original query terms excluded.

    Determinism: r, n, R, N are integers; the single ln runs on an
    exact rational — engine-identical, rounded at ``digits``; ranking
    breaks ties (w, then df desc, then term).

    Scale shape: rides ``bm25_topk`` (query-filtered token stream);
    candidate statistics are one distinct (doc, term) aggregate for df
    and one semi-joined aggregate for r (the n_rel doc ids broadcast);
    read-out is TakeOrderedAndProject.
    """
    rel = bm25_topk(df, query_terms, k=n_rel, text_col=text_col, id_col=id_col)
    rel_ids = rel.select(id_col)
    stream = _term_stream(df, text_col, id_col).distinct()
    dfreq = stream.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    rfreq = (
        stream.join(F.broadcast(rel_ids), id_col, "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    ndocs = df.agg(F.count(F.lit(1)).alias("nd"))
    cand = (
        rfreq.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .filter(~F.col("term").isin(query_terms))
    )
    w = F.log(
        ((F.col("r") + 0.5) * (F.col("nd") - F.col("n") - n_rel + F.col("r") + 0.5))
        / ((F.col("n") - F.col("r") + 0.5) * (n_rel - F.col("r") + 0.5))
    )
    scored = cand.select(
        "term",
        F.col("n").alias("doc_freq"),
        F.col("r").alias("n_rel_docs"),
        round_half_up(w, digits).alias("rsj_weight"),
    )
    return scored.orderBy(
        F.desc("rsj_weight"), F.desc("doc_freq"), F.asc("term")
    ).limit(k)
