"""Text-analysis operators for corpus pipelines (beyond-reference):
language-ID heuristic, quality scoring, token counting, fingerprinting.

All JVM-side (regex + array builtins inside codegen); formulas are
engine-portable so DuckDB oracles reproduce them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import round_half_up

from ..functions.text import LANG_STOPWORDS, fingerprint_md5, tokens

# Word-or-single-punct pattern — the "BPE-ish" token proxy.
_BPE_RE = r"\w+|[^\w\s]"


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token counts: whitespace tokens, regex (BPE-ish) tokens,
    and the chars/4 approximation used for LLM budget estimates."""
    t = tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(t).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_BPE_RE), 0)).alias("n_re_tokens"),
        F.ceil(F.length(text_col) / 4).cast("long").alias("n_tok_est"),
        F.length(text_col).alias("n_chars"),
    )


def quality_columns(text_col: str = "text") -> dict[str, F.Column]:
    """Expression-level quality features — composable into any projection
    (single-scan pipelines fuse these with other per-doc expressions).

    Features: length band, mean word length band, stopword ratio,
    alphabetic ratio. Deliberately simple/deterministic — the point is
    the (scalable) plumbing, not the heuristic.
    """
    t = tokens(text_col)
    n_tok = F.size(t)
    n_chars = F.length(text_col)
    stop = F.array([F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_hits = F.size(F.filter(t, lambda x: F.array_contains(stop, x)))
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", ""))
    mean_wlen = (n_chars - (n_tok - 1)) / n_tok

    stop_ratio = round_half_up(stop_hits / n_tok, 6)
    alpha_ratio = round_half_up(alpha_chars / n_chars, 6)
    len_ok = (n_chars >= F.lit(50)) & (n_chars <= F.lit(20000))
    wlen_ok = (mean_wlen >= 2.0) & (mean_wlen <= 12.0)
    score = round_half_up(
        (F.when(len_ok, 0.25).otherwise(0.0))
        + (F.when(wlen_ok, 0.25).otherwise(0.0))
        + F.least(stop_ratio * F.lit(2.5), F.lit(0.25))
        + (alpha_ratio * F.lit(0.25)),
        6,
    )
    return {
        "n_tokens": F.size(t),
        "stopword_ratio": stop_ratio,
        "alpha_ratio": alpha_ratio,
        "quality": score,
    }


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score in [0,1]."""
    cols = quality_columns(text_col)
    return df.select(
        F.col(id_col), *[c.alias(name) for name, c in cols.items()]
    )


def language_columns(text_col: str = "text") -> dict[str, F.Column]:
    """Expression-level language-ID: {detected_lang, best_score} columns.

    Scores each language by distinct-stopword hits in the token set;
    winner = max score, ties broken alphabetically; zero hits → 'und'.
    Explode+join-free: one array_intersect per language, all codegen.
    """
    t = tokens(text_col)
    langs = sorted(LANG_STOPWORDS)
    scores = {}
    for lang in langs:
        arr = F.array([F.lit(w) for w in LANG_STOPWORDS[lang]])
        scores[lang] = F.size(F.array_intersect(F.array_distinct(t), arr))
    best = F.greatest(*scores.values())
    pick = F.lit("und")
    # Alphabetical tie-break: first lang reaching the max wins.
    for lang in reversed(langs):
        pick = F.when(scores[lang] == best, F.lit(lang)).otherwise(pick)
    pick = F.when(best > 0, pick).otherwise(F.lit("und"))
    return {"detected_lang": pick, "best_score": best}


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-overlap language heuristic (see ``language_columns``)."""
    cols = language_columns(text_col)
    return df.select(
        F.col(id_col),
        cols["detected_lang"].alias("detected_lang"),
        cols["best_score"].alias("best_score"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, md5 fingerprint of normalized text)."""
    return df.select(F.col(id_col), fingerprint_md5(text_col).alias("fingerprint"))


# Engine-portable PII patterns: the same regex text is valid (and means
# the same) in Java regex (Spark) and RE2 (DuckDB) — char classes,
# bounded repetition, and alternation only; no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[A-Za-z0-9./_-]+"


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Count and redact emails / URLs — the scrubbing pass every
    training-data pipeline runs before tokenization. Pure regexp
    expressions in codegen (no Python): returns
    (id, n_emails, n_urls, clean_len, clean_md5) where clean_* describe
    the text after replacing matches with [EMAIL] / [URL].
    """
    c = F.col(text_col)
    clean = F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "[EMAIL]"), URL_RE, "[URL]"
    )
    return df.select(
        F.col(id_col),
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(c, F.lit(URL_RE)).alias("n_urls"),
        F.length(clean).alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


def unigram_logprob_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-unigram log-probability scoring — the cheap perplexity
    proxy used to quality-filter web text against a reference corpus
    (here: the corpus itself, MLE unigram LM). Two aggregations and one
    join, all keyed on the term; the per-doc score is the mean token
    log-probability ln(count(term)/total_tokens).

    Every token occurrence has p >= 1/total by construction (the LM is
    fit on the same corpus), so the log never sees zero.
    """
    terms = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("total"))
    from ..functions.numeric import round_half_up

    return (
        terms.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            round_half_up(
                F.avg(F.log(F.col("c") / F.col("total"))), 4
            ).alias("mean_logprob"),
        )
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters: per-doc duplicate-2/3-gram
    ratios, the most-frequent-2-gram share, and token-level Shannon
    entropy, plus a combined ``flagged`` verdict.

    Entirely array expressions inside whole-stage codegen — no explode,
    no shuffle, no Python. Per doc the top-gram/entropy counts run on a
    SORTED copy of the gram array with a linear run-length ``aggregate``
    — O(len log len) per document (vs the naive filter-per-distinct-gram
    O(distinct x len): a 20k-token doc would cost ~10^8 comparisons in
    one row). Still the right trade at 100 TB: the alternative (explode
    tokens -> groupBy (doc, gram)) shuffles the whole corpus token
    stream for a per-row statistic.

    Thresholds follow the Gopher repetition-removal rules (dup 2-gram
    fraction > 0.2, dup 3-gram > 0.18, top-2-gram share > 0.18; the
    top-share rule only applies to docs with >= 10 2-grams, else a
    2-word doc trivially hits share 1.0). ``flagged`` compares the
    *rounded* values so engine parity is exact.
    """
    from ..functions.text import word_shingles

    # Materialize tokens and gram arrays as columns: word_shingles'
    # transform() lambda slices the token array per element, and a
    # lambda's outer sub-expressions are re-evaluated per element — an
    # inline tokens(text) there re-splits the document once per gram
    # position (O(len²) re-tokenization). Attribute refs are field reads.
    base = (
        df.withColumn("__t", tokens(text_col))
        .withColumn("__g2", word_shingles(F.col("__t"), 2))
        .withColumn("__g3", word_shingles(F.col("__t"), 3))
    )
    t, g2, g3 = F.col("__t"), F.col("__g2"), F.col("__g3")
    nt, n2, n3 = F.size(t), F.size(g2), F.size(g3)
    d2 = F.size(F.array_distinct(g2))
    d3 = F.size(F.array_distinct(g3))
    dup2 = round_half_up(
        F.when(n2 > 0, (n2 - d2) / n2).otherwise(F.lit(0.0)), 6
    )
    dup3 = round_half_up(
        F.when(n3 > 0, (n3 - d3) / n3).otherwise(F.lit(0.0)), 6
    )
    def _run_length_max(arr):
        # Longest run in a sorted array == max multiplicity, in one
        # linear pass: state (prev, current run, best run).
        zero = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        )

        def step(s, x):
            run = F.when(x == s["prev"], s["run"] + F.lit(1).cast("long")).otherwise(
                F.lit(1).cast("long")
            )
            return F.struct(
                x.alias("prev"), run.alias("run"), F.greatest(s["best"], run).alias("best")
            )

        return F.aggregate(F.array_sort(arr), zero, step, lambda s: s["best"])

    top2_cnt = _run_length_max(g2)
    top2 = round_half_up(
        F.when(n2 > 0, top2_cnt / n2).otherwise(F.lit(0.0)), 6
    )

    # Shannon entropy from run lengths of the sorted token array, via
    # H = log2(nt) - (Σ c·log2 c)/nt. CRITICAL: the lambda accumulates
    # only run*log2(run) and references NO outer expression — Catalyst
    # evaluates higher-order-function lambdas interpretively, and any
    # outer sub-expression (e.g. size(tokens(text))) would be recomputed
    # PER ELEMENT, re-tokenizing the whole document len(t) times.
    def _c_log_c(run):
        return F.when(run > 1, run * F.log2(run)).otherwise(F.lit(0.0))

    _ent_zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0.0).alias("acc"),
    )

    def _ent_step(s, x):
        same = x == s["prev"]
        return F.struct(
            x.alias("prev"),
            F.when(same, s["run"] + F.lit(1).cast("long"))
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.when(same, s["acc"]).otherwise(s["acc"] + _c_log_c(s["run"])).alias("acc"),
        )

    sum_c_log_c = F.aggregate(
        F.array_sort(t), _ent_zero, _ent_step, lambda s: s["acc"] + _c_log_c(s["run"])
    )
    entropy = round_half_up(
        F.when(nt > 0, F.log2(nt) - sum_c_log_c / nt).otherwise(F.lit(0.0)), 6
    )
    out = base.select(
        F.col(id_col),
        n2.alias("n_2grams"),
        dup2.alias("dup_2gram_ratio"),
        dup3.alias("dup_3gram_ratio"),
        top2.alias("top_2gram_share"),
        entropy.alias("token_entropy"),
    )
    return out.withColumn(
        "flagged",
        (F.col("dup_2gram_ratio") > 0.2)
        | (F.col("dup_3gram_ratio") > 0.18)
        | ((F.col("n_2grams") >= 10) & (F.col("top_2gram_share") > 0.18)),
    )


def bigram_next_token_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_prefixes: int = 20,
    k: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Corpus bigram language model, read out as the top-``k`` next
    tokens for the ``top_prefixes`` most frequent prefix words.

    The explode is corpus-sized by nature (an LM build touches every
    token) but hash aggregation combines (w1, w2) counts map-side
    before the single shuffle; both rankings then run on vocabulary-
    sized data — the prefix table re-joins as a broadcast. Ties break
    lexicographically so the read-out is deterministic.
    """
    from pyspark.sql import Window

    # __t is a materialized column: the transform() lambda below reads
    # element_at(__t, i+2) per element — with an inline tokens()
    # expression that would re-split the document per bigram position.
    t = F.col("__t")
    grams = F.transform(
        F.slice(t, 1, F.greatest(F.lit(0), F.size(t) - 1)),
        lambda x, i: F.struct(
            x.alias("w1"), F.element_at(t, i + F.lit(2)).alias("w2")
        ),
    )
    pairs = (
        df.withColumn("__t", tokens(text_col))
        .select(F.explode(grams).alias("g"))
        .select("g.w1", "g.w2")
    )
    # pc feeds two consumers (the prefix-total ranking and the per-prefix
    # read-out); without persist each branch re-runs the corpus-sized
    # explode+aggregate. The persisted table is vocabulary-sized.
    pc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .persist()
    )
    # Top-N prefixes via orderBy().limit() — TakeOrderedAndProject keeps a
    # bounded heap per partition and merges N rows on the driver. (A
    # row_number over an UNPARTITIONED window would drag the whole
    # vocabulary — 10^8+ rows on a web corpus — through one task.)
    prefix_rank = (
        pc.groupBy("w1")
        .agg(F.sum("pair_count").alias("__tot"))
        .orderBy(F.col("__tot").desc(), F.col("w1"))
        .limit(top_prefixes)
        .select("w1")
    )
    ranked = pc.join(F.broadcast(prefix_rank), "w1").withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("w1").orderBy(
                F.col("pair_count").desc(), F.col("w2")
            )
        ),
    )
    out = ranked.filter(F.col("rnk") <= k).select(
        "w1", "w2", "pair_count", "rnk"
    )
    if materialize:
        # The result is bounded (top_prefixes·k rows): materialize it
        # eagerly so the vocabulary-sized pair-count cache can be released
        # before returning — long-lived sessions (the driver gate runs
        # queries back-to-back without clearCache) must not accumulate
        # per-query cached storage (ADVICE r03). ``materialize=False``
        # returns the lazy plan (caller owns the pc cache) — used by the
        # plan-quality pin, which needs to inspect the physical plan.
        out = out.localCheckpoint(eager=True)
        pc.unpersist()
    return out


def bpe_merge_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
) -> DataFrame:
    """First BPE iteration: the ``top_k`` most frequent adjacent
    character pairs inside words — the merge candidates a byte-pair
    tokenizer would learn first from this corpus (no end-of-word marker;
    single-char words contribute nothing).

    The word explode is corpus-sized (tokenizer induction reads every
    token); pair counts partial-aggregate map-side, and the final top-k
    is orderBy().limit() — TakeOrderedAndProject, never a global window.
    The pair lambda reads ``substr(w, i, 2)`` against the word COLUMN
    (attribute ref — an inline expression there would re-derive the word
    per character position).
    """
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(top_k)
    )


def bpe_apply_merge_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
) -> DataFrame:
    """Second BPE step: APPLY the corpus' ``top_k`` merge candidates
    (``bpe_merge_candidates``) to every word with the tokenizer's greedy
    left-to-right single-pass rule — a merged pair consumes both
    characters, so the next candidate position is skipped — and report
    the per-document compression: symbols before, merges applied,
    symbols after.

    The sequential greedy scan is a FOLD, not a join: per word,
    ``aggregate`` over the candidate positions with an integer-encoded
    accumulator (``acc = 2·count + skip``) runs inside whole-stage
    codegen — no per-position explode, no window, no shuffle beyond the
    one merge-table broadcast. State per row is one int; the same
    expression runs unchanged on a 100 TB corpus.
    """
    merge_list = (
        bpe_merge_candidates(df, text_col, id_col, top_k)
        .agg(F.collect_list("pair").alias("__merges"))
    )
    # Per word w: fold i = 1..len(w)-1; skip-bit set ⇒ position consumed
    # by the previous merge. Encoded acc: count*2 + skip.
    with_m = df.crossJoin(F.broadcast(merge_list))
    merges = F.col("__merges")
    word_merges = lambda w: F.aggregate(
        F.when(F.length(w) >= 2, F.sequence(F.lit(1), F.length(w) - 1)).otherwise(
            F.array().cast("array<int>")
        ),
        F.lit(0),
        lambda acc, i: F.when(acc % 2 == 1, acc - 1)
        .when(F.array_contains(merges, w.substr(i, F.lit(2))), acc + 3)
        .otherwise(acc),
    )
    t = F.col("__t")
    per_word = F.transform(t, lambda w: F.floor(word_merges(w) / 2))
    stats = with_m.withColumn("__t", tokens(text_col)).select(
        F.col(id_col),
        F.aggregate(
            F.transform(t, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
        ).alias("n_symbols"),
        F.aggregate(per_word, F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "n_merges"
        ),
    )
    return stats.select(
        id_col,
        F.col("n_symbols").cast("bigint").alias("n_symbols"),
        F.col("n_merges"),
        (F.col("n_symbols") - F.col("n_merges")).cast("bigint").alias("n_after"),
        round_half_up(
            F.when(F.col("n_symbols") > 0, F.col("n_merges") / F.col("n_symbols"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("compression"),
    )


def vocab_growth_curve(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 20,
) -> DataFrame:
    """Heaps'-law curve: cumulative distinct vocabulary after each
    ingestion-order slice (``n_buckets`` equal doc-id ranges) — the
    "is more crawl still buying new vocabulary?" read-out.

    The naive formulation (count distinct terms over an expanding
    window) is quadratic. This one is linear: a term's FIRST document
    (min doc id — one shuffle on term) attributes each term to exactly
    one bucket; new-terms-per-bucket + docs-per-bucket are tiny
    aggregates, and the cumulative sum runs over ``n_buckets`` rows —
    bounded output regardless of corpus size.
    """
    from pyspark.sql import Window

    mx = df.agg(F.max(F.col(id_col)).alias("__mx"))
    bucket = lambda c: F.least(
        F.lit(n_buckets - 1), F.floor(c * n_buckets / (F.col("__mx") + 1))
    ).cast("int")
    firsts = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.min(id_col).alias("first_doc"))
    )
    new_terms = (
        firsts.crossJoin(F.broadcast(mx))
        .groupBy(bucket(F.col("first_doc")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_new_terms"))
    )
    docs = (
        df.crossJoin(F.broadcast(mx))
        .groupBy(bucket(F.col(id_col)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    joined = docs.join(new_terms, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        F.coalesce("n_new_terms", F.lit(0)).alias("n_new_terms"),
    )
    # unpartitioned window is safe here: input bounded at n_buckets rows
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return joined.withColumn("cum_vocab", F.sum("n_new_terms").over(w))


def domain_quality_percentiles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """Per-domain quality calibration: each document's percent_rank of
    the heuristic quality score WITHIN its domain — the normalization
    that makes one global threshold meaningful across domains whose raw
    score distributions differ (a 0.6 from a boilerplate-heavy domain is
    not a 0.6 from curated text).

    percent_rank partitions by domain — per-domain sorts, no global
    window; ties (equal scores) share a rank in every engine.
    """
    from pyspark.sql import Window

    q = quality_columns(text_col)
    scored = df.select(
        F.col(id_col), F.col(domain_col), q["quality"].alias("quality")
    )
    w = Window.partitionBy(domain_col).orderBy("quality")
    return scored.select(
        id_col,
        domain_col,
        "quality",
        round_half_up(F.percent_rank().over(w), 6).alias("quality_pct"),
    )


def bigram_perplexity_heldout(
    df: DataFrame,
    heldout_source: str = "src0",
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perplexity-based quality scoring with a REAL train/heldout split:
    an add-one-smoothed bigram LM is fit on every document whose
    ``source_col`` != ``heldout_source``, then each held-out document is
    scored — per doc: bigram count, mean negative log2 likelihood, and
    perplexity. The standard model-based quality filter (docs the corpus
    LM finds surprising are boilerplate, garbled, or off-domain).

    Determinism contract: each bigram's -log2 P is rounded to 6dp (log2
    ulp differences between engines sit ~9 orders below that grid), the
    per-doc sum accumulates in exact decimal, and the perplexity rounds
    at 4dp — every stage engine-portable. Scale shape: the LM tables are
    vocabulary-sized aggregates joined back onto the held-out pair
    stream (corpus-linear, two shuffles); V and N broadcast as 1-row
    aggregates.
    """
    t = F.col("__t")
    grams = F.transform(
        F.slice(t, 1, F.greatest(F.lit(0), F.size(t) - 1)),
        lambda x, i: F.struct(
            x.alias("w1"), F.element_at(t, i + F.lit(2)).alias("w2")
        ),
    )

    def pair_stream(frame):
        return (
            frame.withColumn("__t", tokens(text_col))
            .select(F.col(id_col), F.explode(grams).alias("g"))
            .select(F.col(id_col), F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        )

    train = df.filter(F.col(source_col) != heldout_source)
    heldout = df.filter(F.col(source_col) == heldout_source)

    c12 = pair_stream(train).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    vocab = (
        train.withColumn("__t", tokens(text_col))
        .select(F.explode("__t").alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )

    pairs = (
        pair_stream(heldout)
        .join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
    )
    p = (F.coalesce(F.col("c12"), F.lit(0)) + 1) / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")
    )
    nll = round_half_up(-F.log2(p), 6)
    per_doc = pairs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(nll.cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__avg"),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        round_half_up(F.col("__avg"), 6).alias("avg_nll"),
        round_half_up(F.pow(F.lit(2.0), F.col("__avg")), 4).alias("perplexity"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 30,
) -> DataFrame:
    """Collocation mining: top-``k`` adjacent token pairs by pointwise
    mutual information, PMI = ln(p(w1,w2) / (p(w1)·p(w2))), restricted
    to pairs seen at least ``min_count`` times (unsmoothed PMI explodes
    on hapax pairs). The phrase-discovery pass a tokenizer/vocab
    pipeline runs to decide what deserves a single token.

    Two corpus scans (unigram and bigram counts), both hash-aggregated
    map-side before their single shuffle; the PMI join keys on the
    vocabulary-sized count tables (shuffle equi-joins on w1/w2 — never
    corpus-sized), totals return as one broadcast row, and the read-out
    is orderBy().limit(k) — TakeOrderedAndProject, no global window.
    """
    t = F.col("__t")
    grams = F.transform(
        F.slice(t, 1, F.greatest(F.lit(0), F.size(t) - 1)),
        lambda x, i: F.struct(
            x.alias("w1"), F.element_at(t, i + F.lit(2)).alias("w2")
        ),
    )
    pairs = (
        df.withColumn("__t", tokens(text_col))
        .select(F.explode(grams).alias("g"))
        .select("g.w1", "g.w2")
    )
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    uc = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    totals = pc.agg(F.sum("pair_count").alias("n2")).crossJoin(
        uc.agg(F.sum("wc").alias("n1"))
    )
    scored = (
        pc.filter(F.col("pair_count") >= min_count)
        .join(uc.select(F.col("w").alias("w1"), F.col("wc").alias("c1")), "w1")
        .join(uc.select(F.col("w").alias("w2"), F.col("wc").alias("c2")), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.log(
                (F.col("pair_count") / F.col("n2"))
                / ((F.col("c1") / F.col("n1")) * (F.col("c2") / F.col("n1")))
            ).alias("__pmi"),
        )
    )
    from ..functions.numeric import round_half_up

    return scored.orderBy(
        F.col("__pmi").desc(), F.col("w1"), F.col("w2")
    ).limit(k).select(
        "w1", "w2", "pair_count", round_half_up(F.col("__pmi"), 6).alias("pmi")
    )


_QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# Hand-set logistic weights: (bias, mean_word_len, stopword_ratio,
# digit_ratio, long_word_ratio). Stands in for a trained fastText-style
# quality classifier — the SHAPE (featurize + linear + sigmoid, all
# codegen) is what scales; swap the constants for learned ones.
_QUALITY_WEIGHTS = (-1.0, 0.3, 2.0, -4.0, -1.5)


def quality_classifier_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Model-based quality scoring at corpus scale: a logistic
    classifier over cheap lexical features (mean word length, stopword
    ratio, digit-character ratio, long-word ratio), scored entirely in
    JVM codegen — the distributed-inference pattern for any linear/GLM
    text filter. One scan, no shuffle, no UDF: featurization is array
    aggregates over the token column, the model is a dot product.
    """
    from ..functions.numeric import round_half_up

    t = F.col("__t")
    n_tok = F.size(t)
    char_sum = F.aggregate(
        t, F.lit(0), lambda acc, x: acc + F.length(x)
    ).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in _QUALITY_STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    n_long = F.size(F.filter(t, lambda x: F.length(x) > 7))
    n_digit = F.length(F.regexp_replace(F.col(text_col), "[^0-9]", ""))
    n_chars = F.length(F.col(text_col))
    b, w_len, w_stop, w_dig, w_long = _QUALITY_WEIGHTS
    feats = df.filter(F.size(tokens(text_col)) > 0).withColumn(
        "__t", tokens(text_col)
    ).select(
        F.col(id_col),
        (char_sum / n_tok).alias("mean_word_len"),
        (n_stop / n_tok.cast("double")).alias("stopword_ratio"),
        (n_digit / n_chars.cast("double")).alias("digit_ratio"),
        (n_long / n_tok.cast("double")).alias("long_word_ratio"),
    )
    z = (
        F.lit(b)
        + F.lit(w_len) * F.col("mean_word_len")
        + F.lit(w_stop) * F.col("stopword_ratio")
        + F.lit(w_dig) * F.col("digit_ratio")
        + F.lit(w_long) * F.col("long_word_ratio")
    )
    return feats.select(
        id_col,
        round_half_up(F.col("mean_word_len"), 6).alias("mean_word_len"),
        round_half_up(F.col("stopword_ratio"), 6).alias("stopword_ratio"),
        round_half_up(F.col("digit_ratio"), 6).alias("digit_ratio"),
        round_half_up(F.col("long_word_ratio"), 6).alias("long_word_ratio"),
        round_half_up(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias(
            "quality_prob"
        ),
    )


def language_confusion(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Language-ID eval against labeled ground truth: the confusion
    matrix (true lang × detected lang) with each cell's share of its
    true language — the accept/reject evidence for the lang-id heuristic
    before it routes a corpus mixture. One scan (the detector is a pure
    codegen expression), one dimension-sized groupBy, and a broadcast
    join against per-language totals for the shares.
    """
    from ..functions.numeric import round_half_up

    cols = language_columns(text_col)
    scored = df.select(
        F.col(lang_col), cols["detected_lang"].alias("detected_lang")
    )
    cell = scored.groupBy(lang_col, "detected_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = scored.groupBy(lang_col).agg(F.count(F.lit(1)).alias("__tot"))
    return cell.join(F.broadcast(totals), lang_col).select(
        lang_col,
        "detected_lang",
        "n_docs",
        round_half_up(F.col("n_docs") / F.col("__tot"), 6).alias(
            "share_of_lang"
        ),
    )


def quality_signal_ensemble(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """Ensemble two independent quality signals — the logistic
    classifier (``quality_classifier_score``) and the unigram LM
    log-probability — by PER-DOMAIN rank normalization: each signal
    becomes its percent_rank within the document's domain, and the
    blend is their mean. Rank-blending is how production filters
    combine heuristic + model scores without calibrating either; the
    per-domain partitioning both matches how thresholds get applied
    (within a source) and keeps every ranking window PARTITIONED — no
    global sort at any corpus size.

    Ties are broken by doc id inside the window ordering, so
    percent_rank is a total order and the blend is deterministic.
    """
    from pyspark.sql import Window

    from ..functions.numeric import round_half_up

    clf = quality_classifier_score(df, text_col, id_col).select(
        F.col(id_col), F.col("quality_prob")
    )
    t = F.col("__t")
    base = df.withColumn("__t", tokens(text_col)).filter(F.size(t) > 0)
    # unigram logprob: mean ln(corpus_freq / corpus_total) over tokens
    uni = base.select(F.col(id_col), F.explode(t).alias("w"))
    counts = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("tot"))
    lp = (
        uni.join(counts, "w")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            round_half_up(
                F.avg(F.log(F.col("c") / F.col("tot"))), 6
            ).alias("mean_logprob")
        )
    )
    doms = df.select(F.col(id_col), F.col(domain_col))
    scored = doms.join(clf, id_col).join(lp, id_col)
    w_clf = Window.partitionBy(domain_col).orderBy(
        F.col("quality_prob"), F.col(id_col)
    )
    w_lm = Window.partitionBy(domain_col).orderBy(
        F.col("mean_logprob"), F.col(id_col)
    )
    return scored.select(
        F.col(id_col),
        F.col(domain_col),
        round_half_up(F.percent_rank().over(w_clf), 6).alias("clf_rank"),
        round_half_up(F.percent_rank().over(w_lm), 6).alias("lm_rank"),
    ).select(
        id_col,
        domain_col,
        "clf_rank",
        "lm_rank",
        round_half_up((F.col("clf_rank") + F.col("lm_rank")) / 2.0, 6).alias(
            "blended_rank"
        ),
    )


def term_zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """Zipf's-law fit over the corpus rank-frequency curve: least-squares
    slope/intercept of ln(freq) ~ ln(rank) over the ``top_n`` most
    frequent terms, plus Pearson r — the standard sanity probe that a
    scraped corpus has natural-language token statistics (machine-
    generated or template spam bends the curve; |slope| far from ~1 is
    the red flag).

    Scale shape: one token-count aggregate (map-side combined), then
    ``orderBy().limit(top_n)`` — TakeOrderedAndProject, per-partition
    heaps, never a global sort — then rank over the top_n-row slice and
    a single closed-form regression aggregate (cov/var, no iteration).
    Ties rank deterministically by (freq desc, term asc) in both
    engines.
    """
    freqs = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(top_n)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("c").desc(), F.col("w"))
    # The window runs over the top_n-row LIMIT result (bounded, driver-
    # sized) — not over the full vocab.
    ranked = freqs.select(
        F.log(F.row_number().over(w).cast("double")).alias("lnr"),
        F.log(F.col("c").cast("double")).alias("lnf"),
    )
    # Pearson r is guarded explicitly: a degenerate corpus with all-equal
    # frequencies has var(lnf) = 0, where built-in corr() raises under
    # ANSI mode — the guard returns NULL, matching DuckDB's corr().
    pearson = F.when(
        F.var_pop("lnf") > 0,
        F.covar_pop("lnr", "lnf")
        / F.sqrt(F.var_pop("lnr") * F.var_pop("lnf")),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        round_half_up(
            F.covar_pop("lnr", "lnf") / F.var_pop("lnr"), 6
        ).alias("slope"),
        round_half_up(
            F.avg("lnf") - F.covar_pop("lnr", "lnf") / F.var_pop("lnr") * F.avg("lnr"),
            6,
        ).alias("intercept"),
        round_half_up(pearson, 6).alias("pearson_r"),
    )


def script_char_stats(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Per-group character-class profile: mean fraction of letters,
    digits, whitespace, punctuation/other — the cheap script/encoding
    screen that catches mojibake, base64 blobs, and wrong-language
    buckets before any model-based language ID runs.

    Pure codegen: each class count is a regexp_replace length delta on
    the raw text (one scan, no explode); the group aggregate is
    map-side combined. Class definitions are ASCII-anchored so the
    DuckDB oracle reproduces them bit-for-bit.
    """
    n = F.length(text_col).cast("double")
    letters = n - F.length(F.regexp_replace(F.col(text_col), "[A-Za-z]", ""))
    digits = n - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))
    spaces = n - F.length(F.regexp_replace(F.col(text_col), r"[ \t\n]", ""))
    per_doc = df.filter(n > 0).select(
        F.col(group_col),
        (letters / n).alias("f_letter"),
        (digits / n).alias("f_digit"),
        (spaces / n).alias("f_space"),
        ((n - letters - digits - spaces) / n).alias("f_other"),
    )
    return per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        round_half_up(F.avg("f_letter"), 6).alias("mean_letter_frac"),
        round_half_up(F.avg("f_digit"), 6).alias("mean_digit_frac"),
        round_half_up(F.avg("f_space"), 6).alias("mean_space_frac"),
        round_half_up(F.avg("f_other"), 6).alias("mean_other_frac"),
    )


def domain_term_entropy(
    df: DataFrame,
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """Per-domain unigram distribution audit: Shannon entropy of the
    domain's term distribution and its KL divergence from the whole-
    corpus distribution — the "is this source statistically weird"
    screen behind mixture reweighting (a near-zero-entropy domain is
    template spam; a high-KL domain needs its own mixture weight).

    Two aggregates over one exploded token table: (domain, term) counts,
    then per-domain entropy/KL folds with the corpus totals broadcast.
    KL is well-defined here because every domain term is by construction
    in the corpus distribution (support containment). Results round to
    4 decimals — the same tolerance the driver-green unigram_logprob
    query uses for order-dependent double log-sums.
    """
    dt = (
        df.select(F.col(domain_col), F.explode(tokens(text_col)).alias("w"))
        .groupBy(domain_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    corpus = dt.groupBy("w").agg(F.sum("c").alias("cc"))
    dom_tot = dt.groupBy(domain_col).agg(F.sum("c").alias("dtot"))
    corp_tot = corpus.agg(F.sum("cc").alias("ctot"))
    p = F.col("c") / F.col("dtot")
    q = F.col("cc") / F.col("ctot")
    return (
        dt.join(F.broadcast(dom_tot), domain_col)
        .join(corpus, "w")
        .crossJoin(F.broadcast(corp_tot))
        .groupBy(domain_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            round_half_up(-F.sum(p * F.log(p)), 4).alias("entropy"),
            round_half_up(F.sum(p * F.log(p / q)), 4).alias("kl_vs_corpus"),
        )
    )


_BPE_SEP = "\x1f"  # unit separator — cannot occur in whitespace tokens


def bpe_train_merges(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rounds: int = 3,
) -> DataFrame:
    """TRUE sequential BPE training for ``rounds`` merges: unlike
    ``bpe_merge_candidates`` (one frequency snapshot), each round
    re-counts adjacent SYMBOL pairs after the previous merge has been
    applied, so round 2 can pick a pair containing round 1's new symbol
    — the actual tokenizer-induction recurrence (Sennrich et al.'s
    algorithm, re-expressed distributed).

    State is the WORD VOCABULARY (word, count, symbol sequence), never
    the corpus: pair counts weight by word frequency, so a 100 TB corpus
    costs one token-count aggregate up front and each round touches only
    vocab-sized rows. Symbol sequences are separator-joined strings and
    the merge application is a string FOLD inside codegen (append the
    right symbol without a separator when the accumulator ends with the
    left symbol) — no explode, no shuffle in the apply step; identical
    list_reduce semantics in the DuckDB oracle. Each round does one
    pair-count aggregate + ``orderBy().limit(1)`` argmax (a 1-row driver
    fetch — the same bounded-scalar class as the manifest collects) and
    ends in an eager ``localCheckpoint``.

    Ties on pair count break by (left, right) ascending — deterministic
    in both engines. Output: one row per learned merge:
    (round, lsym, rsym, merged, pair_count).
    """
    spark = df.sparkSession
    sep = _BPE_SEP
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "c",
            F.concat_ws(
                sep,
                F.transform(
                    F.sequence(F.lit(1), F.length("w")),
                    lambda i: F.col("w").substr(i, F.lit(1)),
                ),
            ).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    learned = []
    for rnd in range(1, rounds + 1):
        syms = vocab.withColumn("l", F.split("s", sep))
        # sequence(1, 0) DESCENDS in Spark — guard single-symbol words
        # with an explicit empty array (the word_shingles lesson).
        pair_positions = F.when(
            F.size("l") >= 2, F.sequence(F.lit(1), F.size("l") - 1)
        ).otherwise(F.array().cast("array<int>"))
        pairs = syms.select(
            "c",
            F.explode(
                F.transform(
                    pair_positions,
                    lambda i: F.struct(
                        F.element_at(F.col("l"), i).alias("lsym"),
                        F.element_at(F.col("l"), i + 1).alias("rsym"),
                    ),
                )
            ).alias("p"),
        )
        best_rows = (
            pairs.groupBy("p.lsym", "p.rsym")
            .agg(F.sum("c").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("lsym"), F.col("rsym"))
            .limit(1)
            .collect()
        )
        if not best_rows:
            break
        b = best_rows[0]
        lsym, rsym, cnt = b["lsym"], b["rsym"], int(b["cnt"])
        learned.append((rnd, lsym, rsym, lsym + rsym, cnt))
        suffix = sep + lsym
        fold = lambda acc, x: F.when(
            ((acc == F.lit(lsym)) | acc.endswith(suffix)) & (x == F.lit(rsym)),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(sep), x))
        vocab = (
            syms.select(
                "c",
                F.aggregate(
                    F.slice(F.col("l"), 2, F.greatest(F.size("l") - 1, F.lit(0))),
                    F.element_at(F.col("l"), 1),
                    fold,
                ).alias("s"),
            )
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        learned,
        "round int, lsym string, rsym string, merged string, pair_count bigint",
    )


def vocab_coverage_curve(
    df: DataFrame,
    text_col: str = "text",
    vocab_sizes: tuple = (100, 1000, 10000),
) -> DataFrame:
    """Token-mass coverage of a top-N vocabulary, for several N: what
    fraction of all token occurrences the N most frequent terms cover —
    the table behind every "how big does the vocab need to be" decision
    (closed-vocab models, OOV budgets, stopword cutoffs). The cumulative
    companion to ``vocabulary_oov_rate`` (which fixes one N).

    One token-count aggregate; the candidate slice is
    ``orderBy().limit(max(N))`` (TakeOrderedAndProject, bounded), ranked
    by (freq desc, term) over that bounded slice only; the three
    coverages come from ONE conditional aggregate over the slice plus
    the broadcast corpus total.
    """
    from pyspark.sql import Window

    top_n = max(vocab_sizes)
    freqs = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = freqs.agg(F.sum("c").alias("tot"))
    top = freqs.orderBy(F.col("c").desc(), F.col("w")).limit(top_n)
    w = Window.orderBy(F.col("c").desc(), F.col("w"))
    ranked = top.withColumn("rnk", F.row_number().over(w))
    covered = ranked.agg(
        *[
            F.sum(F.when(F.col("rnk") <= n, F.col("c")).otherwise(F.lit(0)))
            .alias(f"cov_{n}")
            for n in vocab_sizes
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(n).alias("vocab_size"),
                F.col(f"cov_{n}").alias("covered_tokens"),
            )
            for n in vocab_sizes
        ]
    )
    return (
        covered.crossJoin(F.broadcast(total))
        .select(F.explode(rows).alias("r"), "tot")
        .select(
            F.col("r.vocab_size").alias("vocab_size"),
            F.col("r.covered_tokens").alias("covered_tokens"),
            round_half_up(F.col("r.covered_tokens") / F.col("tot"), 6).alias(
                "coverage"
            ),
        )
    )


def tokenizer_fertility(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility by group: regex ("BPE-ish") tokens per
    whitespace word — THE comparative metric for how expensive a
    language/domain is to tokenize (fertility ≈ 1 for space-delimited
    prose, ≫1 for punctuation-dense or unsegmented text), and the
    first column of any multilingual token-budget plan.

    One codegen projection (the same two counters as ``token_stats``),
    one bounded per-group aggregate; fertility is a ratio of exact
    integer sums, so it is engine- and partitioning-deterministic.
    """
    from ..functions.numeric import round_half_up
    from ..functions.text import tokens

    t = tokens(text_col)
    per_doc = df.select(
        F.col(group_col),
        F.size(t).alias("ws"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(_BPE_RE), 0)
        ).alias("re_"),
    )
    return per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ws").alias("n_ws_tokens"),
        F.sum("re_").alias("n_re_tokens"),
        round_half_up(F.sum("re_") / F.sum("ws"), 6).alias("fertility"),
    )


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    digits: int = 6,
) -> DataFrame:
    """Per-document character-unigram Shannon entropy (nats) — the
    gibberish/encoding-junk detector that catches what word-level
    heuristics miss: base64 blobs and hex dumps score near-uniform
    high, repeated-character spam scores near zero, natural language
    sits in a narrow band.

    Characters are enumerated position-by-position (``sequence`` +
    ``substring`` — identical semantics in any engine, no split-on-
    empty-string edge cases), counted per (doc, char), and folded into
    −Σ p·ln p with 9-dp-rounded terms summed exactly. Row volume is
    n_chars total — linear, partitioned by doc.
    """
    from ..functions.numeric import dsum, round_half_up

    chars = df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length(text_col), F.lit(1)))
        ).alias("i"),
        F.col(text_col),
    ).select(
        F.col(id_col),
        F.col(text_col).substr(F.col("i"), F.lit(1)).alias("ch"),
    )
    counts = chars.groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy(id_col).agg(F.sum("c").alias("n"))
    term = round_half_up(
        -(F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n")), 9
    )
    return (
        counts.join(totals, id_col)
        .groupBy(id_col, "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
            round_half_up(dsum(term, 9), digits).alias("char_entropy"),
        )
        .select(
            id_col,
            F.col("n").alias("n_chars"),
            "n_distinct_chars",
            "char_entropy",
        )
    )


def js_divergence_sources(
    df: DataFrame,
    source_a: str,
    source_b: str,
    group_col: str = "source",
    text_col: str = "text",
    top_v: int = 500,
    digits: int = 6,
) -> DataFrame:
    """Jensen–Shannon divergence (nats; √JS is a metric, JS ≤ ln 2)
    between the term distributions of two sources over their combined
    top-``top_v`` vocabulary — the symmetric, bounded domain-shift
    number for "how differently do these two slices talk" (0 =
    identical usage, ln 2 = disjoint vocabularies).

    One term-count aggregate restricted to the two sources, a limit-v
    vocabulary cut (TakeOrderedAndProject — bounded output), probability
    terms from exact integer count ratios, and the JS fold with
    9-dp-rounded terms summed exactly. Zero-probability terms contribute
    their ½·q·ln 2 side exactly (handled by the CASE split, no
    smoothing).
    """
    from ..functions.numeric import dsum, round_half_up
    from ..functions.text import tokens

    tc = (
        df.filter(F.col(group_col).isin(source_a, source_b))
        .select(F.col(group_col).alias("g"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("term", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pivoted = tc.groupBy("term").agg(
        F.sum(F.when(F.col("g") == source_a, F.col("c")).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("g") == source_b, F.col("c")).otherwise(0)).alias("cb"),
    )
    vocab = pivoted.orderBy(
        F.desc(F.col("ca") + F.col("cb")), F.asc("term")
    ).limit(top_v)
    tot = vocab.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    wj = vocab.crossJoin(F.broadcast(tot)).select(
        (F.col("ca") / F.col("na")).alias("p"),
        (F.col("cb") / F.col("nb")).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2.0
    term = round_half_up(
        0.5
        * (
            F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
            + F.when(F.col("q") > 0, F.col("q") * F.log(F.col("q") / m)).otherwise(0.0)
        ),
        9,
    )
    return wj.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        round_half_up(dsum(term, 9), digits).alias("js_divergence"),
    ).select(
        F.lit(source_a).alias("source_a"),
        F.lit(source_b).alias("source_b"),
        "n_terms",
        "js_divergence",
    )


def lexical_diversity(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    digits: int = 6,
) -> DataFrame:
    """Per-group lexical diversity audit: token count, vocabulary size
    (types), type–token ratio, and the hapax-legomenon share (terms
    seen exactly once in the group) — the classic corpus-richness
    screen that flags template-stamped or boilerplate-heavy sources
    (low TTR, low hapax share) before they dominate a mixture.

    Two hash aggregates on the (group, term) projection — term counts,
    then per-group rollup (tokens = Σn, types = count, hapax =
    Σ[n=1]); the shared whitespace tokenizer keeps parity with every
    other text operator and the DuckDB oracle. No windows, no driver
    state; cost is one shuffle on (group, term), which is the minimum
    for an exact distinct-term tally.
    """
    term_counts = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg = term_counts.groupBy("grp").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("n") == 1).cast("long")).cast("long").alias("n_hapax"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_tokens",
        "n_types",
        "n_hapax",
        round_half_up(F.col("n_types") / F.col("n_tokens"), digits).alias(
            "type_token_ratio"
        ),
        round_half_up(F.col("n_hapax") / F.col("n_types"), digits).alias(
            "hapax_ratio"
        ),
    )


def readability_stats(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    digits: int = 6,
) -> DataFrame:
    """Per-group Flesch-reading-ease profile using fully deterministic
    proxies (whitespace words, ``[.!?]+`` sentence breaks, vowel-run
    syllables) — the readability screen a corpus pipeline uses to
    separate prose from code/tables/boilerplate before mixing. The
    proxies are regex-only so the score is reproducible in any engine;
    the CONSTANTS are standard Flesch (206.835 − 1.015·w/s −
    84.6·syll/w).

    Pure map-side regex counting (codegen, no UDFs) + one group
    aggregate; per-doc scores are 6-dp rounded then decimal-summed.
    """
    from ..functions.numeric import dsum, round_half_up

    w = F.size(tokens(text_col))
    snt = F.greatest(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[.!?]+"), 0)),
        F.lit(1),
    )
    syl = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[aeiou]+"), 0)
    )
    flesch = round_half_up(
        F.lit(206.835)
        - F.lit(1.015) * (w / snt)
        - F.lit(84.6) * (syl / w),
        digits,
    )
    per_doc = df.select(
        F.col(group_col).alias("grp"), w.alias("w"), flesch.alias("score")
    ).where(F.col("w") > 0)
    return per_doc.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        round_half_up(dsum("score", digits) / F.count(F.lit(1)), digits).alias(
            "mean_flesch"
        ),
        F.min("score").alias("min_flesch"),
        F.max("score").alias("max_flesch"),
    ).withColumnRenamed("grp", group_col)


def term_burstiness_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Church–Gale term burstiness leaderboard: for every term with
    document frequency >= ``min_df``, the mean within-document
    frequency E[tf | tf > 0] (= total_tf / df — how hard a term hits
    the docs it appears in) and the Fano factor var(tf)/mean(tf) over
    its containing documents; content terms burst (high Fano),
    function words spread uniformly (Fano ≈ 1 under Poisson). The
    top-k by burstiness is the topical-vocabulary extractor that
    needs no stopword list.

    One (term, doc) tf aggregate, one per-term integer moment rollup
    (Σtf, Σtf² — exact longs, order-independent), then TakeOrdered
    on (burstiness desc, term) — no windows, no joins.
    """
    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    mom = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("s1"),
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("s2"),
    )
    filt = mom.where(F.col("df") >= min_df)
    mean = F.col("s1").cast("double") / F.col("df").cast("double")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double")
        * F.col("s1").cast("double")
        / F.col("df").cast("double")
    ) / F.col("df").cast("double")
    scored = filt.select(
        "term",
        "df",
        F.col("s1").alias("total_tf"),
        round_half_up(mean, 6).alias("burstiness"),
        round_half_up(var / mean, 6).alias("fano_factor"),
    )
    return scored.orderBy(
        F.col("burstiness").desc(), "term"
    ).limit(top_k)


def heaps_law_fit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 20,
) -> DataFrame:
    """Heaps'-law exponent fit V = K·N^β over the ingestion-order
    vocabulary growth curve — the scalar companion to
    [vocab_growth_curve]: β (typically 0.4–0.6 for natural text)
    says how fast new vocabulary keeps arriving; β near 0 means the
    crawl is exhausted, β near 1 means noise/IDs are flooding the
    dictionary. Fit by OLS of ln V on ln N over the bounded curve.

    Same linear first-occurrence attribution as vocab_growth_curve
    (a term's min doc id picks its bucket — one shuffle), cumulative
    sums over the ``n_buckets``-row aggregate, then the OLS moments
    with 9-dp-rounded log terms decimal-summed (order- and
    engine-independent). Returns one row:
    (n_buckets_used, beta, k_coef, r2).
    """
    from pyspark.sql import Window
    from ..functions.numeric import dsum

    mx = df.agg(F.max(F.col(id_col)).alias("__mx"))
    bucket = lambda c: F.least(  # noqa: E731 — shared bucketing expr
        F.lit(n_buckets - 1), F.floor(c * n_buckets / (F.col("__mx") + 1))
    ).cast("int")
    firsts = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.min(id_col).alias("first_doc"))
    )
    new_terms = (
        firsts.crossJoin(F.broadcast(mx))
        .groupBy(bucket(F.col("first_doc")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_new_terms"))
    )
    toks = (
        df.crossJoin(F.broadcast(mx))
        .groupBy(bucket(F.col(id_col)).alias("bucket"))
        .agg(F.sum(F.size(tokens(text_col))).alias("n_tokens"))
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = (
        toks.join(new_terms, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_tokens", F.lit(0)).alias("nt"),
            F.coalesce("n_new_terms", F.lit(0)).alias("nv"),
        )
        .select(
            F.sum("nt").over(w).alias("cum_n"),
            F.sum("nv").over(w).alias("cum_v"),
        )
        .where((F.col("cum_n") > 0) & (F.col("cum_v") > 0))
    )
    pts = curve.select(
        round_half_up(F.log("cum_n"), 9).alias("x"),
        round_half_up(F.log("cum_v"), 9).alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        dsum("x", 9).alias("sx"),
        dsum("y", 9).alias("sy"),
        dsum(round_half_up(F.col("x") * F.col("x"), 9), 9).alias("sxx"),
        dsum(round_half_up(F.col("y") * F.col("y"), 9), 9).alias("syy"),
        dsum(round_half_up(F.col("x") * F.col("y"), 9), 9).alias("sxy"),
    )
    kk = F.col("k").cast("double")
    beta = (kk * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        kk * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    lnk = (F.col("sy") - beta * F.col("sx")) / kk
    r2num = kk * F.col("sxy") - F.col("sx") * F.col("sy")
    r2 = (r2num * r2num) / (
        (kk * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (kk * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select(
        F.col("k").alias("n_buckets_used"),
        round_half_up(beta, 6).alias("beta"),
        round_half_up(F.exp(lnk), 6).alias("k_coef"),
        round_half_up(r2, 6).alias("r2"),
    )


def language_id_margin(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Language-ID confidence audit: the margin between the best and
    second-best language scores per document, rolled up per detected
    language — margin 0 means the classifier flipped a coin (tie
    broken alphabetically), the docs any curation pass should route
    to a stronger model or drop. The standard "how sure was the
    cheap classifier" companion to the confusion matrix.

    One projection (5 array_intersect scores + a sort_array for the
    top-2 gap — all codegen), one bounded (lang, margin) rollup.
    """
    t = tokens(text_col)
    langs = sorted(LANG_STOPWORDS)
    score_arr = F.array(
        *[
            F.size(
                F.array_intersect(
                    F.array_distinct(t),
                    F.array([F.lit(w) for w in LANG_STOPWORDS[lang]]),
                )
            )
            for lang in langs
        ]
    )
    srt = F.sort_array(score_arr, asc=False)
    cols = language_columns(text_col)
    scored = df.select(
        cols["detected_lang"].alias("detected_lang"),
        (srt[0] - srt[1]).cast("long").alias("margin"),
    )
    return scored.groupBy("detected_lang", "margin").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


def token_length_histogram(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Token character-length histogram over the whole corpus (by
    OCCURRENCE, not distinct type) with per-length share — the other
    half of the tokenizer-planning pair next to fertility: where the
    mass sits tells you what a subword vocab must cover, and a heavy
    tail of 20+-char "tokens" is the classic URL/hash contamination
    signal.

    One explode + one bounded (length ≤ max token length) rollup
    with a 1-row total broadcast.
    """
    from ..functions.numeric import round_half_up

    lens = df.select(
        F.explode(tokens(text_col)).alias("t")
    ).select(F.length("t").alias("tok_len"))
    hist = lens.groupBy("tok_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    tot = hist.agg(F.sum("n_tokens").alias("__t"))
    return hist.crossJoin(F.broadcast(tot)).select(
        F.col("tok_len").cast("long").alias("tok_len"),
        "n_tokens",
        round_half_up(F.col("n_tokens") / F.col("__t"), 6).alias("share"),
    )


def perplexity_tercile_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document with the
    corpus-unigram LM (mean token log-probability, the same cheap
    perplexity proxy as ``unigram_logprob_score``), then split each
    language into head / middle / tail terciles by score and report the
    per-bucket population. CCNet keeps "head" (lowest perplexity =
    highest logprob) for LM training and drops "tail"; this operator is
    that routing decision as a first-class aggregate.

    Determinism: the per-doc score is rounded to 4 dp BEFORE ranking
    (the proven cross-engine granularity of ``unigram_logprob_score``)
    and the tercile is ``ntile(3)`` over (score DESC, doc_id) — a total
    order, so both engines split identically even at score ties.

    Scale shape: the LM fit is two term-keyed aggregates + one join
    (corpus-linear); the tercile window partitions BY LANGUAGE — state
    per partition is one row per doc of that language, and the ntile
    frame never crosses languages. Final output is 3 rows per language.
    """
    from pyspark.sql import Window

    terms = df.select(
        F.col(id_col), F.col(lang_col), F.explode(tokens(text_col)).alias("term")
    )
    freq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("total"))
    scored = (
        terms.join(freq, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col, lang_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            round_half_up(
                F.avg(F.log(F.col("c") / F.col("total"))), 4
            ).alias("score"),
        )
    )
    w = Window.partitionBy(lang_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    bucketed = scored.withColumn("__t", F.ntile(3).over(w)).withColumn(
        "bucket",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), F.col("__t")
        ),
    )
    return bucketed.groupBy(F.col(lang_col).alias("lang"), "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("score").alias("min_logprob"),
        F.max("score").alias("max_logprob"),
    )


def kneser_ney_bigram_score(
    df: DataFrame,
    heldout_source: str = "src0",
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram scoring of held-out documents —
    the estimator that actually wins LM evals (Chen & Goodman 1999),
    upgrading ``bigram_perplexity_heldout``'s add-one baseline: mass is
    subtracted by an absolute ``discount`` D from every seen bigram and
    redistributed via the CONTINUATION probability (how many distinct
    contexts a word completes, not how often it occurs):

        P(w2|w1) = max(c12 − D, 0)/c1 + (D·N1+(w1·)/c1)·Pcont(w2)
        Pcont(w2) = (N1+(·w2) + 1)/(T + V + 1)   [smoothed, never 0]
        unseen context w1 → P(w2|w1) = Pcont(w2)

    All LM quantities (c12, c1, N1+ forward/backward, T bigram types,
    V vocab) are INTEGER counts, so the double arithmetic runs on exact
    inputs and is engine-identical; per-pair −log2 P rounds at 6 dp
    then sums in exact decimal (the module's standard contract).

    Scale shape: identical to the add-one twin — vocabulary-sized count
    tables joined onto the held-out pair stream (corpus-linear), the
    two scalar totals broadcast as a 1-row aggregate.
    """
    t = F.col("__t")
    grams = F.transform(
        F.slice(t, 1, F.greatest(F.lit(0), F.size(t) - 1)),
        lambda x, i: F.struct(
            x.alias("w1"), F.element_at(t, i + F.lit(2)).alias("w2")
        ),
    )

    def pair_stream(frame):
        return (
            frame.withColumn("__t", tokens(text_col))
            .select(F.col(id_col), F.explode(grams).alias("g"))
            .select(F.col(id_col), F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        )

    train = df.filter(F.col(source_col) != heldout_source)
    heldout = df.filter(F.col(source_col) == heldout_source)

    c12 = pair_stream(train).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    ctx = c12.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count(F.lit(1)).alias("n1f"),  # N1+(w1·): distinct continuations
    )
    n1b = c12.groupBy("w2").agg(
        F.count(F.lit(1)).alias("n1b")  # N1+(·w2): distinct contexts
    )
    tv = c12.agg(F.count(F.lit(1)).alias("bt")).crossJoin(
        train.withColumn("__t", tokens(text_col))
        .select(F.explode("__t").alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )

    pairs = (
        pair_stream(heldout)
        .join(c12, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(n1b, "w2", "left")
        .crossJoin(F.broadcast(tv))
    )
    pcont = (F.coalesce(F.col("n1b"), F.lit(0)) + 1) / (
        F.col("bt") + F.col("v") + 1
    )
    d = F.lit(discount)
    seen_ctx = (
        F.greatest(F.coalesce(F.col("c12"), F.lit(0)) - d, F.lit(0.0))
        / F.col("c1")
        + d * F.col("n1f") / F.col("c1") * pcont
    )
    p = F.when(F.col("c1").isNotNull(), seen_ctx).otherwise(pcont)
    nll = round_half_up(-F.log2(p), 6)
    per_doc = pairs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(nll.cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__avg"),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        round_half_up(F.col("__avg"), 6).alias("avg_nll"),
        round_half_up(F.pow(F.lit(2.0), F.col("__avg")), 4).alias("perplexity"),
    )


def bigram_entropy_rate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    digits: int = 6,
) -> DataFrame:
    """Per-language information-theoretic profile: unigram entropy
    H(W), conditional bigram entropy rate H(W₂|W₁), and redundancy
    1 − H(W₂|W₁)/H(W) — how much each language's corpus is compressible
    by context, the Shannon diagnostic that separates natural text
    (redundancy ≈ 0.3–0.5) from shuffled or templated filler.

    Every probability is a ratio of integer counts; each −p·log2(p)
    term is rounded to 9 dp and summed as exact decimal (the standing
    round-then-decimal-sum rule), so both entropies are engine- and
    partitioning-identical.

    Scale shape: two vocabulary-sized count aggregates per language
    (unigram, bigram) with per-language totals joined back — never a
    corpus-sized shuffle after the counts; output is one row per
    language.
    """
    t = F.col("__t")
    grams = F.transform(
        F.slice(t, 1, F.greatest(F.lit(0), F.size(t) - 1)),
        lambda x, i: F.struct(
            x.alias("w1"), F.element_at(t, i + F.lit(2)).alias("w2")
        ),
    )
    toked = df.withColumn("__t", tokens(text_col))
    uni = (
        toked.select(F.col(lang_col).alias("lang"), F.explode("__t").alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    utot = uni.groupBy("lang").agg(F.sum("c").cast("bigint").alias("tu"))
    bi = (
        toked.select(F.col(lang_col).alias("lang"), F.explode(grams).alias("g"))
        .select("lang", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .groupBy("lang", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    c1 = bi.groupBy("lang", "w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    btot = bi.groupBy("lang").agg(F.sum("c12").cast("bigint").alias("tb"))

    h1_term = round_half_up(
        -(F.col("c") / F.col("tu")) * F.log2(F.col("c") / F.col("tu")), 9
    )
    h1 = (
        uni.join(utot, "lang")
        .groupBy("lang")
        .agg(
            F.max("tu").alias("n_tokens"),
            F.sum(h1_term.cast("decimal(28,9)")).cast("double").alias("__h1"),
        )
    )
    h2_term = round_half_up(
        -(F.col("c12") / F.col("tb")) * F.log2(F.col("c12") / F.col("c1")), 9
    )
    h2 = (
        bi.join(c1, ["lang", "w1"])
        .join(btot, "lang")
        .groupBy("lang")
        .agg(
            F.max("tb").alias("n_bigrams"),
            F.sum(h2_term.cast("decimal(28,9)")).cast("double").alias("__h2"),
        )
    )
    return (
        h1.join(h2, "lang")
        .select(
            "lang",
            "n_tokens",
            "n_bigrams",
            round_half_up(F.col("__h1"), digits).alias("h_unigram"),
            round_half_up(F.col("__h2"), digits).alias("h_bigram_cond"),
            round_half_up(1 - F.col("__h2") / F.col("__h1"), digits).alias(
                "redundancy"
            ),
        )
    )


def rake_keywords(
    df: DataFrame,
    stopwords: list[str],
    k: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
    digits: int = 6,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are the maximal stopword-free token runs; each word scores
    degree/frequency (degree = Σ length of phrases containing it —
    words that live in long multi-word phrases outrank equally-frequent
    loners) and a phrase scores the sum of its words — the unsupervised
    keyword miner that needs nothing but a stopword list.

    Determinism: freq/degree are integers, word scores are ratios of
    integers rounded at 9 dp, phrase scores decimal-sum those terms;
    the read-out is top-``k`` by (score DESC, phrase) via
    orderBy().limit — a total order both engines share.

    Scale shape: phrase segmentation is a DOC-PARTITIONED running
    count of stopword separators (never a global window), phrase/word
    statistics are vocabulary-sized aggregates, and the final ranking
    is TakeOrderedAndProject over the phrase aggregate.
    """
    from pyspark.sql import Window

    pos = (
        df.withColumn("__t", tokens(text_col))
        .select(F.col(id_col), F.posexplode("__t").alias("pos", "tok"))
        .withColumn("__stop", F.col("tok").isin(stopwords).cast("int"))
    )
    wrun = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = pos.withColumn("run", F.sum("__stop").over(wrun)).filter(
        F.col("__stop") == 0
    )
    phrases = runs.groupBy(id_col, "run").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    words = phrases.select(
        "phrase", "plen", F.explode(F.split("phrase", " ")).alias("w")
    )
    wstats = words.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").cast("bigint").alias("deg"),
    )
    wscore = round_half_up(F.col("deg") / F.col("freq"), 9)
    uniq = (
        phrases.select("phrase")
        .distinct()
        .select("phrase", F.explode(F.split("phrase", " ")).alias("w"))
    )
    pscores = (
        uniq.join(wstats, "w")
        .groupBy("phrase")
        .agg(F.sum(wscore.cast("decimal(28,9)")).cast("double").alias("__s"))
    )
    pfreq = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    scored = (
        pscores.join(pfreq, "phrase")
        .select(
            "phrase",
            "n_occurrences",
            round_half_up(F.col("__s"), digits).alias("rake_score"),
        )
    )
    return scored.orderBy(F.desc("rake_score"), F.asc("phrase")).limit(k)


def quality_margin_sample(
    df: DataFrame,
    threshold: float = 0.5,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Margin (uncertainty) sampling for quality-filter curation: the
    ``k`` documents whose heuristic quality score sits CLOSEST to the
    decision ``threshold`` — exactly the docs where the cheap filter is
    least sure and a human label (or an LLM judge) buys the most
    information; the active-learning batch-selection step of a
    data-curation loop.

    Margin = |quality − threshold| on the already-rounded score, ties
    broken on the doc id; read-out is orderBy().limit —
    TakeOrderedAndProject, a distributed partial top-k at any corpus
    size.
    """
    from ..functions.numeric import round_half_up

    scored = quality_score(df, text_col, id_col).select(
        F.col(id_col),
        "quality",
        round_half_up(F.abs(F.col("quality") - threshold), 9).alias("margin"),
    )
    return scored.orderBy(F.asc("margin"), F.asc(id_col)).limit(k)


def chargram_lang_id_confusion(
    df: DataFrame,
    n: int = 3,
    profile_k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Character-n-gram language identification (Cavnar & Trenkle
    1994), evaluated against the corpus's own language tags: build each
    tagged language's profile (top-``profile_k`` char ``n``-grams by
    corpus count, ties alphabetical), score every document by how many
    of its DISTINCT n-grams hit each profile, assign the argmax
    (ties alphabetical), and report the tagged-vs-predicted confusion
    matrix — the method-diversity check against the stopword-based
    ``text_language_id`` (two independent systems disagreeing flags
    mislabeled corpus slices).

    ENTIRELY INTEGER ALGEBRA: profile membership counts and hit counts
    are exact, every tie-break total — bit-identical on any engine.

    Scale shape: profile build = one (lang, gram) count aggregate +
    per-lang rank window (lang-partitioned, vocabulary-sized); scoring
    = doc-distinct grams ⋈ the (langs × k)-row broadcast profile;
    output is the ≤|langs|² confusion grid. The exploded per-doc
    distinct-gram table is built ONCE (lazily checkpointed) and feeds
    both the profile counts and the scoring join — the profile's
    per-(lang, gram) count is exactly the number of docs containing the
    gram, i.e. ``doc_grams`` re-aggregated, so a second explode of the
    text would be the same pass paid twice (measured 5.3s → 3.3s at
    sf0.1).
    """
    from pyspark.sql import Window

    t = F.col("__t")
    grams_arr = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1))
            ),  # greatest(...,1): sequence(1,0) would run DESCENDING
            lambda i: t.substr(i, F.lit(n)),
        )
    )
    base = df.select(
        F.col(id_col),
        F.col(lang_col).alias("tagged"),
        F.lower(F.col(text_col)).alias("__t"),
    )
    doc_grams = (
        base.select(id_col, "tagged", F.explode(grams_arr).alias("g"))
        .filter(F.length("g") == n)
        .localCheckpoint(eager=False)
    )
    prof_counts = doc_grams.groupBy("tagged", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    wp = Window.partitionBy("tagged").orderBy(F.col("c").desc(), F.col("g"))
    profile = (
        prof_counts.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= profile_k)
        .select(F.col("tagged").alias("plang"), "g")
    )
    hits = (
        doc_grams.join(F.broadcast(profile), "g")
        .groupBy(id_col, "tagged", "plang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    # r15 ablation, measured and REVERTED: rewriting this argmax as the
    # LPA-style min(struct(-hits, plang)) grouped aggregate read 1.06 in
    # an isolated ABAB (min-of-5). Unlike LPA's case the window here
    # removes no exchange (the hits aggregate and the window need the
    # same re-partition either way), and min-over-struct plans as a
    # SortAggregate (sorts both partial and final sides) while the
    # row_number window gets WindowGroupLimit rank-limit pushdown — the
    # window formulation is the cheaper physical shape. Same lesson as
    # r14's triangle_counts revert: check what the transform actually
    # removes before applying it.
    wd = Window.partitionBy(id_col).orderBy(
        F.col("hits").desc(), F.col("plang").asc()
    )
    assigned = (
        hits.withColumn("__rn", F.row_number().over(wd))
        .filter(F.col("__rn") == 1)
        .select(id_col, "tagged", F.col("plang").alias("predicted"))
    )
    return assigned.groupBy("tagged", "predicted").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def burrows_delta(
    df: DataFrame,
    top_k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    digits: int = 6,
) -> DataFrame:
    """Burrows' Delta stylometry (Burrows 2002): z-score each of the
    corpus's ``top_k`` most frequent words' RELATIVE frequency across
    the per-``group_col`` profiles, then Delta(a, b) = mean |zₐ − z_b|
    over those words — the standard authorship / style distance that
    separates sources writing about the same things in different
    voices (function-word usage, not topic).

    Determinism: relative frequencies are integer-count ratios rounded
    at 9 dp; mean/σ across the bounded group domain use decimal sums of
    those rounded terms; |z| differences decimal-sum again before the
    final mean. Ranking for the top-``k`` vocabulary breaks ties on the
    term.

    Scale shape: one (group, term) count aggregate, a vocabulary
    top-``k`` cut (TakeOrdered), then everything runs on the bounded
    (groups × k) grid.
    """
    terms = df.select(
        F.col(group_col).alias("grp"), F.explode(tokens(text_col)).alias("w")
    )
    gt = terms.groupBy("grp", "w").agg(F.count(F.lit(1)).alias("c"))
    gtot = gt.groupBy("grp").agg(F.sum("c").cast("bigint").alias("tot"))
    vocab = (
        gt.groupBy("w")
        .agg(F.sum("c").cast("bigint").alias("cw"))
        .orderBy(F.desc("cw"), F.asc("w"))
        .limit(top_k)
        .select("w")
    )
    ngroups = gtot.count()  # bounded: the group domain (sources)
    rel = (
        gtot.crossJoin(F.broadcast(vocab))
        .join(gt, ["grp", "w"], "left")
        .select(
            "grp",
            "w",
            round_half_up(
                F.coalesce(F.col("c"), F.lit(0)) / F.col("tot"), 9
            ).alias("f"),
        )
    )
    stats = rel.groupBy("w").agg(
        (
            F.sum(F.col("f").cast("decimal(28,9)")).cast("double")
            / F.lit(ngroups)
        ).alias("mu"),
        F.sum(
            round_half_up(F.col("f") * F.col("f"), 14).cast("decimal(32,14)")
        ).cast("double").alias("s2"),
    )
    z = (
        rel.join(stats, "w")
        .select(
            "grp",
            "w",
            (
                (F.col("f") - F.col("mu"))
                / F.sqrt(
                    (F.col("s2") - F.lit(ngroups) * F.col("mu") * F.col("mu"))
                    / F.lit(ngroups - 1)
                )
            ).alias("z"),
        )
    )
    a = z.select(F.col("grp").alias("ga"), "w", F.col("z").alias("za"))
    b = z.select(F.col("grp").alias("gb"), "w", F.col("z").alias("zb"))
    return (
        a.join(b, "w")
        .where(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            round_half_up(
                F.sum(
                    round_half_up(F.abs(F.col("za") - F.col("zb")), 9).cast(
                        "decimal(28,9)"
                    )
                ).cast("double")
                / F.count(F.lit(1)),
                digits,
            ).alias("delta"),
        )
    )
