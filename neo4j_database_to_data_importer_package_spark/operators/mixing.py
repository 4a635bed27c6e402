"""Data-mixing operators for training-corpus assembly (beyond-reference):
deterministic train/val/test splits, per-domain caps, and weighted
language mixtures.

All sampling is hash-deterministic (md5 of the document id), so the same
document lands in the same split/sample in any engine, at any
parallelism, on any run — the property that makes a 100 TB corpus
rebuild reproducible (and makes every operator here oracle-checkable in
DuckDB). Assignment is a pure map-side expression; the only shuffles are
the final tiny aggregations (key space = splits × langs / sources), and
the per-domain cap projects to (group, hash, id) before its two-level
bounded aggregation — the same mergeable pattern as the KMV sketch, so
the merge state per group is ≤ k rows per input partition, never the
whole document payload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import round_half_up

_HASH_DENOM = 4294967296.0  # 2^32 — md5 first 8 hex chars → uniform [0, 1)


def hash_frac(col: Column) -> Column:
    """Deterministic uniform [0,1) fraction from any id column."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        / F.lit(_HASH_DENOM)
    )


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.9,
    val: float = 0.05,
) -> DataFrame:
    """Stable train/val/test assignment by hashed id — no shuffle, no
    state: re-running on a grown corpus never moves an old document
    between splits (the property random splits lack)."""
    frac = hash_frac(F.col(id_col))
    return df.withColumn(
        "split",
        F.when(frac < train, F.lit("train"))
        .when(frac < train + val, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def split_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per (split, lang) corpus accounting: doc counts and char budget."""
    return (
        assign_split(df, id_col)
        .groupBy("split", lang_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(chars_col).alias("total_chars"),
            round_half_up(F.avg(chars_col), 4).alias("avg_chars"),
        )
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int = 25,
) -> DataFrame:
    """Per-domain cap: keep a stable k-document sample of every group,
    chosen by md5(id) order (uniform, data-independent).

    Two-level bounded aggregation (the KMV-sketch shape) instead of a
    per-group global window sort: (1) per (group, input partition)
    collect and slice the k smallest (hash, id) pairs — the projection
    drops every other column first, so the shuffle carries two small
    strings per row, never document payloads; (2) merge the ≤k-element
    partials per group and re-slice. A hot domain with 10^9 docs merges
    ≤ k × num_partitions pairs, not 10^9 — no single-task sort at any
    scale.
    """
    h = F.md5(F.col(id_col).cast("string"))
    slim = df.select(F.col(group_col), h.alias("__h"), F.col(id_col))
    partials = slim.groupBy(group_col, F.spark_partition_id().alias("__pid")).agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("__h", id_col))), 1, k
        ).alias("__top")
    )
    merged = partials.groupBy(group_col).agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("__top"))), 1, k
        ).alias("__top")
    )
    return merged.select(group_col, F.explode("__top").alias("__e")).select(
        group_col, F.col(f"__e.{id_col}").alias(id_col)
    )


# Language-mixture weights: keep-probability per language. The shape a
# real pipeline tunes per corpus source; values here are illustrative.
LANG_MIX_WEIGHTS: dict[str, float] = {
    "en": 0.9,
    "de": 0.5,
    "fr": 0.5,
    "es": 0.4,
    "zh": 0.3,
}


def weighted_mixture_sample(
    df: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Keep each document with its language's mixture weight as the
    probability — deterministically (hash_frac(id) < weight), so the
    sampled corpus is reproducible and monotone in the weights (raising
    a weight only ever adds documents). Unknown languages drop out
    (weight 0). Pure map-side filter."""
    w = weights or LANG_MIX_WEIGHTS
    wmap = F.create_map(
        *[x for kv in w.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )
    keep = hash_frac(F.col(id_col)) < F.coalesce(
        wmap[F.col(lang_col)], F.lit(0.0)
    )
    return df.filter(keep)


def mixture_stats(
    df: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    chars_col: str = "n_chars",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Per-language before/after accounting of the weighted mixture:
    one scan, conditional aggregates (no second pass over the corpus)."""
    w = weights or LANG_MIX_WEIGHTS
    wmap = F.create_map(
        *[x for kv in w.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )
    kept = hash_frac(F.col(id_col)) < F.coalesce(wmap[F.col(lang_col)], F.lit(0.0))
    return df.groupBy(lang_col).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept.cast("long")).alias("n_sampled"),
        F.sum(F.when(kept, F.col(chars_col)).otherwise(F.lit(0))).alias(
            "sampled_chars"
        ),
    )


def domain_mixture_weights(
    df: DataFrame,
    domain_col: str = "source",
    chars_col: str = "n_chars",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled sampling weights per domain: weight ∝
    n_docs^alpha, normalized — the standard multinomial smoothing that
    up-samples small domains (alpha < 1) when mixing corpora for
    training. Also reports the effective epochs-per-domain the weight
    implies (weight · total_docs / n_docs).

    Two tiny aggregates (per-domain counts, then the normalizer over
    #domains rows); everything after the first groupBy is
    dimension-sized.
    """
    from ..functions.numeric import round_half_up

    agg = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(chars_col).cast("bigint").alias("total_chars"),
    )
    # alpha=0.5 routes through sqrt: IEEE-correctly-rounded in every
    # engine, unlike pow (libm vs JVM pow can differ in the last ulp,
    # which an oracle comparison would see).
    def _temp(c):
        c = c.cast("double")
        return F.sqrt(c) if alpha == 0.5 else F.pow(c, F.lit(alpha))

    raw = _temp(F.col("n_docs"))
    tot = agg.agg(
        F.sum(_temp(F.col("n_docs"))).alias("__tot"),
        F.sum("n_docs").alias("__all_docs"),
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            domain_col,
            "n_docs",
            "total_chars",
            round_half_up(raw / F.col("__tot"), 6).alias("weight"),
            round_half_up(
                raw / F.col("__tot") * F.col("__all_docs") / F.col("n_docs"), 6
            ).alias("effective_epochs"),
        )
    )


def weighted_reservoir_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str = "doc_id",
    k: int = 100,
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    every row draws a key ``ln(u) / w`` from a DETERMINISTIC uniform u
    (md5 of the id, offset by half a ulp so u > 0) and the k largest
    keys win — each row's inclusion probability is proportional to its
    weight, with no sequential reservoir state.

    This is the distributed form of weighted reservoir sampling: the key
    is a pure map-side expression and the top-k is ``orderBy().limit(k)``
    — Spark compiles it to TakeOrderedAndProject (per-partition k-heaps,
    merge of P·k rows), never a global sort. Deterministic u means the
    sample is reproducible across runs/engines and auditable in SQL.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(_HASH_DENOM)
    key = F.log(u) / F.col(weight_col).cast("double")
    slim = df.select(
        F.col(id_col),
        F.col(weight_col).cast("bigint").alias("weight"),
        key.alias("__key"),
    )
    picked = slim.orderBy(F.col("__key").desc(), F.col(id_col)).limit(k)
    return picked.select(
        id_col, "weight", round_half_up(F.col("__key"), 9).alias("es_key")
    )


def split_leakage_check(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train: float = 0.9,
    val: float = 0.05,
) -> DataFrame:
    """Eval-integrity audit: do near-duplicate documents straddle the
    train/val/test boundary? Every verified near-dup pair (banded
    MinHash candidates + exact Jaccard ≥ 0.5 — the same machinery as
    ``dedup_near_dup_clusters``) is labeled with its endpoints' hash
    splits; any pair whose splits differ is test-set leakage that would
    inflate eval numbers. Returns (split_a, split_b, n_pairs,
    mean_jaccard) — the off-diagonal rows are the finding.

    The split is the map-side hash expression (no join against an
    assignment table), so the only work beyond the dedup pass itself is
    relabeling the bounded pair list.
    """
    from .dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(df, text_col, id_col)

    def _split(col: Column) -> Column:
        frac = hash_frac(col)
        return (
            F.when(frac < train, F.lit("train"))
            .when(frac < train + val, F.lit("val"))
            .otherwise(F.lit("test"))
        )

    labeled = pairs.select(
        _split(F.col("id_a")).alias("split_a"),
        _split(F.col("id_b")).alias("split_b"),
        F.col("jaccard"),
    )
    return labeled.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        round_half_up(F.avg("jaccard"), 6).alias("mean_jaccard"),
    )


def epoch_mixture_plan(
    df: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    chars_col: str = "n_chars",
    alpha: float = 0.5,
) -> DataFrame:
    """Turn temperature-scaled mixture weights into a CONCRETE sampling
    plan: each domain's effective epochs e (from
    ``domain_mixture_weights``) becomes per-document planned copies
    ``floor(e) + Bernoulli(frac(e))``, with the Bernoulli decided by the
    document's own hash — deterministic, so two runs (or two engines)
    plan the identical corpus. This is the step between "weights" and
    "what the loader actually reads": fractional epochs materialize as a
    stable subset of the domain getting one extra copy.

    Per-domain accounting out: n_docs, planned_doc_copies,
    planned_chars, realized_epochs (= planned/n, which converges to e).
    One scan + dimension-sized aggregates; the per-doc decision is a
    map-side expression against broadcast per-domain epochs.
    """
    from ..functions.numeric import round_half_up

    agg = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))

    def _temp(c):
        c = c.cast("double")
        return F.sqrt(c) if alpha == 0.5 else F.pow(c, F.lit(alpha))

    tot = agg.agg(
        F.sum(_temp(F.col("n_docs"))).alias("__tot"),
        F.sum("n_docs").alias("__all"),
    )
    epochs = (
        _temp(F.col("n_docs")) / F.col("__tot") * F.col("__all") / F.col("n_docs")
    )
    dom = agg.crossJoin(F.broadcast(tot)).select(
        domain_col, "n_docs", epochs.alias("__e")
    )
    planned = (
        df.select(F.col(domain_col), F.col(id_col), F.col(chars_col))
        .join(F.broadcast(dom), domain_col)
        .select(
            F.col(domain_col),
            F.col("n_docs"),
            F.col(chars_col),
            (
                F.floor(F.col("__e"))
                + (hash_frac(F.col(id_col)) < (F.col("__e") - F.floor(F.col("__e"))))
                .cast("long")
            ).alias("__copies"),
        )
    )
    return planned.groupBy(domain_col, "n_docs").agg(
        F.sum("__copies").cast("bigint").alias("planned_doc_copies"),
        F.sum(F.col("__copies") * F.col(chars_col)).cast("bigint").alias(
            "planned_chars"
        ),
        round_half_up(F.sum("__copies") / F.col("n_docs"), 6).alias(
            "realized_epochs"
        ),
    )


def curriculum_phases(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_phases: int = 4,
    n_partitions: int = 64,
) -> DataFrame:
    """Curriculum-learning order plan: every document gets a global
    training POSITION (rank over (score, id) — a total order, so no tie
    ambiguity) and a PHASE = 1 + ⌊n_phases·(position−1)/n⌋, i.e. equal-
    size difficulty bands from easiest (lowest score) to hardest. The
    deterministic "feed easy data first" schedule of a curriculum
    trainer, reproducible across engines and runs.

    The global rank never runs a global window: like
    ``analytics.exact_quantiles``, the rows are range-repartitioned on
    the sort key, sorted within partitions, and each row's global rank
    is (cumulative partition offset + within-partition row_number) —
    the offsets are one bounded driver fetch of the partition counts
    (≤ n_partitions scalars). Every task holds only its own range; the
    plan survives any corpus size by raising ``n_partitions``.
    """
    slim = (
        df.select(F.col(id_col), F.col(score_col).cast("double").alias("__score"))
        .repartitionByRange(n_partitions, F.col("__score"), F.col(id_col))
        .sortWithinPartitions("__score", id_col)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    try:
        counts = dict(
            (r["__pid"], r["cnt"])
            for r in slim.groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        n = sum(counts.values())
        offsets, acc = {}, 0
        for pid in sorted(counts):
            offsets[pid] = acc
            acc += counts[pid]
        off_expr = F.lit(0)
        for pid, off in offsets.items():
            off_expr = F.when(F.col("__pid") == pid, F.lit(off)).otherwise(off_expr)
        from pyspark.sql import Window

        w = Window.partitionBy("__pid").orderBy("__score", id_col)
        ranked = slim.withColumn(
            "position", (off_expr + F.row_number().over(w)).cast("long")
        )
        out = ranked.select(
            id_col,
            round_half_up(F.col("__score"), 6).alias("score"),
            "position",
            (
                1
                + F.floor(
                    F.lit(n_phases) * (F.col("position") - 1) / F.lit(n)
                )
            ).cast("int").alias("phase"),
        )
        # Materialize before unpersist so the returned plan does not
        # recompute the ranked table against an evicted cache.
        return out.localCheckpoint(eager=True)
    finally:
        slim.unpersist()


def token_budget_plan(
    df: DataFrame,
    budget_tokens: int = 1_000_000,
    temperature: float = 0.5,
    group_col: str = "lang",
    text_col: str = "text",
    digits: int = 6,
) -> DataFrame:
    """Temperature-based multilingual token-budget allocation (the
    XLM-R / mT5 recipe): per group, weight ∝ (token share)^τ, then
    allocate ``budget_tokens`` by normalized weight — τ=1 keeps natural
    proportions, τ→0 flattens toward uniform, the standard dial for
    keeping low-resource languages represented. Epochs = allocation /
    available tokens shows which groups will be over-sampled (>1 means
    repetition — the value a curriculum planner watches).

    One regex-token count projection, one bounded per-group aggregate,
    a 1-row total broadcast back — plan arithmetic over the bounded
    group table. Token counts are exact integers; pow/shares are
    rounded at 6 dp on both engines.
    """
    from ..functions.numeric import round_half_up

    toks = df.select(
        F.col(group_col),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"\w+|[^\w\s]"), 0)
        ).alias("t"),
    )
    per_g = toks.groupBy(group_col).agg(F.sum("t").alias("n_tokens"))
    tot = per_g.agg(F.sum("n_tokens").alias("total"))
    with_w = per_g.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_tokens",
        F.pow(F.col("n_tokens") / F.col("total"), F.lit(temperature)).alias(
            "__w"
        ),
    )
    wsum = with_w.agg(F.sum("__w").alias("ws"))
    return (
        with_w.crossJoin(F.broadcast(wsum))
        .select(
            group_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            round_half_up(F.col("__w") / F.col("ws"), digits).alias("weight"),
            F.floor(
                F.lit(float(budget_tokens)) * F.col("__w") / F.col("ws") + 0.5
            ).cast("long").alias("alloc_tokens"),
            round_half_up(
                F.lit(float(budget_tokens))
                * F.col("__w")
                / F.col("ws")
                / F.col("n_tokens"),
                digits,
            ).alias("epochs"),
        )
    )


def quality_threshold_sweep(
    df: DataFrame,
    quality_col,
    tokens_col,
    source_col: str = "source",
    n_steps: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Quality-threshold survival curves per source: for each cutoff
    θ ∈ {0.0, 0.1, …, 0.9}, how many documents and tokens survive
    "keep iff quality ≥ θ"? The curve a curation review reads BEFORE
    fixing the threshold a filter funnel then applies — where the
    token cliff is, and whether it hits every source equally.

    Exact-integer shape: the 6-dp-rounded quality becomes a scaled
    integer (q·10⁶), docs collapse to the bounded (source, decile-
    bucket) histogram, and the θ grid is a comparison over INTEGER
    bucket ids — no floating thresholds anywhere (0.3·10 = 2.999…
    in IEEE; the integer path has no such edge). One scan, bounded
    rollup, ≤ sources·n_steps output rows.
    """
    from ..functions.numeric import round_half_up

    q6 = F.round(quality_col * 1000000.0).cast("long")
    step = 1000000 // n_steps
    cells = df.select(
        F.col(source_col).alias("source"),
        (q6 / step).cast("long").alias("bucket"),
        tokens_col.alias("n_tokens"),
    ).groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_toks"),
    )
    grid = cells.sparkSession.range(n_steps).select(
        F.col("id").cast("long").alias("k")
    )
    tot = cells.groupBy("source").agg(
        F.sum("n_docs").alias("t_docs"), F.sum("n_toks").alias("t_toks")
    )
    kept = (
        cells.join(F.broadcast(grid), F.col("bucket") >= F.col("k"))
        .groupBy("source", "k")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs_kept"),
            F.sum("n_toks").cast("long").alias("n_tokens_kept"),
        )
    )
    # grid-complete: a threshold that kills a source entirely still
    # reports its zero row (the curve's cliff edge IS the signal)
    full = tot.crossJoin(F.broadcast(grid)).join(
        kept, ["source", "k"], "left"
    ).select(
        "source",
        "k",
        "t_docs",
        "t_toks",
        F.coalesce("n_docs_kept", F.lit(0)).alias("n_docs_kept"),
        F.coalesce("n_tokens_kept", F.lit(0)).alias("n_tokens_kept"),
    )
    return (
        full
        .select(
            "source",
            round_half_up(F.col("k") / F.lit(float(n_steps)), 2).alias(
                "threshold"
            ),
            "n_docs_kept",
            "n_tokens_kept",
            round_half_up(
                F.col("n_docs_kept") / F.col("t_docs"), digits
            ).alias("doc_keep_rate"),
            round_half_up(
                F.col("n_tokens_kept") / F.col("t_toks"), digits
            ).alias("token_keep_rate"),
        )
    )


def dsir_importance_weights(
    df: DataFrame,
    target_source: str = "src0",
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    NON-target document by the log-likelihood ratio of its hashed
    unigram features under the target-domain LM vs the raw-pool LM, so
    the raw pool can be resampled toward the target distribution.

    Features are md5-hashed token buckets (``n_buckets``-way — the
    hashed n-gram trick that keeps the feature space fixed no matter
    the vocabulary), both LMs are Laplace-smoothed bucket unigrams
    (c+1)/(T+B), and the per-doc weight is the sum of per-token bucket
    log-ratios.

    Determinism: each token's log-ratio is rounded to 9 dp and summed
    as DECIMAL(28,9) — exact, order-independent addition (the standing
    "round terms, then decimal-sum" rule), then the doc weight is
    rounded to 4 dp.

    Scale shape: two B-row LM aggregates (B = ``n_buckets``, a
    constant) broadcast into a map-side lookup join keyed on the
    bucket id; the only data-sized shuffle is the final per-doc sum,
    keyed on the document id. The 100 TB path is exactly this plan —
    the LMs are sketch-sized no matter the corpus.
    """
    from ..functions.text import tokens

    terms = df.select(
        F.col(id_col),
        F.col(source_col),
        F.explode(tokens(text_col)).alias("__term"),
    ).select(
        id_col,
        source_col,
        (
            F.conv(F.substring(F.md5(F.col("__term")), 1, 8), 16, 10).cast(
                "bigint"
            )
            % n_buckets
        ).alias("bucket"),
    )
    is_target = F.col(source_col) == target_source
    counts = terms.groupBy("bucket").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).alias("ct"),
        F.sum(F.when(is_target, 0).otherwise(1)).alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    lm = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        round_half_up(
            F.log((F.col("ct") + 1) / (F.col("tt") + n_buckets))
            - F.log((F.col("cr") + 1) / (F.col("tr") + n_buckets)),
            9,
        ).alias("llr"),
    )
    return (
        terms.filter(~is_target)
        .join(F.broadcast(lm), "bucket")
        .groupBy(id_col, source_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            round_half_up(
                F.sum(F.col("llr").cast("decimal(28,9)")).cast("double"), 4
            ).alias("dsir_weight"),
        )
    )


def token_budget_packing(
    df: DataFrame,
    budget: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Sequential token-budget shard packing: walk each source's
    documents in id order, accumulate token counts, and start a new
    shard every time the running total crosses ``budget`` — the
    "pack documents into fixed-token-budget training shards" step of a
    sequence-packing pipeline (shard = floor(tokens-before-me /
    budget); a doc may straddle its boundary, the standard greedy
    overflow rule). Deterministic by construction: integer token
    counts, integer division, total (source, doc_id) order.

    Scale shape: the running sum partitions BY SOURCE (never a global
    window) — per-partition state is one counter; the output is one
    row per (source, shard). Contrast ``corpus_shard_manifest`` (hash
    sharding, order-free): packing is the ORDER-PRESERVING variant a
    curriculum needs.
    """
    from ..functions.text import tokens
    from pyspark.sql import Window

    toks = df.select(
        F.col(source_col).alias("source"),
        F.col(id_col),
        F.size(tokens(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "shard",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(budget)
        ).cast("bigint"),
    )
    return packed.groupBy("source", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )
