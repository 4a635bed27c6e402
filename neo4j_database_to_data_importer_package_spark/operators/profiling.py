"""Column-level data profiling — the ANALYZE TABLE / catalog-statistics
pass (S1-adjacent; the reference's metadata scan stops at property names,
``neo4j_export.py:285`` — real pipelines also want per-column null
fractions, cardinalities, and ranges before planning joins or filters).

Two modes sharing one shape:

- ``exact=False`` (the 100 TB default): ``approx_count_distinct`` (HLL)
  — a single streaming aggregation pass, no expand, constant memory per
  column.
- ``exact=True`` (the oracle/gate mode): ``countDistinct`` — Spark plans
  multi-column exact distincts via EXPAND (one row replica per profiled
  column), fine at validation scale and bit-comparable to SQL engines.

Output is long-form (one row per column) so profiles of any width union
cleanly into a catalog table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame, cols: list[str], exact: bool = False
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    profiled column; min/max stringified for a uniform schema."""
    distinct_fn = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            distinct_fn(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def length_drift_psi(
    df,
    ref_domain: str = "src0",
    domain_col: str = "source",
    text_col: str = "text",
    max_len: int = 2048,
):
    """Distribution-drift screen (population stability index) between a
    reference domain and every other domain, over the power-of-two
    token-length buckets: PSI = Σ_b (p_b − q_b)·ln(p_b / q_b) with
    add-one smoothing (so empty buckets stay finite). PSI is the
    standard "did this source's length profile move" monitor — the
    corpus twin of a model-feature drift check; > 0.2 is the usual
    investigate threshold.

    One scan to bucket (integer CASE chain — no cross-engine log2), one
    (domain, bucket) aggregate, then the PSI fold runs over the
    dimension-sized bucket table with the reference profile broadcast.
    """
    from pyspark.sql import functions as F

    from ..functions.numeric import round_half_up
    from ..functions.text import tokens

    # One grid drives the CASE chain, the smoothing denominator, AND the
    # dense bucket table — with any max_len they stay consistent (ADVICE
    # r04: the 16..2048 grid was hard-coded, so max_len != 2048 produced
    # phantom empty buckets whose add-one smoothing injected spurious
    # nonzero PSI terms).
    grid = [16]
    while grid[-1] < max_len:
        grid.append(grid[-1] * 2)
    toks = F.least(F.size(tokens(text_col)), F.lit(max_len))
    bucket = F.lit(grid[0])
    for b in grid[1:]:
        bucket = F.when(toks > F.lit(b // 2), F.lit(b)).otherwise(bucket)
    binned = df.select(F.col(domain_col), bucket.alias("bucket"))
    counts = binned.groupBy(domain_col, "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    n_buckets = len(grid)
    totals = counts.groupBy(domain_col).agg(F.sum("n").alias("tot"))
    spark = binned.sparkSession
    grid_df = spark.createDataFrame([(b,) for b in grid], "bucket int")
    full = (
        totals.crossJoin(F.broadcast(grid_df))
        .join(counts, [domain_col, "bucket"], "left")
        .select(
            F.col(domain_col),
            "bucket",
            ((F.coalesce(F.col("n"), F.lit(0)) + 1)
             / (F.col("tot") + F.lit(n_buckets)).cast("double")).alias("p"),
        )
    )
    ref = full.filter(F.col(domain_col) == ref_domain).select(
        F.col("bucket"), F.col("p").alias("q")
    )
    rest = full.filter(F.col(domain_col) != ref_domain)
    term = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    return (
        rest.join(F.broadcast(ref), "bucket")
        .groupBy(domain_col)
        .agg(round_half_up(F.sum(term), 6).alias("psi"))
    )


def dataset_card_stats(
    df,
    domain_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source "dataset card" row: the one-line summary a corpus
    release ships per subset — document/token volume, mean document
    length, language spread (distinct languages + dominant language and
    its share), and the within-source exact-duplication rate. The
    operator-level composition of signals the pipeline already computes
    one query at a time, assembled in three dimension-sized aggregates.

    Scale shape: one scan projects (domain, lang, fingerprint, token
    count); the volume and language aggregates are map-side combined
    into domain- and (domain, lang)-sized states; the duplication rate
    reuses the exact-dedup groupBy on (domain, fingerprint). Everything
    joins back broadcast (rows = |domains|).
    """
    from pyspark.sql import Window

    from ..functions.numeric import round_half_up
    from ..functions.text import fingerprint_md5, tokens

    base = df.select(
        F.col(domain_col),
        F.col(lang_col),
        fingerprint_md5(text_col).alias("__fp"),
        F.size(tokens(text_col)).alias("__ntok"),
        F.length(text_col).alias("__nchars"),
    )
    vol = base.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__ntok").alias("n_tokens"),
        round_half_up(F.avg("__nchars"), 2).alias("mean_chars"),
    )
    dups = (
        base.groupBy(domain_col, "__fp")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(domain_col)
        .agg(F.sum(F.col("c") - 1).alias("n_dup_docs"))
    )
    langs = base.groupBy(domain_col, lang_col).agg(
        F.count(F.lit(1)).alias("lc")
    )
    n_langs = langs.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_langs")
    )
    w = Window.partitionBy(domain_col).orderBy(
        F.col("lc").desc(), F.col(lang_col)
    )
    top = (
        langs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(domain_col),
            F.col(lang_col).alias("top_lang"),
            F.col("lc").alias("__top_c"),
        )
    )
    return (
        vol.join(F.broadcast(dups), domain_col)
        .join(F.broadcast(n_langs), domain_col)
        .join(F.broadcast(top), domain_col)
        .select(
            domain_col,
            "n_docs",
            "n_tokens",
            "mean_chars",
            "n_langs",
            "top_lang",
            round_half_up(F.col("__top_c") / F.col("n_docs"), 6).alias(
                "top_lang_share"
            ),
            round_half_up(F.col("n_dup_docs") / F.col("n_docs"), 6).alias(
                "dup_rate"
            ),
        )
    )


def data_quality_checks(view) -> DataFrame:
    """Expectation-suite audit over the star schema: one row per rule
    with total rows, violations, and pass rate — the pre-ingest gate a
    pipeline runs before accepting a new data drop (the
    Great-Expectations shape, expressed as aggregates). Rules cover the
    three families that catch real drops: referential integrity
    (FK anti-join counts), domain ranges, and key uniqueness.

    Every rule is a single aggregate (or anti-join + aggregate) over a
    two-column projection; results union into a dimension-sized report.
    At 100 TB each FK check is one broadcast/shuffle anti-join on the
    key column only — no rule ever touches a full row.
    """
    from pyspark.sql import functions as F

    from ..functions.numeric import round_half_up

    orders = view.tables["orders"]
    lineitem = view.tables["lineitem"]
    customer = view.tables["customer"]
    events = view.tables["events"]
    documents = view.tables["documents"]

    def report(table, rule, total_df, viol_col):
        agg = total_df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(viol_col.cast("long")).alias("n_violations"),
        )
        return agg.select(
            F.lit(table).alias("table_name"),
            F.lit(rule).alias("rule"),
            "n_rows",
            "n_violations",
            round_half_up(
                (F.col("n_rows") - F.col("n_violations")) / F.col("n_rows"), 6
            ).alias("pass_rate"),
        )

    # FK checks as left join + null probe on a marker column
    cust_keys = customer.select(
        F.col("c_custkey").alias("o_custkey"), F.lit(1).alias("__hit")
    )
    fk1 = report(
        "orders",
        "o_custkey_in_customer",
        orders.select("o_custkey").join(F.broadcast(cust_keys), "o_custkey", "left"),
        F.col("__hit").isNull(),
    )
    order_keys = orders.select(
        F.col("o_orderkey").alias("l_orderkey"), F.lit(1).alias("__hit")
    )
    fk2 = report(
        "lineitem",
        "l_orderkey_in_orders",
        lineitem.select("l_orderkey").join(order_keys, "l_orderkey", "left"),
        F.col("__hit").isNull(),
    )
    rng1 = report(
        "lineitem",
        "l_quantity_in_1_50",
        lineitem.select("l_quantity"),
        ~F.col("l_quantity").between(1, 50),
    )
    rng2 = report(
        "events",
        "value_non_negative",
        events.select("value"),
        F.col("value") < 0,
    )
    ne = report(
        "documents",
        "text_non_empty",
        documents.select("text"),
        F.coalesce(F.length("text"), F.lit(0)) == 0,
    )
    uniq = report(
        "customer",
        "c_custkey_unique",
        customer.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("__c")),
        F.col("__c") > 1,
    )
    out = fk1
    for piece in (fk2, rng1, rng2, ne, uniq):
        out = out.unionByName(piece)
    return out


def fd_violations(
    df: DataFrame,
    lhs: str,
    rhs: str,
    top_k: int = 5,
) -> DataFrame:
    """Functional-dependency check lhs → rhs (the Metanome-style
    profiling primitive): does each lhs value determine a single rhs
    value? Reports, per violating lhs key, how many distinct rhs
    values it maps to and how many rows sit outside the majority
    mapping — the schema-discovery signal ("is source→lang a real
    rule?") and the dirty-data count if you enforce it.

    Two hash aggregates over the (lhs, rhs) projection: value-pair
    counts, then per-lhs distinct-rhs + majority bookkeeping via a
    (count, rhs) struct max — no windows; output only the violating
    keys, globally top-``top_k`` by violation count
    (TakeOrderedAndProject — bounded).
    """
    pairs = df.groupBy(
        F.col(lhs).alias("lhs_value"), F.col(rhs).alias("__rhs")
    ).agg(F.count(F.lit(1)).alias("n"))
    per_lhs = pairs.groupBy("lhs_value").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_rhs"),
        F.sum("n").alias("__total"),
        F.max(F.struct(F.col("n").alias("n"), F.col("__rhs").alias("r"))).alias(
            "__m"
        ),
    )
    return (
        per_lhs.filter(F.col("n_distinct_rhs") > 1)
        .select(
            "lhs_value",
            "n_distinct_rhs",
            F.col("__total").cast("long").alias("n_rows"),
            (F.col("__total") - F.col("__m.n")).cast("long").alias(
                "n_violating_rows"
            ),
        )
        .orderBy(F.desc("n_violating_rows"), F.asc("lhs_value"))
        .limit(top_k)
    )


def join_key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_k: int = 5,
    digits: int = 6,
) -> DataFrame:
    """Join-key skew profiler: the pre-flight check run before shuffling
    a 100 TB table on ``key_col`` — per-key row counts rolled up into
    the global skew picture (total rows, distinct keys, max-key share)
    plus the ``top_k`` heaviest keys with their share and skew factor
    (count / mean-rows-per-key). A skew factor in the tens is the
    signal to salt the join or let AQE's skew-join handle it (the
    salted shape this package uses in ``skewed_join_hot_suppliers``
    and the walk-corpus hop join); this operator is how you FIND those
    keys without eyeballing a straggler timeline.

    One hash aggregate per key, one single-row rollup broadcast back,
    TakeOrderedAndProject for the top-k — the profile costs one
    shuffle of key counts, strictly cheaper than the join it audits.
    Shares/factors are 6-dp half-up-rounded integer ratios.
    """
    from ..functions.numeric import round_half_up

    per_key = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    tot = per_key.agg(
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n_rows",
            "total_rows",
            "n_keys",
            round_half_up(F.col("n_rows") / F.col("total_rows"), digits).alias(
                "share"
            ),
            round_half_up(
                F.col("n_rows") * F.col("n_keys") / F.col("total_rows"), digits
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top_k)
    )


def k_anonymity_classes(
    df: DataFrame,
    quasi_cols: list,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple: the histogram
    of equivalence-class sizes (how many identical quasi-identifier
    combinations exist, and how many individuals sit in classes of
    each size). Classes of size < k are re-identification risks — the
    screen a training-data pipeline runs before releasing "anonymized"
    records, because a (nation, segment, balance-bucket) triple that
    is unique IS an identifier even with the name column dropped.

    Two hash aggregates: class sizes, then the size histogram —
    output bounded by the distinct-size domain. No windows.
    """
    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("sz"))
    return (
        classes.groupBy(F.col("sz").alias("class_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("sz").cast("long").alias("n_individuals"),
        )
    )


def l_diversity_classes(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
) -> DataFrame:
    """l-diversity audit — the k-anonymity companion: within each
    quasi-identifier equivalence class, how many DISTINCT sensitive
    values appear? A class can be large (k-anonymous) yet carry a
    single sensitive value, which still leaks it for every member;
    this histogram (diversity level → classes / individuals) is the
    release gate for that failure mode.

    Two hash aggregates: per-class (size, distinct-sensitive via a
    distinct pre-aggregate), then the diversity histogram — bounded
    output, no windows.
    """
    pairs = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    classes = pairs.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("l_div"),
        F.sum("n").cast("long").alias("sz"),
    )
    return classes.groupBy(F.col("l_div").alias("l_diversity")).agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("sz").cast("long").alias("n_individuals"),
    )


def t_closeness_classes(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
    digits: int = 6,
) -> DataFrame:
    """t-closeness audit — the third leg of the k-anonymity /
    l-diversity release gate: within each quasi-identifier
    equivalence class, how FAR is the sensitive-attribute
    distribution from the global one? A class can be large
    (k-anonymous) and diverse (l-diverse) yet still leak — if its
    balance distribution skews far from the population's, membership
    alone reveals the skew. t is the Earth Mover's Distance over the
    ORDERED sensitive domain: t = Σᵢ |Pcum_i − Qcum_i| / (K−1).

    Shape: a bounded global histogram (the sensitive bucket domain),
    a per-class count, and a class × bucket completion grid built by
    broadcast-crossJoin of the BOUNDED bucket list (size = distinct
    buckets of a fixed-width bucketing — never data-scaled); the
    cumulative runs in a window PARTITIONED by class over that
    bounded grid. EMD numerators stay INTEGER (|Pcum·N − Qcum·n_c|,
    exact and order-independent); the single final division is the
    only double op, so both engines agree bit-for-bit before
    rounding.

    Returns (quasi_cols..., n, t_closeness) per equivalence class.
    """
    from ..functions.numeric import round_half_up

    glob = df.groupBy(F.col(sensitive_col).alias("__bucket")).agg(
        F.count(F.lit(1)).alias("__qn")
    )
    totals = glob.select(
        F.sum("__qn").alias("__N"),
        F.count(F.lit(1)).alias("__K"),
    )
    classes = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__nc")
    )
    cls_cells = df.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("__bucket")
    ).agg(F.count(F.lit(1)).alias("__pn"))
    # Completion grid: every class × every observed bucket (bounded:
    # the bucket domain is fixed-width, not data-scaled).
    grid = classes.crossJoin(F.broadcast(glob)).join(
        cls_cells, [*quasi_cols, "__bucket"], "left"
    ).withColumn("__pn", F.coalesce(F.col("__pn"), F.lit(0)))
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*quasi_cols)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        *quasi_cols,
        "__nc",
        F.sum("__pn").over(w).alias("__cp"),
        F.sum("__qn").over(w).alias("__cq"),
    )
    emd_num = F.sum(
        F.abs(
            F.col("__cp") * F.col("__N") - F.col("__cq") * F.col("__nc")
        )
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .groupBy(*quasi_cols, "__nc", "__N", "__K")
        .agg(emd_num.alias("__emd"))
        .select(
            *quasi_cols,
            F.col("__nc").cast("long").alias("n"),
            round_half_up(
                F.col("__emd").cast("double")
                / (
                    F.col("__nc").cast("double")
                    * F.col("__N").cast("double")
                    * (F.col("__K") - 1).cast("double")
                ),
                digits,
            ).alias("t_closeness"),
        )
    )


def correlation_matrix(
    df: DataFrame,
    num_cols: list,
    scale: int = 6,
    digits: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlation across a list of numeric fact
    columns — the schema-profiling staple ("which measures move
    together?") computed the scale-correct way: ONE pass aggregates
    every moment (n, Σx, Σx², Σxy for each of the C(k,2) pairs) as
    exact decimal sums, and the k² arithmetic happens on the single
    moment row — never k² scans, never a driver loop over columns.

    The decimal cast makes every sum order- and engine-exact (money
    columns are ≤ 2-dp, products ≤ 2·scale dp); correlations are the
    only double ops, identical in both engines. Returns one row per
    pair: (col_x, col_y, n, corr).
    """
    from pyspark.sql import functions as F
    from ..functions.numeric import dsum, round_half_up

    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in num_cols:
        aggs.append(dsum(c, scale).alias(f"s_{c}"))
        aggs.append(
            dsum(
                round_half_up(F.col(c) * F.col(c), 2 * scale), 2 * scale
            ).alias(f"ss_{c}")
        )
    pairs = [
        (num_cols[i], num_cols[j])
        for i in range(len(num_cols))
        for j in range(i + 1, len(num_cols))
    ]
    for a, b in pairs:
        aggs.append(
            dsum(
                round_half_up(F.col(a) * F.col(b), 2 * scale), 2 * scale
            ).alias(f"sp_{a}_{b}")
        )
    mom = df.agg(*aggs)
    nn = F.col("n").cast("double")
    outs = []
    for a, b in pairs:
        num = nn * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        da = nn * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        db = nn * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        outs.append(
            mom.select(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col("n"),
                round_half_up(num / F.sqrt(da * db), digits).alias("corr"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def incremental_rollup_check(
    df: DataFrame,
    split_id: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Incremental-view-maintenance audit for the per-group corpus
    rollup: treat rows with ``id_col`` < ``split_id`` as the existing
    snapshot's materialized rollup and the rest as a delta batch, merge
    the two partial rollups (count/sum state is commutative — the IVM
    merge is a pure aggregate union, NO rescan of the snapshot), and
    verify the merged numbers equal a full recompute. At 100 TB the
    difference is the whole point: maintaining the rollup costs
    O(delta), rebuilding costs O(corpus); this operator is the
    correctness harness that lets a pipeline trust the O(delta) path.

    All integers; `consistent` is an exact equality flag.
    """
    def rollup(frame):
        return frame.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(chars_col).cast("bigint").alias("total_chars"),
        )

    old = rollup(df.filter(F.col(id_col) < split_id))
    delta = rollup(df.filter(F.col(id_col) >= split_id))
    merged = (
        old.unionByName(delta)
        .groupBy(group_col)
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs_ivm"),
            F.sum("total_chars").cast("bigint").alias("chars_ivm"),
        )
    )
    full = rollup(df).select(
        group_col,
        F.col("n_docs").cast("bigint").alias("n_docs_full"),
        F.col("total_chars").alias("chars_full"),
    )
    return full.join(merged, group_col).select(
        group_col,
        "n_docs_full",
        "n_docs_ivm",
        "chars_full",
        "chars_ivm",
        (
            (F.col("n_docs_full") == F.col("n_docs_ivm"))
            & (F.col("chars_full") == F.col("chars_ivm"))
        ).cast("int").alias("consistent"),
    )
