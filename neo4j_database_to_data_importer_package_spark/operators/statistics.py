"""Distribution statistics for corpus/dataset auditing (beyond-reference,
per the north star: the quantitative screens a training-data pipeline
runs before shipping a mixture — concentration, robust moments, drift,
association, and uncertainty).

Scale design notes (100 TB):
- every operator here is one or two hash aggregations over a narrow
  projection, plus arithmetic over a BOUNDED table (key domains:
  event types, domains, languages, quantile grids, bootstrap
  replicates) — no windows over unbounded inputs, no driver loops;
- the one global ordering (Gini's sorted cumulative) runs over the
  bounded per-key aggregate, never over raw rows;
- the bootstrap is md5-derandomized (Binomial(4, 1/4) ≈ Poisson(1)
  multiplicities) so resampling is a deterministic, partition-
  independent 4× fan-out — no RNG state, reproducible in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum, round_half_up


def gini_concentration(
    df: DataFrame,
    key_col: str,
    value_col: str,
    digits: int = 6,
) -> DataFrame:
    """Gini coefficient of how ``value_col`` mass concentrates across
    ``key_col`` groups (0 = perfectly even, →1 = one group holds all) —
    the one-number inequality audit for domain mixes ("is 90% of the
    corpus one crawl?") and revenue concentration alike.

    One hash aggregate to per-key totals, then the textbook sorted
    formula G = (2·Σ i·xᵢ)/(n·Σx) − (n+1)/n over the BOUNDED per-key
    table (the ranking window runs over |keys| rows, not raw data).
    Per-key totals use exact decimal sums so the ordering — and hence
    the score — is partition-independent.
    """
    per_key = df.groupBy(key_col).agg(dsum(value_col).alias("__v"))
    w = Window.orderBy(F.col("__v").asc(), F.col(key_col))
    ranked = per_key.select(
        F.col("__v"), F.row_number().over(w).alias("__i")
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        round_half_up(
            (2.0 * F.sum(F.col("__i") * F.col("__v"))) / (F.count(F.lit(1)) * F.sum("__v"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            digits,
        ).alias("gini"),
    )


def winsorized_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    digits: int = 6,
) -> DataFrame:
    """Per-group winsorized mean/min/max: values are CLAMPED to the
    group's [lo, hi] quantiles before averaging — the robust location
    estimate that keeps every observation (unlike trimming) while
    bounding any single outlier's pull; the standard pre-aggregation
    for latency and value columns with fat tails.

    Two passes over a two-column projection: exact per-group quantiles
    (percentile — quantile_cont semantics, identical to the oracle),
    then a clamp + exact-decimal mean. The quantile table is one row
    per key (bounded domain) and joins broadcast.
    """
    slim = df.select(F.col(key_col), F.col(value_col).cast("double").alias("v"))
    q = slim.groupBy(key_col).agg(
        F.expr(f"percentile(v, {lo!r})").alias("__qlo"),
        F.expr(f"percentile(v, {hi!r})").alias("__qhi"),
    )
    clamped = slim.join(F.broadcast(q), key_col).select(
        F.col(key_col),
        F.greatest(F.least(F.col("v"), F.col("__qhi")), F.col("__qlo")).alias("__w"),
    )
    return clamped.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        round_half_up(dsum("__w") / F.count(F.lit(1)), digits).alias("winsorized_mean"),
        round_half_up(F.min("__w"), digits).alias("winsorized_min"),
        round_half_up(F.max("__w"), digits).alias("winsorized_max"),
    )


def ks_drift(
    df: DataFrame,
    value_col: str,
    split_col,
    digits: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the ``value_col``
    distributions of the two halves named by boolean ``split_col`` —
    the non-parametric drift screen that catches shape changes PSI's
    fixed binning smooths over (PSI and KS together are the standard
    drift pair).

    One (value, side) count aggregate, then running ECDFs via a
    cumulative window over the DISTINCT VALUE table — bounded by the
    value domain (for integer length/size columns this is the range of
    observed lengths, thousands of rows at any corpus scale, which is
    why the window input is the aggregate and never raw rows).
    D = max |ECDF_a − ECDF_b|; ECDF ratios are exact integer counts
    over integer totals, so D is engine-deterministic.
    """
    sided = df.select(
        F.col(value_col).cast("double").alias("v"),
        F.when(split_col, F.lit("a")).otherwise(F.lit("b")).alias("side"),
    )
    counts = sided.groupBy("v").agg(
        F.sum((F.col("side") == "a").cast("long")).alias("na"),
        F.sum((F.col("side") == "b").cast("long")).alias("nb"),
    )
    tot = counts.agg(
        F.sum("na").alias("n_a"), F.sum("nb").alias("n_b")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "v",
        F.sum("na").over(w).alias("ca"),
        F.sum("nb").over(w).alias("cb"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            round_half_up(
                F.max(
                    F.abs(
                        F.col("ca") / F.col("n_a") - F.col("cb") / F.col("n_b")
                    )
                ),
                digits,
            ).alias("ks_stat"),
        )
    )


def chi2_association(
    df: DataFrame,
    row_col: str,
    col_col: str,
    digits: int = 6,
) -> DataFrame:
    """Pearson chi-square contingency audit between two categorical
    columns (domain × language, split × quality-bucket): per-cell
    observed vs expected counts and the total χ² — the "is my mixture
    confounded" screen run before attributing a metric shift to either
    axis alone.

    One cross-count aggregate over the (bounded × bounded) category
    grid, margins as two more aggregates of it, broadcast back. The
    DENSE grid (including zero-observed cells, which still contribute
    expected mass to χ²) is the margins cross join — category-domain
    sized. Expected counts are exact integer ratios; output one row per
    cell plus the same total chi2 on every row (the driver-friendly
    flat shape).
    """
    obs = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count(F.lit(1)).alias("o"))
    rm = obs.groupBy("r").agg(F.sum("o").alias("nr"))
    cm = obs.groupBy("c").agg(F.sum("o").alias("nc"))
    tot = obs.agg(F.sum("o").alias("n"))
    grid = (
        rm.crossJoin(cm)
        .crossJoin(F.broadcast(tot))
        .join(obs, ["r", "c"], "left")
        .select(
            "r", "c", "nr", "nc", "n",
            F.coalesce("o", F.lit(0)).alias("o"),
            (F.col("nr") * F.col("nc") / F.col("n")).alias("e"),
        )
    )
    cell = grid.select(
        "r", "c", "o",
        round_half_up(F.col("e"), digits).alias("expected"),
        round_half_up(
            F.pow(F.col("o") - F.col("e"), F.lit(2.0)) / F.col("e"), digits
        ).alias("chi2_cell"),
    )
    return cell


def mutual_information(
    df: DataFrame,
    row_col: str,
    col_col: str,
    digits: int = 6,
) -> DataFrame:
    """Mutual information I(X;Y) in nats between two categorical
    columns, plus both marginal entropies — the dependence measure
    behind "does domain predict language in this corpus" (and the
    normalization H gives the uncertainty coefficient for free).

    Same bounded contingency aggregate as ``chi2_association``; MI is
    Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) over OBSERVED cells (zero cells
    contribute zero). All probabilities are exact integer count ratios,
    the log terms are summed once over the bounded grid.
    """
    obs = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count(F.lit(1)).alias("o"))
    rm = obs.groupBy("r").agg(F.sum("o").alias("nr"))
    cm = obs.groupBy("c").agg(F.sum("o").alias("nc"))
    tot = obs.agg(F.sum("o").alias("n"))
    j = (
        obs.join(rm, "r")
        .join(cm, "c")
        .crossJoin(F.broadcast(tot))
    )
    p = F.col("o") / F.col("n")
    mi_term = p * F.log(
        F.col("o") * F.col("n") / (F.col("nr") * F.col("nc"))
    )
    hr_term = -(F.col("o") / F.col("n")) * F.log(F.col("o") / F.col("n"))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        round_half_up(F.sum(mi_term), digits).alias("mutual_information"),
    )


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    n_boot: int = 32,
    lo: float = 0.05,
    hi: float = 0.95,
    digits: int = 6,
) -> DataFrame:
    """Deterministic bootstrap confidence interval for the mean of
    ``value_col``: ``n_boot`` resample means, read off at the [lo, hi]
    percentiles — the uncertainty band a pipeline report should attach
    to any corpus-level metric (mean quality, mean doc length) instead
    of a bare point estimate.

    md5-derandomized Poisson bootstrap: row r's multiplicity in
    replicate b is Binomial(4, 1/4) — the count of j∈{0..3} with
    md5(b|r|j) in the low quarter of hash space — which matches the
    Poisson(1) resampling weights of the streaming bootstrap to
    O(1/n) while staying exactly reproducible across engines, runs,
    and partitionings (no RNG state; the same trick as the hash-
    Bernoulli samplers). Plan shape: one explode to (row × n_boot)
    partial sums — a fixed 32× fan-out with map-side combine into
    n_boot rows — then the percentile read-off over the BOUNDED
    replicate table. Row identity is the value's md5 fingerprint
    combined with a per-partition-independent hash of the value col
    ONLY (caller supplies a unique id column for exactness).
    """
    b = F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("b")
    # hash input uses the RAW column (integer rendering is identical in
    # Spark and SQL; double rendering is not), value math uses the cast
    fan = df.select(
        F.col(value_col).cast("string").alias("__key"),
        F.col(value_col).cast("double").alias("v"),
        b,
    )
    trials = F.array([F.lit(j) for j in range(4)])

    def mult(kcol, bcol):
        def one(j):
            h = F.md5(F.concat_ws("|", bcol, kcol, j))
            return (F.substring(h, 1, 1).isin("0", "1", "2", "3")).cast("int")

        return F.aggregate(
            F.transform(trials, one), F.lit(0), lambda acc, x: acc + x
        )

    # NOTE: multiplicity keyed by (b, value) — rows with equal values
    # share multiplicity, which preserves the bootstrap distribution of
    # the MEAN (exchangeable weights) while keeping the hash input
    # engine-portable.
    rep = (
        fan.select("b", "v", mult(F.col("__key"), F.col("b")).alias("m"))
        .groupBy("b")
        .agg(
            (dsum(F.col("v") * F.col("m"), 6) / F.sum("m")).alias("mean_b")
        )
    )
    return rep.agg(
        F.count(F.lit(1)).cast("long").alias("n_boot"),
        round_half_up(F.expr(f"percentile(mean_b, {lo!r})"), digits).alias("ci_lo"),
        round_half_up(F.expr("percentile(mean_b, 0.5)"), digits).alias("ci_mid"),
        round_half_up(F.expr(f"percentile(mean_b, {hi!r})"), digits).alias("ci_hi"),
    )


def top_percentile_contribution(
    df: DataFrame,
    key_col: str,
    value_col: str,
    pct: float = 0.99,
    digits: int = 6,
) -> DataFrame:
    """Concentration read-off: what share of total ``value_col`` mass is
    held by keys at or above the ``pct`` quantile of per-key totals —
    the "top 1% of customers drive X% of revenue" (or "top 1% of
    domains contribute X% of tokens") companion number to the Gini.

    Aggregate-only (unlike a ranking approach this needs NO window over
    the per-key table): one hash aggregate to per-key totals, an exact
    ``percentile`` for the threshold, broadcast back, one conditional
    sum. Per-key totals and the shares are decimal-exact. At 100 TB
    swap the exact percentile for ``approx_percentile`` — same shape.
    """
    per_key = df.groupBy(key_col).agg(dsum(value_col).alias("v"))
    thr = per_key.agg(
        F.expr(f"percentile(v, {pct!r})").alias("thr"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        per_key.crossJoin(F.broadcast(thr))
        .agg(
            F.max("n_keys").cast("long").alias("n_keys"),
            round_half_up(F.max("thr"), digits).alias("threshold"),
            F.sum((F.col("v") >= F.col("thr")).cast("long")).alias("n_top_keys"),
            round_half_up(
                F.sum(F.when(F.col("v") >= F.col("thr"), F.col("v")).otherwise(0.0))
                / F.sum("v"),
                digits,
            ).alias("top_share"),
        )
    )


def grouped_bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_boot: int = 32,
    lo: float = 0.05,
    hi: float = 0.95,
    digits: int = 6,
) -> DataFrame:
    """Stratified bootstrap: the ``bootstrap_mean_ci`` machinery run
    independently per ``group_col`` value — per-stratum uncertainty
    bands (mean doc length per source ± CI), the form a dataset card
    actually prints. Same md5-Poisson determinism; the fan-out and the
    replicate table are per (group, b), still bounded.
    """
    b = F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("b")
    fan = df.select(
        F.col(group_col),
        F.col(value_col).cast("string").alias("__key"),
        F.col(value_col).cast("double").alias("v"),
        b,
    )
    trials = F.array([F.lit(j) for j in range(4)])

    def mult(kcol, bcol):
        def one(j):
            h = F.md5(F.concat_ws("|", bcol, kcol, j))
            return (F.substring(h, 1, 1).isin("0", "1", "2", "3")).cast("int")

        return F.aggregate(
            F.transform(trials, one), F.lit(0), lambda acc, x: acc + x
        )

    rep = (
        fan.select(
            group_col, "b", "v", mult(F.col("__key"), F.col("b")).alias("m")
        )
        .groupBy(group_col, "b")
        .agg((dsum(F.col("v") * F.col("m"), 6) / F.sum("m")).alias("mean_b"))
    )
    return rep.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_boot"),
        round_half_up(F.expr(f"percentile(mean_b, {lo!r})"), digits).alias("ci_lo"),
        round_half_up(F.expr("percentile(mean_b, 0.5)"), digits).alias("ci_mid"),
        round_half_up(F.expr(f"percentile(mean_b, {hi!r})"), digits).alias("ci_hi"),
    )


def benford_audit(
    df: DataFrame,
    value_col: str,
    digits: int = 6,
) -> DataFrame:
    """Benford first-digit audit: observed share of leading digits 1–9
    of |value| vs the Benford expectation log10(1 + 1/d), with each
    digit's chi-square contribution — the classic fabricated-data /
    unit-mix-up screen for money-like columns (a uniform or truncated
    source jumps straight out of this table).

    One projection extracting the leading digit (string form — no
    float log tricks, exact for any magnitude), one 9-row aggregate.
    Rows with zero/NULL values are excluded (no leading digit).
    """
    import math

    d = F.substring(
        F.regexp_replace(F.abs(F.col(value_col)).cast("string"), r"[0.]*", ""),
        1,
        1,
    )
    digit = df.select(d.alias("d")).filter(F.col("d").between("1", "9"))
    tot = digit.agg(F.count(F.lit(1)).alias("n"))
    obs = digit.groupBy("d").agg(F.count(F.lit(1)).alias("n_obs"))
    expected = F.create_map(
        *[
            x
            for dd in range(1, 10)
            for x in (F.lit(str(dd)), F.lit(math.log10(1 + 1 / dd)))
        ]
    )
    return (
        obs.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("leading_digit"),
            F.col("n_obs"),
            round_half_up(F.col("n_obs") / F.col("n"), digits).alias("observed_share"),
            round_half_up(expected[F.col("d")], digits).alias("benford_share"),
            round_half_up(
                F.pow(
                    F.col("n_obs") / F.col("n") - expected[F.col("d")], F.lit(2.0)
                )
                / expected[F.col("d")],
                digits,
            ).alias("chi2_term"),
        )
    )


def score_calibration_bins(
    df: DataFrame,
    score_col,
    label_col,
    n_bins: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Reliability-diagram table for a [0,1] score against a binary
    label: fixed-width score bins with their count, mean score, and
    observed positive rate — the calibration readout behind every
    quality-classifier threshold decision (a well-calibrated score has
    positive_rate ≈ mean_score per bin; a miscalibrated one needs
    re-thresholding before it gates a corpus).

    One projection + one bounded aggregate (n_bins rows). Score 1.0
    lands in the top bin (clamped), mirroring sklearn's inclusive top
    edge.
    """
    binned = df.select(
        F.least(
            F.lit(n_bins - 1),
            F.floor(score_col * n_bins).cast("int"),
        ).alias("bin"),
        score_col.cast("double").alias("__s"),
        label_col.cast("long").alias("__y"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        round_half_up(dsum("__s", 9) / F.count(F.lit(1)), digits).alias("mean_score"),
        round_half_up(F.sum("__y") / F.count(F.lit(1)), digits).alias("positive_rate"),
    )


def kmv_set_intersection(
    events: DataFrame,
    key_col: str = "event_type",
    id_col: str = "user_id",
    k: int = 32,
) -> DataFrame:
    """Sketch set-algebra: pairwise distinct-member INTERSECTION
    estimates between per-key id sets from their KMV (bottom-k)
    sketches — the mergeable-sketch answer to "how much do the
    audiences of A and B overlap" that never touches the raw id sets
    twice (at 100 TB the sketches are the only thing two teams need to
    exchange to estimate overlap across datasets).

    Per key: the standard two-level bounded KMV (per-partition bottom-k
    map-side, merge + re-slice — at most k·partitions doubles of state;
    the same construction as ``kmv_distinct_users_per_type``). Per key
    PAIR (bounded: |keys|²/2 rows): union sketch = bottom-k of the
    merged arrays, union cardinality from its kth minimum, Jaccard
    estimate = fraction of the union window present in BOTH sketches,
    intersection = Jaccard × union. Sketches smaller than k are exact.
    Exact intersections are computed alongside (one distinct self-join
    keyed by id — key pairs per id are bounded by the key-domain
    square) so the output doubles as the estimator's accuracy audit.
    md5 hashing keeps every estimate engine-reproducible.
    """
    frac = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        / F.lit(4294967296.0)
    )
    h = events.select(F.col(key_col).alias("key"), frac.alias("frac"))
    partials = h.groupBy("key", F.spark_partition_id().alias("pid")).agg(
        F.slice(F.array_sort(F.collect_set("frac")), 1, k).alias("mins")
    )
    merged = partials.groupBy("key").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("mins")))),
            1,
            k,
        ).alias("mins")
    )
    a = merged.select(F.col("key").alias("key_a"), F.col("mins").alias("ma"))
    b = merged.select(F.col("key").alias("key_b"), F.col("mins").alias("mb"))
    pairs = a.join(b, F.col("key_a") < F.col("key_b"))
    union_mins = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("ma"), F.col("mb")))), 1, k
    )
    est = pairs.select(
        "key_a",
        "key_b",
        "ma",
        "mb",
        union_mins.alias("um"),
    )
    n_um = F.size("um")
    union_est = F.when(
        n_um < k, n_um.cast("double")
    ).otherwise(
        F.floor((F.lit(k - 1) / F.element_at("um", k)) + 0.5)
    )
    in_both = F.size(
        F.array_intersect(F.array_intersect(F.col("um"), F.col("ma")), F.col("mb"))
    )
    kmv_est = F.floor(in_both / n_um * union_est + 0.5).cast("long")

    d = events.select(F.col(key_col).alias("key"), F.col(id_col).alias("id")).distinct()
    ea = d.select(F.col("key").alias("key_a"), "id")
    eb = d.select(F.col("key").alias("key_b"), "id")
    exact = (
        ea.join(eb, "id")
        .filter(F.col("key_a") < F.col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    return (
        est.select("key_a", "key_b", kmv_est.alias("kmv_intersection"))
        .join(exact, ["key_a", "key_b"], "left")
        .select(
            "key_a",
            "key_b",
            "kmv_intersection",
            F.coalesce("exact_intersection", F.lit(0)).alias("exact_intersection"),
        )
    )


def oneway_anova(
    df: DataFrame,
    group_col: str,
    value_col,
    digits: int = 6,
) -> DataFrame:
    """One-way ANOVA over a numeric column across groups: the F
    statistic (between-group over within-group variance) and η²
    (variance explained) — the "does this label actually structure this
    feature" test, e.g. whether embedding norms genuinely differ by
    class before anyone trusts a norm-based filter.

    Sufficient statistics only: per-group (n, Σx, Σx²) with exact
    decimal sums, then closed-form SSB/SSW from the bounded group
    table — no residual pass, engine-deterministic.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    per_g = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("ni"),
        dsum(v, 9).alias("si"),
        dsum(v * v, 9).alias("qi"),
    )
    agg = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ni").cast("long").alias("n"),
        F.sum("si").alias("s"),
        F.sum("qi").alias("q"),
        F.sum(F.col("si") * F.col("si") / F.col("ni")).alias("sb"),
    )
    ssb = F.col("sb") - F.col("s") * F.col("s") / F.col("n")
    ssw = F.col("q") - F.col("sb")
    fstat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    return agg.select(
        "n",
        "k",
        round_half_up(fstat, digits).alias("f_stat"),
        round_half_up(ssb / (ssb + ssw), digits).alias("eta_squared"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    digits: int = 6,
) -> DataFrame:
    """Two-sample Mann–Whitney U rank-sum test between the
    ``value_col`` distributions of two groups — the non-parametric
    location-shift screen that pairs with [KS] for drift audits: KS
    answers "did the shape change", the rank test answers "did one
    source systematically shift longer/shorter", with a tie-corrected
    normal-approximation z and the rank-biserial effect size.

    Scale shape (the same one as ``ks_drift``): one (value, side)
    count aggregate, then midranks via a cumulative window over the
    DISTINCT VALUE histogram — bounded by the value domain, never raw
    rows. All rank algebra stays in integers (2·R_A =
    Σ c_a·(2·cum_before + t + 1) avoids the half-rank fractions), so
    U is exact and engine-portable; only the final z / effect-size
    divisions touch doubles, with the expression structure mirrored
    verbatim in the oracle.
    """
    sided = df.filter(F.col(group_col).isin(group_a, group_b)).select(
        F.col(value_col).cast("long").alias("v"),
        (F.col(group_col) == group_a).alias("is_a"),
    )
    counts = sided.groupBy("v").agg(
        F.sum(F.col("is_a").cast("long")).alias("ca"),
        F.sum((~F.col("is_a")).cast("long")).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.select(
        "ca",
        "cb",
        (F.col("ca") + F.col("cb")).alias("t"),
        F.coalesce(
            F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0)
        ).alias("cum_before"),
    )
    agg = cum.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(
            F.col("ca") * (2 * F.col("cum_before") + F.col("t") + 1)
        ).cast("long").alias("r2a"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).cast("long").alias("tie_term"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    n = na + nb
    u2 = F.col("r2a") - na * (na + 1)
    var = (
        na * nb
        * ((n + F.lit(1.0)) - F.col("tie_term") / (n * (n - F.lit(1.0))))
        / F.lit(12.0)
    )
    return agg.select(
        "n_a",
        "n_b",
        (u2 / F.lit(2.0)).alias("u_stat"),
        round_half_up(
            (u2 - na * nb) / (F.lit(2.0) * F.sqrt(var)), digits
        ).alias("z_score"),
        round_half_up(
            F.lit(1.0) - u2 / (na * nb).cast("double"), digits
        ).alias("rank_biserial"),
    )


def hhi_concentration(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_col,
    scale: int = 4,
    digits: int = 6,
) -> DataFrame:
    """Herfindahl–Hirschman concentration index of ``value_col`` mass
    across ``key_col`` holders within each ``group_col`` — the
    market-concentration companion to [gini]: HHI = Σ share² is the
    antitrust-standard read-out ("is this nation's revenue one
    customer deep?"), directly comparable across groups and rounds.

    Two keyed aggregates: per-(group, key) exact decimal sums, then a
    per-group rollup joined back for shares (the totals table is
    group-cardinality — bounded — and re-aggregation of the per-key
    decimal sums is still exact, so the denominator is
    partition-independent). Share² terms are 9-dp rounded and
    decimal-summed; output HHI, holder count, and the top holder's
    share per group.
    """
    per_key = df.groupBy(
        F.col(group_col).alias("grp"), F.col(key_col).alias("key")
    ).agg(dsum(value_col, scale).alias("rev"))
    totals = per_key.groupBy("grp").agg(
        dsum("rev", scale).alias("tot"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("rev").alias("max_rev"),
    )
    share_sq = round_half_up(
        (F.col("rev") / F.col("tot")) * (F.col("rev") / F.col("tot")), 9
    )
    return (
        per_key.join(totals, "grp")
        .groupBy("grp", "n_keys", "tot", "max_rev")
        .agg(round_half_up(dsum(share_sq, 9), digits).alias("hhi"))
        .select(
            F.col("grp").alias(group_col),
            "n_keys",
            "hhi",
            round_half_up(F.col("max_rev") / F.col("tot"), digits).alias(
                "top_share"
            ),
        )
    )


def exact_group_median(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_col,
    scale: int = 4,
    digits: int = 2,
) -> DataFrame:
    """Exact median of per-key totals within each group (e.g. median
    customer lifetime value per nation) — the nested-aggregate query
    every BI layer gets wrong with approximate percentiles: the
    per-key totals are exact decimal sums, and the median is the
    true middle element (or the mean of the two middles), not an
    interpolation of a sketch.

    Per-key totals first (one keyed shuffle), then a row_number
    window PARTITIONED by group over the per-key aggregate (bounded:
    one row per key within the group, never raw rows) with a
    (value, key) tiebreak, and the middle pick by exact rank
    arithmetic. Decimal totals are exactly representable as doubles
    at the 4-dp money scale, so the two-middle mean is
    engine-deterministic.
    """
    per_key = df.groupBy(
        F.col(group_col).alias("grp"), F.col(key_col).alias("key")
    ).agg(dsum(value_col, scale).alias("total"))
    w = Window.partitionBy("grp").orderBy("total", "key")
    ranked = per_key.select(
        "grp",
        "total",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("cnt"),
    )
    mid = ranked.where(
        (F.col("rn") == F.floor((F.col("cnt") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("cnt") + 2) / 2))
    )
    return mid.groupBy("grp").agg(
        F.max("cnt").cast("long").alias("n_keys"),
        round_half_up(F.sum("total") / F.count(F.lit(1)), digits).alias(
            "median_total"
        ),
    ).withColumnRenamed("grp", group_col)


def theil_sen_trend(
    df: DataFrame,
    x_col: str,
    y_col: str,
    digits: int = 6,
) -> DataFrame:
    """Theil–Sen robust trend estimate over a BOUNDED (x, y) series —
    the median of all pairwise slopes, the standard outlier-immune
    alternative to OLS for "is this metric drifting?" monitoring (one
    wild month moves OLS arbitrarily; it moves the pairwise-slope
    median not at all).

    The caller aggregates the raw fact table down to the bounded
    series FIRST (e.g. one row per month) — the pairwise self-join is
    O(k²) of the SERIES length, never of the data, and the median
    pick is a row_number over those ≤ k² slope rows (allow-listed
    bounded unpartitioned window, like vocab_growth_curve). Slopes
    are computed as double((y_j − y_i)) / (x_j − x_i) with integer x
    distances; the even-count median is the mean of the two middle
    slopes, ordered with an (x_i, x_j) tiebreak so rank selection is
    engine-deterministic.

    Returns one row: (n_points, n_pairs, median_slope, pct_positive).
    """
    a = df.select(
        F.col(x_col).cast("long").alias("xi"),
        F.col(y_col).alias("yi"),
    )
    b = df.select(
        F.col(x_col).cast("long").alias("xj"),
        F.col(y_col).alias("yj"),
    )
    pairs = a.join(b, F.col("xi") < F.col("xj")).select(
        "xi",
        "xj",
        (
            (F.col("yj") - F.col("yi")).cast("double")
            / (F.col("xj") - F.col("xi")).cast("double")
        ).alias("slope"),
    )
    w = Window.orderBy("slope", "xi", "xj")
    ranked = pairs.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))
        ).alias("np"),
        (F.col("slope") > 0).cast("long").alias("pos"),
    )
    n_points = df.select(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    mid = ranked.groupBy("np").agg(
        round_half_up(
            F.sum(
                F.when(
                    (F.col("rn") == F.floor((F.col("np") + 1) / 2))
                    | (F.col("rn") == F.floor((F.col("np") + 2) / 2)),
                    F.col("slope"),
                )
            )
            / F.sum(
                F.when(
                    (F.col("rn") == F.floor((F.col("np") + 1) / 2))
                    | (F.col("rn") == F.floor((F.col("np") + 2) / 2)),
                    F.lit(1),
                )
            ),
            digits,
        ).alias("median_slope"),
        round_half_up(F.sum("pos") / F.max("np"), digits).alias(
            "pct_positive"
        ),
    )
    return n_points.crossJoin(
        mid.select(
            F.col("np").cast("long").alias("n_pairs"),
            "median_slope",
            "pct_positive",
        )
    )


def spearman_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    digits: int = 6,
) -> DataFrame:
    """Spearman rank correlation of two LOW-CARDINALITY numeric
    columns within each group, computed entirely from the joint
    histogram — the scale-correct way to rank-correlate fact-table
    columns: ranking a 100-TB table through a window is a single-task
    global sort, but when the value domains are bounded (quantities,
    discount steps, ratings), the average rank of every VALUE is pure
    prefix arithmetic over the per-value counts, and all Pearson
    moments over ranks are exact integer sums over the joint cells.

    Shape: one (group, x, y) hash aggregate (bounded cells), two
    marginal rollups with a cumulative window PARTITIONED by group
    over the bounded value domain, then integer moment sums — the
    doubled average rank 2r(v) = 2·count(<v) + count(=v) + 1 keeps
    every intermediate a BIGINT (exact, order-independent), and the
    single final rho division is the only double op, so both engines
    agree bit-for-bit before rounding.

    Returns (group, n, rho) per group.
    """
    cells = df.groupBy(
        F.col(group_col).alias("grp"),
        F.col(x_col).alias("xv"),
        F.col(y_col).alias("yv"),
    ).agg(F.count(F.lit(1)).alias("n_cell"))
    xm = cells.groupBy("grp", "xv").agg(F.sum("n_cell").alias("cx"))
    wx = (
        Window.partitionBy("grp")
        .orderBy("xv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    xr = xm.select(
        "grp",
        "xv",
        (2 * F.sum("cx").over(wx) - F.col("cx") + 1).alias("rx2"),
    )
    ym = cells.groupBy("grp", "yv").agg(F.sum("n_cell").alias("cy"))
    wy = (
        Window.partitionBy("grp")
        .orderBy("yv")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    yr = ym.select(
        "grp",
        "yv",
        (2 * F.sum("cy").over(wy) - F.col("cy") + 1).alias("ry2"),
    )
    j = cells.join(xr, ["grp", "xv"]).join(yr, ["grp", "yv"])
    sums = j.groupBy("grp").agg(
        F.sum("n_cell").cast("long").alias("n"),
        F.sum(F.col("n_cell") * F.col("rx2")).cast("long").alias("sx"),
        F.sum(F.col("n_cell") * F.col("ry2")).cast("long").alias("sy"),
        F.sum(F.col("n_cell") * F.col("rx2") * F.col("rx2"))
        .cast("long")
        .alias("sxx"),
        F.sum(F.col("n_cell") * F.col("ry2") * F.col("ry2"))
        .cast("long")
        .alias("syy"),
        F.sum(F.col("n_cell") * F.col("rx2") * F.col("ry2"))
        .cast("long")
        .alias("sxy"),
    )
    num = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    )
    denx = (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    deny = (
        F.col("n").cast("double") * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    return sums.select(
        F.col("grp").alias(group_col),
        "n",
        round_half_up(
            num / F.sqrt(denx * deny), digits
        ).alias("rho"),
    )


def mann_kendall_trend(
    df: DataFrame,
    x_col: str,
    y_col: str,
    digits: int = 6,
) -> DataFrame:
    """Mann–Kendall trend test over a BOUNDED (x, y) series — the
    nonparametric "is there ANY monotonic trend" significance test
    that pairs with [theil_sen_trend]'s magnitude estimate: S is the
    sum of pairwise sign(y_j − y_i), and the tie-corrected normal
    approximation turns it into a z-score a monitoring alert can
    threshold on.

    Like theil_sen_trend, the caller aggregates down to the bounded
    series first; the pairwise join is O(k²) of the series length.
    S and both variance terms are exact integers (sign sums and the
    Σt(t−1)(2t+5) tie correction from a groupBy on y); the z-score's
    continuity-corrected division is the only double op.

    Returns one row: (n_points, s_stat, var_s, z_score).
    """
    a = df.select(
        F.col(x_col).cast("long").alias("xi"), F.col(y_col).alias("yi")
    )
    b = df.select(
        F.col(x_col).cast("long").alias("xj"), F.col(y_col).alias("yj")
    )
    s_stat = (
        a.join(b, F.col("xi") < F.col("xj"))
        .select(F.signum(F.col("yj") - F.col("yi")).alias("sgn"))
        .agg(F.sum("sgn").cast("long").alias("s_stat"))
    )
    n_tot = df.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    ties = (
        df.groupBy(F.col(y_col).alias("yv"))
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    joined = s_stat.crossJoin(n_tot).crossJoin(ties)
    n = F.col("n_points")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.col("tie_term")
    ).cast("double") / F.lit(18.0)
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1).cast("double") / F.sqrt(var_s),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1).cast("double") / F.sqrt(var_s),
        )
        .otherwise(F.lit(0.0))
    )
    return joined.select(
        "n_points",
        "s_stat",
        round_half_up(var_s, digits).alias("var_s"),
        round_half_up(z, digits).alias("z_score"),
    )


def kendall_tau_by_group(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    digits: int = 6,
) -> DataFrame:
    """Kendall τ-b rank correlation within each group, computed from
    the joint value histogram — the concordant/discordant companion
    to [spearman_by_group] for the same bounded-domain setting: all
    pair tallies come from a self-join of the CELL table (cells², not
    rows²), so a 100-TB fact table costs one histogram shuffle plus
    arithmetic over a few thousand cells.

    Concordant/discordant weights are exact integer products of cell
    counts; the tie corrections n1 = Σ tx(tx−1)/2, n2 = Σ ty(ty−1)/2
    come from the marginal histograms; τ-b's denominator
    √((n0−n1)(n0−n2)) is computed double-side (the factors overflow
    BIGINT at scale) with both engines casting identically.

    Returns (group, n, n_concordant, n_discordant, tau_b).
    """
    cells = df.groupBy(
        F.col(group_col).alias("grp"),
        F.col(x_col).alias("xv"),
        F.col(y_col).alias("yv"),
    ).agg(F.count(F.lit(1)).alias("n_cell"))
    a = cells.select(
        "grp",
        F.col("xv").alias("x1"),
        F.col("yv").alias("y1"),
        F.col("n_cell").alias("n1"),
    )
    b = cells.select(
        F.col("grp").alias("grp2"),
        F.col("xv").alias("x2"),
        F.col("yv").alias("y2"),
        F.col("n_cell").alias("n2"),
    )
    pairs = a.join(
        b, (F.col("grp") == F.col("grp2")) & (F.col("x1") < F.col("x2"))
    )
    pq = pairs.groupBy("grp").agg(
        F.sum(
            F.when(F.col("y2") > F.col("y1"), F.col("n1") * F.col("n2"))
            .otherwise(0)
        )
        .cast("long")
        .alias("n_concordant"),
        F.sum(
            F.when(F.col("y2") < F.col("y1"), F.col("n1") * F.col("n2"))
            .otherwise(0)
        )
        .cast("long")
        .alias("n_discordant"),
    )
    totals = cells.groupBy("grp").agg(
        F.sum("n_cell").cast("long").alias("n")
    )
    tx = (
        cells.groupBy("grp", "xv")
        .agg(F.sum("n_cell").alias("t"))
        .groupBy("grp")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1))
            .cast("long")
            .alias("tx2")
        )
    )
    ty = (
        cells.groupBy("grp", "yv")
        .agg(F.sum("n_cell").alias("t"))
        .groupBy("grp")
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1))
            .cast("long")
            .alias("ty2")
        )
    )
    j = pq.join(totals, "grp").join(tx, "grp").join(ty, "grp")
    n0x2 = F.col("n") * (F.col("n") - 1)  # 2·n0, exact long
    tau = (
        (F.col("n_concordant") - F.col("n_discordant")).cast("double")
        / F.sqrt(
            ((n0x2 - F.col("tx2")).cast("double") / F.lit(2.0))
            * ((n0x2 - F.col("ty2")).cast("double") / F.lit(2.0))
        )
    )
    return j.select(
        F.col("grp").alias(group_col),
        "n",
        "n_concordant",
        "n_discordant",
        round_half_up(tau, digits).alias("tau_b"),
    )


def cramers_v(
    df: DataFrame,
    row_col: str,
    col_col: str,
    digits: int = 6,
) -> DataFrame:
    """Cramér's V association strength between two categorical
    columns — the [0,1]-normalized scalar on top of
    [chi2_association]'s per-cell table: V = √(χ²/(n·(min(r,c)−1)))
    is comparable across column pairs and table sizes, the number a
    schema-profiling pass reports for every categorical pair.

    Same bounded dense grid as chi2_association (observed counts,
    margins, zero cells contribute expected mass); χ² cell terms are
    9-dp rounded and decimal-summed so the total is order- and
    engine-independent. Returns one row:
    (n, n_rows, n_cols, chi2, cramers_v).
    """
    obs = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("c")
    ).agg(F.count(F.lit(1)).alias("o"))
    rm = obs.groupBy("r").agg(F.sum("o").alias("nr"))
    cm = obs.groupBy("c").agg(F.sum("o").alias("nc"))
    tot = obs.agg(F.sum("o").alias("n"))
    grid = (
        rm.crossJoin(cm)
        .crossJoin(F.broadcast(tot))
        .join(obs, ["r", "c"], "left")
        .select(
            "n",
            F.coalesce("o", F.lit(0)).alias("o"),
            (F.col("nr") * F.col("nc") / F.col("n")).alias("e"),
        )
    )
    cell_chi2 = round_half_up(
        F.pow(F.col("o") - F.col("e"), F.lit(2.0)) / F.col("e"), 9
    )
    agg = grid.groupBy("n").agg(dsum(cell_chi2, 9).alias("chi2"))
    dims = (
        rm.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .crossJoin(cm.agg(F.count(F.lit(1)).cast("long").alias("n_cols")))
    )
    return (
        agg.crossJoin(F.broadcast(dims))
        .select(
            F.col("n").cast("long").alias("n"),
            "n_rows",
            "n_cols",
            round_half_up(F.col("chi2"), digits).alias("chi2"),
            round_half_up(
                F.sqrt(
                    F.col("chi2")
                    / (
                        F.col("n").cast("double")
                        * (
                            F.least(F.col("n_rows"), F.col("n_cols")) - 1
                        ).cast("double")
                    )
                ),
                digits,
            ).alias("cramers_v"),
        )
    )


def levene_brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: str,
    digits: int = 6,
) -> DataFrame:
    """Brown–Forsythe test statistic for equality of VARIANCES across
    groups (Levene's test with the median center — the robust form):
    a one-way ANOVA on |x − group median|. The companion check to
    [oneway_anova], which compares means and silently assumes the
    variances already match — exactly the assumption this audits.

    Scale shape: everything runs on the bounded (group, value)
    HISTOGRAM — group medians come from a cumulative walk over the
    per-group value domain (never a row sort), and the deviation
    moments are integer sums in doubled units (Z = |2v − 2·median| is
    exact BIGINT arithmetic; the factor 4 cancels in the W ratio).
    Per-group terms are 9-dp rounded and decimal-summed.

    Returns one row: (n_groups, n_total, w_stat).
    """
    h = df.groupBy(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    ng = h.groupBy("g").agg(F.sum("c").cast("long").alias("n_g"))
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = h.select("g", "v", "c", F.sum("c").over(w).alias("cum")).join(
        ng, "g"
    )
    r1 = F.floor((F.col("n_g") + 1) / 2)
    r2 = F.floor((F.col("n_g") + 2) / 2)
    m1 = cum.where(
        (F.col("cum") - F.col("c") < r1) & (r1 <= F.col("cum"))
    ).select("g", F.col("v").alias("m1"))
    m2 = cum.where(
        (F.col("cum") - F.col("c") < r2) & (r2 <= F.col("cum"))
    ).select("g", F.col("v").alias("m2"))
    med = m1.join(m2, "g").select(
        "g", (F.col("m1") + F.col("m2")).cast("long").alias("med2")
    )
    z = h.join(med, "g").select(
        "g",
        "c",
        F.abs(2 * F.col("v").cast("long") - F.col("med2")).alias("z2"),
    )
    per_g = z.groupBy("g").agg(
        F.sum("c").cast("long").alias("n_g"),
        F.sum(F.col("c") * F.col("z2")).cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("z2") * F.col("z2"))
        .cast("long")
        .alias("s2"),
    )
    tot = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n_tot"),
        F.sum("s1").cast("long").alias("s1_tot"),
    )
    joined = per_g.crossJoin(F.broadcast(tot))
    m_g = F.col("s1").cast("double") / F.col("n_g").cast("double")
    m_all = F.col("s1_tot").cast("double") / F.col("n_tot").cast("double")
    between_term = round_half_up(
        F.col("n_g").cast("double") * (m_g - m_all) * (m_g - m_all), 9
    )
    within_term = round_half_up(
        F.col("s2").cast("double")
        - F.col("s1").cast("double")
        * F.col("s1").cast("double")
        / F.col("n_g").cast("double"),
        9,
    )
    agg = joined.groupBy("k", "n_tot").agg(
        dsum(between_term, 9).alias("between"),
        dsum(within_term, 9).alias("within"),
    )
    return agg.select(
        F.col("k").alias("n_groups"),
        F.col("n_tot").alias("n_total"),
        round_half_up(
            (F.col("n_tot") - F.col("k")).cast("double")
            / (F.col("k") - 1).cast("double")
            * F.col("between")
            / F.col("within"),
            digits,
        ).alias("w_stat"),
    )


def holt_linear_backtest(
    df: DataFrame,
    x_col: str,
    y_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    digits: int = 6,
) -> DataFrame:
    """Holt's linear (double-exponential) smoothing over a BOUNDED
    series with a one-step-ahead backtest: level/trend recursion from
    (l = y₂, b = y₂ − y₁), forecasting each next point and scoring
    the mean absolute error — the five-line forecaster every capacity
    dashboard runs before anyone reaches for a model, with the MAE
    saying whether even that is beating persistence.

    The recursion is inherently sequential, so it runs as ONE
    Arrow-batched applyInPandas over the caller-aggregated bounded
    series (a few hundred rows — same contract as theil_sen /
    mann_kendall: aggregate first, then O(k) state). Plain-Python
    float ops in data order, so the DuckDB recursive-CTE oracle
    reproduces the exact IEEE sequence.

    Returns one row: (n_points, mae, level, trend, forecast_next).
    """
    import pandas as pd

    a, b_ = float(alpha), float(beta)
    scale = float(10**digits)

    def _fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("__x")
        y = [float(v) for v in pdf["__y"]]
        n = len(y)
        if n < 3:
            return pd.DataFrame(
                [
                    {
                        "n_points": n,
                        "mae": None,
                        "level": None,
                        "trend": None,
                        "forecast_next": None,
                    }
                ]
            )
        lvl = y[1]
        trd = y[1] - y[0]
        serr = 0.0
        cnt = 0
        import math

        for t in range(2, n):
            f = lvl + trd
            serr += abs(y[t] - f)
            cnt += 1
            new_l = a * y[t] + (1 - a) * (lvl + trd)
            trd = b_ * (new_l - lvl) + (1 - b_) * trd
            lvl = new_l
        rnd = lambda v: math.floor(v * scale + 0.5) / scale  # noqa: E731
        return pd.DataFrame(
            [
                {
                    "n_points": n,
                    "mae": rnd(serr / cnt),
                    "level": rnd(lvl),
                    "trend": rnd(trd),
                    "forecast_next": rnd(lvl + trd),
                }
            ]
        )

    bounded = df.select(
        F.col(x_col).alias("__x"), F.col(y_col).cast("double").alias("__y")
    )
    return bounded.groupBy(F.lit(1).alias("__g")).applyInPandas(
        _fit,
        "n_points long, mae double, level double, trend double, "
        "forecast_next double",
    )


def ab_variant_lift(
    df: DataFrame,
    user_col: str = "user_id",
    event_col: str = "event_type",
    conversion_event: str = "purchase",
    value_col: str = "value",
    min_value: float = 150.0,
    digits: int = 6,
) -> DataFrame:
    """A/B experiment readout with a deterministic hash split: users are
    assigned variant A/B by md5 parity (the classic stable bucketing —
    the same user lands in the same arm on every run, every engine, at
    any parallelism), conversion = the user emitted ``conversion_event``
    with ``value_col`` ≥ ``min_value`` at least once (the value floor
    keeps the metric non-degenerate on a fixture where every user
    purchases — and mirrors real "qualified conversion" definitions),
    and the readout is each arm's rate plus the lift and
    the two-proportion pooled z statistic — the decision row an
    experimentation platform computes per metric.

    Determinism: arm sizes and conversion counts are exact integers;
    rate / lift / z are double arithmetic over those exact inputs
    (engine-identical), rounded at ``digits``.

    Scale shape: one user-keyed aggregate (conversion flag via max), one
    4-row (variant × converted) count table, then scalar algebra — the
    z computation never touches row-level data again.
    """
    per_user = (
        df.select(
            F.col(user_col).alias("u"),
            (
                (F.col(event_col) == conversion_event)
                & (F.col(value_col) >= min_value)
            ).cast("int").alias("conv"),
        )
        .groupBy("u")
        .agg(F.max("conv").alias("converted"))
        .select(
            "u",
            "converted",
            F.when(
                F.conv(
                    F.substring(F.md5(F.col("u").cast("string")), 1, 8), 16, 10
                ).cast("bigint")
                % 2
                == 0,
                F.lit("A"),
            )
            .otherwise(F.lit("B"))
            .alias("variant"),
        )
    )
    arms = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    a = arms.filter(F.col("variant") == "A").select(
        F.col("n_users").alias("na"), F.col("n_converted").alias("ca")
    )
    b = arms.filter(F.col("variant") == "B").select(
        F.col("n_users").alias("nb"), F.col("n_converted").alias("cb")
    )
    wide = a.crossJoin(b)
    pa = F.col("ca") / F.col("na")
    pb = F.col("cb") / F.col("nb")
    pool = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    z = (pa - pb) / F.sqrt(
        pool * (1 - pool) * (1 / F.col("na") + 1 / F.col("nb"))
    )
    tall = wide.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("A").alias("variant"),
                    F.col("na").alias("n_users"),
                    F.col("ca").alias("n_converted"),
                    round_half_up(pa, digits).alias("rate"),
                ),
                F.struct(
                    F.lit("B").alias("variant"),
                    F.col("nb").alias("n_users"),
                    F.col("cb").alias("n_converted"),
                    round_half_up(pb, digits).alias("rate"),
                ),
            )
        ).alias("s"),
        round_half_up(pa - pb, digits).alias("lift"),
        round_half_up(z, digits).alias("z_score"),
    )
    return tall.select("s.variant", "s.n_users", "s.n_converted", "s.rate", "lift", "z_score")


def diag_mahalanobis_outliers(
    df: DataFrame,
    id_col: str,
    feature_cols: list[str],
    threshold: float = 9.0,
    digits: int = 4,
) -> DataFrame:
    """Multivariate outlier screen under a diagonal covariance: each
    entity's squared Mahalanobis distance Σ_f ((x_f − μ_f)/σ_f)² against
    the population, flagging rows above ``threshold`` (9.0 ≈ the 3σ
    ellipsoid for uncorrelated features). The multi-feature upgrade of
    the per-column z-score screens — an account that is mildly extreme
    on EVERY axis outscores one wild on a single axis.

    Determinism contract: μ and σ² come from exact decimal sums (the
    ``dsum`` discipline — feature columns must be ≤2-dp money or
    integers, which TPC-H's are), so the per-row double arithmetic runs
    on engine-identical inputs; m2 rounds at ``digits`` BEFORE the
    threshold compare, so the cut is the same everywhere.

    Scale shape: one 1-row global aggregate (broadcast), then a
    map-side projection — no shuffle after the stats pass; the filter
    pushes the entire screen into one scan.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in feature_cols:
        aggs.append(dsum(F.col(f), 4).alias(f"__s1_{f}"))
        aggs.append(dsum(F.col(f) * F.col(f), 4).alias(f"__s2_{f}"))
    stats1 = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(stats1))
    m2 = F.lit(0.0)
    for f in feature_cols:
        n = F.col("__n")
        mu = F.col(f"__s1_{f}") / n
        var = (F.col(f"__s2_{f}") - F.col(f"__s1_{f}") * mu) / (n - 1)
        m2 = m2 + F.pow((F.col(f) - mu) / F.sqrt(var), F.lit(2.0))
    return (
        joined.select(
            F.col(id_col), round_half_up(m2, digits).alias("m2")
        )
        .filter(F.col("m2") > threshold)
    )


def dispersion_index(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    digits: int = 6,
) -> DataFrame:
    """Overdispersion screen per key: the variance-to-mean ratio (index
    of dispersion) of DAILY event counts plus the chi-square statistic
    (n−1)·VMR — VMR ≈ 1 is Poisson-compatible arrivals, VMR ≫ 1 means
    bursty/clumped traffic (bots, batch jobs, incident retries), the
    standard first look before any rate-based alerting threshold is
    trusted.

    Daily counts are exact integers, so mean and sample variance are
    double arithmetic over exact sums — engine-identical; outputs round
    at ``digits``.

    Scale shape: one (key, day) count aggregate, then a key-sized
    moment aggregate — the raw stream is touched once.
    """
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
        )
        .groupBy("key", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    m = daily.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    n = F.col("n_days")
    mean = F.col("s1") / n
    var = (F.col("s2") - F.col("s1") * mean) / (n - 1)
    return m.select(
        F.col("key").alias(key_col),
        "n_days",
        round_half_up(mean, digits).alias("mean_daily"),
        round_half_up(var, digits).alias("var_daily"),
        round_half_up(var / mean, digits).alias("vmr"),
        round_half_up((n - 1) * var / mean, digits).alias("chi2"),
    )


def kaplan_meier_curve(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    cust_col: str = "o_custkey",
    censor_months: int = 6,
    digits: int = 6,
) -> DataFrame:
    """Kaplan–Meier survival curve of customer lifetime (months between
    first and last order), with right-censoring: a customer whose last
    order falls within ``censor_months`` of the corpus end is CENSORED
    (still alive — we just stopped watching), not churned; ignoring
    censoring is the classic retention-analysis mistake this estimator
    exists to fix. S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over event (churn)
    times.

    Determinism: lifetimes are integer month diffs (year·12+month
    arithmetic on string-formatted parts — no tz-dependent date math),
    dᵢ/nᵢ are integer ratios, and the product accumulates as a
    cumulative sum of 9-dp-rounded ln(1−dᵢ/nᵢ) terms (decimal-exact)
    exponentiated once — with an exact-zero flag so a 100%-event time
    renders S = 0 instead of exp(−∞).

    Scale shape: one customer-keyed aggregate, one bounded
    (months-domain) aggregate, then windows over that bounded table
    only.
    """
    ym = (
        F.date_format(F.col(date_col), "yyyy").cast("int") * 12
        + F.date_format(F.col(date_col), "MM").cast("int")
    )
    per = orders.groupBy(F.col(cust_col).alias("c")).agg(
        F.min(ym).alias("first_m"), F.max(ym).alias("last_m")
    )
    corpus_end = per.agg(F.max("last_m").alias("end_m"))
    life = per.crossJoin(F.broadcast(corpus_end)).select(
        (F.col("last_m") - F.col("first_m")).alias("t"),
        (F.col("last_m") <= F.col("end_m") - censor_months)
        .cast("int")
        .alias("event"),
    )
    at_t = life.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_at_t"),
        F.sum("event").cast("bigint").alias("d"),
    )
    w_all = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    w_after = Window.orderBy("t").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    risk = at_t.withColumn("n_risk", F.sum("n_at_t").over(w_after))
    term = F.when(
        F.col("d") > 0,
        round_half_up(F.log(1 - F.col("d") / F.col("n_risk")), 9),
    ).otherwise(F.lit(0.0))
    dead = (F.col("d") == F.col("n_risk")).cast("int")
    curve = (
        risk.withColumn("__term", term)
        .withColumn("__dead", F.max(dead).over(w_all))
        .withColumn(
            "__logs",
            F.sum(
                F.when(F.col("d") < F.col("n_risk"), F.col("__term"))
                .otherwise(F.lit(0.0))
                .cast("decimal(28,9)")
            ).over(w_all),
        )
    )
    return curve.select(
        F.col("t").alias("t_months"),
        F.col("n_risk").alias("n_at_risk"),
        F.col("d").alias("n_events"),
        F.when(F.col("__dead") == 1, F.lit(0.0))
        .otherwise(
            round_half_up(F.exp(F.col("__logs").cast("double")), digits)
        )
        .alias("survival"),
    )


def two_way_anova(
    df: DataFrame,
    a_col: str,
    b_col: str,
    y_col: str,
    digits: int = 6,
) -> DataFrame:
    """Two-way factorial ANOVA with interaction (unweighted/sequential
    sums of squares — exact for near-balanced designs, the standard
    screening decomposition otherwise): how much of ``y_col``'s
    variance each factor, and their interaction, explains — upgrading
    the one-way ANOVA already in the suite to the crossed design every
    "does the effect differ by segment" question needs.

    SS_A = Σ_a n_a(ȳ_a−ȳ)², SS_B likewise, SS_cells = Σ_ab n_ab(ȳ_ab−ȳ)²,
    SS_AB = SS_cells − SS_A − SS_B, SS_err = SS_tot − SS_cells; F per
    term against MS_err. ``y_col`` must be integer-valued (quantities,
    counts) so every moment is an exact integer sum and the double
    algebra runs on engine-identical inputs.

    Scale shape: ONE scan building the (a, b) cell moment table
    (bounded grid); margins and totals are aggregates of the cells.
    Output: one row per source of variation (a, b, interaction,
    residual) with df, ss, ms, f.
    """
    cells = df.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(y_col)).cast("bigint").alias("s"),
        F.sum(F.col(y_col) * F.col(y_col)).cast("bigint").alias("q"),
    )
    am = cells.groupBy("a").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    )
    bm = cells.groupBy("b").agg(
        F.sum("n").alias("n"), F.sum("s").alias("s")
    )
    tot = cells.agg(
        F.sum("n").alias("nt"),
        F.sum("s").alias("st"),
        F.sum("q").alias("qt"),
        F.count(F.lit(1)).alias("n_cells"),
        F.count_distinct("a").alias("ka"),
        F.count_distinct("b").alias("kb"),
    )
    gm = F.col("st") / F.col("nt")
    # each group's n·(ȳ−ȳ..)² term is rounded at 9 dp and summed as
    # exact decimal so the (tiny but shuffled) margin tables aggregate
    # identically under any partial-aggregation order
    dev_ss = lambda: F.sum(  # noqa: E731
        round_half_up(
            F.col("n")
            * (F.col("s") / F.col("n") - gm)
            * (F.col("s") / F.col("n") - gm),
            9,
        ).cast("decimal(38,9)")
    ).cast("double")
    ssa = am.crossJoin(F.broadcast(tot)).agg(
        F.max("nt").alias("nt"), F.max("st").alias("st"),
        F.max("qt").alias("qt"), F.max("n_cells").alias("n_cells"),
        F.max("ka").alias("ka"), F.max("kb").alias("kb"),
        dev_ss().alias("ss_a"),
    )
    ssb = bm.crossJoin(F.broadcast(tot)).agg(dev_ss().alias("ss_b"))
    ssc = cells.crossJoin(F.broadcast(tot)).agg(dev_ss().alias("ss_cells"))
    wide = ssa.crossJoin(F.broadcast(ssb)).crossJoin(F.broadcast(ssc))
    ss_tot = F.col("qt") - F.col("st") * (F.col("st") / F.col("nt"))
    ss_ab = F.col("ss_cells") - F.col("ss_a") - F.col("ss_b")
    ss_err = ss_tot - F.col("ss_cells")
    df_a = F.col("ka") - 1
    df_b = F.col("kb") - 1
    df_ab = F.col("n_cells") - F.col("ka") - F.col("kb") + 1
    df_err = F.col("nt") - F.col("n_cells")
    ms_err = ss_err / df_err
    rows = F.array(
        F.struct(
            F.lit("a").alias("term"),
            df_a.cast("long").alias("df"),
            round_half_up(F.col("ss_a"), digits).alias("ss"),
            round_half_up(F.col("ss_a") / df_a, digits).alias("ms"),
            round_half_up(F.col("ss_a") / df_a / ms_err, digits).alias("f"),
        ),
        F.struct(
            F.lit("b").alias("term"),
            df_b.cast("long").alias("df"),
            round_half_up(F.col("ss_b"), digits).alias("ss"),
            round_half_up(F.col("ss_b") / df_b, digits).alias("ms"),
            round_half_up(F.col("ss_b") / df_b / ms_err, digits).alias("f"),
        ),
        F.struct(
            F.lit("interaction").alias("term"),
            df_ab.cast("long").alias("df"),
            round_half_up(ss_ab, digits).alias("ss"),
            round_half_up(ss_ab / df_ab, digits).alias("ms"),
            round_half_up(ss_ab / df_ab / ms_err, digits).alias("f"),
        ),
        F.struct(
            F.lit("residual").alias("term"),
            df_err.cast("long").alias("df"),
            round_half_up(ss_err, digits).alias("ss"),
            round_half_up(ms_err, digits).alias("ms"),
            F.lit(None).cast("double").alias("f"),
        ),
    )
    return wide.select(F.explode(rows).alias("r")).select(
        "r.term", "r.df", "r.ss", "r.ms", "r.f"
    )


def daily_entropy_trend(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    digits: int = 6,
) -> DataFrame:
    """Mix-drift monitor: the Shannon entropy of the event-type
    distribution PER DAY, plus the OLS slope of entropy over the day
    index — a negative slope means traffic is concentrating onto fewer
    types (a bot flood, a dying feature), long before any single
    type's share alarms.

    Per-day entropy terms are integer-count ratios rounded at 9 dp and
    decimal-summed; the regression runs over the bounded day domain
    with x = row_number in day order and x·y products decimal-exact
    (y is the 6-dp entropy). Output: one row — n_days, mean_entropy,
    slope_per_day, intercept.
    """
    daily = (
        df.select(
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
            F.col(key_col).alias("k"),
        )
        .groupBy("day", "k")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dtot = daily.groupBy("day").agg(F.sum("c").cast("bigint").alias("n"))
    hterm = round_half_up(
        -(F.col("c") / F.col("n")) * F.log2(F.col("c") / F.col("n")), 9
    )
    ent = (
        daily.join(dtot, "day")
        .groupBy("day")
        .agg(
            round_half_up(
                F.sum(hterm.cast("decimal(28,9)")).cast("double"), digits
            ).alias("h")
        )
    )
    w = Window.orderBy("day")
    xy = ent.withColumn("x", F.row_number().over(w).cast("long"))
    reg = xy.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("h").cast("decimal(28,9)")).cast("double").alias("sy"),
        F.sum(
            (F.col("x") * F.col("h")).cast("decimal(28,9)")
        ).cast("double").alias("sxy"),
    )
    nn = F.col("n_days")
    slope = (nn * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nn * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return reg.select(
        "n_days",
        round_half_up(F.col("sy") / nn, digits).alias("mean_entropy"),
        round_half_up(slope, digits).alias("slope_per_day"),
        round_half_up(
            (F.col("sy") - slope * F.col("sx")) / nn, digits
        ).alias("intercept"),
    )


def cuped_adjusted_lift(
    df: DataFrame,
    cutoff_day: str = "2024-01-16",
    user_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    digits: int = 6,
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. 2013):
    per user, X = pre-period value sum (before ``cutoff_day``) and
    Y = post-period value sum; the adjusted metric
    Y′ = Y − θ·(X − X̄) with θ = cov(X,Y)/var(X) removes the variance
    the pre-period already explains, so the same arms give a tighter
    lift estimate — the standard upgrade every experimentation platform
    applies before reading an A/B test. Arms reuse the md5-parity
    bucketing of ``ab_variant_lift``.

    Determinism: values are milli-unit integers, all moment sums exact
    integer arithmetic; θ and the adjusted means are double algebra
    over exact inputs, rounded at ``digits``. Output one row per
    variant carrying the experiment-level columns (theta, raw and
    CUPED lift, variance-reduction share ρ²).

    Scale shape: one user-keyed conditional aggregate, one 1-row
    moment aggregate, one 2-row arm aggregate — scalar algebra after.
    """
    day = F.date_format(F.col(ts_col), "yyyy-MM-dd")
    vm = F.floor(F.col(value_col).cast("double") * 1000 + 0.5).cast("long")
    per_user = (
        df.select(
            F.col(user_col).alias("u"),
            F.when(day < cutoff_day, vm).otherwise(F.lit(0)).alias("xv"),
            F.when(day >= cutoff_day, vm).otherwise(F.lit(0)).alias("yv"),
        )
        .groupBy("u")
        .agg(
            F.sum("xv").cast("bigint").alias("x"),
            F.sum("yv").cast("bigint").alias("y"),
        )
        .select(
            "u", "x", "y",
            F.when(
                F.conv(
                    F.substring(F.md5(F.col("u").cast("string")), 1, 8), 16, 10
                ).cast("bigint")
                % 2
                == 0,
                F.lit("A"),
            )
            .otherwise(F.lit("B"))
            .alias("variant"),
        )
    )
    g = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    arms = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").cast("bigint").alias("ax"),
        F.sum("y").cast("bigint").alias("ay"),
    )
    wide = arms.crossJoin(F.broadcast(g))
    n = F.col("n")
    mx = F.col("sx") / n
    cov = F.col("sxy") / n - mx * (F.col("sy") / n)
    varx = F.col("sxx") / n - mx * mx
    vary = F.col("syy") / n - (F.col("sy") / n) * (F.col("sy") / n)
    theta = cov / varx
    rho2 = cov * cov / (varx * vary)
    mean_y = F.col("ay") / F.col("n_users")
    mean_x = F.col("ax") / F.col("n_users")
    adj = mean_y - theta * (mean_x - mx)
    # experiment-level lifts: recompute from the 2-row arm table pivoted
    per_variant = wide.select(
        "variant",
        "n_users",
        round_half_up(mean_y / 1000, digits).alias("mean_post"),
        round_half_up(adj / 1000, digits).alias("mean_adjusted"),
        round_half_up(theta, digits).alias("theta"),
        round_half_up(rho2, digits).alias("rho2"),
    )
    lifts = per_variant.agg(
        F.sum(
            F.when(F.col("variant") == "A", F.col("mean_post")).otherwise(
                -F.col("mean_post")
            )
        ).alias("lift_raw"),
        F.sum(
            F.when(F.col("variant") == "A", F.col("mean_adjusted")).otherwise(
                -F.col("mean_adjusted")
            )
        ).alias("lift_cuped"),
    )
    return (
        per_variant.crossJoin(F.broadcast(lifts))
        .select(
            "variant",
            "n_users",
            "mean_post",
            "mean_adjusted",
            "theta",
            "rho2",
            round_half_up(F.col("lift_raw"), digits).alias("lift_raw"),
            round_half_up(F.col("lift_cuped"), digits).alias("lift_cuped"),
        )
    )


def funnel_step_ab_significance(
    df: DataFrame,
    steps: list[tuple[str, float]] | None = None,
    user_col: str = "user_id",
    event_col: str = "event_type",
    value_col: str = "value",
    digits: int = 6,
) -> DataFrame:
    """Per-funnel-step A/B significance: for every (step, min_value)
    of the funnel, each md5-parity arm's QUALIFIED completion rate
    (share of users who emitted the step's event with value ≥ the
    step's floor — the value floor keeps rates non-degenerate on a
    fixture where every user touches every type, and mirrors real
    "qualified action" definitions) and the two-proportion pooled z —
    localizing WHERE in the funnel an experiment moves behavior
    instead of reading a single end-conversion number.

    Determinism: per-user step flags via integer max, arm counts exact;
    rate/z double algebra over exact integers, rounded at ``digits``.

    Scale shape: ONE user-keyed aggregate builds all step flags in a
    single pass (conditional max per step), then a (steps × 2)-row
    aggregate and scalar algebra.
    """
    steps = steps or [
        ("view", 90.0), ("click", 90.0), ("signup", 90.0), ("purchase", 150.0)
    ]
    flags = [
        F.max(
            (
                (F.col(event_col) == s) & (F.col(value_col) >= mv)
            ).cast("int")
        ).alias(f"__s{i}")
        for i, (s, mv) in enumerate(steps)
    ]
    per_user = (
        df.select(F.col(user_col).alias("u"), F.col(event_col), F.col(value_col))
        .groupBy("u")
        .agg(*flags)
        .select(
            "u",
            *[F.col(f"__s{i}") for i in range(len(steps))],
            F.when(
                F.conv(
                    F.substring(F.md5(F.col("u").cast("string")), 1, 8), 16, 10
                ).cast("bigint")
                % 2
                == 0,
                F.lit("A"),
            )
            .otherwise(F.lit("B"))
            .alias("variant"),
        )
    )
    arms = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        *[
            F.sum(F.col(f"__s{i}")).cast("bigint").alias(f"__c{i}")
            for i in range(len(steps))
        ],
    )
    tall = arms.select(
        "variant",
        "n_users",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("step"),
                        F.lit(i).alias("step_idx"),
                        F.col(f"__c{i}").alias("n_completed"),
                    )
                    for i, (s, _mv) in enumerate(steps)
                ]
            )
        ).alias("x"),
    ).select(
        "variant", "n_users", "x.step", "x.step_idx", "x.n_completed"
    )
    a = tall.filter(F.col("variant") == "A").select(
        "step",
        "step_idx",
        F.col("n_users").alias("na"),
        F.col("n_completed").alias("ca"),
    )
    b = tall.filter(F.col("variant") == "B").select(
        F.col("step").alias("__step"),
        F.col("n_users").alias("nb"),
        F.col("n_completed").alias("cb"),
    )
    wide = a.join(b, a["step"] == b["__step"]).drop("__step")
    pa = F.col("ca") / F.col("na")
    pb = F.col("cb") / F.col("nb")
    pool = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    # pooled rate 0 or 1 → zero variance → z undefined (NULL), which a
    # tiny fixture's all-qualify step can produce
    z = F.when(
        (pool > 0) & (pool < 1),
        (pa - pb)
        / F.sqrt(pool * (1 - pool) * (1 / F.col("na") + 1 / F.col("nb"))),
    )
    return wide.select(
        "step",
        F.col("step_idx").cast("int").alias("step_idx"),
        F.col("na").alias("n_users_a"),
        F.col("ca").alias("n_completed_a"),
        F.col("nb").alias("n_users_b"),
        F.col("cb").alias("n_completed_b"),
        round_half_up(pa, digits).alias("rate_a"),
        round_half_up(pb, digits).alias("rate_b"),
        round_half_up(z, digits).alias("z_score"),
    )


def seasonal_naive_backtest(
    orders: DataFrame,
    date_col: str = "o_orderdate",
    value_col: str = "o_totalprice",
    digits: int = 6,
) -> DataFrame:
    """Forecast-baseline backtest: score the two baselines every
    forecasting effort must beat — naive (next month = last month) and
    seasonal-naive (next month = same month last year) — on the monthly
    revenue series, reporting each method's MAPE and mean absolute
    error over the months where both forecasts exist. The sanity bar
    for ``events_holt_forecast``-class models: a fancy model that loses
    to seasonal-naive is negative value.

    Determinism: monthly revenue is an exact decimal sum (2-dp money),
    so errors are exact 2-dp decimals summed exactly; APE terms round
    at 9 dp then decimal-sum (standing rule). Month keys are integer
    year·12+month arithmetic on string-formatted parts — no
    tz-dependent date math.

    Scale shape: one month-keyed aggregate, two self-joins on the
    BOUNDED month table, one 2-row output.
    """
    ym = (
        F.date_format(F.col(date_col), "yyyy").cast("int") * 12
        + F.date_format(F.col(date_col), "MM").cast("int")
    )
    monthly = orders.groupBy(ym.alias("ym")).agg(
        dsum(value_col, 2).alias("rev")
    )
    base = monthly.select("ym", "rev")

    def backtest(lag: int, label: str) -> DataFrame:
        f = base.select(
            (F.col("ym") + lag).alias("ym"), F.col("rev").alias("fc")
        )
        joined = base.join(f, "ym")
        ape = round_half_up(
            F.abs(F.col("rev") - F.col("fc")) / F.col("rev"), 9
        )
        return joined.agg(
            F.lit(label).alias("method"),
            F.count(F.lit(1)).alias("n_months"),
            round_half_up(
                F.sum(ape.cast("decimal(28,9)")).cast("double")
                / F.count(F.lit(1)),
                digits,
            ).alias("mape"),
            round_half_up(
                F.sum(
                    F.abs(F.col("rev") - F.col("fc")).cast("decimal(27,2)")
                ).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("mean_abs_err"),
        )
    return backtest(1, "naive").unionByName(
        backtest(12, "seasonal_naive")
    )


def lead_lag_correlation(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    digits: int = 6,
) -> DataFrame:
    """Lead–lag discovery between event-type daily series: Pearson r at
    lag 0 (co-movement) and lag 1 (does a's volume today predict b's
    tomorrow) for every ordered type pair — the screen that surfaces
    causal-ish orderings (views lead purchases) a same-day correlation
    matrix hides.

    Daily counts are integers, so every correlation moment is an exact
    integer sum — engine-identical; r rounds at ``digits``. Day+1
    arithmetic runs on parsed 'yyyy-MM-dd' strings (date math on the
    NTZ-derived day key, no session-tz dependence).

    Scale shape: one (type, day) aggregate, two self-joins on the
    bounded day table (|types|²·|days| rows), one |types|²-row output.
    """
    daily = (
        df.select(
            F.col(key_col).alias("k"),
            F.date_format(F.col(ts_col), "yyyy-MM-dd").alias("day"),
        )
        .groupBy("k", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    def corr_at(lagged: DataFrame, label: str) -> DataFrame:
        j = daily.select(
            F.col("k").alias("ka"), F.col("day"), F.col("c").alias("x")
        ).join(lagged, "day")
        m = j.filter(F.col("ka") != F.col("kb")).groupBy("ka", "kb").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        )
        n = F.col("n")
        num = n * F.col("sxy") - F.col("sx") * F.col("sy")
        den = F.sqrt(
            (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            * (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
        )
        return m.select(
            "ka",
            "kb",
            F.col("n").alias(f"n_{label}"),
            round_half_up(num / den, digits).alias(f"r_{label}"),
        )

    same = daily.select(
        F.col("k").alias("kb"), F.col("day"), F.col("c").alias("y")
    )
    tomorrow = daily.select(
        F.col("k").alias("kb"),
        F.date_format(
            F.date_sub(F.to_date(F.col("day")), 1), "yyyy-MM-dd"
        ).alias("day"),  # b's count indexed at the PREVIOUS day: x(t)·y(t+1)
        F.col("c").alias("y"),
    )
    return corr_at(same, "lag0").join(
        corr_at(tomorrow, "lag1"), ["ka", "kb"]
    )


def gini_by_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_col: str,
    digits: int = 6,
) -> DataFrame:
    """Per-group Gini drift: the Gini coefficient of how ``value_col``
    concentrates across ``key_col`` WITHIN each ``group_col`` slice —
    e.g. revenue concentration across nations per year, the "is the
    business getting more dependent on few markets" trend a single
    all-time Gini hides.

    Same sorted-formula shape as ``gini_concentration`` but the ranking
    window partitions BY GROUP over the (group × key) aggregate —
    bounded by the key domain per group, never raw rows. Per-key totals
    are exact decimal sums, so ordering and score are
    partition-independent.
    """
    per = df.groupBy(F.col(group_col).alias("grp"), F.col(key_col)).agg(
        dsum(value_col).alias("__v")
    )
    w = Window.partitionBy("grp").orderBy(F.col("__v").asc(), F.col(key_col))
    ranked = per.select("grp", "__v", F.row_number().over(w).alias("__i"))
    return (
        ranked.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            round_half_up(
                (2.0 * F.sum(F.col("__i") * F.col("__v")))
                / (F.count(F.lit(1)) * F.sum("__v"))
                - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
                digits,
            ).alias("gini"),
        )
        .select(F.col("grp").alias(group_col), "n_groups", "gini")
    )


def gap_burstiness(
    df: DataFrame,
    key_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    digits: int = 6,
) -> DataFrame:
    """Goh–Barabási burstiness coefficient B = (σ−μ)/(σ+μ) of
    inter-event gaps per key: B ≈ −1 for periodic arrivals, ≈ 0 for
    Poisson, → 1 for heavy-tailed bursts — the one-number upgrade of
    the dispersion screen that reads the GAP distribution instead of
    binned counts (robust to bin-width choices).

    Gaps are integer seconds (microsecond diffs integer-divided), so
    μ and σ come from exact integer sums; B is double algebra over
    exact inputs, rounded at ``digits``.

    Scale shape: one user-partitioned lag window (per-user streams),
    one key-sized moment aggregate.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    gaps = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(user_col),
            F.col(ts_col),
            F.col(id_col),
        )
        .select(
            "key",
            F.timestamp_diff(
                "MICROSECOND", F.lag(ts_col).over(w), F.col(ts_col)
            ).alias("gap_us"),
        )
        .where(F.col("gap_us").isNotNull())
        .select("key", F.expr("gap_us div 1000000").alias("g"))
    )
    m = gaps.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("g").cast("bigint").alias("s1"),
        F.sum(F.col("g") * F.col("g")).cast("bigint").alias("s2"),
    )
    n = F.col("n_gaps")
    mu = F.col("s1") / n
    sigma = F.sqrt((F.col("s2") - F.col("s1") * mu) / (n - 1))
    return m.select(
        F.col("key").alias(key_col),
        "n_gaps",
        round_half_up(mu, 2).alias("mean_gap_s"),
        round_half_up((sigma - mu) / (sigma + mu), digits).alias("burstiness"),
    )


def circular_hour_stats(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    digits: int = 6,
) -> DataFrame:
    """Circular (directional) statistics of event time-of-day per key:
    map each event's second-of-day to an angle, report the mean
    resultant length R̄ (0 = uniform around the clock, 1 = all events
    at the same instant) and the mean direction as an hour — the
    CORRECT way to average times-of-day (arithmetic means break at
    midnight: 23:00 and 01:00 average to NOON, not midnight; the
    circular mean gets it right).

    Determinism: each event's cos/sin term is rounded to 9 dp and
    decimal-summed (libm ulp differences sit far below that grid —
    the ln/log2 precedent), angles come from exact integer
    second-of-day, and atan2/sqrt run on the identical rounded sums.

    Scale shape: one key-partitioned aggregate over a three-column
    projection; output is one row per key.
    """
    import math

    sec = (
        F.date_format(F.col(ts_col), "HH").cast("int") * 3600
        + F.date_format(F.col(ts_col), "mm").cast("int") * 60
        + F.date_format(F.col(ts_col), "ss").cast("int")
    )
    theta = sec.cast("double") * (2.0 * math.pi / 86400.0)
    c9 = round_half_up(F.cos(theta), 9).cast("decimal(28,9)")
    s9 = round_half_up(F.sin(theta), 9).cast("decimal(28,9)")
    agg = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(c9).cast("double").alias("sc"),
        F.sum(s9).cast("double").alias("ss"),
    )
    n = F.col("n_events")
    rbar = F.sqrt(F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss")) / n
    mean_angle = F.atan2(F.col("ss"), F.col("sc"))  # (-pi, pi]
    mean_hour = (
        (mean_angle / (2.0 * math.pi) * 24.0 + 24.0) % 24.0
    )
    return agg.select(
        F.col("key").alias(key_col),
        "n_events",
        round_half_up(rbar, digits).alias("resultant_length"),
        round_half_up(mean_hour, digits).alias("mean_hour"),
    )


def hill_tail_index(
    df: DataFrame,
    value_col: str,
    k: int = 500,
    digits: int = 6,
) -> DataFrame:
    """Hill estimator of the power-law tail index over the top-``k``
    order statistics: α = k / Σᵢ ln(xᵢ/x_min) with x_min the (k+1)-th
    largest value — the standard answer to "how heavy is this tail",
    which decides whether means/variances are even meaningful for the
    column (α ≤ 2 → infinite variance).

    The top-(k+1) cut is TakeOrderedAndProject (ties on the row via the
    value itself, deterministic for the value multiset); the ln terms
    round at 9 dp and decimal-sum. Output: one row — k, x_min, alpha.

    Scale shape: one distributed partial top-k, then arithmetic on
    k+1 rows.
    """
    top = (
        df.select(F.col(value_col).cast("double").alias("v"))
        .orderBy(F.col("v").desc())
        .limit(k + 1)
    )
    xmin = top.agg(F.min("v").alias("xmin"))
    terms = (
        top.crossJoin(F.broadcast(xmin))
        .filter(F.col("v") > F.col("xmin"))
        .select(
            round_half_up(F.log(F.col("v") / F.col("xmin")), 9).alias("t"),
            "xmin",
        )
    )
    return terms.groupBy("xmin").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        round_half_up(
            F.count(F.lit(1))
            / F.sum(F.col("t").cast("decimal(28,9)")).cast("double"),
            digits,
        ).alias("alpha"),
    ).select("k", F.col("xmin").alias("x_min"), "alpha")
