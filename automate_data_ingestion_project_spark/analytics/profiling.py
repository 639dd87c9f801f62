"""Table profiling — the data-quality summary every warehouse ships
(dbt docs / AWS Deequ / Great Expectations profilers): per-column null
counts, exact distinct counts, and min/max, in ONE pass over the table.

Shape: a single aggregate computes every column's metrics simultaneously
(Spark evaluates all aggregate expressions in one scan — no per-column
jobs), then the wide 1-row result unpivots to long (column, metric)
form driver-side-free via the stack expression.

Two registered variants:

- :func:`table_profile_approx` — the SCALE DEFAULT. DataSketches HLL
  (``hll_sketch_agg``, lgK=14 → rse ≈ 0.81%) keeps the profile a true
  single pass: partial sketches merge associatively, the shuffle
  carries ONE compact binary sketch per column, and no row
  multiplication happens. (HLL++ ``approx_count_distinct(rsd=0.01)``
  is semantically identical but exposes ~2.7k buffer attributes per
  sketch to the planner — measured 7× slower and an OOM risk; see
  :func:`_profile`.)
  Raw sketch values are engine-specific, so the REGISTERED form under
  this name (:func:`table_profile_approx_checked`) re-expresses the
  claim as per-column ``distinct_ok`` tolerance booleans the DuckDB
  oracle CAN hash-match — the driver runs a full value-hash check, not
  a rows-only one.
- :func:`table_profile` — the exact form, kept as the ORACLE query
  (hash-matched against DuckDB). Exact multi-column COUNT(DISTINCT)
  goes through Spark's Expand rewrite — a |columns|× row
  multiplication before the shuffle, which at 100 TB IS the job; fine
  at fixture scale, wrong as the default.

The same tolerance-boolean contract covers the quantile sketch
(:func:`quantile_sketch_calibration` — approx_percentile vs exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from .registry import register

_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@register(
    "table_profile",
    oracle=f"""
    {" UNION ALL ".join(
        f'''SELECT '{c}' AS column_name,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM orders'''
        for c in _COLS
    )}
    """,
    survey_ref="data-quality profiling: per-column null/distinct/min/max in one pass",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _profile(spark, sf_dir, exact=True)


def table_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-default profile: identical output shape to
    :func:`table_profile`, with a DataSketches HLL estimate (lgK=14,
    rse ≈ 0.81%) replacing the Expand-rewrite exact distinct (see
    module docstring). ``tests/test_plans.py`` asserts the plan
    contains NO Expand node and the estimates land within the
    documented error of exact."""
    return _profile(spark, sf_dir, exact=False)


@register(
    "table_profile_approx",
    oracle=f"""
    {" UNION ALL ".join(
        f'''SELECT '{c}' AS column_name,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value,
               TRUE AS distinct_ok
        FROM orders'''
        for c in _COLS
    )}
    """,
    survey_ref="data-quality profiling: approx-distinct scale default (sketch contract)",
)
def table_profile_approx_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HASH-CHECKABLE contract for the approx profile. HLL++ sketch
    values are engine-specific (DuckDB's sketch cannot hash-match
    Spark's), so the registered form re-expresses the claim so it does
    not have to: compute exact AND approx in ONE Spark pass and emit a
    per-column ``distinct_ok = |approx - exact| <= max(3, 5·rsd·exact)``
    boolean alongside the exact profile values; the oracle returns the
    identical exact profile with the expected all-TRUE column. Same
    measure-before-trusting discipline as ``minhash_estimate_error`` —
    the calibration deliberately pays the exact pass; the production
    scale default (:func:`table_profile_approx`, no Expand, plan-tested)
    skips it.

    The two profiles run as SEPARATE aggregates joined on column_name,
    not one fused aggregate: fusing 6 exact distincts (the Expand
    rewrite) with 6 HLL sketches multiplies partial-aggregation buffer
    memory across Expand groups × shuffle partitions — measured OOM on
    a 1 GiB driver at sf0.01 with the HLL++ buffers. Each pass alone is
    the already-proven shape; the join is 6 rows ⋈ 6 rows. Tolerance is
    ``max(3, 5·rse·exact)`` with rse = 0.01 — a deliberately loose 5%
    band (≈6 standard errors of the lgK=14 sketch, whose rse ≈ 0.81%),
    plus an absolute floor of 3 so tiny dimension tables (|distinct| ≤
    a few hundred) don't flap on sketch quantization."""
    rse = 0.01
    exact = _profile(spark, sf_dir, exact=True)
    approx = _profile(spark, sf_dir, exact=False).select(
        "column_name", F.col("n_distinct").alias("n_approx")
    )
    tol = F.greatest(F.lit(3.0), F.lit(5 * rse) * F.col("n_distinct"))
    return exact.join(approx, "column_name").select(
        "column_name",
        "n_nulls",
        "n_distinct",
        "min_value",
        "max_value",
        (F.abs(F.col("n_approx") - F.col("n_distinct")) <= tol).alias(
            "distinct_ok"
        ),
    )


@register(
    "heavy_hitters_sketch",
    oracle="""
    WITH stream AS (
        SELECT user_id FROM events
        UNION ALL
        SELECT 1000000 + (event_id % 3) AS user_id
        FROM events WHERE event_id % 2 = 0
    ),
    c AS (SELECT user_id, COUNT(*) AS exact_n FROM stream GROUP BY 1)
    SELECT user_id, exact_n,
           TRUE AS in_sketch_topk, TRUE AS est_within_tol
    FROM c ORDER BY exact_n DESC, user_id LIMIT 3
    """,
    survey_ref="data-quality profiling: approx heavy hitters (frequent-items sketch contract)",
)
def heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy-hitter detection (``approx_top_k``, the
    DataSketches frequent-items sketch) under the same hash-checkable
    calibration contract as :func:`table_profile_approx`: plant
    deterministic skew (three synthetic hot keys, each ~20× the hottest
    organic key), then assert the sketch (a) surfaces exactly the true
    top-3 and (b) estimates their counts within a generous N/8 bound —
    the oracle returns the exact top-3 with the expected all-TRUE
    columns.

    Why a sketch at all: exact top-k needs a full (key → count)
    aggregate — fine here, impossible at 100 TB key cardinality. The
    frequent-items sketch is fixed-size (``maxItemsTracked=64`` — far
    below the organic key count, so it genuinely compresses), merges
    associatively across partitions, and guarantees no false negatives
    for keys above the error bound. Estimate values depend on partial-
    merge order, so they are NOT hash-matched directly; the planted
    20× skew keeps both booleans deterministic under any merge order
    (sketch error ≲ N·3.5/64 ≪ the planted-vs-organic gap).

    The exact aggregate computed alongside is the calibration's ground
    truth, not the scale path; its global top-3 window runs on the
    already-aggregated key counts."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    heavy = ev.filter(F.col("event_id") % 2 == 0).select(
        (F.lit(1000000) + F.col("event_id") % 3).alias("user_id")
    )
    from ..operators.caching import tracked_persist
    from pyspark.sql import Window

    # feeds the sketch aggregate AND the exact ground-truth aggregate
    stream = tracked_persist(ev.select("user_id").unionByName(heavy))
    sk = stream.agg(
        F.expr("approx_top_k(user_id, 3, 64)").alias("tk"),
        F.count("*").alias("n_total"),
    )
    exact = stream.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    # bounded unpartitioned window: per-user aggregate rows, not events
    w = Window.orderBy(F.col("exact_n").desc(), F.col("user_id").asc())
    top3 = (
        exact.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 3")
        .drop("rn")
    )
    j = top3.join(F.broadcast(sk))
    items = F.transform("tk", lambda x: x["item"])
    est = F.element_at(
        F.filter("tk", lambda x: x["item"] == F.col("user_id")), 1
    )["count"]
    return j.select(
        "user_id",
        "exact_n",
        F.array_contains(items, F.col("user_id")).alias("in_sketch_topk"),
        (F.abs(est - F.col("exact_n")) <= F.col("n_total") / F.lit(8)).alias(
            "est_within_tol"
        ),
    )


_QUANTILES = (0.25, 0.5, 0.75)
_APPROX_ACC = 10000  # rank error <= n/accuracy


@register(
    "quantile_sketch_calibration",
    oracle=f"""
    WITH ex AS (
        SELECT {", ".join(f"quantile_cont(o_totalprice, {q}) AS e{i}"
                          for i, q in enumerate(_QUANTILES))}
        FROM orders
    )
    SELECT * FROM (
        {" UNION ALL ".join(
            f'''SELECT CAST({q} AS DOUBLE) AS quantile, e{i} AS exact_value,
                   TRUE AS within_tolerance FROM ex'''
            for i, q in enumerate(_QUANTILES)
        )}
    )
    """,
    survey_ref="data-quality profiling: approx-quantile sketch contract (scale default)",
)
def quantile_sketch_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approx-percentile twin of the :func:`table_profile_approx`
    contract: at 100 TB grouped/global quantiles run on the
    Greenwald-Khanna sketch (``approx_percentile`` — mergeable partial
    state, no global sort), and this query PROVES the sketch honors its
    error bound, hash-checkably. Exact and approx quantiles compute in
    one Spark pass; the emitted boolean is
    ``|approx − exact| ≤ 5% · IQR`` (value-domain tolerance derived
    from the exact quartiles — generous next to the sketch's ≤
    n/accuracy rank error, so nondeterministic sketch-merge order can
    never flip it); the oracle returns the exact values with the
    expected all-TRUE column. Same measure-before-trusting discipline
    as ``minhash_estimate_error`` / ``table_profile_approx``.
    """
    qlist = ", ".join(str(q) for q in _QUANTILES)
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.agg(
        F.expr(f"percentile(o_totalprice, array({qlist}))").alias("ex"),
        F.expr(
            f"approx_percentile(o_totalprice, array({qlist}), {_APPROX_ACC})"
        ).alias("ap"),
    )
    rows = wide.select(
        F.posexplode(
            F.arrays_zip(
                F.array(*[F.lit(float(q)) for q in _QUANTILES]).alias("q"),
                F.col("ex"),
                F.col("ap"),
            )
        ).alias("pos", "z"),
        (F.element_at("ex", 3) - F.element_at("ex", 1)).alias("iqr"),
    )
    return rows.select(
        F.col("z.q").alias("quantile"),
        F.col("z.ex").alias("exact_value"),
        (F.abs(F.col("z.ap") - F.col("z.ex")) <= 0.05 * F.col("iqr")).alias(
            "within_tolerance"
        ),
    )


def _profile(spark: SparkSession, sf_dir: str, exact: bool) -> DataFrame:
    from ..textops.dedup import spread_for_compute

    # Two layout decisions, both measured at sf0.1:
    #
    # - spread_for_compute: single-file fixture tables scan as ONE
    #   partition, serializing the whole aggregate on one core (3.3 s →
    #   0.5 s from this alone; no-op at scale, where inputs arrive with
    #   ≥cores splits).
    #
    # - counts and min/max run as SEPARATE aggregates joined at the end
    #   (1-row ⋈ 1-row), NOT one fused aggregate. min/max on STRING
    #   columns make the aggregation buffer variable-width, which
    #   forces the WHOLE fused aggregate onto the sort-based fallback —
    #   for the exact form that means sorting the |cols|×-Expanded
    #   relation on a string-first compound key (measured 4-8× the
    #   query). Split, the exact counts pass stays fixed-width →
    #   HashAggregate, and the min/max pass is a keyless single pass.
    #   The table is scanned twice, but a second columnar scan is far
    #   cheaper than sorting the expanded relation — at 100 TB the
    #   distinct pass, not the scan, is the job.
    #
    # - the approx distinct is DataSketches HLL (hll_sketch_agg,
    #   lgK=14 → rse ≈ 0.81%), NOT HyperLogLog++
    #   approx_count_distinct(rsd=0.01). Functionally equivalent; the
    #   difference is the AGGREGATION BUFFER REPRESENTATION. HLL++ at
    #   rsd=0.01 exposes its ~2.7k-word register array as individual
    #   buffer ATTRIBUTES — every plan transform copies 16k
    #   AttributeReferences for 6 columns, the task binary balloons to
    #   ~3 MiB ("Broadcasting large task binary"), 32 concurrent task
    #   deserializations OOM'd a 1 GiB heap, and the measured query
    #   was 6.5 s at sf0.1. The DataSketches buffer is ONE binary
    #   attribute per column: same split shape measured 0.87 s, no
    #   closure blow-up, estimates within 1.1% of exact on every
    #   fixture column. Inputs cast to string first (the sketch hashes
    #   int/long/string/binary only; the cast is injective for every
    #   profiled type, so distinct counts are preserved).
    base = load_table(spark, sf_dir, "orders")
    return _profile_df(base, exact)


def _profile_df(base: DataFrame, exact: bool) -> DataFrame:
    """The profile aggregate over an arbitrary relation carrying
    ``_COLS`` — shared by the snapshot profile queries and the
    snapshot-vs-snapshot drift monitor."""
    from ..textops.dedup import spread_for_compute

    orders = spread_for_compute(base)
    if exact:
        distinct = F.countDistinct
    else:
        def distinct(c):
            return F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col(c).cast("string"), F.lit(14))
            )

    counts, extremes = [], []
    for c in _COLS:
        counts += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_nulls"),
            distinct(c).alias(f"{c}__n_distinct"),
        ]
        extremes += [
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = orders.agg(*counts).join(orders.agg(*extremes))
    stack = ", ".join(
        f"'{c}', {c}__n_nulls, {c}__n_distinct, {c}__min, {c}__max"
        for c in _COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_COLS)}, {stack}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        )
    )


def _profile_cols_sql(rel: str) -> str:
    """Per-column exact profile of `rel` as a UNION ALL — the DuckDB
    twin of :func:`_profile_df` (exact form)."""
    return " UNION ALL ".join(
        f"""SELECT '{c}' AS column_name,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM {rel}"""
        for c in _COLS
    )


@register(
    "profile_drift",
    oracle=f"""
    WITH mut AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 2 = 0 THEN 'Z' ELSE o_orderstatus END
                   AS o_orderstatus,
               o_totalprice, o_orderdate,
               CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderpriority END
                   AS o_orderpriority
        FROM orders
    ),
    pb AS ({_profile_cols_sql("orders")}),
    pn AS ({_profile_cols_sql("mut")}),
    nr AS (SELECT COUNT(*) AS n_rows FROM orders)
    SELECT pb.column_name,
           pb.n_nulls AS n_nulls_base, pn.n_nulls AS n_nulls_new,
           pb.n_distinct AS n_distinct_base, pn.n_distinct AS n_distinct_new,
           ((pn.n_nulls - pb.n_nulls) * 200 > nr.n_rows) AS null_drift,
           (abs(pn.n_distinct - pb.n_distinct) * 10 > pb.n_distinct)
               AS distinct_drift,
           (pb.min_value IS DISTINCT FROM pn.min_value
            OR pb.max_value IS DISTINCT FROM pn.max_value) AS range_drift
    FROM pb JOIN pn USING (column_name) CROSS JOIN nr
    """,
    survey_ref="data-quality profiling: snapshot-vs-snapshot drift monitor (engine ext)",
)
def profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistics drift between two table snapshots — the monitoring
    query a nightly pipeline runs before promoting a new load: profile
    both sides, join per column, flag null-rate / distinct-count /
    range changes. The candidate snapshot here plants two real drift
    modes (a 10% null injection into o_orderpriority; a new
    o_orderstatus value on half the rows) so every flag fires
    deterministically somewhere and stays FALSE everywhere else.

    All three drift predicates compare INTEGERS or strings —
    ``(Δnulls)·200 > n_rows`` is "null rate rose by >0.5%" without a
    float boundary to flap cross-engine. Cost: two profile passes
    (each the proven split-aggregate shape) + a 6-row join; the row
    count rides along as a broadcast 1-row aggregate, and at 100 TB
    the baseline side's profile comes from the PREVIOUS run's stored
    result rather than a rescan (the join shape is unchanged)."""
    base = load_table(spark, sf_dir, "orders")
    mutated = base.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("Z")).otherwise(
            F.col("o_orderstatus")
        ),
    ).withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 10 == 0, F.lit(None).cast("string")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    pb = _profile_df(base, exact=True)
    pn = _profile_df(mutated, exact=True).select(
        F.col("column_name"),
        F.col("n_nulls").alias("nn"),
        F.col("n_distinct").alias("nd"),
        F.col("min_value").alias("mn"),
        F.col("max_value").alias("mx"),
    )
    n_rows = base.agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        pb.join(pn, "column_name")
        .crossJoin(F.broadcast(n_rows))
        .select(
            "column_name",
            F.col("n_nulls").alias("n_nulls_base"),
            F.col("nn").alias("n_nulls_new"),
            F.col("n_distinct").alias("n_distinct_base"),
            F.col("nd").alias("n_distinct_new"),
            ((F.col("nn") - F.col("n_nulls")) * 200 > F.col("n_rows")).alias(
                "null_drift"
            ),
            (
                F.abs(F.col("nd") - F.col("n_distinct")) * 10
                > F.col("n_distinct")
            ).alias("distinct_drift"),
            (
                ~F.col("min_value").eqNullSafe(F.col("mn"))
                | ~F.col("max_value").eqNullSafe(F.col("mx"))
            ).alias("range_drift"),
        )
    )


@register(
    "snapshot_diff",
    oracle="""
    WITH mut AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0
                    THEN o_totalprice + 1000.0 ELSE o_totalprice END
                   AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 11 <> 3
        UNION ALL
        SELECT o_orderkey + 10000000 AS o_orderkey,
               o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 13 = 1
    ),
    base AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders)
    SELECT CASE WHEN b.o_orderkey IS NULL THEN 'added'
                WHEN m.o_orderkey IS NULL THEN 'removed'
                WHEN b.o_totalprice IS DISTINCT FROM m.o_totalprice
                  OR b.o_orderstatus IS DISTINCT FROM m.o_orderstatus
                    THEN 'changed'
                ELSE 'unchanged' END AS change_kind,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN b.o_totalprice IS DISTINCT FROM m.o_totalprice
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_price_changes
    FROM base b FULL OUTER JOIN mut m USING (o_orderkey)
    GROUP BY 1
    """,
    survey_ref="snapshot reconciliation: row-level CDC diff by key (engine ext)",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff between two table snapshots — the reconciliation
    report behind every CDC backfill sign-off: per change kind
    (added / removed / changed / unchanged), how many rows, plus a
    per-column change counter. The candidate snapshot plants all three
    mutation modes deterministically (price bump on keys %7, deletes
    on keys %11, inserts cloned above the key space on keys %13).

    Scale shape: ONE full-outer hash join on the primary key — the
    diff never leaves the join's key partitioning, and the classifier
    is a codegen'd CASE over null-safe comparisons
    (``IS DISTINCT FROM`` ≡ ``eqNullSafe``), so column drift in either
    direction counts once. The rollup is a bounded-key aggregate
    (4 kinds). At 100 TB both sides are key-bucketed tables and the
    join is exchange-free.
    """
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    mut = (
        base.filter(F.col("o_orderkey") % 11 != 3)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1000.0
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderstatus",
        )
        .unionByName(
            base.filter(F.col("o_orderkey") % 13 == 1).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )
        )
    )
    b = base.alias("b")
    m = mut.alias("m")
    joined = b.join(m, F.col("b.o_orderkey") == F.col("m.o_orderkey"), "full_outer")
    price_changed = ~F.col("b.o_totalprice").eqNullSafe(F.col("m.o_totalprice"))
    status_changed = ~F.col("b.o_orderstatus").eqNullSafe(F.col("m.o_orderstatus"))
    kind = (
        F.when(F.col("b.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("m.o_orderkey").isNull(), F.lit("removed"))
        .when(price_changed | status_changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            kind.alias("change_kind"),
            price_changed.cast("int").alias("pc"),
        )
        .groupBy("change_kind")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("pc").cast("long").alias("n_price_changes"),
        )
    )


@register(
    "value_outliers_mad",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
        WHERE e.value IS NOT NULL
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           COUNT(*) AS n_values,
           ANY_VALUE(d.med) AS median_value,
           ANY_VALUE(m.mad) AS mad_value,
           CAST(SUM(CASE WHEN abs(d.value - d.med) > 3 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    survey_ref="data quality: robust MAD outlier gate per group (engine ext)",
)
def value_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per event_type: median / MAD (median
    absolute deviation) with the standard 3·1.4826·MAD fence — the
    data-quality gate that, unlike the z-score form
    (``lang_length_zscores``), does not let the outliers themselves
    inflate the threshold (mean/stddev break down at ≥1/4
    contamination; median/MAD tolerate it).

    Cross-engine parity: Spark exact ``percentile(x, 0.5)`` ==
    DuckDB ``quantile_cont`` bit-for-bit (same lower+(upper−lower)·frac
    interpolation — the repo's proven grouped-median bridge), and the
    fence multiplication keeps one operand order on both sides.

    Scale shape: two grouped exact medians (each one shuffle on
    event_type; at 100 TB swap ``percentile_approx`` with a documented
    error bound — same plan) and two small join-backs of ≤|groups|
    rows, broadcast by AQE.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(med, "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    fence = F.lit(3) * F.lit(1.4826) * F.col("mad")
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_values"),
            F.any_value("med").alias("median_value"),
            F.any_value("mad").alias("mad_value"),
            F.sum(
                F.when(F.abs(F.col("value") - F.col("med")) > fence, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )
