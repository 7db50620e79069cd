"""Core relational operators (SURVEY.md §2.3-§2.5 batch surface).

Each function is a *logical plan builder*: it takes input DataFrames and
returns an unevaluated DataFrame. Physical strategy (broadcast vs shuffle
join, partial aggregation, pushdown) is Catalyst's job; we only declare
intent and, where the stats can't know (small dims), hint ``broadcast``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_helloworld_spark.functions import davg, dec, dsum, words_of


def word_count(lines: DataFrame, text_col: str = "text") -> DataFrame:
    """The reference hello-world: source → flatMap split → map (word,1) →
    keyBy → rolling sum (reference HelloWorldFlinkTest.java:39-49), with
    its token filters (drop blank / ``http*`` / ``--`` tokens,
    HelloWorldFlinkTest.java:195-200).

    Batch final state of the rolling sum = plain group-by count. The
    explode stays JVM-side; the aggregation is map-side partial + final
    (HashAggregate pair), so it scales linearly with input splits.
    """
    return (
        lines.select(F.explode(words_of(F.col(text_col))).alias("word"))
        .where(
            (F.col("word") != "")
            & ~F.col("word").startswith("http")
            & ~F.col("word").contains("--")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def pricing_summary(lineitem: DataFrame, ship_cutoff: str = "2000-12-01") -> DataFrame:
    """TPC-H Q1-shaped keyed aggregation: filters + multi-agg group-by +
    decimal money math (reference's rolling sums A1/A4 + BigDecimal math,
    StateTest.java:584-621, evaluated to batch final state).

    The shipdate predicate is pushed into the parquet scan; sums are exact
    decimal (partition-order independent) cast back to double.
    """
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,4)") + dec("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def denormalize_orders(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Star-schema denormalization into one wide row — the batch analog of
    the reference's capstone 5-stream ``BdWaybillOrder`` pipeline
    (StateTest.java:639-872): every fact row enriched with all its
    dimensions.

    Scale shape: one shuffle join on the biggest pair
    (lineitem ⋈ orders on orderkey); every other dim is broadcast, so the
    plan has exactly one exchange of the fact table regardless of how many
    dimensions are attached.
    """
    dims = (
        F.broadcast(customer)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    revenue = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            revenue.cast("double").alias("revenue"),
            "l_shipdate",
            "o_orderstatus",
            "o_orderdate",
            "o_orderpriority",
            F.col("c_name").alias("customer_name"),
            "c_mktsegment",
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


def rolling_sum(
    df: DataFrame,
    key: str,
    order: list[str],
    value: str,
    alias: str = "running_total",
) -> DataFrame:
    """Per-key rolling aggregation with per-row emission — the reference's
    ``KeyedStream.sum`` semantics ("滚动", HelloWorldFlinkTest.java:45,78):
    every input row produces an updated cumulative row.

    Batch expression: a window function over (key ORDER BY order). One
    shuffle on the key; within partitions the cumulative sum is a single
    sort + linear scan (WindowExec), no state explosion.
    """
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(alias, F.sum(dec(value)).over(w).cast("double"))


def rolling_fold(
    df: DataFrame, key: str, order: list[str], value: str
) -> DataFrame:
    """``KeyedStream.fold`` (HelloWorldFlinkTest.java:409-415): rolling
    accumulate with a *type-changing* output — each row carries its own
    value plus the running total and running count per key."""
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn("running_total", F.sum(dec(value)).over(w).cast("double")).withColumn(
        "running_count", F.count(F.lit(1)).over(w)
    )


def last_non_null_merge(
    df: DataFrame, key: str, order: str, merge_cols: list[str]
) -> DataFrame:
    """Per-key last-non-null-wins record merge — the reference's rolling
    ``reduce`` with ``Optional.ofNullable(...).ifPresent(...)`` per field
    (StateTest.java:371-382,686-697): later rows overwrite only the fields
    they carry.

    Batch final state: for each column, the last non-null value in arrival
    order. Expressed as ``last(col, ignorenulls)`` over an unbounded
    window + keep one row per key — deterministic because `order` is a
    total order within key.
    """
    w_all = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_rank = Window.partitionBy(key).orderBy(F.col(order).desc())
    merged = df.select(
        key,
        order,
        *[F.last(c, ignorenulls=True).over(w_all).alias(c) for c in merge_cols],
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w_rank))
        .where(F.col("_rn") == 1)
        .drop("_rn", order)
    )


def filter_split(df: DataFrame, predicate: Column) -> tuple[DataFrame, DataFrame]:
    """Side outputs (reference OutputTag + ctx.output, SURVEY.md §2.7):
    one stream split into main/side by complementary filters. Both
    branches share the parent plan; null predicate rows go to the side
    channel (matching Flink: rows the main path doesn't select)."""
    main = df.where(predicate)
    side = df.where(~F.coalesce(predicate, F.lit(False)))
    return main, side


def union_streams(*dfs: DataFrame) -> DataFrame:
    """Same-type stream union (reference ``union``,
    HelloWorldFlinkTest.java:192; StateTest.java:683). ``unionByName``
    keeps column alignment by name, with nulls for side-specific fields."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def scd2_intervals(
    orders: DataFrame,
    key: str = "o_custkey",
    attr: str = "o_orderpriority",
    time_col: str = "o_orderdate",
    seq_col: str = "o_orderkey",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history build: collapse a keyed
    change stream into validity intervals [valid_from, valid_to) per
    attribute value, open interval (NULL valid_to) = current.

    The warehouse-side equivalent of the reference's last-non-null keyed
    merge (StateTest.java rolling reduce): instead of keeping only the
    latest value, keep every change with its validity range. Two window
    passes over the same (key, time, seq) ordering — change detection via
    lag(), interval close via lead() — one shuffle total (same partition
    key both passes, Catalyst reuses the sort). seq_col breaks same-day
    ties deterministically.
    """
    from pyspark.sql import Window as Wspec

    w = Wspec.partitionBy(key).orderBy(time_col, seq_col)
    # change detection must be NULL-safe: lag(attr) can't distinguish
    # "no previous row" from "previous attr was NULL", so a separate
    # lag(1) marks row-existence and the value compare uses <=> — a
    # HIGH -> NULL -> HIGH history yields three intervals instead of
    # dropping the NULL period and fabricating boundaries after it
    chg = (
        orders.select(key, attr, time_col, seq_col)
        .withColumn("_prev", F.lag(attr).over(w))
        .withColumn("_has_prev", F.lag(F.lit(1)).over(w))
        .where(
            F.col("_has_prev").isNull()
            | ~F.col("_prev").eqNullSafe(F.col(attr))
        )
        .select(key, attr, F.col(time_col).alias("valid_from"), seq_col)
    )
    w2 = Wspec.partitionBy(key).orderBy("valid_from", seq_col)
    nxt = F.lead("valid_from").over(w2)
    return chg.select(
        key,
        attr,
        "valid_from",
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def apply_changelog(
    changes: DataFrame,
    key: str,
    seq: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Materialize a changelog stream into its current table — the batch
    form of Flink's upsert-kafka table conversion (and of this engine's
    streaming KeyedUpsertSink, which applies the same semantics
    incrementally with tombstones): for each key keep only the row with
    the highest ``seq``; if that row is a delete, the key is gone.

    ``seq`` must be unique per key (a changelog offset/LSN — the Kafka
    offset in the reference's topology); this keeps the winner
    deterministic across engines. One window shuffle on the key."""
    from pyspark.sql import Window as Wspec

    w = Wspec.partitionBy(key).orderBy(F.col(seq).desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn", op_col)
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    tracked by distinct-active-day offset — the classic product-
    analytics rollup (and, for a training pipeline, the freshness view
    of a crawl: how much of each ingest cohort is still emitting).
    Complements the weekly `retention_cohorts` registry query (raw
    distinct-user counts): this is the DAY-granularity RATE view, with
    the cohort-size join and active/size normalization a dashboard
    plots directly.

    Scale shape: two user-keyed aggregations (first day; distinct active
    days — both map-side combinable and co-partitioned after one
    shuffle), then one cohort-keyed agg whose cardinality is
    days × offsets — tiny. The distinct-day projection dedups BEFORE
    the join, so the join carries at most one row per (user, day).

    Output: (cohort_day, day_offset, active_users, cohort_size,
    retention) with retention = active/size rounded to 6 dp.
    """
    firsts = events.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_day")
    )
    days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    joined = days.join(firsts, "user_id").select(
        "cohort_day",
        F.datediff("day", "cohort_day").alias("day_offset"),
        "user_id",
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    mat = joined.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )
    # cohort_day as ISO string: engine-portable (DATE objects surface
    # differently across Arrow/DuckDB result readers)
    return mat.join(sizes, "cohort_day").select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "active_users",
        "cohort_size",
        F.round(
            F.col("active_users").cast("double")
            / F.col("cohort_size").cast("double"),
            6,
        ).alias("retention"),
    )
