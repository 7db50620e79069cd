"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries map the SURVEY.md §2 operator inventory onto the driver's
TPC-H-ish tables; implementations live in ``flink_helloworld_spark``.

Float determinism contract: every aggregated double is computed as exact
DECIMAL and cast back to DOUBLE in BOTH the Spark plan and the oracle SQL,
so value hashes match bit-for-bit regardless of partitioning.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_helloworld_spark.operators import relational as R
from flink_helloworld_spark.operators import windows as W
from flink_helloworld_spark.functions import dsum
from flink_helloworld_spark.sources.tables import load_tables

DEC = "decimal(12,2)"  # inputs carry ≤2 decimals; products stay exact


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the capstone star-schema
    denormalization (reference StateTest.java:639-872 analog)."""
    t = load_tables(spark, "/root/testdata/sf0.001")
    return R.denormalize_orders(t.lineitem, t.orders, t.customer, t.nation, t.region)


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def _q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S1/P1/P2/P3/A1: the reference hello-world word count
    return R.word_count(load_tables(spark, sf_dir).documents)


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A4/A5/P6: filtered multi-aggregate group-by with decimal money math
    return R.pricing_summary(load_tables(spark, sf_dir).lineitem)


def _q_denorm_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J4 capstone analog: fact ⋈ 4 dims → wide row
    t = load_tables(spark, sf_dir)
    return R.denormalize_orders(t.lineitem, t.orders, t.customer, t.nation, t.region)


def _q_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A1: per-key rolling sum with per-row emission (batch analog)
    ev = load_tables(spark, sf_dir).events
    return R.rolling_sum(ev, "user_id", ["ts", "event_id"], "value").select(
        "user_id", "event_id", "running_total"
    )


def _q_rolling_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A2: rolling fold with type-changing output (value + total + count)
    ev = load_tables(spark, sf_dir).events
    return R.rolling_fold(ev, "user_id", ["ts", "event_id"], "value").select(
        "user_id", "event_id", "value", "running_total", "running_count"
    )


def _q_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W2/W4/A4: tumbling 1-day event-time window per event_type
    ev = load_tables(spark, sf_dir).events
    return W.tumbling_agg(
        ev, "ts", "1 day", ["event_type"],
        [F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value")],
    )


def _q_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W3: sliding 1h/30min window per event_type
    ev = load_tables(spark, sf_dir).events
    return W.sliding_agg(
        ev, "ts", "1 hour", "30 minutes", ["event_type"],
        [F.count(F.lit(1)).alias("cnt")],
    )


def _q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W5: merging session windows (30 min gap) per user
    ev = load_tables(spark, sf_dir).events
    return W.session_agg(
        ev, "ts", "30 minutes", ["user_id"],
        [F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value")],
    )


def _q_count_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W1: keyed count windows of 50, partial windows never fire
    ev = load_tables(spark, sf_dir).events
    return W.count_window_agg(ev, "user_id", ["ts", "event_id"], 50, "value")


def _q_trigger_evictor(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W6: GlobalWindows + CountTrigger(2) + CountEvictor(5)
    ev = load_tables(spark, sf_dir).events
    return W.global_window_every_n_keep_k(ev, "user_id", ["ts", "event_id"], "value", 2, 5)


def _q_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J2: window equi inner join (views ⋈ purchases in same hour per user)
    ev = load_tables(spark, sf_dir).events
    views = ev.where(F.col("event_type") == "view").select(
        F.window("ts", "1 hour").alias("w"), "user_id",
        F.col("event_id").alias("view_id"),
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.window("ts", "1 hour").alias("w"), "user_id",
        F.col("event_id").alias("purchase_id"), F.col("value").alias("purchase_value"),
    )
    return views.join(buys, ["w", "user_id"]).select(
        F.col("w.start").alias("window_start"),
        "user_id", "view_id", "purchase_id", "purchase_value",
    )


def _q_union_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J1/P1: union of two schema-aligned projections (tag-union pattern)
    t = load_tables(spark, sf_dir)
    a = t.orders.select(
        F.lit("order").alias("src"),
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("amount"),
    )
    b = t.lineitem.select(
        F.lit("lineitem").alias("src"),
        F.col("l_orderkey").alias("key"),
        F.col("l_extendedprice").alias("amount"),
    )
    return R.union_streams(a, b).groupBy("src").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("amount", "total_amount")
    )


def _q_merge_last_non_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A3/P7/T4: per-key last-non-null-wins merge (CEM-style enrichment)
    ev = load_tables(spark, sf_dir).events
    typed = ev.select(
        "user_id",
        "event_id",
        *[
            F.when(F.col("event_type") == et, F.col("value")).alias(f"v_{et}")
            for et in ("click", "view", "purchase", "signup", "error")
        ],
    )
    return R.last_non_null_merge(
        typed, "user_id", "event_id",
        [f"v_{et}" for et in ("click", "view", "purchase", "signup", "error")],
    )


def _q_side_output_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.7: filter-split side channel (below-threshold rows,
    # reference StateTest.java:624-633)
    ev = load_tables(spark, sf_dir).events
    _, side = R.filter_split(ev, F.col("value") > 100.0)
    return side.select("event_id", "user_id", "event_type", "value")


def _q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §1.2 JSON wire format: from_json/get_json_object parity (Jackson)
    ev = load_tables(spark, sf_dir).events
    return (
        ev.select("event_type", F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("cnt"))
    )


def _q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A7-analog + ordered limit: top 10 customers by exact revenue
    t = load_tables(spark, sf_dir)
    rev = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(dsum("l_extendedprice", "revenue"))
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(10)


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A11 + north-star exact dedup: hash-groupBy on document text
    docs = load_tables(spark, sf_dir).documents
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "wordcount": _q_wordcount,
        "pricing_summary": _q_pricing_summary,
        "denorm_wide": _q_denorm_wide,
        "rolling_sum": _q_rolling_sum,
        "rolling_fold": _q_rolling_fold,
        "tumbling_daily": _q_tumbling_daily,
        "sliding_hourly": _q_sliding_hourly,
        "session_windows": _q_session_windows,
        "count_windows": _q_count_windows,
        "trigger_evictor": _q_trigger_evictor,
        "window_join": _q_window_join,
        "union_streams": _q_union_streams,
        "merge_last_non_null": _q_merge_last_non_null,
        "side_output_split": _q_side_output_split,
        "json_extract": _q_json_extract,
        "top_customers": _q_top_customers,
        "dedup_exact": _q_dedup_exact,
    }


# --------------------------------------------------------------------------
# oracles (DuckDB SQL on pre-registered views)
# --------------------------------------------------------------------------

_D = "DECIMAL(18,4)"
_D2 = "DECIMAL(12,2)"


def _sum_d(col: str, alias: str) -> str:
    return f"CAST(SUM(CAST({col} AS {_D})) AS DOUBLE) AS {alias}"


def oracle_sql() -> dict[str, str]:
    return {
        "wordcount": """
            SELECT word, count(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE word <> '' AND NOT starts_with(word, 'http')
              AND word NOT LIKE '%--%'
            GROUP BY word
        """,
        "pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
              {_sum_d('l_quantity', 'sum_qty')},
              {_sum_d('l_extendedprice', 'sum_base_price')},
              CAST(SUM(CAST(l_extendedprice AS {_D2}) * (1 - CAST(l_discount AS {_D2}))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(l_extendedprice AS {_D2}) * (1 - CAST(l_discount AS {_D2})) * (1 + CAST(l_tax AS {_D2}))) AS DOUBLE) AS sum_charge,
              CAST(SUM(CAST(l_quantity AS {_D})) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS avg_qty,
              CAST(SUM(CAST(l_extendedprice AS {_D})) AS DOUBLE) / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
              CAST(SUM(CAST(l_discount AS {_D})) AS DOUBLE) / CAST(COUNT(l_discount) AS DOUBLE) AS avg_disc,
              count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2000-12-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "denorm_wide": f"""
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
              CAST(CAST(l_extendedprice AS {_D2}) * (1 - CAST(l_discount AS {_D2})) AS DOUBLE) AS revenue,
              l_shipdate, o_orderstatus, o_orderdate, o_orderpriority,
              c_name AS customer_name, c_mktsegment,
              n_name AS nation_name, r_name AS region_name
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
        """,
        "rolling_sum": f"""
            SELECT user_id, event_id,
              CAST(SUM(CAST(value AS {_D})) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              AS running_total
            FROM events
        """,
        "rolling_fold": f"""
            SELECT user_id, event_id, value,
              CAST(SUM(CAST(value AS {_D})) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              AS running_total,
              COUNT(*) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS running_count
            FROM events
        """,
        "tumbling_daily": f"""
            SELECT date_trunc('day', ts) AS window_start,
                   date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
                   event_type, count(*) AS cnt,
                   {_sum_d('value', 'sum_value')}
            FROM events
            GROUP BY 1, 2, 3
        """,
        "sliding_hourly": """
            SELECT make_timestamp(CAST((CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - k * 1800) * 1000000 AS BIGINT)) AS window_start,
                   make_timestamp(CAST((CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - k * 1800 + 3600) * 1000000 AS BIGINT)) AS window_end,
                   event_type, count(*) AS cnt
            FROM events, (SELECT unnest([0, 1]) AS k)
            GROUP BY 1, 2, 3
        """,
        "session_windows": f"""
            WITH marked AS (
              SELECT user_id, ts, value,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sess AS (
              SELECT *, SUM(new_sess) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM marked
            )
            SELECT min(ts) AS window_start,
                   max(ts) + INTERVAL 30 MINUTE AS window_end,
                   user_id, count(*) AS cnt, {_sum_d('value', 'sum_value')}
            FROM sess GROUP BY user_id, sid
        """,
        "count_windows": f"""
            WITH t AS (
              SELECT user_id, value,
                (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) // 50 AS bucket
              FROM events
            )
            SELECT user_id, bucket, {_sum_d('value', 'window_sum')}
            FROM t GROUP BY user_id, bucket HAVING count(*) = 50
        """,
        "trigger_evictor": f"""
            WITH t AS (
              SELECT user_id,
                row_number() OVER w AS rn,
                CAST(SUM(CAST(value AS {_D})) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS fired_sum
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, CAST(rn AS INT) AS fire_seq, fired_sum
            FROM t WHERE rn % 2 = 0
        """,
        "window_join": """
            SELECT date_trunc('hour', a.ts) AS window_start,
                   a.user_id, a.event_id AS view_id,
                   b.event_id AS purchase_id, b.value AS purchase_value
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND date_trunc('hour', a.ts) = date_trunc('hour', b.ts)
            WHERE a.event_type = 'view' AND b.event_type = 'purchase'
        """,
        "union_streams": f"""
            WITH u AS (
              SELECT 'order' AS src, o_orderkey AS key, o_totalprice AS amount FROM orders
              UNION ALL
              SELECT 'lineitem' AS src, l_orderkey AS key, l_extendedprice AS amount FROM lineitem
            )
            SELECT src, count(*) AS cnt, {_sum_d('amount', 'total_amount')}
            FROM u GROUP BY src
        """,
        "merge_last_non_null": """
            WITH typed AS (
              SELECT user_id, event_id,
                CASE WHEN event_type = 'click' THEN value END AS v_click,
                CASE WHEN event_type = 'view' THEN value END AS v_view,
                CASE WHEN event_type = 'purchase' THEN value END AS v_purchase,
                CASE WHEN event_type = 'signup' THEN value END AS v_signup,
                CASE WHEN event_type = 'error' THEN value END AS v_error
              FROM events
            )
            SELECT user_id,
              arg_max(v_click, event_id) FILTER (v_click IS NOT NULL) AS v_click,
              arg_max(v_view, event_id) FILTER (v_view IS NOT NULL) AS v_view,
              arg_max(v_purchase, event_id) FILTER (v_purchase IS NOT NULL) AS v_purchase,
              arg_max(v_signup, event_id) FILTER (v_signup IS NOT NULL) AS v_signup,
              arg_max(v_error, event_id) FILTER (v_error IS NOT NULL) AS v_error
            FROM typed GROUP BY user_id
        """,
        "side_output_split": """
            SELECT event_id, user_id, event_type, value
            FROM events WHERE NOT (value > 100.0)
        """,
        "json_extract": """
            SELECT event_type,
                   SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
                   count(*) AS cnt
            FROM events GROUP BY event_type
        """,
        "top_customers": f"""
            SELECT c_custkey, c_name, {_sum_d('l_extendedprice', 'revenue')}
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name
            ORDER BY revenue DESC, c_custkey
            LIMIT 10
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
                   count(*) AS n_copies
            FROM documents GROUP BY 1
        """,
    }
