"""Waybill-domain generators (reference func/source/*.java, SURVEY §2.1
S3-S10), batch + streaming.

The reference generators are rate-limited random emitters (1 row/s,
AbstractSourceFunction.java:18-43). Here the same row shapes are derived
*deterministically* from the sequence number via md5 (portable to the
DuckDB oracle, reproducible across runs): "randomness" is a hash, not an
RNG. Batch mode builds from ``spark.range`` (massively parallel, no
driver data); streaming mode maps the rate source's ``value`` through
the identical column expressions.

Generator facts mirrored from the reference:
- waybill_code 'JD' + zero-padded seq  (WaybillCSource.java:27)
- waybill_sign: 30-char 0/1 string     (GenerateDomainUtils.java:46-48)
- site_code ∈ [1,9], site_name '站点'+code (WaybillCSource.java:28-30)
- busi_no ∈ [1,99], busi_name '商家'+no, 50-char send_pay
  (WaybillESource.java:19-38)
- pickup/delivery dates now + rand days (WaybillMSource.java:21-31)
- 5 packageCode rows per waybill, '%s-%d' (WaybillRouteLinkSource.java:26-32)
- order_id 'Order' + zero-padded seq, 1:1 waybill (WaybillOrderSource.java:12-28)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# fixed generation instant for deterministic timestamps (batch parity
# with the oracle); streaming mode uses the rate-source timestamp
GEN_EPOCH_MS = 1704067200000  # 2024-01-01T00:00:00Z

_HEX = "0123456789abcdef"
_PARITY = "0101010101010101"  # hex char → its low bit


def _h(seed: str, seq: Column) -> Column:
    """Portable per-seq hash: md5 of 'seed:seq'."""
    return F.md5(F.concat(F.lit(f"{seed}:"), seq.cast("string")))


def _hash_int(seed: str, seq: Column, lo: int, hi: int) -> Column:
    """Deterministic integer in [lo, hi] from the seq hash."""
    span = hi - lo + 1
    v = F.conv(F.substring(_h(seed, seq), 1, 8), 16, 10).cast("long")
    return (v % span + lo).cast("int")


def _bitstring(seed: str, seq: Column, n: int) -> Column:
    """n-char 0/1 string: parity bits of md5 hex chars (n ≤ 64 via two
    concatenated hashes)."""
    hexes = _h(seed, seq)
    if n > 32:
        hexes = F.concat(hexes, _h(seed + "b", seq))
    return F.translate(F.substring(hexes, 1, n), _HEX, _PARITY)


def waybill_code(seq: Column) -> Column:
    return F.concat(F.lit("JD"), F.lpad(seq.cast("string"), 10, "0"))


def order_id(seq: Column) -> Column:
    return F.concat(F.lit("Order"), F.lpad(seq.cast("string"), 10, "0"))


def _range(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(1, n + 1).select(F.col("id").alias("seq"))


def _waybill_c_columns() -> list[Column]:
    """The WaybillC projection (WaybillCSource.java:22-33), shared by the
    batch and streaming generators so the two can never drift — the
    DuckDB oracle replays exactly this column list."""
    seq = F.col("seq")
    site = _hash_int("site", seq, 1, 9)
    return [
        waybill_code(seq).alias("waybill_code"),
        _bitstring("sign", seq, 30).alias("waybill_sign"),
        site.cast("string").alias("site_code"),
        F.concat(F.lit("站点"), site.cast("string")).alias("site_name"),
        seq.alias("time_stamp"),
        seq.alias("seq"),
    ]


def waybill_c(spark: SparkSession, n: int) -> DataFrame:
    """WaybillCSource.java:22-33 — ops/site stream."""
    return _range(spark, n).select(*_waybill_c_columns())


def waybill_e(spark: SparkSession, n: int) -> DataFrame:
    """WaybillESource.java:19-38 — merchant stream (same key space)."""
    seq = F.col("seq")
    busi = _hash_int("busi", seq, 1, 99)
    return _range(spark, n).select(
        waybill_code(seq).alias("waybill_code"),
        busi.cast("string").alias("busi_no"),
        F.concat(F.lit("商家"), busi.cast("string")).alias("busi_name"),
        _bitstring("pay", seq, 50).alias("send_pay"),
        seq.alias("time_stamp"),
        seq.alias("seq"),
    )


def waybill_m(spark: SparkSession, n: int) -> DataFrame:
    """WaybillMSource.java:21-31 — milestone stream: pickup now+[1,10)d,
    delivery now+[1,5)d."""
    seq = F.col("seq")
    pickup_days = _hash_int("pickup", seq, 1, 9)
    delivery_days = _hash_int("delivery", seq, 1, 4)
    base = F.timestamp_millis(F.lit(GEN_EPOCH_MS))
    return _range(spark, n).select(
        waybill_code(seq).alias("waybill_code"),
        (base + F.make_dt_interval(days=pickup_days)).alias("pickup_date"),
        (base + F.make_dt_interval(days=delivery_days)).alias("delivery_date"),
        seq.alias("seq"),
    )


def waybill_route_link(spark: SparkSession, n: int) -> DataFrame:
    """WaybillRouteLinkSource.java:22-35 — fan-out: 5 package rows per
    waybill, packageCode '%s-%d'. The explode is JVM-side."""
    seq = F.col("seq")
    return (
        _range(spark, n)
        .select(
            waybill_code(seq).alias("waybill_code"),
            seq.alias("seq"),
            F.explode(F.sequence(F.lit(1), F.lit(5))).alias("pkg"),
        )
        .select(
            "waybill_code",
            F.concat_ws("-", F.col("waybill_code"), F.col("pkg")).alias("package_code"),
            F.timestamp_millis(F.lit(GEN_EPOCH_MS) + F.col("seq") * 1000).alias(
                "static_delivery_time"
            ),
            "seq",
        )
    )


def waybill_order(spark: SparkSession, n: int) -> DataFrame:
    """WaybillOrderSource.java:12-28 — order↔waybill link, 1:1."""
    seq = F.col("seq")
    return _range(spark, n).select(
        order_id(seq).alias("order_id"),
        waybill_code(seq).alias("waybill_code"),
        seq.alias("seq"),
    )


def orders_stream(spark: SparkSession, n: int) -> DataFrame:
    """OrderSource.java:14-23 — order header."""
    seq = F.col("seq")
    return _range(spark, n).select(
        order_id(seq).alias("order_code"),
        F.timestamp_millis(F.lit(GEN_EPOCH_MS) + seq * 1000).alias("create_time"),
        seq.alias("seq"),
    )


def product_income(spark: SparkSession, n: int) -> DataFrame:
    """ProductSource.java:20-25 — category ∈ 类别{A..G}, income ∈ [100,3000)."""
    seq = F.col("seq")
    cat = _hash_int("cat", seq, 0, 6)
    return _range(spark, n).select(
        F.concat(
            F.lit("类别"), F.chr(F.lit(ord("A")) + cat)
        ).alias("product_name"),
        _hash_int("income", seq, 100, 2999).alias("income"),
        seq.alias("seq"),
    )


def product_sale(spark: SparkSession, n: int) -> DataFrame:
    """ProductSaleSource.java:16-26 — sale ∈ [0.5, 1.0), 5× slower stream
    (batch: n/5 rows)."""
    seq = F.col("seq")
    cat = _hash_int("scat", seq, 0, 6)
    frac = _hash_int("sale", seq, 0, 4999).cast("double") / F.lit(10000.0)
    return _range(spark, max(n // 5, 1)).select(
        F.concat(F.lit("类别"), F.chr(F.lit(ord("A")) + cat)).alias("product_name"),
        (F.lit(0.5) + frac).alias("sale"),
        seq.alias("seq"),
    )


# --- streaming variants (rate source → same exprs) -------------------------


def rate_stream(spark: SparkSession, rows_per_second: int = 1, partitions: int = 1) -> DataFrame:
    """The reference's AbstractSourceFunction rate loop ↦ rate source
    (S3/S11: rowsPerSecond = emit interval, numPartitions = parallelism)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .option("numPartitions", str(partitions))
        .load()
        .select((F.col("value") + 1).alias("seq"), F.col("timestamp").alias("emit_time"))
    )


def waybill_c_stream(spark: SparkSession, rows_per_second: int = 1) -> DataFrame:
    """Streaming WaybillCSource: rate ticks through the SAME projection
    as the batch generator (one definition, no drift)."""
    return rate_stream(spark, rows_per_second).select(
        *_waybill_c_columns(), F.col("emit_time")
    )
