"""Fixed schema registry.

The reference declares record types as Java POJOs under
``src/main/java/com/mzq/usage/flink/domain/`` (see SURVEY.md §1.2); here
they are Catalyst ``StructType``s. Event-time columns are ``TimestampType``
(required by ``withWatermark``); raw epoch millis stay ``LongType``.
Money math uses ``DecimalType`` (reference uses BigDecimal,
StateTest.java:584-621).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- waybill logistics domain (reference domain/*.java) -------------------

# reference domain/WaybillC.java:6-15
WAYBILL_C = StructType(
    [
        StructField("waybill_code", StringType()),
        StructField("waybill_sign", StringType()),
        StructField("site_code", StringType()),
        StructField("site_name", StringType()),
        StructField("time_stamp", LongType()),
    ]
)

# reference domain/WaybillE.java:6-13
WAYBILL_E = StructType(
    [
        StructField("waybill_code", StringType()),
        StructField("busi_no", StringType()),
        StructField("busi_name", StringType()),
        StructField("send_pay", StringType()),
        StructField("time_stamp", LongType()),
    ]
)

# reference domain/WaybillM.java:8-12
WAYBILL_M = StructType(
    [
        StructField("waybill_code", StringType()),
        StructField("pickup_date", TimestampType()),
        StructField("delivery_date", TimestampType()),
    ]
)

# reference domain/WaybillOrder.java:6-10
WAYBILL_ORDER = StructType(
    [
        StructField("order_id", StringType()),
        StructField("waybill_code", StringType()),
    ]
)

# reference domain/Order.java:8-11
ORDER = StructType(
    [
        StructField("order_code", StringType()),
        StructField("create_time", TimestampType()),
    ]
)

# reference domain/WaybillRouteLink.java:8-13
WAYBILL_ROUTE_LINK = StructType(
    [
        StructField("waybill_code", StringType()),
        StructField("package_code", StringType()),
        StructField("static_delivery_time", TimestampType()),
    ]
)

# reference domain/WaybillCEM.java:8-18 — union of C/E/M fields; the
# common schema the three streams are projected into before merge.
WAYBILL_CEM = StructType(
    [
        StructField("waybill_code", StringType()),
        StructField("waybill_sign", StringType()),
        StructField("site_code", StringType()),
        StructField("site_name", StringType()),
        StructField("busi_no", StringType()),
        StructField("busi_name", StringType()),
        StructField("send_pay", StringType()),
        StructField("pickup_date", TimestampType()),
        StructField("delivery_date", TimestampType()),
        StructField("time_stamp", LongType()),
    ]
)

# reference domain/BdWaybillOrder.java:11-25 + ES mapping
# HelloWorldFlink.java:58 — the final denormalized wide row.
BD_WAYBILL_ORDER = StructType(
    [
        StructField("waybill_code", StringType()),
        StructField("waybill_sign", StringType()),
        StructField("site_code", StringType()),
        StructField("site_name", StringType()),
        StructField("busi_no", StringType()),
        StructField("busi_name", StringType()),
        StructField("send_pay", StringType()),
        StructField("order_code", StringType()),
        StructField("package_code", StringType()),
        StructField("pickup_date", TimestampType()),
        StructField("delivery_date", TimestampType()),
        StructField("order_create_date", TimestampType()),
        StructField("ts", LongType()),
    ]
)

# reference domain/ProductIncome.java:10-19 (note Integer[] detail)
PRODUCT_INCOME = StructType(
    [
        StructField("product_name", StringType()),
        StructField("income", IntegerType()),
        StructField("summary", IntegerType()),
        StructField("detail", ArrayType(IntegerType())),
    ]
)

# reference domain/ProductSale.java:10-13
PRODUCT_SALE = StructType(
    [
        StructField("product_name", StringType()),
        StructField("sale", DoubleType()),
    ]
)

# Money math: reference StateTest.java:603,621 multiplies income × sale in
# BigDecimal; our decimal contract for revenue computations.
REVENUE_DECIMAL = DecimalType(18, 4)

# --- scripted event-time fixture schema (FIXTURES.md §4) -------------------

SCRIPTED_EVENT = StructType(
    [
        StructField("k", StringType()),
        StructField("v", IntegerType()),
        StructField("event_ts_ms", LongType()),
        StructField("watermark_ms", LongType()),
        StructField("seq", IntegerType()),
    ]
)

# --- driver test tables (TESTDATA.md) -------------------------------------
#
# The engine's normalized column-type contract per table, as Catalyst
# simpleString()s. The driver regenerates the parquet between rounds and
# has already silently drifted physical types once (TIMESTAMP(NANOS) →
# timestamp[us]-no-tz, which PySpark 4 infers as TIMESTAMP_NTZ and which
# broke every unix_millis call site downstream). ``load_tables`` casts any
# drifted column back to this contract at the scan, so drift surfaces as
# (at worst) one extra Project — never as NTZ/INT96/etc. leaking into
# operators. Timestamps are TIMESTAMP (session-UTC, required by
# withWatermark and matching DuckDB's naive-UTC oracle semantics).

TESTDATA_CONTRACT: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {
        "n_nationkey": "int",
        "n_name": "string",
        "n_regionkey": "int",
    },
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}

TESTDATA_TABLES = tuple(TESTDATA_CONTRACT)
