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

# --- driver test tables (TESTDATA.md) — names only; parquet carries types --

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
