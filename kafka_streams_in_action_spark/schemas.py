"""StructType constants — every source declares a schema; nothing is inferred.

The reference enforces schema-by-contract (registry + codegen, never inference):
see golang/avenger.avsc:6-15, golang/proto/avenegers.proto:7-11, and the sales
struct golang/chapter_4/sales/sales_data_source.go:3-8. We mirror that rule.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# The universal Kafka record shape (reference §1.1): what
# spark.read[Stream].format("kafka") yields, and the columnar twin we use for
# batch fixtures. Fields used at golang/chapter_4/sales/sales_consumer_client.go:87-96.
# ---------------------------------------------------------------------------
KAFKA_RECORD = T.StructType([
    T.StructField("key", T.BinaryType(), True),
    T.StructField("value", T.BinaryType(), True),
    T.StructField("topic", T.StringType(), True),
    T.StructField("partition", T.IntegerType(), True),
    T.StructField("offset", T.LongType(), True),
    T.StructField("timestamp", T.TimestampType(), True),
    T.StructField("timestampType", T.IntegerType(), True),
])

# ProductTransaction — golang/chapter_4/sales/sales_data_source.go:3-8
PRODUCT_TRANSACTION = T.StructType([
    T.StructField("customer_name", T.StringType(), True),
    T.StructField("product_name", T.StringType(), True),
    T.StructField("quantity", T.IntegerType(), True),
    T.StructField("price", T.DoubleType(), True),
])

# Avenger — golang/avenger.avsc:6-15 and golang/proto/avenegers.proto:7-11
AVENGER = T.StructType([
    T.StructField("name", T.StringType(), True),
    T.StructField("real_name", T.StringType(), True),
    T.StructField("movies", T.ArrayType(T.StringType()), True),
])

AVENGER_AVRO_SCHEMA = """
{"type": "record", "name": "AvengerAvro", "namespace": "bbejeck.chapter_3",
 "fields": [
   {"name": "name", "type": "string"},
   {"name": "real_name", "type": "string"},
   {"name": "movies", "type": {"type": "array", "items": "string"}, "default": []}
 ]}
"""

# ---------------------------------------------------------------------------
# Driver testdata tables (FIXTURES.md) — declared, never inferred.
# ---------------------------------------------------------------------------
REGION = T.StructType([
    T.StructField("r_regionkey", T.IntegerType(), True),
    T.StructField("r_name", T.StringType(), True),
])

NATION = T.StructType([
    T.StructField("n_nationkey", T.IntegerType(), True),
    T.StructField("n_name", T.StringType(), True),
    T.StructField("n_regionkey", T.IntegerType(), True),
])

CUSTOMER = T.StructType([
    T.StructField("c_custkey", T.LongType(), True),
    T.StructField("c_name", T.StringType(), True),
    T.StructField("c_nationkey", T.IntegerType(), True),
    T.StructField("c_acctbal", T.DoubleType(), True),
    T.StructField("c_mktsegment", T.StringType(), True),
])

SUPPLIER = T.StructType([
    T.StructField("s_suppkey", T.LongType(), True),
    T.StructField("s_name", T.StringType(), True),
    T.StructField("s_nationkey", T.IntegerType(), True),
    T.StructField("s_acctbal", T.DoubleType(), True),
])

PART = T.StructType([
    T.StructField("p_partkey", T.LongType(), True),
    T.StructField("p_name", T.StringType(), True),
    T.StructField("p_brand", T.StringType(), True),
    T.StructField("p_type", T.StringType(), True),
    T.StructField("p_size", T.IntegerType(), True),
    T.StructField("p_retailprice", T.DoubleType(), True),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType(), True),
    T.StructField("o_custkey", T.LongType(), True),
    T.StructField("o_orderstatus", T.StringType(), True),
    T.StructField("o_totalprice", T.DoubleType(), True),
    T.StructField("o_orderdate", T.TimestampType(), True),
    T.StructField("o_orderpriority", T.StringType(), True),
])

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType(), True),
    T.StructField("l_partkey", T.LongType(), True),
    T.StructField("l_suppkey", T.LongType(), True),
    T.StructField("l_linenumber", T.IntegerType(), True),
    T.StructField("l_quantity", T.DoubleType(), True),
    T.StructField("l_extendedprice", T.DoubleType(), True),
    T.StructField("l_discount", T.DoubleType(), True),
    T.StructField("l_tax", T.DoubleType(), True),
    T.StructField("l_returnflag", T.StringType(), True),
    T.StructField("l_linestatus", T.StringType(), True),
    T.StructField("l_shipdate", T.TimestampType(), True),
])

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType(), True),
    T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    T.StructField("label", T.IntegerType(), True),
])

TABLES = {
    "region": REGION, "nation": NATION, "customer": CUSTOMER,
    "supplier": SUPPLIER, "part": PART, "orders": ORDERS,
    "lineitem": LINEITEM, "events": EVENTS, "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
