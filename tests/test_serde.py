"""Round-trip serde tests (SURVEY §5.2): F1-F4 + JSON encode/decode identity,
wire-format malformed-skip semantics, and the schema-registry shim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_in_action_spark.functions.serde import (
    _fnv1a_32_bytes, fnv1a_32, fnv1a_partition, json_decode, json_encode,
    wire_is_valid, wire_payload, wire_payload_proto, wire_schema_id, wire_wrap,
    wire_wrap_proto,
)
from kafka_streams_in_action_spark.registry import SchemaRegistry, value_subject
from kafka_streams_in_action_spark.schemas import PRODUCT_TRANSACTION


def test_fnv1a_reference_vectors():
    # Published FNV-1a 32-bit vectors (public algorithm spec)
    assert _fnv1a_32_bytes(b"") == 2166136261
    assert _fnv1a_32_bytes(b"a") == 0xE40C292C
    assert _fnv1a_32_bytes(b"foobar") == 0xBF9CF968


def test_fnv1a_partition_matches_reference_semantics(spark):
    # custom_order_partitioner.go:15-36 — "CUSTOM" → 0, else fnv1a % n
    df = spark.createDataFrame(
        [("CUSTOM",), ("Martin",), ("Chandler",)], ["key"])
    rows = {r["key"]: (r["p"], r["h"]) for r in df.select(
        "key",
        fnv1a_partition(F.col("key"), 4).alias("p"),
        fnv1a_32(F.col("key")).alias("h"),
    ).collect()}
    assert rows["CUSTOM"][0] == 0
    for k in ("Martin", "Chandler"):
        assert rows[k][0] == _fnv1a_32_bytes(k.encode()) % 4
        assert rows[k][1] == _fnv1a_32_bytes(k.encode())


def test_wire_format_roundtrip(spark):
    df = spark.createDataFrame([(42, b"payload-bytes"), (7, b"x")], ["sid", "data"])
    out = df.select(
        wire_wrap(F.col("sid"), F.col("data")).alias("wrapped"),
        "sid", "data",
    ).select(
        "*",
        wire_is_valid(F.col("wrapped")).alias("valid"),
        wire_schema_id(F.col("wrapped")).alias("sid2"),
        wire_payload(F.col("wrapped")).alias("data2"),
    ).collect()
    for r in out:
        assert r["valid"] is True
        assert r["sid2"] == r["sid"]
        assert bytes(r["data2"]) == bytes(r["data"])
        # exact wire layout: 0x00 magic ‖ int32-BE id ‖ payload (util/index.go:16-36)
        w = bytes(r["wrapped"])
        assert w[0] == 0
        assert int.from_bytes(w[1:5], "big") == r["sid"]
        assert w[5:] == bytes(r["data"])


def test_wire_format_proto_message_index(spark):
    # proto flavor: uvarint message-index byte after the id (util/index.go:31-32)
    df = spark.createDataFrame([(3, b"pb")], ["sid", "data"])
    r = df.select(
        wire_wrap_proto(F.col("sid"), F.col("data")).alias("w")
    ).select(
        wire_schema_id(F.col("w")).alias("sid2"),
        wire_payload_proto(F.col("w")).alias("data2"),
        F.substring("w", 6, 1).alias("idx"),
    ).collect()[0]
    assert r["sid2"] == 3
    assert bytes(r["data2"]) == b"pb"
    assert bytes(r["idx"]) == b"\x00"


def test_malformed_wire_records_are_skipped_not_fatal(spark):
    # cmd/consumer/main.go:43-46: bad magic byte → skip with log, don't fail
    rows = [(b"\x00\x00\x00\x00\x2agood",), (b"\x01bad-magic",), (b"\x00\x00",)]
    df = spark.createDataFrame(rows, ["value"])
    kept = df.filter(wire_is_valid(F.col("value"))).collect()
    assert len(kept) == 1
    assert bytes(kept[0]["value"])[0] == 0


def test_json_roundtrip(spark):
    df = spark.createDataFrame(
        [("Martin", "fries", 2, 3.5)],
        ["customer_name", "product_name", "quantity", "price"])
    encoded = df.select(json_encode(*df.columns).alias("value"))
    decoded = encoded.select(
        json_decode(F.col("value"), PRODUCT_TRANSACTION).alias("tx")
    ).select("tx.*")
    assert decoded.collect()[0].asDict() == {
        "customer_name": "Martin", "product_name": "fries",
        "quantity": 2, "price": 3.5}


def test_json_decode_missing_field_yields_null(spark):
    # avenger_avro.go:186-188 — missing required field is an error return,
    # engine-side: null field, permissive row
    df = spark.createDataFrame([('{"customer_name":"X"}',)], ["value"])
    r = df.select(
        json_decode(F.col("value"), PRODUCT_TRANSACTION).alias("tx")
    ).select("tx.*").collect()[0]
    assert r["customer_name"] == "X"
    assert r["quantity"] is None


def test_schema_registry_shim(tmp_path):
    # A14: get-or-create, by_id, latest, persistence
    path = str(tmp_path / "registry.json")
    reg = SchemaRegistry(path)
    sid1 = reg.get_or_create(value_subject("avro-avengers"), '{"type":"string"}')
    sid_same = reg.get_or_create(value_subject("avro-avengers"), '{"type":"string"}')
    sid2 = reg.get_or_create(value_subject("avro-avengers"), '{"type":"int"}')
    assert sid1 == sid_same
    assert sid2 != sid1
    assert reg.latest("avro-avengers-value")[0] == sid2
    # reload from disk
    reg2 = SchemaRegistry(path)
    assert reg2.by_id(sid1) == '{"type": "string"}'
    assert reg2.subjects() == ["avro-avengers-value"]


@pytest.mark.parametrize("codec", ["avro", "protobuf"])
def test_binary_codecs_available_or_gated(spark, codec):
    """A11-A13: from_avro/to_avro need the spark-avro module, from_protobuf
    needs spark-protobuf + descriptors. Neither jar ships in this container,
    so the contract here is: the API import path exists (Spark ≥3.4) and our
    wire-format layer is codec-agnostic (payload bytes pass through intact —
    proven by test_wire_format_roundtrip on arbitrary bytes)."""
    if codec == "avro":
        from pyspark.sql.avro.functions import from_avro, to_avro  # noqa: F401
    else:
        from pyspark.sql.protobuf.functions import from_protobuf, to_protobuf  # noqa: F401
