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


def test_avro_binary_byte_layout():
    """A12: byte-for-byte the generated Go writer's output
    (avenger_avro.go:64-83): zigzag-varint string lengths, block-coded array."""
    from kafka_streams_in_action_spark.functions.binary_codecs import (
        avro_decode_avenger_py, avro_encode_avenger_py)
    # "Hulk"(4→zigzag 8), "Bruce"(5→10), 2 movies block, terminator
    b = avro_encode_avenger_py("Hulk", "Bruce", ["Avengers", "Endgame"])
    assert b[0] == 8 and b[1:5] == b"Hulk"
    assert b[5] == 10 and b[6:11] == b"Bruce"
    assert b[11] == 4  # zigzag(2) — array block count
    assert b[12] == 16 and b[13:21] == b"Avengers"
    assert b[-1] == 0  # block terminator
    assert avro_decode_avenger_py(b) == ("Hulk", "Bruce", ["Avengers", "Endgame"])
    # empty array: bare terminator (array_string.go:16-18)
    e = avro_encode_avenger_py("X", "", [])
    assert e.endswith(b"\x00\x00")  # empty real_name (len 0) + terminator
    assert avro_decode_avenger_py(e) == ("X", "", [])


def test_avro_schema_evolution_resolves_by_name(spark):
    """A11 resolving-reader semantics (avenger_avro.go:41-62): data written
    under older / reordered / wider writer schemas decodes into the current
    reader schema by field name — missing reader fields take their avsc
    default (movies → []), writer-only fields are read-and-discarded."""
    from kafka_streams_in_action_spark.functions.binary_codecs import (
        avro_decode_resolved_py, avro_encode_fields_py,
        from_avro_avenger_resolved)

    full = {"name": "Hulk", "real_name": "Bruce",
            "movies": ["Avengers"], "era": "MCU"}

    # v1 writer: no movies field yet → reader default []
    v1 = (("name", "string"), ("real_name", "string"))
    b1 = avro_encode_fields_py(full, v1)
    assert avro_decode_resolved_py(b1, v1) == ("Hulk", "Bruce", [])

    # reordered writer: fields resolve by name, not position
    v2 = (("real_name", "string"), ("movies", "array<string>"),
          ("name", "string"))
    b2 = avro_encode_fields_py(full, v2)
    assert avro_decode_resolved_py(b2, v2) == ("Hulk", "Bruce", ["Avengers"])

    # wider writer: unknown trailing field is consumed and dropped
    v3 = (("name", "string"), ("real_name", "string"),
          ("movies", "array<string>"), ("era", "string"))
    b3 = avro_encode_fields_py(full, v3)
    assert avro_decode_resolved_py(b3, v3) == ("Hulk", "Bruce", ["Avengers"])

    # and through the Spark column API
    df = spark.createDataFrame([(b1,)], "value binary").select(
        from_avro_avenger_resolved(F.col("value"), v1).alias("r")).select("r.*")
    row = df.collect()[0]
    assert (row["name"], row["real_name"], row["movies"]) == \
        ("Hulk", "Bruce", [])


def test_proto_binary_byte_layout():
    """A13: proto3 TLV layout for avenegers.proto fields 1/2/3."""
    from kafka_streams_in_action_spark.functions.binary_codecs import (
        proto_decode_avenger_py, proto_encode_avenger_py)
    b = proto_encode_avenger_py("Hulk", "Bruce", ["Avengers"])
    assert b[0] == 0x0A and b[1] == 4 and b[2:6] == b"Hulk"
    assert b[6] == 0x12 and b[7] == 5 and b[8:13] == b"Bruce"
    assert b[13] == 0x1A and b[14] == 8 and b[15:23] == b"Avengers"
    assert proto_decode_avenger_py(b) == ("Hulk", "Bruce", ["Avengers"])
    # proto3 zero values omitted → empty message
    assert proto_encode_avenger_py("", "", []) == b""
    assert proto_decode_avenger_py(b"") == ("", "", [])


def test_binary_codec_roundtrip_property():
    """Round-trip identity over generated inputs (SURVEY §5.2), incl. unicode,
    long strings (multi-byte varints), and many-element arrays."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_streams_in_action_spark.functions.binary_codecs import (
        avro_decode_avenger_py, avro_encode_avenger_py,
        proto_decode_avenger_py, proto_encode_avenger_py)

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=300), st.text(max_size=300),
           st.lists(st.text(max_size=50), max_size=20))
    def check(name, real_name, movies):
        assert avro_decode_avenger_py(
            avro_encode_avenger_py(name, real_name, movies)
        ) == (name, real_name, movies)
        # proto3 can't distinguish absent from empty-string/empty-list
        pn, pr, pm = proto_decode_avenger_py(
            proto_encode_avenger_py(name, real_name, movies))
        assert (pn, pr, pm) == (name, real_name, movies)

    check()


def test_avro_resolving_reader_property():
    """Schema-resolution identity over random writer layouts: any permutation
    of known fields plus interleaved unknown string/array fields decodes to
    the same (name, real_name, movies) — unknowns dropped, missing fields
    defaulted."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_streams_in_action_spark.functions.binary_codecs import (
        avro_decode_resolved_py, avro_encode_fields_py)

    known = st.sampled_from(["name", "real_name", "movies"])
    extra = st.sampled_from(["f_str", "f_arr"])

    @settings(max_examples=200, deadline=None)
    @given(st.permutations(["name", "real_name", "movies"]),
           st.lists(extra, max_size=2, unique=True),
           st.integers(0, 3),  # how many known fields the writer has
           st.text(max_size=80), st.text(max_size=80),
           st.lists(st.text(max_size=30), max_size=8),
           st.text(max_size=40), st.lists(st.text(max_size=20), max_size=4))
    def check(perm, extras, n_known, name, real_name, movies, xs, xa):
        types = {"name": "string", "real_name": "string",
                 "movies": "array<string>", "f_str": "string",
                 "f_arr": "array<string>"}
        fields = perm[:n_known] + extras
        writer = tuple((f, types[f]) for f in fields)
        vals = {"name": name, "real_name": real_name, "movies": movies,
                "f_str": xs, "f_arr": xa}
        got = avro_decode_resolved_py(
            avro_encode_fields_py(vals, writer), writer)
        want = (name if "name" in fields else "",
                real_name if "real_name" in fields else "",
                movies if "movies" in fields else [])
        assert got == want

    check()


def test_binary_codec_spark_roundtrip(spark):
    """A11-A13 through the Spark column API with wire-format framing."""
    from pyspark.sql import functions as SF

    from kafka_streams_in_action_spark.functions.binary_codecs import (
        from_avro_avenger, from_proto_avenger, to_avro_avenger,
        to_proto_avenger)
    df = spark.createDataFrame(
        [("Hulk", "Bruce Banner", ["Avengers", "Endgame"]),
         ("Thor", "Thor", [])],
        ["name", "real_name", "movies"])
    for enc, dec in [(to_avro_avenger, from_avro_avenger),
                     (to_proto_avenger, from_proto_avenger)]:
        wrapped = df.select(
            "name", "real_name", "movies",
            wire_wrap(7, enc("name", "real_name", "movies")).alias("v"))
        out = wrapped.select(
            "name", "real_name", "movies",
            dec(wire_payload(SF.col("v"))).alias("a")).collect()
        for r in out:
            assert r["a"]["name"] == r["name"]
            assert r["a"]["real_name"] == r["real_name"]
            assert list(r["a"]["movies"]) == list(r["movies"])


def test_binary_decode_permissive_on_malformed(spark):
    """Truncated/garbage payloads decode to null fields, not job failure —
    the reference's skip-with-log semantic (cmd/consumer/main.go:43-46)."""
    from pyspark.sql import functions as SF

    from kafka_streams_in_action_spark.functions.binary_codecs import (
        from_avro_avenger, from_proto_avenger)
    df = spark.createDataFrame(
        [(b"\x08Hulk\x0aBru",), (b"\xff\xff\xff",), (None,)], "v binary")
    for dec in (from_avro_avenger, from_proto_avenger):
        rows = df.select(dec(SF.col("v")).alias("a")).collect()
        assert len(rows) == 3  # no task failure
        garbage = rows[1]["a"]
        assert garbage is None or garbage["name"] in (None, "")


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


def test_fnv32_column_algebra_matches_udf(spark):
    """sampling.fnv32_column (pure column fold, the sampling/split hot path)
    must agree with functions.serde.fnv1a_32 (byte-level pandas UDF, vector-
    tested against Go hash/fnv) on every testdata key."""
    from kafka_streams_in_action_spark.operators.sampling import fnv32_column
    from kafka_streams_in_action_spark.sources.parquet import load_table
    from .conftest import SF_DIR

    keys = load_table(spark, "documents", SF_DIR).select(
        F.concat(F.col("doc_id").cast("string"), F.lit(":split")).alias("k"))
    diff = keys.select(
        fnv32_column(F.col("k")).alias("a"),
        fnv1a_32(F.col("k")).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    assert diff.count() == 0
