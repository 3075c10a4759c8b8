"""Scalar functions F1-F4 (SURVEY §2C C20) + JSON serde wrappers (A7/A8).

F1  fnv1a_32        — FNV-1a 32-bit hash; semantics from the reference's custom
                      partitioner (golang/chapter_4/sales/custom_order_partitioner.go:26-31).
F2  wire_wrap       — Confluent wire format encode: 0x00 magic ‖ int32-BE schema id ‖
                      payload (golang/cmd/producer/main.go:30-35, golang/util/index.go:16-36).
F3  wire_schema_id  — big-endian schema id from bytes 1-5
                      (golang/cmd/consumer/main.go:43-50).
F4  wire_payload    — payload after the 5-byte header; proto variant also skips the
                      uvarint message-index (golang/proto/consumer/main.go:47-63,76-90).

Everything except fnv1a_32 and the proto varint skip is pure column algebra —
JVM-side, whole-stage-codegen'd, no Python in the hot path. fnv1a_32 must match
Go's hash/fnv byte-for-byte (Spark's `hash` is Murmur3, `xxhash64` is xxHash),
so it is a vectorized Pandas UDF (Arrow batches, not per-row Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

FNV1A_OFFSET = 2166136261
FNV1A_PRIME = 16777619
_MASK32 = 0xFFFFFFFF


def _fnv1a_32_bytes(b: bytes) -> int:
    h = FNV1A_OFFSET
    for byte in b:
        h = ((h ^ byte) * FNV1A_PRIME) & _MASK32
    return h


@F.pandas_udf(T.LongType())
def _fnv1a_32_udf(s: pd.Series) -> pd.Series:
    def one(v):
        if v is None:
            return None
        if isinstance(v, str):
            v = v.encode("utf-8")
        return _fnv1a_32_bytes(bytes(v))
    return s.map(one)


def fnv1a_32(col: Column | str) -> Column:
    """F1: FNV-1a 32-bit of a string/binary column, as an unsigned value in a long."""
    return _fnv1a_32_udf(F.col(col) if isinstance(col, str) else col)


def fnv1a_partition(key: Column | str, num_partitions: int,
                    override_key: str = "CUSTOM") -> Column:
    """The reference's custom partitioner: partition 0 for the override key,
    else fnv1a_32(key) % n (custom_order_partitioner.go:15-32)."""
    key = F.col(key) if isinstance(key, str) else key
    return F.when(key == override_key, F.lit(0)).otherwise(
        F.pmod(fnv1a_32(key), F.lit(num_partitions))
    ).cast("int")


# ---------------------------------------------------------------------------
# Confluent wire format — pure column algebra (no UDF)
# ---------------------------------------------------------------------------

def _int32_be(col: Column) -> Column:
    """int → 4-byte big-endian binary, via hex round-trip (JVM-side)."""
    return F.unhex(F.lpad(F.hex(col.cast("long")), 8, "0"))


def wire_wrap(schema_id: Column | int, payload: Column) -> Column:
    """F2: 0x00 magic ‖ int32-BE schema_id ‖ payload (util/index.go:16-36)."""
    sid = F.lit(schema_id) if isinstance(schema_id, int) else schema_id
    return F.concat(F.lit(bytes([0])), _int32_be(sid), payload)


def wire_wrap_proto(schema_id: Column | int, payload: Column,
                    message_index: int = 0) -> Column:
    """F2 proto flavor: header + uvarint message-index before the payload
    (util/index.go:31-32). Single-byte encoding covers index < 128, which is
    the reference's only case (index always 0, proto/consumer/main.go:57-59)."""
    if not 0 <= message_index < 128:
        raise ValueError("multi-byte message-index varints not needed by the contract")
    sid = F.lit(schema_id) if isinstance(schema_id, int) else schema_id
    return F.concat(F.lit(bytes([0])), _int32_be(sid),
                    F.lit(bytes([message_index])), payload)


def wire_is_valid(value: Column) -> Column:
    """A10 permissive-skip predicate: magic byte 0x00 and ≥ 5-byte header
    (cmd/consumer/main.go:43-46 skips malformed records instead of failing)."""
    return (F.length(value) >= 6) & (F.substring(value, 1, 1) == F.lit(bytes([0])))


def wire_schema_id(value: Column) -> Column:
    """F3: big-endian int32 schema id at bytes 1-5 (cmd/consumer/main.go:47)."""
    return F.conv(F.hex(F.substring(value, 2, 4)), 16, 10).cast("long")


def wire_payload(value: Column) -> Column:
    """F4: payload after the 5-byte header (cmd/consumer/main.go:50)."""
    return F.substring(value, 6, 2147483647)


def wire_payload_proto(value: Column) -> Column:
    """F4 proto flavor: additionally skip the uvarint message-index
    (proto/consumer/main.go:76-90). Single-byte fast path (index < 128) is
    column algebra; the reference never emits multi-byte indexes."""
    return F.substring(value, 7, 2147483647)


# ---------------------------------------------------------------------------
# JSON serde (A7/A8) — thin wrappers to pin the engine-wide convention
# ---------------------------------------------------------------------------

def json_encode(*cols: Column | str) -> Column:
    """A8: struct → JSON string (sales_producer_client.go:56)."""
    return F.to_json(F.struct(*cols))


def json_decode(value: Column, schema) -> Column:
    """A7: JSON bytes/string → typed struct; missing/invalid → null fields, the
    reference's error-return semantic (avenger_avro.go:186-188)."""
    return F.from_json(value.cast("string"), schema)
