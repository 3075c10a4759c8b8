"""Scalar function sweeps (SURVEY §2C C15-C19) — string, date/time, math, array,
map/JSON. All built-in `pyspark.sql.functions` (JVM-side, whole-stage codegen);
no Python touches these rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def string_functions(part: DataFrame) -> DataFrame:
    """C15 over part.p_name."""
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("upper_name"),
        F.lower("p_brand").alias("lower_brand"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%green%").alias("is_green"),
        F.regexp_extract("p_name", r"(\w+)$", 1).alias("last_word"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.length("p_name").alias("name_len"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
    )


def date_functions(orders: DataFrame) -> DataFrame:
    """C16 over o_orderdate."""
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate"))
            .alias("days_to_eoy"),
        F.to_date("o_orderdate").cast("timestamp").alias("order_day"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


def math_functions(lineitem: DataFrame) -> DataFrame:
    """C17 over lineitem numerics."""
    return lineitem.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice"), 1).alias("rounded"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_delta"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.round(F.pow(F.col("l_discount"), 2), 6).alias("disc_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
    )


def array_functions(embeddings: DataFrame) -> DataFrame:
    """C18 over embeddings.embedding (array<float>, 64-dim) with higher-order fns.

    Arithmetic is done after casting to double so DuckDB (which promotes) and
    Spark agree bit-for-bit at 6-decimal rounding.
    """
    emb = F.col("embedding").cast("array<double>")
    return embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(emb, 1), 6).alias("first_val"),
        F.round(F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x), 6)
            .alias("vec_sum"),
        F.round(F.aggregate(F.slice(emb, 1, 8), F.lit(0.0),
                            lambda acc, x: acc + x * x), 6).alias("head_sq_norm"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        F.round(F.element_at(F.sort_array(emb), 1), 6).alias("min_val"),
        F.round(F.element_at(F.sort_array(emb, asc=False), 1), 6).alias("max_val"),
    )


def explode_tokens(documents: DataFrame) -> DataFrame:
    """C18b: explode/posexplode — token stream with positions from documents."""
    return (
        documents
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(F.split(F.trim("text"), " "))
                .alias("pos", "token"))
    )


def json_scalar_functions(events: DataFrame) -> DataFrame:
    """C19a (oracle-matched): scalar-only JSON sweep — extraction via path,
    json_tuple-style field pull, struct re-encode, key/value flattening."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.from_json("props", "k INT").getField("k").alias("k_struct"),
        F.to_json(F.struct(F.col("event_type").alias("t"),
                           F.col("user_id").alias("u"))).alias("as_json"),
        F.array_join(F.map_keys(F.from_json("props", "map<string,int>")), ",")
            .alias("keys_csv"),
        F.array_join(F.map_values(F.from_json("props", "map<string,int>"))
                     .cast("array<string>"), ",").alias("vals_csv"),
    )


def json_functions(events: DataFrame) -> DataFrame:
    """C19 over events.props (JSON string, e.g. {"k": 69}). props parses ONCE
    to map<string,int>; every map-shaped fn reads that single parse (the
    path-extraction fn intentionally keeps the raw-string API surface)."""
    m = F.from_json("props", "map<string,int>")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.element_at(m, "k").alias("k_struct"),
        F.to_json(F.struct(F.col("event_type"), F.col("user_id"))).alias("as_json"),
        F.map_keys(m).alias("keys"),
        F.map_values(m).alias("vals"),
    )


def json_functions_canonical(events: DataFrame) -> DataFrame:
    """C19 (driver-canonicalizable form): the same JSON-fn sweep as
    `json_functions`, with the array outputs flattened through `array_join`
    to CSV strings — the driver's canonicalizer sorts pandas columns, which
    throws `unhashable type: 'list'` on array cells, so the oracle-matched
    registration must emit scalars only. The array-shaped form stays pinned
    by pytest (test_json_fn_sweep_values)."""
    m = F.from_json("props", "map<string,int>")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_value"),
        F.element_at(m, "k").alias("k_struct"),
        F.to_json(F.struct(F.col("event_type"), F.col("user_id"))).alias("as_json"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.array_join(F.map_values(m).cast("array<string>"), ",").alias("vals_csv"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


def m4_downsample(events: DataFrame, n_buckets: int = 8) -> DataFrame:
    """C16j: M4 downsampling (Jugel et al., VLDB 2014) — per series,
    bucket the day axis into `n_buckets` equal spans and keep min, max,
    first, and last of each bucket: the error-free line-chart reduction
    (every pixel column's extremes survive), the fixed-bucket
    complement of C16g's LTTB (which picks one visually-optimal anchor
    per bucket; M4 keeps all four sentinels and needs no sequential
    chain). All integer: milli day sums, integer bucket index
    ((day−d0)·n) div (span+1), min_by/max_by on the unique day axis.

    Scale shape: day rollup = one map-side-combinable agg; per-type
    (d0, span) is a bounded broadcast; the bucket agg shuffles on
    (type, bucket) — no window, no sequential pass, embarrassingly
    parallel (M4's whole point vs LTTB)."""
    vm = F.sum(F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("long")) \
        .alias("vm")
    day = (events.groupBy("event_type", F.to_date("ts").alias("day"))
           .agg(vm))
    span = day.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1"))
    bucketed = (day.join(F.broadcast(span), "event_type")
                .withColumn("bucket", F.expr(
                    f"CAST((datediff(day, d0) * {n_buckets}) div "
                    "(datediff(d1, d0) + 1) AS INT)")))
    return (bucketed.groupBy("event_type", "bucket")
            .agg(F.min("day").alias("d_start"),
                 F.max("day").alias("d_end"),
                 F.count(F.lit(1)).alias("n_days"),
                 F.min_by("vm", "day").alias("v_first"),
                 F.min("vm").alias("v_min"),
                 F.max("vm").alias("v_max"),
                 F.max_by("vm", "day").alias("v_last")))
