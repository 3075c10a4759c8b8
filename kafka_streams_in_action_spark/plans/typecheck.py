"""Oracle output-type audit (round-7 hardening).

The driver's value hash is type/representation-sensitive: in round 6 the
only two rows whose DuckDB oracle emitted a HUGEINT column (un-cast
``sum()`` over integers) were exactly the two driver hash failures, while
``str()``-based local normalization masked the divergence. This module is
the shared guard: every oracle's DuckDB output type must map to the Spark
query's dtype for the same column, and the known-divergent DuckDB types
(HUGEINT / UHUGEINT / DECIMAL) are banned outright — the repo convention
is CAST to BIGINT / DOUBLE in the oracle SELECT.

Used by both tests/test_oracle.py (every oracle, every pytest run) and
scripts/driver_sim.py (the sf0.01 gate), so the sim can no longer pass
what the driver would fail.
"""

from __future__ import annotations

# Spark simpleString dtype -> acceptable DuckDB base type names.
_SPARK_TO_DUCK = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT", "REAL"},
    "boolean": {"BOOLEAN"},
    "string": {"VARCHAR"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
    "binary": {"BLOB"},
}

# DuckDB types that hash differently from any Spark output representation;
# oracles must CAST these away (sum(int)->HUGEINT -> CAST AS BIGINT,
# literal 0.5 -> DECIMAL -> CAST AS DOUBLE).
_BANNED_DUCK = ("HUGEINT", "UHUGEINT", "DECIMAL")


def oracle_type_mismatches(spark_dtypes, duck_cols, duck_types):
    """Return a list of human-readable mismatch strings (empty = clean).

    spark_dtypes: list of (name, simpleString) from DataFrame.dtypes
    duck_cols/duck_types: DuckDBPyRelation .columns / .types (stringified)
    """
    problems = []
    dmap = {c: str(t).upper() for c, t in zip(duck_cols, duck_types)}
    for col, dtyp in dmap.items():
        base = dtyp.split("(")[0].strip()
        if any(base == b for b in _BANNED_DUCK):
            problems.append(
                f"column {col!r}: DuckDB {dtyp} is banned (CAST it in the "
                f"oracle SELECT — BIGINT for integer sums, DOUBLE for "
                f"decimal literals)")
    smap = dict(spark_dtypes)
    for col, styp in smap.items():
        if col not in dmap:
            continue  # name mismatch is caught by the value compare
        allowed = _SPARK_TO_DUCK.get(styp)
        if allowed is None:
            continue  # arrays/structs never appear in oracle outputs
        dtyp = dmap[col]
        if dtyp not in allowed and dtyp.split("(")[0] not in allowed:
            problems.append(
                f"column {col!r}: spark={styp} but oracle emits "
                f"DuckDB {dtyp} (want one of {sorted(allowed)})")
    return problems
