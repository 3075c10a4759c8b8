"""UDF / UDAF / UDTF surface (SURVEY §2C C20-C21).

The reference's extension points are the RecordProcessor interface
(pipelining_consumer_client.go:13-16) and the data-source interfaces
(multi_event_avro_producer_client.go:15-17). Spark-side, those become:
scalar Pandas UDFs (F1-F4 live in functions/serde.py), grouped custom
aggregation via applyInPandas, and table functions via mapInPandas
(operators/text.py:tokenize_udtf).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_avg_by_type(events: DataFrame) -> DataFrame:
    """C21 (UDAF surface): per-event-type weighted average of `value`, weight =
    (user_id % 5) + 1, via applyInPandas. The oracle is the closed-form
    sum(v·w)/sum(w), so the custom-agg machinery is what's actually under test.

    Grouped-map shuffles once on the group key; each group materializes in one
    executor's memory — fine for bounded key cardinality (5 types), and the
    pattern scales by key count, not row count, when groups are themselves
    aggregates."""
    def wavg(pdf: pd.DataFrame) -> pd.DataFrame:
        w = (pdf["user_id"] % 5) + 1
        return pd.DataFrame({
            "event_type": [pdf["event_type"].iloc[0]],
            "weighted_avg": [round(float((pdf["value"] * w).sum() / w.sum()), 6)],
            "n": [len(pdf)],
        })

    return (
        events.select("event_type", "user_id", "value")
        .groupBy("event_type")
        .applyInPandas(wavg, schema="event_type string, weighted_avg double, n long")
    )
