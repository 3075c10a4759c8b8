"""Multimodal column discipline (SURVEY §2C C31).

The reference's pattern: payloads are opaque bytes with typed metadata beside
them (the Confluent wire format's magic/schema-id header — util/index.go:16-36;
the multi-event envelope's (key, value bytes, type) —
multi_event_proto_producer_client.go:10-13). We generalize that to media
columns: `binary` payload + a typed metadata struct + lazy decode behind
mapInPandas.

The decode kernels themselves are STUBS (no image/audio libs in this
container): `decode_image_stub` produces deterministic fake features from the
payload bytes so the Spark-side plumbing — schema, batch shape, partitioning —
is real and testable; a production build swaps the kernel only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_media_table(documents: DataFrame) -> DataFrame:
    """Lift documents into the media-column shape: payload bytes + metadata
    struct (format tag, byte size, source). Pure column algebra."""
    payload = F.encode("text", "UTF-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length(payload).alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def media_metadata(documents: DataFrame) -> DataFrame:
    """C31 oracle query: metadata projection of the media table — proves the
    binary lift/measure path without any Python."""
    m = to_media_table(documents)
    return m.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.source").alias("source"),
    )


def decode_image_stub(media: DataFrame, real_decoder=None) -> DataFrame:
    """Lazy decode: binary payload → (width, height, mean_intensity) features.

    `real_decoder(payload: bytes) -> (int, int, float)` plugs in a genuine
    image library; the default is a deterministic fake derived from the bytes
    (length → dimensions, byte-sum → intensity) so tests pin the plumbing.
    mapInPandas keeps Arrow batches intact — one Python roundtrip per batch,
    not per row; at 100 TB this is the only tenable decode shape.
    """
    def kernel(payload: bytes):
        if real_decoder is not None:
            return real_decoder(payload)
        n = len(payload)
        side = max(1, int(n ** 0.5))
        mean = (sum(payload[:256]) / min(n, 256)) if n else 0.0
        # no rounding: Python round() is banker's, which diverges from SQL
        # engines on exact dyadic ties; the raw double is deterministic
        return side, max(1, n // side), mean

    def decode(batches):
        import pandas as pd
        for pdf in batches:
            feats = pdf["payload"].map(lambda b: kernel(bytes(b)))
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": feats.map(lambda t: t[0]).astype("int32"),
                "height": feats.map(lambda t: t[1]).astype("int32"),
                "mean_intensity": feats.map(lambda t: t[2]).astype("float64"),
            })
            yield out

    return media.select("doc_id", "payload").mapInPandas(
        decode, schema="doc_id long, width int, height int, mean_intensity double")


def resize_stub(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Aspect-preserving resize stub: stub-decode (width, height) from the
    payload, downscale so the longer side is ≤ max_side, report output dims
    and byte budget. The kernel is a real mapInPandas pipeline (decode →
    transform per Arrow batch); the arithmetic is pure integer/IEEE-double
    ops (sqrt, floor-div, multiply, truncate) that a SQL engine executes
    identically — so unlike most UDF kernels this one is fully
    oracle-checkable, pinning the Python-side plumbing against a SQL twin."""
    def resize(batches):
        import pandas as pd
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [],
                   "out_width": [], "out_height": [], "out_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(bytes(payload))
                w = max(1, int(n ** 0.5))
                h = max(1, n // w)
                scale = min(1.0, float(max_side) / max(w, h))
                nw = max(1, int(w * scale))
                nh = max(1, int(h * scale))
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["out_width"].append(nw)
                out["out_height"].append(nh)
                out["out_bytes"].append(nw * nh)
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(
        resize, schema=("doc_id long, width long, height long, "
                        "out_width long, out_height long, out_bytes long"))


def frame_sample_stub(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video-style frame sampling stub: payload → every-nth 'frame' (16-byte
    chunk) as its own row. Demonstrates the 1→N decode fan-out shape
    (mapInPandas yielding more rows than it receives)."""
    def sample(batches):
        import pandas as pd
        rows = {"doc_id": [], "frame_no": [], "frame": []}
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, len(b) // 16, every_nth):
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(i)
                    rows["frame"].append(b[i * 16:(i + 1) * 16])
            yield pd.DataFrame(rows)
            rows = {"doc_id": [], "frame_no": [], "frame": []}

    return media.select("doc_id", "payload").mapInPandas(
        sample, schema="doc_id long, frame_no int, frame binary")
