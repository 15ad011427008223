"""Tier C EXT — multimodal (binary) column plumbing (north-star spec).

Images/audio/video are opaque ``binary`` columns plus typed metadata. The
Spark-side plumbing is real and tested — schema, Arrow batch shape,
``mapInPandas`` signature, partition behavior — while the actual codec calls
are stubbed (the container has no image/audio libraries): pass a ``decoder``
callable for production, or get the deterministic fake; ``decoder="strict"``
raises NotImplementedError to mark the integration point.

At 100 TB: binary payloads dominate row size — the decode stage runs
``mapInPandas`` so each Arrow batch streams through Python once, with
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounding memory; metadata-
only queries never touch the binary column (column pruning keeps it out of
the scan entirely).

No fixture table carries real media, so the query below fabricates binary
payloads from ``documents.text`` (utf-8 encode) — exercising the identical
byte-column path end to end with a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oss_data_lake_spark.sources.loaders import load_table

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, n_bytes long, meta string"
)
FEATURE_SCHEMA = "doc_id long, n_bytes long, feat_mean double, feat_dim int"


def decode_media(
    df: DataFrame,
    media_col: str = "media",
    decoder: Callable[[bytes], dict] | str | None = None,
) -> DataFrame:
    """Decode/feature-extract a binary column via mapInPandas (Arrow batches).

    decoder=None → deterministic fake; decoder="strict" → NotImplementedError
    (the marked integration point for a real image/audio codec); otherwise a
    callable bytes → {"n_bytes", "feat_mean", "feat_dim"}."""
    if decoder == "strict":
        def _strict(_: bytes) -> dict:
            raise NotImplementedError(
                "real media decoding requires an image/audio codec library "
                "not present in this environment; inject a decoder callable"
            )
        fn: Callable[[bytes], dict] = _strict
    else:
        # nested (not module-level) so cloudpickle serializes it BY VALUE:
        # executor Python workers may not have this repo on sys.path
        def _fake_decode(payload: bytes) -> dict:
            n = len(payload)
            mean = (sum(payload[:64]) / min(n, 64)) if n else 0.0
            return {"n_bytes": n, "feat_mean": float(mean), "feat_dim": 64}

        fn = decoder or _fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf[media_col].map(lambda b: fn(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": feats.map(lambda f: f["n_bytes"]),
                    "feat_mean": feats.map(lambda f: f["feat_mean"]),
                    "feat_dim": feats.map(lambda f: f["feat_dim"]),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Fabricate a media table from documents: utf-8 payload + metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        F.to_json(F.struct("lang", "source")).alias("meta"),
    )


def binary_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation over the binary table — the pattern that
    must NOT read payload bytes at scale (column pruning); oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return (
        media.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("sum_bytes"),
            F.countDistinct(F.md5("media")).alias("n_distinct_payloads"),
        )
        .orderBy("media_type")
    )


def media_features_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the full binary → mapInPandas decode path with the deterministic
    fake codec; aggregates the 'features'. Oracle-checked: the fake codec is
    pure byte arithmetic (sum of the first 64 payload bytes / min(n, 64)),
    which DuckDB reproduces with ascii(substr()) byte math — exact because
    the fixture text is pure ASCII (verified: octet_length == length for
    every document), so utf-8 bytes == code points. The Python-side division
    is one IEEE double op, identical in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    feats = decode_media(media)
    return (
        feats.groupBy("feat_dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("feat_mean").alias("min_mean"),
            F.max("feat_mean").alias("max_mean"),
        )
        .orderBy("feat_dim")
    )


QUERIES = {
    "e60_binary_metadata_stats": binary_metadata_stats,
    "e61_media_features_stats": media_features_stats,
}

ORACLES = {
    "e60_binary_metadata_stats": """
        SELECT 'text/plain' AS media_type,
               COUNT(*) AS n_docs,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
               COUNT(DISTINCT md5(text)) AS n_distinct_payloads
        FROM documents
        GROUP BY 1 ORDER BY media_type
    """,
    "e61_media_features_stats": """
        WITH feats AS (
            SELECT doc_id,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE CAST(list_sum(list_transform(
                                 range(1, least(length(text), 64) + 1),
                                 i -> ascii(substr(text, CAST(i AS INT), 1))))
                             AS DOUBLE)
                             / least(length(text), 64)
                   END AS feat_mean,
                   64 AS feat_dim
            FROM documents
        )
        SELECT CAST(feat_dim AS INT) AS feat_dim, COUNT(*) AS n,
               MIN(feat_mean) AS min_mean, MAX(feat_mean) AS max_mean
        FROM feats GROUP BY feat_dim ORDER BY feat_dim
    """,
}
