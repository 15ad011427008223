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


RESIZED_SCHEMA = (
    "doc_id long, media binary, width int, height int, orig_bytes long"
)
FRAME_SCHEMA = "doc_id long, frame_index int, byte_offset long, frame binary"


def resize_media(
    df: DataFrame,
    width: int = 8,
    height: int = 8,
    media_col: str = "media",
    resizer: Callable[[bytes, int, int], bytes] | str | None = None,
) -> DataFrame:
    """Binary→binary transform plumbing (image resize at scale).

    Real resizing needs an image codec (not in this container):
    ``resizer="strict"`` raises at the marked integration point; the
    default fake deterministically resamples the payload to exactly
    width*height bytes (nearest-neighbor over byte positions — the same
    index arithmetic a real nearest-neighbor resize performs per pixel
    row). The plumbing under test is what matters at 100 TB: binary in /
    binary out through Arrow batches, output size bounded by (width,
    height) not by input size, payload column pruned everywhere upstream
    of the mapInPandas stage."""
    if resizer == "strict":
        def _strict(_: bytes, __: int, ___: int) -> bytes:
            raise NotImplementedError(
                "real image resizing requires a codec library not present "
                "in this environment; inject a resizer callable"
            )
        fn: Callable[[bytes, int, int], bytes] = _strict
    else:
        def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
            n = len(payload)
            if n == 0:
                return b"\x00" * (w * h)
            return bytes(payload[(i * n) // (w * h)] for i in range(w * h))

        fn = resizer or _fake_resize

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[media_col].map(bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": payloads.map(lambda b: fn(b, width, height)),
                    "width": width,
                    "height": height,
                    "orig_bytes": payloads.map(len),
                }
            )

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 256,
    stride: int = 4,
    max_frames: int = 16,
    media_col: str = "media",
) -> DataFrame:
    """Frame sampling plumbing (video → sampled frames, one row per frame).

    Treats the payload as a sequence of fixed-size frames and emits every
    ``stride``-th one (up to ``max_frames``) — the 1→N batch shape a real
    video sampler produces. At 100 TB the explosion factor is bounded by
    max_frames, each output row carries only its frame's bytes (never the
    whole video), and the stage parallelizes per input partition with no
    shuffle. A real demuxer slots in by replacing the byte-slicing loop."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            doc_ids: list[int] = []
            idxs: list[int] = []
            offs: list[int] = []
            frames: list[bytes] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[media_col]):
                payload = bytes(payload)
                n_frames = max(len(payload) // frame_bytes, 0)
                for k, fi in enumerate(range(0, n_frames, stride)):
                    if k >= max_frames:
                        break
                    off = fi * frame_bytes
                    doc_ids.append(doc_id)
                    idxs.append(fi)
                    offs.append(off)
                    frames.append(payload[off : off + frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "byte_offset": pd.Series(offs, dtype="int64"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


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
