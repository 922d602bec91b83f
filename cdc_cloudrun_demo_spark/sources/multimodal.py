"""Multimodal columns: opaque binary payloads + typed metadata.

Design for 100 TB of images/audio/video: the DataFrame carries
(a) a `binary` payload column (or a pointer-to-blob for objects too large
to inline), (b) a typed metadata struct, and (c) feature columns produced
by `mapInPandas` decode UDFs that process Arrow batches — so the expensive
Python work is amortized per-batch and the Spark-side schema/partitioning
stays fully declarative.

The decode libraries (PIL/ffmpeg/librosa) are not in this container, so
`decode_image` raises NotImplementedError and the pipeline runs a
deterministic fake decoder (`_fake_decode_batch`) that exercises the real
plumbing: binary column in, Arrow batches through mapInPandas, fixed
output schema out. Swapping in a real decoder changes one function.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, n_chunks bigint, header_hex string"
)


def decode_image(payload: bytes) -> dict:
    """Real image decode (resize / feature-extract) — requires PIL, which
    is intentionally absent here. STUB (see module docstring)."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; wire a real decoder here when the "
        "runtime image ships one. The Spark-side plumbing is exercised by "
        "_fake_decode_batch."
    )


def _fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in decoder: byte length, 256-byte chunk count,
    first-4-bytes hex (the 'magic number' a real decoder would sniff)."""
    for pdf in batches:
        payload = pdf["payload"]
        byte_len = payload.map(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": byte_len,
                "n_chunks": -(-byte_len // 256),  # ceil div
                "header_hex": payload.map(lambda b: bytes(b[:4]).hex()),
            }
        )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque payload + metadata struct. In production the
    payload comes off the object store; here we materialize the document
    text as utf-8 bytes so the column is real."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("lang").alias("lang"),
            F.octet_length(F.col("text")).cast("long").alias("content_length"),
        ).alias("meta"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal path: binary column → mapInPandas decode →
    typed feature columns. Oracle-checkable because the fake decoder's
    outputs are pure functions of the payload bytes."""
    d = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(d).select("doc_id", "payload")
    return payloads.mapInPandas(_fake_decode_batch, schema=FEATURE_SCHEMA)


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan (no payload decode) — the cheap pre-filter pass
    a real pipeline runs first; column pruning keeps payload bytes unread."""
    d = load_table(spark, sf_dir, "documents")
    return with_binary_payload(d).select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.lang").alias("lang"),
        F.col("meta.content_length").alias("content_length"),
    )


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_metadata": multimodal_metadata,
}

ORACLES = {
    "multimodal_features": """
        SELECT doc_id,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
               CAST(CEIL(octet_length(CAST(text AS BLOB)) / 256.0) AS BIGINT)
                 AS n_chunks,
               SUBSTRING(LOWER(HEX(CAST(text AS BLOB))), 1, 8) AS header_hex
        FROM documents
    """,
    "multimodal_metadata": """
        SELECT doc_id,
               'text/plain' AS mime,
               lang,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS content_length
        FROM documents
    """,
}
