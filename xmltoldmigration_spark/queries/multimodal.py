"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries aren't in this container, so the decode step is
a clearly-marked stub (operators/multimodal.py) — but the Spark-side
plumbing (binary column, Arrow batch shape, mapInPandas schema, partition
behavior) is real and oracle-checked: the payload here is the utf-8 encoding
of the document text, and the extracted "metadata" (byte length, md5) is
verifiable in SQL against the source text.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmltoldmigration_spark.queries import register
from xmltoldmigration_spark.tables import load_table


@register(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
    survey_ref="training-data multimodal: binary column + mapInPandas metadata extract",
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_payload = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_md5": pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return with_payload.mapInPandas(extract, schema="doc_id long, n_bytes long, payload_md5 string")


@register(
    "multimodal_frame_sample",
    # The deterministic decoder stand-in (md5 of consecutive 64-byte
    # windows) IS SQL over an ASCII corpus: byte offsets == character
    # offsets (asserted by tests/test_kg_pipeline.py::
    # test_documents_corpus_is_ascii over every shipped sf dir), so VARCHAR
    # substring windows hash identically to the Spark side's byte windows.
    oracle="""
    WITH b AS (SELECT doc_id, text, length(text) AS n FROM documents)
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           md5(substring(text, CAST(i*64+1 AS INT), 64)) AS frame_sig
    FROM (SELECT doc_id, text, unnest(range(CAST(ceil(n/64.0) AS BIGINT))) AS i
          FROM b)
    """,
    survey_ref="training-data multimodal: frame-sample plumbing over stubbed decoder",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xmltoldmigration_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("video/fake").alias("mime_type"),
    )
    return sample_frames(media, every_n_bytes=64)


@register(
    "multimodal_resize",
    oracle=None,  # stub-backed resize -> rows-only check
    survey_ref="training-data multimodal: resize plumbing (fixed-size binary out)",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xmltoldmigration_spark.operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return resize_images(media, target_w=16, target_h=16)


@register(
    "multimodal_feature_extract",
    # The byte-histogram stand-in IS SQL: per-doc per-bin byte counts over
    # the utf-8 payload (bin = byte*16//256 = the high hex nibble).  The
    # exploded exact-integer shape is driver-hashable (an array<float>
    # column broke the driver's pandas canonicalizer in round 2) and
    # admits a value-level DuckDB oracle.
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
      FROM documents
    ),
    bins AS (SELECT CAST(unnest(range(16)) AS INT) AS bin_idx),
    e AS (
      SELECT doc_id,
             strpos('0123456789ABCDEF', substring(h, CAST(i AS INT)*2+1, 1)) - 1 AS bin_idx
      FROM (SELECT doc_id, h, unnest(range(n)) AS i FROM b)
    ),
    c AS (SELECT e.doc_id AS doc_id, e.bin_idx AS bin_idx, count(*) AS cnt
          FROM e GROUP BY e.doc_id, e.bin_idx)
    SELECT b.doc_id AS doc_id, bins.bin_idx AS bin_idx,
           CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
    FROM b CROSS JOIN bins
    LEFT JOIN c ON c.doc_id = b.doc_id AND c.bin_idx = bins.bin_idx
    """,
    survey_ref="training-data multimodal: feature-extract -> array<float> for ANN",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exploded exact-count histogram; the normalized array<float> twin of
    the same operator (normalize=True) feeds the ANN queries directly."""
    from xmltoldmigration_spark.operators.multimodal import extract_features

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    counts = extract_features(media, n_bins=16, normalize=False)
    return counts.select(
        "doc_id", F.posexplode("features").alias("bin_idx", "cnt")
    )
