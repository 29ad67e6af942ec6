"""Text-analysis operators over `documents`: language-ID heuristic, quality
scoring, token counting, document fingerprinting (training-data pipeline
first-class ops; mirrors the reference's scalar text surface C1/C20)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xmltoldmigration_spark.queries import register
from xmltoldmigration_spark.tables import load_table


# --------------------------------------------------------------------------
# Token counting: whitespace tokens + a BPE-ish regex segmentation.
# --------------------------------------------------------------------------
@register(
    "text_token_count",
    oracle=r"""
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens
    FROM documents
    """,
    survey_ref="training-data text: token counting (whitespace + BPE-ish regex)",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")).cast("bigint").alias(
            "n_ws_tokens"
        ),
        F.size(F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"))
        .cast("bigint")
        .alias("n_bpe_tokens"),
    )


# --------------------------------------------------------------------------
# Language-ID heuristic: marker-token ratio (n-gram heuristic stand-in;
# deterministic rule, same on both sides).
# --------------------------------------------------------------------------
@register(
    "text_lang_id",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           CASE
             WHEN len(toks) = 0 THEN 'unknown'
             WHEN CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) >= 0.06 THEN 'en'
             WHEN CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) >= 0.03 THEN 'en-like'
             ELSE 'other'
           END AS predicted_lang
    FROM t
    """,
    survey_ref="training-data text: language-ID heuristic (C20 analog)",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    markers = F.size(F.filter(toks, lambda x: x.isin("the", "a")))
    ratio = markers.cast("double") / F.size(toks)
    return docs.select(
        "doc_id",
        F.when(F.size(toks) == 0, F.lit("unknown"))
        .when(ratio >= 0.06, F.lit("en"))
        .when(ratio >= 0.03, F.lit("en-like"))
        .otherwise(F.lit("other"))
        .alias("predicted_lang"),
    )


# --------------------------------------------------------------------------
# Quality scoring: length / punctuation / stopword ratios.
# --------------------------------------------------------------------------
@register(
    "text_quality_score",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, n_chars,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks,
             len(regexp_extract_all(text, '[^a-z0-9\s]')) AS n_punct
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CASE WHEN len(toks) = 0 THEN 0.0
                ELSE CAST(len(list_filter(toks, x -> x IN ('the','a','of','to'))) AS DOUBLE) / len(toks)
           END AS stopword_ratio,
           CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chars END AS punct_ratio,
           CASE WHEN len(toks) BETWEEN 20 AND 1000 THEN 1 ELSE 0 END AS length_ok
    FROM t
    """,
    survey_ref="training-data text: quality scoring (length/punct/stopword ratios)",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    n_tokens = F.size(toks)
    stop = F.size(F.filter(toks, lambda x: x.isin("the", "a", "of", "to")))
    n_punct = F.size(F.expr(r"regexp_extract_all(text, '[^a-z0-9\\s]', 0)"))
    return docs.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        F.when(n_tokens == 0, F.lit(0.0))
        .otherwise(stop.cast("double") / n_tokens)
        .alias("stopword_ratio"),
        F.when(F.col("n_chars") == 0, F.lit(0.0))
        .otherwise(n_punct.cast("double") / F.col("n_chars"))
        .alias("punct_ratio"),
        F.when((n_tokens >= 20) & (n_tokens <= 1000), F.lit(1)).otherwise(F.lit(0)).alias("length_ok"),
    )


# --------------------------------------------------------------------------
# Document fingerprinting: md5 content fingerprint + 2-hex shard (the
# reference's own md5 output sharding, MigrationApp.getDstFileName:133-147).
# --------------------------------------------------------------------------
@register(
    "text_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
           substr(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 2) AS shard
    FROM documents
    """,
    survey_ref="training-data text: document fingerprinting (rolling-hash analog, C10)",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    return docs.select("doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 2).alias("shard"))
