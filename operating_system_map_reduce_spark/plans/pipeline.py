"""LLM-training-data pipeline operators over documents/embeddings.

Beyond-reference surface (project charter): dedup, similarity search,
text analysis, multimodal plumbing -- each partition-parallel with no
driver-side collect, designed so the same plan runs at 100 TB.

Oracle-parity design notes:
 - All hashing goes through md5 hex strings -- identical in Spark and
   DuckDB -- never engine-native hash() (Spark murmur3 != DuckDB hash).
 - Tokenization is a shared regex split on whitespace; both engines'
   regex dialects agree on the simple classes used here.
 - Floating-point outputs are rounded where cross-engine accumulation
   order could differ.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --- exact dedup: hash-groupBy -------------------------------------------
# Canonical = min doc_id per md5(text) group.  One shuffle on the hash;
# at 100 TB the md5 is computed map-side and only (hash, id) shuffles.

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text")).alias("text_hash"), F.col("doc_id"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("canonical_id")
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
HAVING COUNT(*) > 1
ORDER BY canonical_id
"""


# --- text quality scoring -------------------------------------------------
# length / punctuation / stopword / digit ratios -> composite score.
# Pure built-in expressions: whole-stage codegen, no Python.

_STOPWORDS = "('the','a','an','and','or','of','to','in','is','on','for','with')"
_STOP_ARR = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for", "with"]


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), "\\s+")
    n_tok = F.size(F.filter(toks, lambda t: t != ""))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(_STOP_ARR)))
    n_chars = F.length("text")
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    return (
        docs.select(
            F.col("doc_id"),
            n_chars.alias("n_chars_m"),
            n_tok.alias("n_tokens"),
            F.round(n_alpha / n_chars, 6).alias("alpha_ratio"),
            F.round(n_digit / n_chars, 6).alias("digit_ratio"),
            F.round(stop_hits / n_tok, 6).alias("stopword_ratio"),
        )
        .orderBy("doc_id")
    )


TEXT_QUALITY_SQL = f"""
SELECT doc_id,
       LENGTH(text) AS n_chars_m,
       len(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')) AS n_tokens,
       ROUND(CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / LENGTH(text), 6) AS alpha_ratio,
       ROUND(CAST(LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / LENGTH(text), 6) AS digit_ratio,
       ROUND(CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t IN {_STOPWORDS})) AS DOUBLE)
             / len(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')), 6) AS stopword_ratio
FROM documents
ORDER BY doc_id
"""


# --- token counting: whitespace + BPE-ish sub-token estimate --------------
# BPE-ish: alpha runs contribute ceil(len/4) sub-tokens (~4 chars per BPE
# token), digits/punct one each.  Deterministic arithmetic only.

def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ws_toks = F.size(F.filter(F.split(F.col("text"), "\\s+"), lambda t: t != ""))
    words = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != "")
    bpe_est = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
    )
    return (
        docs.select(
            F.col("doc_id"),
            ws_toks.alias("ws_tokens"),
            bpe_est.alias("bpe_est_tokens"),
        )
        .orderBy("doc_id")
    )


TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS ws_tokens,
       list_sum(list_transform(
           list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> ''),
           w -> CAST(CEIL(LENGTH(w) / 4.0) AS BIGINT))) AS bpe_est_tokens
FROM documents
ORDER BY doc_id
"""


# --- language ID: stopword-hit heuristic ----------------------------------
# Score each candidate language by hits from a tiny per-language marker
# list; argmax with deterministic tie-break on language name.

_LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "a"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["de", "shi", "le", "zai", "he"],
}


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z]+"), lambda t: t != "")
    scored = docs.select("doc_id", "lang", toks.alias("toks"))
    for lang, markers in _LANG_MARKERS.items():
        scored = scored.withColumn(
            f"score_{lang}", F.size(F.filter(F.col("toks"), lambda t: t.isin(markers)))
        )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[F.sum(f"score_{lang}").alias(f"hits_{lang}") for lang in _LANG_MARKERS],
        )
        .orderBy("lang")
    )


_lang_score_sql = ",\n       ".join(
    "SUM(len(list_filter(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), t -> t <> ''), "
    f"t -> t IN ({', '.join(repr(m) for m in ms)})))) AS hits_{lang}"
    for lang, ms in _LANG_MARKERS.items()
)

LANG_ID_SQL = f"""
SELECT lang, COUNT(*) AS n_docs,
       {_lang_score_sql}
FROM documents
GROUP BY lang
ORDER BY lang
"""


# --- document fingerprint: normalized-content hash ------------------------
# Rabin-style content fingerprint: normalize (lowercase, collapse
# non-alnum runs to single space, trim) then md5.  Groups near-identical
# formatting variants; pure map-side at scale.

def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
    return (
        docs.select(F.col("doc_id"), F.md5(norm).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .orderBy("first_doc")
    )


DOC_FINGERPRINT_SQL = """
SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
       COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
FROM documents
GROUP BY 1
ORDER BY first_doc
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "text_quality": text_quality,
    "token_count": token_count,
    "text_lang_id": text_lang_id,
    "doc_fingerprint": doc_fingerprint,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "text_quality": TEXT_QUALITY_SQL,
    "token_count": TOKEN_COUNT_SQL,
    "text_lang_id": LANG_ID_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
}
