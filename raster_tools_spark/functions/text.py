"""Text analysis for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All implementations are pure JVM-side column expressions (no UDFs at
all) so they stay inside whole-stage codegen; every one has an exact
DuckDB-SQL oracle (see __spark_entry__.oracle_sql).

Token convention: documents are single-space separated; token count is
computed arithmetically (spaces + 1) so the Spark and SQL versions are
bit-identical with no regex dialect risk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "and", "to")


def token_count_col(text: Column) -> Column:
    """Whitespace token count: spaces + 1 (empty text -> 0)."""
    return F.when(F.length(text) == 0, F.lit(0)).otherwise(
        F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1
    )


def alpha_ratio_col(text: Column) -> Column:
    """Fraction of [a-z] characters."""
    return F.length(F.regexp_replace(text, "[^a-z]", "")) / F.length(text)


def avg_word_len_col(text: Column) -> Column:
    return (
        F.length(F.replace(text, F.lit(" "), F.lit("")))
        / token_count_col(text)
    )


def stopword_ratio_col(text: Column) -> Column:
    """Fraction of tokens that are English stopwords."""
    toks = F.split(text, " ")
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS_EN))
    )
    return hits / F.size(toks)


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-document quality metrics (length / char-class / word-shape
    ratios), rounded for engine-exact comparison."""
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.length(t).alias("n_chars_m"),
        token_count_col(t).alias("n_tokens"),
        F.round(alpha_ratio_col(t), 6).alias("alpha_ratio"),
        F.round(avg_word_len_col(t), 6).alias("avg_word_len"),
        F.round(stopword_ratio_col(t), 6).alias("stopword_ratio"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-profile language ID heuristic: predict 'en' when the
    text contains an English stopword token, else 'unk'; report
    agreement with the labeled lang."""
    toks = F.split(F.col("text"), " ")
    pred = F.when(
        F.arrays_overlap(toks, F.array(*[F.lit(s) for s in STOPWORDS_EN])),
        F.lit("en"),
    ).otherwise(F.lit("unk"))
    return (
        docs.select("doc_id", "lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprints: full-text md5 plus a prefix fingerprint
    (md5 of the first 64 chars) for bucketed near-dup candidate
    generation."""
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("fp"),
        F.md5(F.substring(F.col("text"), 1, 64)).alias("fp_prefix"),
    )
