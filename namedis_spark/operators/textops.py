"""Text-analysis operators over the documents table (training-data ops) and
the reference's cleaning/projection family (SURVEY.md §2.2).

All JVM-side expressions shared with DuckDB oracles via functions.sqlexpr.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from namedis_spark.functions.sqlexpr import (
    fingerprint_expr,
    stopword_list_sql,
    tokens_expr,
)

# XML entity restore map (clean.pl:25-65, restoreXmlEntity NLPUtil.pm:764-773)
XML_ENTITIES = [
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&uuml;", "u"),
    ("&ouml;", "o"),
    ("&auml;", "a"),
    ("&szlig;", "ss"),
    ("&eacute;", "e"),
    ("&egrave;", "e"),
]

# removePublisher-style strip patterns (NLPUtil.pm:1522-1548, 190-205):
# "Book review:" prefixes, trailing page counts, parenthesized years.
PUBLISHER_PATTERNS = [
    (r"^(book review|review of|editorial)[:\s]+", ""),
    (r"\s*\(\d{4}\)\s*$", ""),
    (r"\s*,?\s*\d+\s*pages?\.?\s*$", ""),
    (r"\s+", " "),
]


def restore_xml_entities(docs: DataFrame, text_col: str = "text") -> DataFrame:
    col = F.col(text_col)
    for ent, rep in XML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return docs.withColumn("restored", col)


def strip_publisher(docs: DataFrame, text_col: str = "text") -> DataFrame:
    col = F.lower(F.col(text_col))
    for pat, rep in PUBLISHER_PATTERNS:
        col = F.regexp_replace(col, pat, rep)
    return docs.withColumn("stripped", F.trim(col))


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + regex (alnum) tokens + distinct
    terms — the byte/token accounting every corpus pipeline needs."""
    toks = tokens_expr(text_col, "spark")
    return docs.select(
        "doc_id",
        F.length(text_col).cast("bigint").alias("n_chars"),
        F.size(F.expr(f"filter(split({text_col}, ' +'), x -> x <> '')"))
        .cast("bigint")
        .alias("n_ws_tokens"),
        F.size(F.expr(toks)).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(F.expr(toks))).cast("bigint").alias("n_distinct"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: stopword ratio, alpha ratio, mean token length
    (clean.pl validity/language-filter spirit, :317-336,445-541)."""
    toks = tokens_expr(text_col, "spark")
    sw = stopword_list_sql()
    return docs.select(
        "doc_id",
        F.round(
            F.size(F.expr(f"filter({toks}, t -> array_contains(array({sw}), t))"))
            / F.greatest(F.size(F.expr(toks)), F.lit(1)),
            6,
        ).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace(F.lower(text_col), "[^a-z]", ""))
            / F.greatest(F.length(text_col), F.lit(1)),
            6,
        ).alias("alpha_ratio"),
        F.round(
            F.expr(f"aggregate({toks}, 0d, (acc, t) -> acc + length(t))")
            / F.greatest(F.size(F.expr(toks)), F.lit(1)),
            6,
        ).alias("mean_token_len"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Dictionary-vote language ID (testLang, clean.pl:445-541): English
    stopword hit-rate as the vote; label 'en' above 2%, else 'other'.
    (The reference votes German/French dictionaries; same mechanism.)"""
    toks = tokens_expr(text_col, "spark")
    sw = stopword_list_sql()
    ratio = F.size(
        F.expr(f"filter({toks}, t -> array_contains(array({sw}), t))")
    ) / F.greatest(F.size(F.expr(toks)), F.lit(1))
    return docs.select(
        "doc_id",
        F.round(ratio, 6).alias("en_vote"),
        F.when(ratio > 0.02, "en").otherwise("other").alias("lang_pred"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting via normalized-content md5
    (functions.text.fingerprint)."""
    return docs.select(
        "doc_id", F.expr(fingerprint_expr(text_col, "spark")).alias("fingerprint")
    )
