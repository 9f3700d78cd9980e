"""Dual-dialect SQL expression builders.

Every deterministic text rule (tokenizer, lemma, name normalizer, stopword
filter — see functions/text.py) is emitted here for BOTH Spark SQL and
DuckDB SQL from one template, so the driver's DuckDB oracle replays our
Spark queries exactly. This is the single source of truth the
`__spark_entry__.py` queries/oracles build on.
"""

from __future__ import annotations

from namedis_spark.functions.text import STOPWORDS


def stopword_list_sql() -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS)


def tokens_expr(col: str, dialect: str) -> str:
    """lowercase alphanumeric tokens of `col` as an array/list expression."""
    if dialect == "spark":
        return f"filter(split(lower({col}), '[^a-z0-9]+'), t -> t <> '')"
    return f"list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), t -> t <> '')"


def lemma_case(var: str = "t") -> str:
    """CASE chain implementing functions.text.lemma — identical text works
    in both dialects."""
    return (
        f"CASE WHEN length({var}) > 4 AND {var} LIKE '%ies' THEN substr({var}, 1, length({var}) - 3) || 'y' "
        f"WHEN length({var}) > 5 AND {var} LIKE '%ing' THEN substr({var}, 1, length({var}) - 3) "
        f"WHEN length({var}) > 4 AND {var} LIKE '%ed' THEN substr({var}, 1, length({var}) - 2) "
        f"WHEN length({var}) > 3 AND {var} LIKE '%s' AND {var} NOT LIKE '%ss' THEN substr({var}, 1, length({var}) - 1) "
        f"ELSE {var} END"
    )


def content_terms_expr(col: str, dialect: str) -> str:
    """tokens → drop stopwords → lemma each. Array/list expression."""
    toks = tokens_expr(col, dialect)
    sw = stopword_list_sql()
    if dialect == "spark":
        no_sw = f"filter({toks}, t -> NOT array_contains(array({sw}), t))"
        return f"transform({no_sw}, t -> {lemma_case('t')})"
    no_sw = f"list_filter({toks}, t -> NOT list_contains([{sw}], t))"
    return f"list_transform({no_sw}, t -> {lemma_case('t')})"


def norm_name_expr(col: str, dialect: str) -> str:
    """Normalized speaker key: lower → strip non-letters → split → sort →
    join (functions.text.normalize_name_key)."""
    if dialect == "spark":
        cleaned = f"regexp_replace(lower({col}), '[^a-z ]', ' ')"
        parts = f"filter(split({cleaned}, ' +'), p -> p <> '')"
        return f"array_join(array_sort({parts}), ' ')"
    cleaned = f"regexp_replace(lower({col}), '[^a-z ]', ' ', 'g')"
    parts = f"list_filter(regexp_split_to_array({cleaned}, ' +'), p -> p <> '')"
    return f"array_to_string(list_sort({parts}), ' ')"


def fingerprint_expr(col: str, dialect: str) -> str:
    """md5 of the concatenated tokens (functions.text.fingerprint)."""
    toks = tokens_expr(col, dialect)
    if dialect == "spark":
        return f"md5(array_join({toks}, ''))"
    return f"md5(array_to_string({toks}, ''))"
