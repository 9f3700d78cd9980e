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


def lemma_rules_case(var: str = "t") -> str:
    """Rule-only lemma CASE (suffix stripping + doubling/silent-e restore) —
    everything in functions.text.lemma EXCEPT the irregular table. Small and
    fixed-size, so it stays inline in codegen; the (growable) irregular
    table is applied separately (broadcast join on the Spark side, WHEN
    chain in the DuckDB twin via lemma_case)."""
    from namedis_spark.functions.text import _DOUBLED_FORMS, _E_RESTORE

    doubled = ", ".join(f"'{d}'" for d in sorted(_DOUBLED_FORMS))
    erestore = ", ".join(f"'{e}'" for e in sorted(_E_RESTORE))

    def destem(stem_expr: str) -> str:
        return (
            f"CASE WHEN {stem_expr} IN ({doubled})"
            f" THEN substr({stem_expr}, 1, length({stem_expr}) - 1)"
            f" WHEN {stem_expr} IN ({erestore}) THEN {stem_expr} || 'e'"
            f" ELSE {stem_expr} END"
        )

    ing = destem(f"substr({var}, 1, length({var}) - 3)")
    ed = destem(f"substr({var}, 1, length({var}) - 2)")
    es = (
        f"({var} LIKE '%sses' OR {var} LIKE '%xes' OR {var} LIKE '%zes'"
        f" OR {var} LIKE '%ches' OR {var} LIKE '%shes')"
    )
    return (
        f"CASE "
        f"WHEN length({var}) > 4 AND {es} THEN substr({var}, 1, length({var}) - 2) "
        f"WHEN length({var}) > 4 AND {var} LIKE '%ies' THEN substr({var}, 1, length({var}) - 3) || 'y' "
        f"WHEN length({var}) > 5 AND {var} LIKE '%ing' THEN {ing} "
        f"WHEN length({var}) > 4 AND {var} LIKE '%ed' THEN {ed} "
        f"WHEN length({var}) > 3 AND {var} LIKE '%s' AND {var} NOT LIKE '%ss' THEN substr({var}, 1, length({var}) - 1) "
        f"ELSE {var} END"
    )


def lemma_case(var: str = "t") -> str:
    """CASE chain implementing functions.text.lemma — identical text works
    in both dialects. Generated from the SAME irregular/doubling/e-restore
    tables the Python lemmatizer uses, so the engines cannot drift. Used in
    array-lambda contexts (and all DuckDB oracles); Spark hot paths use the
    broadcast-join form in operators.features.exploded_content_terms, which
    keeps codegen small as the irregular table grows."""
    from namedis_spark.functions.text import IRREGULAR_LEMMAS

    irr = " ".join(
        f"WHEN {var} = '{s}' THEN '{l}'" for s, l in sorted(IRREGULAR_LEMMAS.items())
    )
    rules = lemma_rules_case(var)
    # splice the irregular WHENs in front of the rule WHENs
    assert rules.startswith("CASE ")
    return f"CASE {irr} " + rules[len("CASE ") :]


def content_tokens_expr(col: str, dialect: str) -> str:
    """tokens → drop stopwords (NO lemma). Array/list expression — the
    pre-lemma half of content_terms_expr, for the Spark broadcast-join
    lemma path (operators.features.exploded_content_terms)."""
    toks = tokens_expr(col, dialect)
    sw = stopword_list_sql()
    if dialect == "spark":
        return f"filter({toks}, t -> NOT array_contains(array({sw}), t))"
    return f"list_filter({toks}, t -> NOT list_contains([{sw}], t))"


def content_terms_expr(col: str, dialect: str) -> str:
    """tokens → drop stopwords → lemma each. Array/list expression."""
    no_sw = content_tokens_expr(col, dialect)
    if dialect == "spark":
        return f"transform({no_sw}, t -> {lemma_case('t')})"
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
