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


def test_lang(
    text: str | None,
    foreign_natives: frozenset[str] | set[str],
    en_map: dict[str, int] | None = None,
) -> bool:
    """Full dictionary-vote foreign-language test — a faithful pure-Python
    port of ``testLang`` (clean.pl:445-541) incl. the loan-phrase
    lookahead (``matchPhrase``, clean.pl:680-702) and apostrophe words:

    * tokens = [a-zA-Z']+ runs, lowercased;
    * a token native in the foreign language votes `foreign` unless
      English also knows it (`shared`) — and a foreign lead word of an
      English loan phrase ("de" in "de facto") consumes the whole phrase
      into `shared` when the following tokens complete a known loan;
    * apostrophe words (French elision "l'analyse") count twice and vote
      both splits;
    * decision: short all-English titles pass; otherwise foreign wins
      when foreign·3 >= english or shared >= english.

    Returns True when the text reads as the foreign language."""
    import re as _re

    from namedis_spark.functions.langdata import (
        LOAN_PART_PHRASE,
        LOANWORD,
        NATIVEWORD,
        build_en_map,
    )

    if en_map is None:
        en_map = build_en_map()
    if not text:
        return False
    words = [w.lower() for w in _re.findall(r"[a-zA-Z']+", text)]
    foreign = shared = eng = 0
    total = 0
    i = 0
    while i < len(words):
        w = words[i]
        if "'" not in w or en_map.get(w, 0) & (LOAN_PART_PHRASE | LOANWORD):
            total += 1
            if w in foreign_natives:
                flags = en_map.get(w, 0)
                if not flags:
                    foreign += 1
                elif flags & LOAN_PART_PHRASE:
                    # matchPhrase: greedily extend with following tokens
                    # while prefixes stay loan-phrase parts
                    lead, j, matched = w, i + 1, 0
                    while j < len(words):
                        lead = lead + " " + words[j]
                        lf = en_map.get(lead, 0)
                        if lf & LOANWORD:
                            matched = j
                            break
                        if lf & LOAN_PART_PHRASE:
                            j += 1
                            continue
                        break
                    if matched:
                        shared += 1
                        total += matched - i
                        i = matched
                    elif flags & (NATIVEWORD | LOANWORD):
                        shared += 1
                    else:
                        foreign += 1
                elif flags & (NATIVEWORD | LOANWORD):
                    shared += 1
            elif w in en_map:
                eng += 1
            # else: unknown word — counted in total only
        else:
            total += 2
            for part in w.split("'"):
                if part in foreign_natives:
                    foreign += 1
                if en_map.get(part, 0) & NATIVEWORD:
                    eng += 1
        i += 1

    if total <= 4 and eng >= total - 1:
        return False
    if foreign > 0 and (foreign * 3 >= eng or shared >= eng):
        return True
    return False


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Dictionary-vote language ID (testLang, clean.pl:445-541) — the
    dual-dialect vote: per document, count German/French native hits
    (words in the foreign list but not English), shared hits (in both)
    and English hits, then apply the reference's decision rule per
    language. The phrase/apostrophe refinements live in the Python port
    ``test_lang`` (used by the cleaning filter); this engine-side vote
    uses plain set membership so the DuckDB oracle replays it exactly."""
    from namedis_spark.functions.langdata import DE_WORDS, EN_WORDS, FR_WORDS

    # The dictionaries are thousands of words per language: membership is
    # resolved by a BROADCAST JOIN on the exploded tokens (hash lookup,
    # constant codegen) — an inline array_contains(array(<N literals>))
    # grows codegen linearly with the dictionary and scans O(N) per token
    # (the same failure mode the lemma CASE chain had). The DuckDB oracle
    # keeps the generated IN-list form; both derive from langdata.
    spark = docs.sparkSession
    vocab = sorted(DE_WORDS | FR_WORDS | EN_WORDS)
    dic = spark.createDataFrame(
        [(w, int(w in DE_WORDS), int(w in FR_WORDS), int(w in EN_WORDS)) for w in vocab],
        "w string, in_de int, in_fr int, in_en int",
    )
    toks = tokens_expr(text_col, "spark")
    ex = docs.select("doc_id", F.explode_outer(F.expr(toks)).alias("w"))
    j = ex.join(F.broadcast(dic), "w", "left").select(
        "doc_id",
        "w",
        F.coalesce("in_de", F.lit(0)).alias("in_de"),
        F.coalesce("in_fr", F.lit(0)).alias("in_fr"),
        F.coalesce("in_en", F.lit(0)).alias("in_en"),
    )

    def s(cond):
        return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))

    agg = j.groupBy("doc_id").agg(
        F.count("w").cast("int").alias("n_words"),  # null token row → 0
        s((F.col("in_de") == 1) & (F.col("in_en") == 0)).alias("de_hits"),
        s((F.col("in_de") == 1) & (F.col("in_en") == 1)).alias("sh_de"),
        s((F.col("in_en") == 1) & (F.col("in_de") == 0)).alias("en_de"),
        s((F.col("in_fr") == 1) & (F.col("in_en") == 0)).alias("fr_hits"),
        s((F.col("in_fr") == 1) & (F.col("in_en") == 1)).alias("sh_fr"),
        s((F.col("in_en") == 1) & (F.col("in_fr") == 0)).alias("en_fr"),
        s(F.col("in_en") == 1).alias("en_hits"),
    )
    de, sh_de, en_de = F.col("de_hits"), F.col("sh_de"), F.col("en_de")
    fr, sh_fr, en_fr = F.col("fr_hits"), F.col("sh_fr"), F.col("en_fr")
    n_words = F.col("n_words")
    short_de = (n_words <= 4) & (en_de >= n_words - 1)
    short_fr = (n_words <= 4) & (en_fr >= n_words - 1)
    is_de = ~short_de & (de > 0) & ((de * 3 >= en_de) | (sh_de >= en_de))
    is_fr = ~short_fr & (fr > 0) & ((fr * 3 >= en_fr) | (sh_fr >= en_fr))
    # label tie-break: the reference only needs the binary foreign-vs-
    # english verdict (clean.pl drops the record if EITHER test fires);
    # for the label, the language with more native hits wins
    return agg.select(
        "doc_id",
        "n_words",
        "de_hits",
        "fr_hits",
        "en_hits",
        F.when(is_de & (~is_fr | (de >= fr)), "de")
        .when(is_fr, "fr")
        .otherwise("en")
        .alias("lang_pred"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting via normalized-content md5
    (functions.text.fingerprint)."""
    return docs.select(
        "doc_id", F.expr(fingerprint_expr(text_col, "spark")).alias("fingerprint")
    )


# Venue alias map (%venueMap, NLPUtil.pm:315-317) retargeted to the tool
# column: long-form tool names collapse to their canonical ids. Shared with
# the SQL oracle via venue_norm_expr (generated from this dict).
VENUE_ALIASES: tuple[tuple[str, str], ...] = (
    ("world wide web", "www"),
    ("congress on evolutionary computation", "ieee cec"),
)


def venue_norm_expr(col: str, dialect: str) -> str:
    """Venue/tool normalization (parseDBLPBlock, NLPUtil.pm:637-648):
    keep the first comma-section, strip ONE parenthesized track marker
    ("ACCV (3)" → "ACCV" — an author publishes on different tracks of the
    same conference), trim, lowercase, then apply the alias map. One
    expression, identical semantics in both dialects."""
    if dialect == "spark":
        first = f"element_at(split({col}, ','), 1)"
        stripped = f"regexp_replace({first}, '\\\\([^()]+\\\\)', '')"
    else:
        first = f"(string_split({col}, ','))[1]"
        stripped = f"regexp_replace({first}, '\\(([^()]+)\\)', '')"
    base = f"lower(trim({stripped}))"
    expr = base
    for alias, canon in VENUE_ALIASES:
        expr = f"CASE WHEN {base} = '{alias}' THEN '{canon}' ELSE {expr} END"
    return expr


def normalize_venues(docs: DataFrame, venue_col: str = "tool") -> DataFrame:
    """(raw, venue) normalization table over the distinct venue/tool
    surfaces — the Spark-side of venue_norm_expr."""
    return (
        docs.select(F.col(venue_col).alias("raw"))
        .where(F.col("raw").isNotNull())
        .distinct()
        .select("raw", F.expr(venue_norm_expr("raw", "spark")).alias("venue"))
    )
