"""Concept-vector extraction: titles → taxonomy-term weight vectors.

Distributed face of the ``matchTitle`` family (functions/matcher.py;
reference ConceptNet.pm:4043-4364): the matcher object rides to executors
inside the Arrow-batched ``mapInPandas`` closure (≙ the broadcast taxonomy
+ inverted index + unigram table the reference holds in process memory),
and each batch of titles is matched in vectorized Python — no per-row
Spark-side Python, one output row per (doc, matched term).

At 10^12 turns this is a map-only stage: no shuffle, prunes to the two
scanned columns, and the matcher broadcast is bounded by taxonomy size
(the reference's full CS/Math/Linguistics taxonomy is ~100k terms —
megabytes), not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from namedis_spark.functions.matcher import ConceptMatcher

MATCH_SCHEMA = "id string, term string, weight double"


def concept_match(
    df: DataFrame,
    matcher: ConceptMatcher,
    id_col: str = "doc_id",
    text_col: str = "text",
    weight_thres: float = 0.3,
) -> DataFrame:
    """(id, term, weight) rows: per document, every taxonomy term matched in
    its text at best-window score ≥ ``weight_thres``
    (recordBestMatches semantics, ConceptNet.pm:3822-3845)."""

    terms = matcher.terms

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids: list = []
            out_terms: list[str] = []
            weights: list[float] = []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                for tid, w in matcher.match_title(
                    text or "", weight_thres
                ).items():
                    ids.append(i)
                    out_terms.append(terms[tid])
                    weights.append(round(w, 4))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype=object),
                    "term": pd.Series(out_terms, dtype=object),
                    "weight": pd.Series(weights, dtype="float64"),
                }
            )

    from pyspark.sql import functions as F

    return df.select(
        F.col(id_col).cast("string").alias(id_col), text_col
    ).mapInPandas(run, MATCH_SCHEMA)
