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


PAIR_SIMI_SCHEMA = (
    "block_key string, conv_id1 string, conv_id2 string, simi double, "
    "ic_sum double, gate_passed boolean, venue_boost double, "
    "shared_sum double, max_diff double"
)


def cluster_pair_simi(
    convs: DataFrame,
    matcher: ConceptMatcher,
    ics: dict,
    freqs: dict,
    mc: float,
    default_ambig: float = 2.718281828459045,
    ic_offset: float = 3.5,
    closeness_fn=None,
    weight_thres: float = 0.3,
    max_block_size: int = 512,
) -> DataFrame:
    """Full reference stage-2 pair scoring, end-to-end: per block, each
    conversation's text is concept-matched (``match_title_full`` keeps the
    token/lemma provenance), aggregated into a cluster vector pair via
    ``title_set_to_vector`` (singleton clusters here — the CC stage merges
    them downstream), and every within-block pair is scored with
    ``calc_concept_vector_simi`` (shared-term sum + exact-lemma override,
    overlap dedup, single-term veto, venue CSLR boost, priors, ICSum
    gate).

    Input ``convs``: (block_key, conv_id, text, venue, year_from,
    year_to). Scale shape: one shuffle on the block key; the matcher +
    IC/freq dicts ride the UDF closure (taxonomy-sized); blocks beyond
    ``max_block_size`` are truncated to their first conversations by id
    (hot blocks belong to the capped evidence-join scorer, not the
    exhaustive one — same routing as the pipeline)."""
    import pandas as pd

    from namedis_spark.functions.conceptsimi import (
        calc_concept_vector_simi,
        title_set_to_vector,
    )

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("conv_id").head(max_block_size)
        vecs = []
        for _, r in pdf.iterrows():
            matches = matcher.match_title_full(r["text"] or "", weight_thres)
            cv, vv = title_set_to_vector(
                [matches], [r["venue"]], [r["year_from"]]
            )
            # widen the year range to the conversation's own span
            for h in cv.values():
                if r["year_to"] is not None and h["t"] is not None:
                    h["t"] = max(h["t"], int(r["year_to"]))
            vecs.append((r["conv_id"], cv, vv))
        rows = []
        for i in range(len(vecs)):
            for j in range(i + 1, len(vecs)):
                c1, cv1, vv1 = vecs[i]
                c2, cv2, vv2 = vecs[j]
                res = calc_concept_vector_simi(
                    cv1, cv2, vv1, vv2,
                    ics=ics, freqs=freqs, mc=mc, ambig=default_ambig,
                    closeness_fn=closeness_fn, ic_offset=ic_offset,
                    use_lower_bound=False,
                )
                rows.append(
                    (
                        key[0], c1, c2,
                        round(res["simi"], 6), round(res["ic_sum"], 6),
                        bool(res["gate_passed"]),
                        round(res["venue_boost"], 6),
                        round(res["shared_sum"], 6),
                        round(res["max_diff"], 6),
                    )
                )
        return pd.DataFrame(
            rows,
            columns=[
                "block_key", "conv_id1", "conv_id2", "simi", "ic_sum",
                "gate_passed", "venue_boost", "shared_sum", "max_diff",
            ],
        )

    return convs.groupBy("block_key").applyInPandas(run, schema=PAIR_SIMI_SCHEMA)
