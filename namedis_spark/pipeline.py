"""End-to-end resumable entity-resolution pipeline (SURVEY.md §7).

transcripts → features → side tables → blocking → pair scoring → edges →
connected components (checkpointed rounds) → assignments [→ evaluation].

Stage boundaries are checkpoint snapshots; `run(resume=True)` re-enters at
the last complete stage/round, mirroring EP1's staged outputs
(clust.pl:326-435: *-c1.txt / *-c2.txt per stage).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from namedis_spark.operators import corpus
from namedis_spark.operators.blocking import attach_features, candidate_pairs
from namedis_spark.operators.cluster import assignments_from_edges
from namedis_spark.operators.evaluate import macro_micro, pairwise_prf
from namedis_spark.operators.features import conversation_features
from namedis_spark.operators.scoring import (
    ScoringParams,
    collect_side_tables,
    edges_above_threshold,
    score_pairs,
)
from namedis_spark.sources.checkpoint import CheckpointStore


@dataclass
class PipelineResult:
    features: DataFrame
    scored_pairs: DataFrame
    assignments: DataFrame
    metrics: dict | None = None


def run(
    spark: SparkSession,
    transcripts: DataFrame,
    checkpoint_dir: str,
    labels: DataFrame | None = None,
    params: ScoringParams | None = None,
    resume: bool = False,
    ambiguity_rounds: int = 3,
) -> PipelineResult:
    params = params or ScoringParams()
    store = CheckpointStore(spark, checkpoint_dir)

    # -- features (stage snapshot: resumable without recompute) ----------
    if resume and store.latest_round("features") is not None:
        features = store.read_round("features", store.latest_round("features"))
    else:
        features = store.write_round(
            "features", 0, conversation_features(transcripts), lineage={"op": "features"}
        )

    # -- corpus side tables (EP2 analog) ----------------------------------
    ambiguity = corpus.key_ambiguity(features, rounds=ambiguity_rounds)
    coauthor_counts = corpus.coauthor_stats(features)
    idf = corpus.term_idf(features)
    tool_similarity = corpus.tool_simi(features)
    ic = corpus.term_ic(features)
    side = collect_side_tables(
        features,
        ambiguity=ambiguity,
        coauthor_counts=coauthor_counts,
        idf=idf,
        tool_similarity=tool_similarity,
        ic=ic,
    )

    # -- blocking + scoring (stage snapshot) ------------------------------
    if resume and store.latest_round("scored") is not None:
        scored = store.read_round("scored", store.latest_round("scored"))
    else:
        pairs = candidate_pairs(features)
        scored = score_pairs(spark, attach_features(pairs, features), side, params)
        scored = store.write_round(
            "scored", 0,
            scored.drop("f1", "f2"),
            lineage={"op": "blocking+scoring"},
        )

    # -- clustering (per-round snapshots inside) --------------------------
    edges = edges_above_threshold(scored, params)
    assignments = assignments_from_edges(
        spark, features, edges, store=store, resume=resume
    )
    assignments = store.write_round("assignments", 0, assignments, lineage={"op": "cc"})

    metrics = None
    if labels is not None:
        prf = pairwise_prf(assignments, labels)
        metrics = macro_micro(prf)

    return PipelineResult(
        features=features, scored_pairs=scored, assignments=assignments, metrics=metrics
    )
