"""Parity: the production fast scorer (prepare_scoring + score_pairs_fast)
must reproduce the per-pair oracle path (score_one_pair via score_pairs)
channel-for-channel on real generated blocks."""

from __future__ import annotations

import pytest

from namedis_spark.datagen import generate_transcripts
from namedis_spark.operators import corpus
from namedis_spark.operators.blocking import attach_features, candidate_pairs
from namedis_spark.operators.features import conversation_features
from namedis_spark.operators.scoring import (
    ScoringParams,
    collect_side_tables,
    prepare_scoring,
    score_pairs,
    score_pairs_fast,
    score_pairs_grouped,
)

BOOL_COLS = ["stage1_mergeable", "gate_passed"]
STR_COLS = ["stage1_reason"]
NUM_COLS = [
    "cslr_coauthor", "cslr_tool", "jw", "content_cos", "taxonomy_cos",
    "year_discount", "coauthor_boost", "ic_sum", "score",
]


@pytest.fixture(scope="module")
def scored_both(spark):
    t, _ = generate_transcripts(spark, n_blocks=3, seed=7, hot_blocks=1)
    f = conversation_features(t).persist()
    side = collect_side_tables(
        f,
        ambiguity=corpus.key_ambiguity(f, rounds=2),
        coauthor_counts=corpus.coauthor_stats(f),
        idf=corpus.term_idf(f),
        tool_similarity=corpus.tool_simi(f),
        ic=corpus.term_ic(f),
    )
    params = ScoringParams()
    pairs = candidate_pairs(f).persist()
    prep = prepare_scoring(spark, f, side).persist()
    slow = score_pairs(spark, attach_features(pairs, f), side, params)
    fast = score_pairs_fast(spark, attach_features(pairs, prep), side, params)
    grouped = score_pairs_grouped(spark, pairs, prep, side, params,
                                  target_pairs_per_group=200)  # force salting
    key = ["block_key", "conv_id1", "conv_id2"]
    s = {tuple(r[k] for k in key): r for r in slow.collect()}
    q = {tuple(r[k] for k in key): r for r in fast.collect()}
    g = {tuple(r[k] for k in key): r for r in grouped.collect()}
    return s, q, g


def test_same_pair_set(scored_both):
    s, q, g = scored_both
    assert len(s) > 200
    assert set(s.keys()) == set(q.keys()) == set(g.keys())


def test_booleans_and_reasons_exact(scored_both):
    s, q, g = scored_both
    for k, rs in s.items():
        for other in (q, g):
            ro = other[k]
            for c in BOOL_COLS + STR_COLS:
                assert rs[c] == ro[c], (k, c, rs[c], ro[c])


def test_numeric_channels_close(scored_both):
    s, q, g = scored_both
    for k, rs in s.items():
        for other in (q, g):
            ro = other[k]
            for c in NUM_COLS:
                a, b = rs[c], ro[c]
                assert a == pytest.approx(b, rel=1e-9, abs=1e-12), (k, c, a, b)
