"""Golden tests for the concept-vector shared-term precision guards
(calcConceptVectorSimi sub-terms, ConceptNet.pm:5698-5988) with
reference-derived numbers."""

from __future__ import annotations

import pytest

from namedis_spark.functions.conceptsimi import (
    lemma_sequences_intersect,
    remove_overlap_terms,
    shared_term_simi,
)


def test_exact_lemma_override_golden():
    # IC 6.0, offset 3.5 → ic-part 2.5
    # small weights: w1=0.2, w2=0.3 → double discount 3·0.06 = 0.18
    # exact lemma match raises it to min(w1, w2) = 0.2
    assert shared_term_simi(
        6.0, 0.2, 0.3, [["support", "vector"]], [["support", "vector"]]
    ) == pytest.approx(2.5 * 0.2, abs=1e-4)
    # no lemma match → product discount
    assert shared_term_simi(
        6.0, 0.2, 0.3, [["support", "vector"]], [["svm"]]
    ) == pytest.approx(2.5 * 0.18, abs=1e-4)
    # big weights: product 3·0.4·0.5 = 0.6 > min 0.4 → product wins even
    # with the exact match (the override is a floor, not a cap)
    assert shared_term_simi(
        6.0, 0.4, 0.5, [["a"]], [["a"]]
    ) == pytest.approx(2.5 * 0.6, abs=1e-4)
    # IC below offset → zero evidence regardless of weights
    assert shared_term_simi(3.0, 1.0, 1.0, [["a"]], [["a"]]) == 0.0
    # year discount scales multiplicatively; trunc-4 (not rounding)
    assert shared_term_simi(6.0, 1.0, 1.0, None, None, year_discount=0.49) == (
        pytest.approx(int(2.5 * 3.0 * 0.49 * 10000) / 10000)
    )


def test_lemma_sequence_intersection():
    assert lemma_sequences_intersect([["a", "b"], ["c"]], [["c"], ["d"]])
    assert not lemma_sequences_intersect([["a", "b"]], [["a"], ["b"]])
    assert not lemma_sequences_intersect(None, [["a"]])


def _cv(spans: dict) -> dict:
    # spans: concept → list of (title_sn, [token_sns])
    return {c: {"tokens": t} for c, t in spans.items()}


def test_remove_overlap_terms_higher_ic_steals_span():
    # 'vector machine' (IC 5) and 'support vector machine' (IC 8) overlap
    # on tokens (0, [1, 2]); the higher-IC term processed later steals the
    # span and the earlier term is dropped
    cv1 = _cv({"vm": [(0, [1, 2])], "svm": [(0, [0, 1, 2])]})
    cv2 = _cv({"vm": [(3, [4, 5])], "svm": [(3, [3, 4, 5])]})
    shared = [
        ("vm", 1.0, 0, 5.0),
        ("svm", 2.0, 0, 8.0),
    ]
    out = remove_overlap_terms(shared, cv1, cv2)
    assert [t[0] for t in out] == ["svm"]


def test_remove_overlap_terms_lower_ic_cannot_steal():
    # reversed processing order: the high-IC term claims first; the
    # low-IC term cannot steal (conflictICSum 8 >= 5) and is dropped
    cv1 = _cv({"vm": [(0, [1, 2])], "svm": [(0, [0, 1, 2])]})
    cv2 = _cv({"vm": [(3, [4, 5])], "svm": [(3, [3, 4, 5])]})
    shared = [
        ("svm", 2.0, 0, 8.0),
        ("vm", 1.0, 0, 5.0),
    ]
    out = remove_overlap_terms(shared, cv1, cv2)
    assert [t[0] for t in out] == ["svm"]


def test_remove_overlap_terms_disjoint_spans_all_kept():
    cv1 = _cv({"a": [(0, [0, 1])], "b": [(0, [3, 4])]})
    cv2 = _cv({"a": [(1, [0, 1])], "b": [(2, [0, 1])]})
    shared = [("a", 1.0, 0, 5.0), ("b", 1.0, 0, 6.0)]
    out = remove_overlap_terms(shared, cv1, cv2)
    assert [t[0] for t in out] == ["a", "b"]


def test_remove_overlap_terms_equal_ic_higher_simi_wins():
    cv1 = _cv({"a": [(0, [0])], "b": [(0, [0])]})
    cv2 = _cv({"a": [(1, [0])], "b": [(1, [0])]})
    shared = [("a", 1.0, 0, 5.0), ("b", 2.0, 0, 5.0)]
    out = remove_overlap_terms(shared, cv1, cv2)
    assert [t[0] for t in out] == ["b"]
    # but equal IC and LOWER simi cannot steal
    shared = [("b", 2.0, 0, 5.0), ("a", 1.0, 0, 5.0)]
    out = remove_overlap_terms(shared, cv1, cv2)
    assert [t[0] for t in out] == ["b"]
