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


def _h(w, f=2019, t=2020, lemmas=None, tokens=None):
    return {"w": w, "f": f, "t": t, "lemmas": lemmas or [], "tokens": tokens or []}


BASE = dict(
    ics={"svm": 6.0, "nn": 5.5, "ml": 4.5, "ai": 4.0},
    freqs={"svm": 40.0, "nn": 60.0, "ml": 400.0, "ai": 900.0},
    mc=10000.0,
    ambig=10.0,
)


def test_combined_simi_shared_channel_golden():
    from namedis_spark.functions.conceptsimi import calc_concept_vector_simi

    cv1 = {"svm": _h(0.9, tokens=[(0, [0, 1])])}
    cv2 = {"svm": _h(0.8, tokens=[(1, [2, 3])])}
    r = calc_concept_vector_simi(cv1, cv2, {"icml": 2}, {"icml": 1}, **BASE)
    # shared term: (6.0-3.5) * 3*0.9*0.8 * ydisc(1.0) = 2.5*2.16 = 5.4
    assert r["shared_sum"] == pytest.approx(5.4, abs=1e-4)
    assert r["ic_sum"] == pytest.approx(6.0)
    # gate: ICSum 6.0 >= ln(10) = 2.303
    assert r["gate_passed"]
    # final = sharedSum * venueBoost (venue vectors overlap → boost > 0)
    assert r["simi"] == pytest.approx(5.4 * r["venue_boost"], abs=1e-4)


def test_combined_simi_cross_term_lcs_channel():
    from namedis_spark.functions.conceptsimi import calc_concept_vector_simi

    # no shared concepts; svm~nn meet at 'ml' (depth sum 2)
    def closeness(c1, c2):
        if {c1, c2} == {"svm", "nn"}:
            return (1.0, 1.0, "ml", 2)  # ic(ml)-offset = 1.0
        return None

    cv1 = {"svm": _h(0.9)}
    cv2 = {"nn": _h(0.8)}
    r = calc_concept_vector_simi(
        cv1, cv2, {"v": 1}, {"v": 1}, closeness_fn=closeness, **BASE
    )
    # diff = 1.0 * 1.0 * 0.9*0.8 * 0.7^2 = 0.3528; freq(ml)=400 > freqSumThres
    # = trunc2(10000*0.5/(10*3)) = 166.66 → GATED OUT → falls to the floor
    assert r["max_diff"] == 0.0
    assert r["shared_sum"] == 0.0

    # with a rarer lcs the channel engages
    b2 = dict(BASE)
    b2["freqs"] = dict(BASE["freqs"], ml=100.0)
    r = calc_concept_vector_simi(
        cv1, cv2, {"v": 1}, {"v": 1}, closeness_fn=closeness,
        use_lower_bound=False, **b2
    )
    assert r["max_diff"] == pytest.approx(1.0 * 0.9 * 0.8 * 0.49, abs=1e-6)
    assert r["ic_sum"] == pytest.approx(4.5 * 0.49, abs=1e-6)  # ics[ml]*disc


def test_combined_simi_single_term_veto_and_empty_prior():
    from namedis_spark.functions.conceptsimi import calc_concept_vector_simi

    # only shared concept is corpus-frequent 'ai' (900) → vetoed
    cv1 = {"ai": _h(0.9)}
    cv2 = {"ai": _h(0.8)}
    r = calc_concept_vector_simi(cv1, cv2, {"v": 1}, {"v": 1}, **BASE)
    assert r["shared_sum"] == 0.0 and r["ic_sum"] == 0.0
    assert not r["gate_passed"]

    # empty vector → prior, gate bypassed
    r = calc_concept_vector_simi({}, cv2, {"v": 1}, {"v": 1}, **BASE)
    assert r["simi"] == pytest.approx(0.5 * r["venue_boost"], abs=1e-6)
    assert r["gate_passed"]


def test_combined_simi_lower_bound_and_overlap_dedup():
    from namedis_spark.functions.conceptsimi import calc_concept_vector_simi

    # two shared concepts on the SAME token span: only the higher-IC one
    # survives the dedup; weights chosen so the surviving sum is tiny →
    # the similarity floor raises maxsimi to the prior
    cv1 = {
        "svm": _h(0.1, tokens=[(0, [0, 1, 2])]),
        "nn": _h(0.1, tokens=[(0, [1, 2])]),
    }
    cv2 = {
        "svm": _h(0.1, tokens=[(5, [0, 1, 2])]),
        "nn": _h(0.1, tokens=[(5, [1, 2])]),
    }
    r = calc_concept_vector_simi(cv1, cv2, {"v": 1}, {"v": 1}, **BASE)
    survivors = [t[0] for t in r["shared_terms"]]
    assert survivors == ["svm"]  # nn's span stolen (lower IC)
    # sharedSum = (6-3.5)*3*0.01 = 0.075 < prior 0.5 → floored
    assert r["shared_sum"] == pytest.approx(0.075, abs=1e-4)
    assert r["simi"] == pytest.approx(0.5 * r["venue_boost"], abs=1e-6)


def test_least_common_subsumer_ordering():
    from namedis_spark.functions.conceptsimi import least_common_subsumer

    anc1 = {"a": (0, 1.0), "m": (1, 1.0), "c": (2, 1.0)}
    anc2 = {"b": (0, 1.0), "m": (1, 0.5), "c": (2, 1.0)}
    # m wins on depth sum (2 < 4)
    lcs, ds, at, d1, d2 = least_common_subsumer(anc1, anc2)
    assert lcs == "m" and ds == 2 and at == 0.5 and (d1, d2) == (1, 1)
    # gate excludes it → c (if within the gate)
    assert least_common_subsumer(anc1, anc2, 1) is None
    # attenuated tie-break: equal depth sums, less-attenuated path wins
    a1 = {"x": (1, 1.0), "y": (1, 1.0)}
    a2 = {"x": (1, 0.5), "y": (1, 1.0)}
    assert least_common_subsumer(a1, a2)[0] == "y"


def test_merge_nearby_terms_and_compact():
    from namedis_spark.functions.conceptsimi import (
        compact_concept_vector,
        merge_nearby_terms,
    )

    # svm and kernelm are siblings under ml (depth 2 in the taxonomy);
    # their LCS 'ml' has depth sum... svm→ml 1, kernelm→ml 1 → within round 1?
    # round 1 admits depth-sum ≤ 1 only → no merge; svm/itself: a term whose
    # direct parent is the other term merges at depth-sum 1.
    ancestors = {
        "svm": {"svm": (0, 1.0), "kernel": (1, 1.0), "ml": (2, 1.0)},
        "kernel": {"kernel": (0, 1.0), "ml": (1, 1.0)},
        "far": {"far": (0, 1.0)},
    }
    rootdepth = {"svm": 4, "kernel": 3, "ml": 2, "far": 4}
    weights = {"svm": 0.6, "kernel": 0.5, "far": 0.2}
    mm = merge_nearby_terms(weights, ancestors, rootdepth, max_nearby_depth_diff=1)
    # svm merges INTO its parent 'kernel' (depth-sum 1); kernel == lcs so
    # only svm appears in the map
    assert mm == {"svm": ("kernel", 1)}

    cv = {
        "svm": {"w": 0.6, "f": 2019, "t": 2020, "lemmas": [["svm"]],
                 "tokens": [(0, [1])]},
        "kernel": {"w": 0.5, "f": 2018, "t": 2019, "lemmas": [["kernel"]],
                    "tokens": [(1, [0])]},
    }
    out = compact_concept_vector(cv, mm)
    assert out["kernel"]["w"] == pytest.approx(1.1)
    assert out["kernel"]["f"] == 2018 and out["kernel"]["t"] == 2020
    assert len(out["kernel"]["tokens"]) == 2
    assert out["svm"] == cv["svm"]  # original kept alongside


def test_merge_nearby_respects_weight_ratio_and_depth_floor():
    from namedis_spark.functions.conceptsimi import merge_nearby_terms

    ancestors = {
        "svm": {"svm": (0, 1.0), "kernel": (1, 1.0)},
        "kernel": {"kernel": (0, 1.0)},
    }
    rootdepth = {"svm": 4, "kernel": 3}
    # round 2 requires ratio >= 1/2: 0.9 vs 0.1 fails → no merge
    mm = merge_nearby_terms(
        {"svm": 0.1, "kernel": 0.9}, dict(ancestors), rootdepth,
        max_nearby_depth_diff=2,
    )
    # depth-sum 1 pairs merge in round 1 with NO ratio requirement
    assert mm == {"svm": ("kernel", 1)}
    # but a too-general subsumer (rootdepth < 2) never absorbs anything
    mm = merge_nearby_terms(
        {"svm": 0.5, "kernel": 0.5}, dict(ancestors), {"svm": 4, "kernel": 1},
        max_nearby_depth_diff=1,
    )
    assert mm == {}


def test_title_set_to_vector_goldens():
    from namedis_spark.functions.conceptsimi import title_set_to_vector

    m1 = {"svm": (0.8, (0, 1), ("support", "vector"))}
    m2 = {"svm": (0.6, (2, 3), ("support", "vector")),
          "nn": (1.0, (0,), ("network",))}
    cv, vv = title_set_to_vector([m1, m2], ["icml", None], [2018, 2020])
    # w scaled by sqrt(c) * max(1, ln 2) = sqrt(2) * 1
    import math
    assert cv["svm"]["w"] == pytest.approx((0.8 + 0.6) / math.sqrt(2))
    assert cv["svm"]["c"] == 2
    assert cv["svm"]["f"] == 2018 and cv["svm"]["t"] == 2020
    assert cv["svm"]["tokens"] == [(0, [0, 1]), (1, [2, 3])]
    assert cv["nn"]["w"] == pytest.approx(1.0)
    assert vv == {"icml": 1, "UNKNOWN": 1}


def test_hash_top_n_keeps_ties():
    from namedis_spark.functions.conceptsimi import hash_top_n

    d = {"a": 3.0, "b": 2.0, "c": 2.0, "d": 1.0}
    out = hash_top_n(d, 2, lambda v: v)
    assert set(out) == {"a", "b", "c"}  # tie at the cutoff kept
