"""Golden tests for the pairwise scorer (score_one_pair) — stage-1 merge
predicates, evidence gate, and channel composition (FIXTURES.md §4)."""

from __future__ import annotations

import math

import pytest

from namedis_spark.operators.scoring import ScoringParams, score_one_pair


def mk(focus="wei wang", focus_raw="Wei Wang", coauthors=(), terms=None,
       tools=None, venue="tool_01", yf=2020, yt=2021):
    return {
        "focus_name": focus,
        "focus_raw": focus_raw,
        "coauthors": list(coauthors),
        "term_freq": dict(terms or {}),
        "tool_freq": dict(tools or {}),
        "venue": venue,
        "year_from": yf,
        "year_to": yt,
    }


BASE_KW = dict(
    params=ScoringParams(),
    ambig={"wei wang": 10.0},
    cn_counts={"wei wang": 20.0, "rare pal": 3.0, "famous star": 500.0},
    ambig_sum_total=10000.0,
    idf={"t1": 2.0, "t2": 2.0, "t3": 2.0},
    tool_simi_map={},
    cat_ic={},
)


def test_western_focus_two_shared_merge():
    # non-ambiguous focus: >= 2 shared coauthors merge (NLPUtil.pm:3904-3941)
    kw = dict(BASE_KW)
    f1 = mk(focus="john smith", coauthors=["a b", "c d", "e f"])
    f2 = mk(focus="john smith", coauthors=["a b", "c d"])
    r = score_one_pair(f1, f2, **kw)
    assert r["stage1_mergeable"] and r["stage1_reason"] == "shared>=2"
    f2 = mk(focus="john smith", coauthors=["a b", "x y"])
    # one shared only -> no merge, and CSLR coauthor odds computed
    r = score_one_pair(f1, f2, **kw)
    assert not r["stage1_mergeable"]
    assert r["cslr_coauthor"] > 0


def test_ambiguous_subset_rule():
    # shared == one side's whole coauthor set (NLPUtil.pm:4231-4238)
    f1 = mk(coauthors=["a b", "c d", "e f"])
    f2 = mk(coauthors=["a b", "c d"])
    r = score_one_pair(f1, f2, **BASE_KW)
    assert r["stage1_mergeable"] and r["stage1_reason"] == "subset"


def test_ambiguous_evidence_error_rule():
    # rare shared coauthor -> tiny evidence error -> merge; famous shared
    # coauthor -> error above tolerance -> no merge (NLPUtil.pm:4096-4137)
    f1 = mk(coauthors=["rare pal", "x x"])
    f2 = mk(coauthors=["rare pal", "y y"])
    r = score_one_pair(f1, f2, **BASE_KW)
    assert r["stage1_mergeable"] and r["stage1_reason"] == "evidence-error"

    f1 = mk(coauthors=["famous star", "x x"])
    f2 = mk(coauthors=["famous star", "y y"])
    r = score_one_pair(f1, f2, **BASE_KW)
    # error = (500+1)*25/10000/2 = 0.626 > 0.05
    assert not r["stage1_mergeable"]


def test_gate_blocks_empty_evidence():
    # no shared terms -> ic_sum 0 < log(ambig floor e) -> score forced 0
    f1 = mk(terms={"t1": 2})
    f2 = mk(terms={"t9": 2})
    r = score_one_pair(f1, f2, **BASE_KW)
    assert not r["gate_passed"] and r["score"] == 0.0


def test_gate_and_score_composition():
    p = ScoringParams()
    f1 = mk(terms={"t1": 2, "t2": 1}, tools={"tool_01": 2})
    f2 = mk(terms={"t1": 1, "t2": 2}, tools={"tool_01": 1})
    r = score_one_pair(f1, f2, **BASE_KW)
    # shared idf mass = 4.0 >= log(25) = 3.22 -> gate passes
    assert r["gate_passed"]
    assert r["ic_sum"] == pytest.approx(4.0)
    expected_base = p.w_content * r["content_cos"] + p.w_taxonomy * r["taxonomy_cos"] + p.w_jw * r["jw"]
    venue_boost = min(max(r["cslr_tool"], p.venue_boost_floor), p.venue_boost_cap)
    assert r["score"] == pytest.approx(
        expected_base * venue_boost * r["coauthor_boost"] * r["year_discount"]
    )
    assert r["jw"] == 1.0  # identical raw names


def test_year_discount_zeroes_distant_pairs():
    f1 = mk(terms={"t1": 2}, yf=2000, yt=2001)
    f2 = mk(terms={"t1": 2}, yf=2015, yt=2016)
    r = score_one_pair(f1, f2, **BASE_KW)
    assert r["year_discount"] == 0.0 and r["score"] == 0.0


def test_taxonomy_channel():
    kw = dict(BASE_KW)
    kw["cat_ic"] = {"cat_05": 3.0, "cat_06": 3.0}
    kw["idf"] = {"term0005": 2.0, "term0045": 2.0}
    # term0005 and term0045 both map to cat_05 (mod 40)
    f1 = mk(terms={"term0005": 1})
    f2 = mk(terms={"term0045": 1})
    r = score_one_pair(f1, f2, **kw)
    assert r["taxonomy_cos"] == pytest.approx(1.0)  # same single category
    assert r["content_cos"] == 0.0  # no shared term


def test_single_shared_term_veto():
    """ConceptNet.pm:6059-6066 + getTermFreqThresByAmbig :5475-5497:
    a pair whose ONLY shared term is corpus-frequent carries no term
    evidence — content and ic_sum are zeroed and the gate fails."""
    kw = dict(BASE_KW)
    # corpus of 1000 docs; 'common' appears in 800 (idf = ln(1000/800)),
    # 'rare' in 5 (idf = ln(200))
    kw["idf"] = {"common": math.log(1000 / 800), "rare": math.log(1000 / 5)}
    kw["n_docs"] = 1000.0
    kw["max_df"] = 800.0
    # ambig(wei wang)=10 → oe = 10*2.5=25 (overestimate boost), freqSumThres
    # = 800*0.5/(25*3) ≈ 5.33 → per-vector thres walks dfs ascending
    f1 = mk(terms={"common": 3, "rare": 1})
    f2 = mk(terms={"common": 2, "other": 1})
    r = score_one_pair(f1, f2, **kw)
    # only shared term = 'common', df 800 > thres (≈ 4) → vetoed
    assert r["ic_sum"] == 0.0 and r["content_cos"] == 0.0
    assert not r["gate_passed"] and r["score"] == 0.0

    # sharing the RARE term instead survives the veto (df 5 ≤ … no: thres
    # from freqSumThres 5.33: sorted dfs of f1 = [5, 800]: running 5 ≤ 5.33
    # → thres 5; f2 (other unknown → df 1000? other not in idf → df = n)
    f1 = mk(terms={"rare": 1})
    f2 = mk(terms={"rare": 2})
    r = score_one_pair(f1, f2, **kw)
    assert r["ic_sum"] > 0 and r["content_cos"] > 0


def test_empty_vector_prior_and_gate_bypass():
    """ConceptNet.pm:6038-6053: an empty content vector scores the prior
    (min(threshold, 0.5)) with the gate auto-passed, so venue/coauthor
    evidence alone can carry the pair."""
    p = ScoringParams()
    f1 = mk(terms={})
    f2 = mk(terms={"t1": 2})
    r = score_one_pair(f1, f2, **BASE_KW)
    assert r["gate_passed"]
    prior = min(p.threshold, p.empty_vec_prior_cap)
    venue_boost = min(max(r["cslr_tool"], p.venue_boost_floor), p.venue_boost_cap)
    assert r["score"] == pytest.approx(
        prior * venue_boost * r["coauthor_boost"] * r["year_discount"]
    )


def test_simi_lower_bound_floor():
    """ConceptNet.pm:6084-6089: a positive-but-tiny base for non-empty
    vectors is floored at the prior (the gate still decides). OFF by
    default (score-space deviation — see ScoringParams); exercised here
    with the flag on."""
    p = ScoringParams(use_simi_lower_bound=True)
    kw = dict(BASE_KW)
    kw["params"] = p
    kw["idf"] = {"t1": 4.0, "u1": 4.0, "u2": 4.0}
    # one strong shared term passes the gate (idf 4 >= log(25)=3.22) but
    # the cosine is diluted by disjoint terms → base < prior
    f1 = mk(terms={"t1": 1, "u1": 9}, focus_raw="wei wang")
    f2 = mk(terms={"t1": 1, "u2": 9}, focus_raw="wang w")
    r = score_one_pair(f1, f2, **kw)
    assert r["gate_passed"]
    prior = min(p.threshold, p.empty_vec_prior_cap)
    base = p.w_content * r["content_cos"] + p.w_taxonomy * r["taxonomy_cos"] + p.w_jw * r["jw"]
    assert 0.0 < base < prior  # the floor actually engaged
    venue_boost = min(max(r["cslr_tool"], p.venue_boost_floor), p.venue_boost_cap)
    assert r["score"] == pytest.approx(
        prior * venue_boost * r["coauthor_boost"] * r["year_discount"]
    )


def test_term_freq_thres_by_ambig_golden():
    from namedis_spark.functions.core import term_freq_thres_by_ambig

    # walk [2, 5, 30] with budget 10: 2 ok (thres 2), +5=7 ok (thres 5),
    # +30=37 > 10 → thres = 30-1 = 29
    assert term_freq_thres_by_ambig([30, 2, 5], 10) == 29
    # budget 6: 2 ok, +5=7 > 6 → thres 4
    assert term_freq_thres_by_ambig([30, 2, 5], 6) == 4
    # everything fits → thres = max freq
    assert term_freq_thres_by_ambig([1, 2, 3], 100) == 3
    assert term_freq_thres_by_ambig([], 10) == 0.0
