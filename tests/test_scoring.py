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
