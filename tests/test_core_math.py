"""Golden tests for the pure-Python similarity core (FIXTURES.md §4).

Expected values are assembled from independent formula derivations (not by
calling the functions under test), covering the reference's edge cases:
UNSEEN pooling, priors, freq cap 4, UNSEEN reduction int(N/3), the N>20
log-space branch, and the x100 floor logic (NLPUtil.pm:3486-3712).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from namedis_spark.functions.core import (
    combination,
    coauthor_evidence_error,
    cslr_v1,
    cslr_v2,
    jaro_winkler,
    overestimate_ambig,
    shared_coauthor_boost,
    tfidf_cosine,
    weighted_jaccard,
    year_diff_discount,
    year_range_diff,
)


def test_cslr_equal_distributions():
    # multinomial {a:2.5, b:2.5, UNSEEN:.5}; sample {a:2, b:2}; N=4, M=3
    prob, lr = cslr_v2({"a": 2, "b": 2}, {"a": 2, "b": 2})
    p = 2.5 / 5.5
    exp_prob = (math.factorial(4) / (math.factorial(2) ** 2)) * p**4
    exp_lr = exp_prob * combination(6, 4)
    assert prob == pytest.approx(exp_prob, rel=1e-12)
    assert lr == pytest.approx(exp_lr, rel=1e-12)


def test_cslr_disjoint_unseen_path():
    # sample pooled to UNSEEN:2; reduction int(2*0.3334)=0
    prob, lr = cslr_v2({"a": 3, "b": 3}, {"c": 2})
    exp_prob = (0.5 / 7.5) ** 2
    exp_lr = exp_prob * combination(4, 2)
    assert prob == pytest.approx(exp_prob, rel=1e-12)
    assert lr == pytest.approx(exp_lr, rel=1e-12)


def test_cslr_unseen_reduction():
    # sample {x:6} vs base {a:1}: base bigger? sums 1 < 6 → multinomial is
    # the sample side... pick sizes so the big side is the base:
    # base {a:5,b:5}, sample {c:6}: UNSEEN=6, N=6, reduction=int(6*.3334)=2
    prob, lr = cslr_v2({"a": 5, "b": 5}, {"c": 6})
    # caps: a,b → 4; priors → 4.5; UNSEEN prior .5 → s=9.5
    # sample UNSEEN = 6-2 = 4, N=4, M=3
    exp_prob = (0.5 / 9.5) ** 4  # coeff = 4!/4! = 1
    exp_lr = exp_prob * combination(6, 4)
    assert prob == pytest.approx(exp_prob, rel=1e-12)
    assert lr == pytest.approx(exp_lr, rel=1e-12)


def test_cslr_freq_cap():
    # multinomial freq capped at 4 before priors
    prob, _ = cslr_v2({"a": 10}, {"a": 1})
    # mult {a: 4+0.5, UNSEEN: 0.5} → s=5; sample {a:1}; N=1
    assert prob == pytest.approx(4.5 / 5.0, rel=1e-12)


def test_cslr_log_space_branch_consistency():
    # N=25 forces the log branch; check against a direct non-log derivation
    base = {f"t{i}": 3 for i in range(12)}
    sample = {f"t{i}": 5 for i in range(5)}  # N=25 > 20
    prob, lr = cslr_v2(base, sample)
    # derive directly: caps 3<4 stay; priors 3.5 each; UNSEEN 0.5
    s = 12 * 3.5 + 0.5
    logp = math.lgamma(26)
    for _ in range(5):
        logp -= math.lgamma(6)
        logp += math.log(3.5 / s) * 5
    m = 13
    exp_lr = math.exp(logp + math.lgamma(m + 25) - math.lgamma(26) - math.lgamma(m))
    assert prob == pytest.approx(math.exp(logp), rel=1e-10)
    assert lr == pytest.approx(exp_lr, rel=1e-10)


def test_cslr_floor_logic():
    # raw lr = 6/225 ≈ 0.02667 (from the disjoint case)
    _, lr = cslr_v2({"a": 3, "b": 3}, {"c": 2}, min_odds=1.0)
    assert lr == 1.0  # within 100x → raised to min_odds
    _, lr = cslr_v2({"a": 3, "b": 3}, {"c": 2}, min_odds=10.0)
    assert lr == 0.1  # beyond 100x → min_odds/100


def test_cslr_bigger_side_is_multinomial():
    # symmetric: result must not depend on argument order
    a = {"x": 5, "y": 2}
    b = {"x": 1, "z": 1}
    assert cslr_v2(a, b) == cslr_v2(b, a)


def test_cslr_v1_template_pick_plain_or():
    # v1 picks the multinomial by a plain OR (NLPUtil.pm:3268-3276): vv1 has
    # the BIGGER freq sum but FEWER keys, so it still becomes the sample.
    # mult = vv2 = {a,x,y} + priors → {1.5,1.5,1.5, UNSEEN:0.5}, s=5.
    # sample = {a:2, b:2} → b unseen (1 type), seen-cancel ⌊1·0.5⌋=0 →
    # sample {a:2, UNSEEN:1}, N=3: prob = 3!/2! · 0.3² · 0.1 = 0.027,
    # support C(6,3)=20 → lr = 0.54.
    _, lr = cslr_v1({"a": 2, "b": 2}, {"a": 1, "x": 1, "y": 1})
    assert lr == pytest.approx(0.54)
    _, lr2 = cslr_v2({"a": 2, "b": 2}, {"a": 1, "x": 1, "y": 1})
    assert lr2 != pytest.approx(lr)  # v2 picks vv1 as template instead


def test_cslr_v1_prior_before_cap():
    # v1 adds the prior BEFORE capping (NLPUtil.pm:3362-3369): a freq-4
    # outcome stays at 4.0 (not 4.5 as in v2).
    # mult {a: min(4+0.5, 4)=4, UNSEEN: 0.5}, s=4.5; sample {a:1}:
    # prob = 4/4.5, support C(2,1)=2 → lr = 16/9.
    _, lr1 = cslr_v1({"a": 4}, {"a": 1})
    assert lr1 == pytest.approx(16.0 / 9.0)
    _, lr2 = cslr_v2({"a": 4}, {"a": 1})
    assert lr2 == pytest.approx(0.9 * 2)


def test_cslr_v1_unseen_type_count_and_seen_cancel():
    # UNSEEN holds the unseen TYPE COUNT (not freq sum, NLPUtil.pm:3330-3333)
    # reduced by ⌊seenTypes·0.5⌋ (:3350-3355).
    # sample {a:1, x:5}: x → UNSEEN=1 type (not 5); seen_cnt=1 → cancel 0.
    # mult {a: min(10+.5,4)=4, b: 4, UNSEEN: .5}, s=8.5; sample {a:1,UNSEEN:1},
    # N=2: prob = 2!·(4/8.5)·(0.5/8.5); support C(4,2)=6.
    _, lr = cslr_v1({"a": 10, "b": 10}, {"a": 1, "x": 5})
    expected = 2 * (4 / 8.5) * (0.5 / 8.5) * 6
    assert lr == pytest.approx(expected)
    # two seen types cancel ⌊2·0.5⌋=1 of two unseen types:
    # mult → all 1.5 ×4 + UNSEEN .5, s=6.5; sample {a:1,b:1,UNSEEN:1}, N=3
    _, lr2 = cslr_v1({"a": 1, "b": 1, "c": 1, "d": 1}, {"a": 1, "b": 1, "x": 1, "y": 1})
    p = (1.5 / 6.5) ** 2 * (0.5 / 6.5) * 6
    assert lr2 == pytest.approx(p * combination(7, 3))


def test_jaccard_freq_and_type_modes():
    v1 = {"a": 3, "b": 1}
    v2 = {"a": 1, "c": 2}
    # inter = min(3,1)=1; union = max(3,1)+1+2 = 6
    assert weighted_jaccard(v1, v2, 0.0, True) == pytest.approx(1 / 6)
    assert weighted_jaccard(v1, v2, 0.0, False) == pytest.approx(1 / 3)


def test_jaccard_unknown_never_matches():
    v1 = {"UNKNOWN": 2, "a": 1}
    v2 = {"UNKNOWN": 3, "a": 1}
    # inter=1; union = 2+3+1 = 6
    assert weighted_jaccard(v1, v2, 0.0, True) == pytest.approx(1 / 6)


def test_jaccard_min_simi_floor():
    assert weighted_jaccard({"a": 1}, {"b": 1}, 0.05, True) == 0.05


def test_jaro_winkler_matches_duckdb():
    pairs = [
        ("martha", "marhta"), ("dixon", "dicksonx"), ("jellyfish", "smellyfish"),
        ("wei wang", "wang wei"), ("abc", "abc"), ("", "abc"), ("a", "b"),
        ("dwayne", "duane"), ("li min", "li ming"), ("zhang lei", "zhang wei"),
    ]
    con = duckdb.connect()
    for s1, s2 in pairs:
        exp = con.sql("select jaro_winkler_similarity(?, ?)", params=[s1, s2]).fetchone()[0]
        assert jaro_winkler(s1, s2) == pytest.approx(exp, abs=1e-12), (s1, s2)


def test_tfidf_cosine():
    v1 = {"a": 1.0, "b": 2.0}
    v2 = {"a": 2.0, "c": 1.0}
    exp = 2.0 / (math.sqrt(5) * math.sqrt(5))
    assert tfidf_cosine(v1, v2) == pytest.approx(exp)
    assert tfidf_cosine({}, v2) == 0.0


def test_year_discount_golden():
    # gaps 0,2,3,6,7 (FIXTURES.md §4)
    assert year_diff_discount(0) == 1.0
    assert year_diff_discount(2) == 1.0
    assert year_diff_discount(3) == pytest.approx(0.7)
    assert year_diff_discount(6) == pytest.approx(0.7**4)
    assert year_diff_discount(7) == 0.0
    assert year_range_diff(2000, 2005, 2003, 2010) == 0
    assert year_range_diff(2000, 2002, 2005, 2010) == 3
    assert year_range_diff(2005, 2010, 2000, 2002) == 3


def test_overestimate_ambig_boosts():
    ambig = {"big": 300.0, "mid": 100.0, "small": 10.0}
    assert overestimate_ambig("big", ambig) == 300.0
    assert overestimate_ambig("mid", ambig) == 150.0  # x1.5
    assert overestimate_ambig("small", ambig) == 25.0  # x2.5
    assert overestimate_ambig("absent", ambig) == 0.0


def test_coauthor_evidence_error_symmetric_max():
    ambig = {"wei wang": 100.0, "li min": 4.0}
    counts = {"wei wang": 50.0, "li min": 10.0}
    total = 10000.0
    e1 = (10 + 1) * 150.0 / total / 2
    e2 = (50 + 1) * 10.0 / total / 2
    got = coauthor_evidence_error("wei wang", "li min", ambig, counts, total)
    assert got == pytest.approx(max(e1, e2))


def test_shared_coauthor_boost():
    ambig = {"wei wang": 100.0, "rare guy": 2.0}
    counts = {"wei wang": 50.0, "rare guy": 3.0}
    total = 10000.0
    b1 = total / (3 + 1) / 150.0
    b2 = total / (50 + 1) / 5.0
    exp = max(1.0, min(b1, b2))
    got = shared_coauthor_boost("wei wang", ["rare guy"], ambig, counts, total)
    assert got == pytest.approx(exp)
    assert shared_coauthor_boost("unambiguous", ["x"], ambig, counts, total) == 1.0
