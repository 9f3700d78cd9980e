"""Property-based tests (hypothesis) for the similarity core and matcher.

These check structural invariants on arbitrary inputs — the golden tests
pin exact values; these pin the shapes that must hold everywhere:
positivity, the N>20 log/linear branch agreement, floor behavior, Jaccard
bounds and symmetry, and total-function robustness of the fuzzy matcher.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from namedis_spark.functions.core import (
    cslr_v1,
    cslr_v2,
    jaro_winkler,
    weighted_jaccard,
    year_diff_discount,
)

keys = st.sampled_from(["a", "b", "c", "d", "e", "f", "UNKNOWN"])
vec = st.dictionaries(keys, st.integers(min_value=1, max_value=9), min_size=1, max_size=6)


@settings(max_examples=200, deadline=None)
@given(vec, vec)
def test_cslr_outputs_positive_and_finite(v1, v2):
    for fn in (cslr_v1, cslr_v2):
        prob, lr = fn(dict(v1), dict(v2))
        assert prob >= 0.0 and math.isfinite(prob)
        assert lr >= 0.0 and math.isfinite(lr)


@settings(max_examples=200, deadline=None)
@given(vec, vec)
def test_cslr_log_linear_branches_agree(v1, v2):
    # compute via the internal log value and via the linear-space result:
    # they must agree to float tolerance on BOTH sides of the N=20 switch
    for fn in (cslr_v1, cslr_v2):
        prob, lr, log_lr = fn(dict(v1), dict(v2), _return_log=True)
        if lr > 0:
            assert math.isclose(math.log(lr), log_lr, rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=200, deadline=None)
@given(vec, vec, st.floats(min_value=1e-6, max_value=10.0))
def test_cslr_floor_logic(v1, v2, min_odds):
    # floored ratio is either >= min_odds, or exactly min_odds/100
    # (NLPUtil.pm:3692-3706)
    for fn in (cslr_v1, cslr_v2):
        _, lr = fn(dict(v1), dict(v2), min_odds=min_odds)
        assert lr >= min_odds or math.isclose(lr, min_odds / 100.0)


@settings(max_examples=300, deadline=None)
@given(vec, vec)
def test_jaccard_bounds_and_symmetry(v1, v2):
    for use_freq in (True, False):
        s12 = weighted_jaccard(v1, v2, use_freq=use_freq)
        s21 = weighted_jaccard(v2, v1, use_freq=use_freq)
        assert 0.0 <= s12 <= 1.0
        assert math.isclose(s12, s21, rel_tol=1e-12)
    ident = {k: v for k, v in v1.items() if k != "UNKNOWN"}
    if ident:
        assert weighted_jaccard(ident, dict(ident)) == 1.0


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=0, max_size=12), st.text(min_size=0, max_size=12))
def test_jaro_winkler_bounds_symmetry_identity(s1, s2):
    jw = jaro_winkler(s1, s2)
    assert 0.0 <= jw <= 1.0
    assert math.isclose(jw, jaro_winkler(s2, s1), rel_tol=1e-12)
    if s1:
        assert jaro_winkler(s1, s1) == 1.0


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=30))
def test_year_discount_monotone(d):
    # non-increasing in the gap; 1 within tolerance; 0 beyond the max
    assert year_diff_discount(d) >= year_diff_discount(d + 1)
    assert year_diff_discount(0) == 1.0
    assert year_diff_discount(7) == 0.0


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=80))
def test_matcher_total_on_arbitrary_text(title):
    # match_title must be a total function over arbitrary titles, and every
    # emitted weight must sit in (0, 1]
    from namedis_spark.functions.matcher import ConceptMatcher

    m = ConceptMatcher(
        ["data structure", "compression", "mdl (minimum description length)"],
        {"data": 2.0, "structure": 3.0, "compression": 4.0, "mdl": 5.0,
         "minimum": 1.5, "description": 2.0, "length": 1.8},
    )
    for tid, w in m.match_title(title).items():
        assert 0.0 < w <= 1.0
        assert 0 <= tid < 3


# --- round-2 surfaces ------------------------------------------------------

words = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=12)


@settings(max_examples=300, deadline=None)
@given(words)
def test_lemma_total_and_idempotent_on_output(w):
    """lemma() never raises, never empties a word, and its output is a
    fixed point for the suffix families it strips (no rule re-fires on an
    already-lemmatized form in a way that loops)."""
    from namedis_spark.functions.text import lemma

    out = lemma(w)
    assert isinstance(out, str) and out
    # applying twice equals applying... not always (e.g. 'busses'→'busse'
    # →'buss'? busse ends 'e'); the invariant that DOES hold: applying
    # repeatedly terminates at a fixed point within a few steps
    x = out
    for _ in range(4):
        nxt = lemma(x)
        if nxt == x:
            break
        x = nxt
    assert lemma(x) == x


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(words, words), min_size=0, max_size=5))
def test_name_reverse_vote_total_and_bounded(pairs):
    """The vote is a total function into {-1, 0, 1} for arbitrary 2-part
    surfaces and arbitrary prob tables."""
    import math as m

    from namedis_spark.functions.nameorder import name_reverse_vote

    names = [f"{a} {b}" for a, b in pairs]
    sur = {a: m.log(0.1) for a, _ in pairs[:2]}
    giv = {b: m.log(0.2) for _, b in pairs[:2]}
    v = name_reverse_vote(names, sur, giv)
    assert v in (-1, 0, 1)


@settings(max_examples=100, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["t1", "t2", "t3", "t4"]),
        st.floats(min_value=0.01, max_value=2.0),
        min_size=0, max_size=4,
    ),
    st.dictionaries(
        st.sampled_from(["t1", "t2", "t3", "t4"]),
        st.floats(min_value=0.01, max_value=2.0),
        min_size=0, max_size=4,
    ),
)
def test_concept_vector_simi_total_and_nonnegative(w1, w2):
    """calc_concept_vector_simi is total and non-negative for arbitrary
    weight vectors (empty included) and always reports a finite gate."""
    import math as m

    from namedis_spark.functions.conceptsimi import calc_concept_vector_simi

    cv1 = {k: {"w": v, "f": 2019, "t": 2020} for k, v in w1.items()}
    cv2 = {k: {"w": v, "f": 2018, "t": 2021} for k, v in w2.items()}
    r = calc_concept_vector_simi(
        cv1, cv2, {"v1": 2}, {"v2": 1},
        ics={k: 5.0 for k in ("t1", "t2", "t3", "t4")},
        freqs={k: 10.0 for k in ("t1", "t2", "t3", "t4")},
        mc=1000.0, ambig=5.0,
    )
    assert r["simi"] >= 0.0 and m.isfinite(r["simi"])
    assert r["ic_sum"] >= 0.0 and m.isfinite(r["ic_sum"])
    assert isinstance(r["gate_passed"], bool)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from(["x", "y", "z"])),
        min_size=0, max_size=12,
    )
)
def test_test_lang_total(tokens):
    """test_lang never raises on arbitrary token soup."""
    from namedis_spark.functions.langdata import DE_WORDS, FR_WORDS
    from namedis_spark.operators.textops import test_lang

    text = " ".join(f"{w}{i}" if i % 3 == 0 else w for i, w in tokens)
    assert test_lang(text, DE_WORDS) in (True, False)
    assert test_lang(text, FR_WORDS) in (True, False)
