"""Golden tests for the fuzzy taxonomy matcher (functions/matcher.py ≙
matchTitle family, ConceptNet.pm:3648-4364)."""

from __future__ import annotations

import pytest

from namedis_spark.functions.matcher import (
    ALL_BAD_MATCHES_DISCOUNT,
    DIFF_SUFFIX_DISCOUNT,
    MATCH_1_OF_N_TOKENS_DISCOUNT,
    MATCH_1_TOKEN_QUERY_DISCOUNT,
    PERFECT_MATCH_LEAST_SCORE,
    SUF_NONE,
    SUF_S,
    SUF_STOPWORD,
    ConceptMatcher,
    lemma_suffix,
)

TERMS = [
    "data structure",                      # 0
    "data compression",                    # 1
    "image compression",                   # 2
    "compression",                         # 3
    "structure (computer science)",        # 4
    "mdl (minimum description length)",    # 5
]
TFIAF = {
    "data": 2.0, "structure": 3.0, "compression": 4.0, "image": 2.5,
    "minimum": 1.5, "description": 2.0, "length": 1.8, "mdl": 5.0,
    "computer": 1.2, "science": 1.1,
}


@pytest.fixture(scope="module")
def matcher():
    return ConceptMatcher(TERMS, TFIAF)


def test_lemma_suffix_classes():
    assert lemma_suffix("structures") == ("structure", SUF_S)
    assert lemma_suffix("structure") == ("structure", SUF_NONE)
    assert lemma_suffix("the") == ("the", SUF_STOPWORD)


def test_exact_match_is_perfect(matcher):
    got = matcher.match_title("data structure")
    assert got == {0: 1.0}


def test_suffix_mismatch_discount(matcher):
    # 'structures' lemmatizes to structure with a different suffix class:
    # one suffix discount on the whole match (ConceptNet.pm:4536-4541)
    got = matcher.match_title("data structures")
    assert got == {0: pytest.approx(DIFF_SUFFIX_DISCOUNT)}


def test_single_token_exact(matcher):
    # 1-token query matches only the 1-token term (partial-match veto for
    # multi-token mains, ConceptNet.pm:4407-4412), at the 1-token discount
    got = matcher.match_title("compression")
    assert got == {3: pytest.approx(MATCH_1_TOKEN_QUERY_DISCOUNT)}


def test_single_token_diff_suffix_veto(matcher):
    # 'compressions' vs 'compression': DISABLE_1_TOKEN_DIFF_SUFFIX_MATCH
    assert matcher.calc_match_score(3, [lemma_suffix("compressions")]) == 0.0


def test_context_only_match_veto(matcher):
    # query 'science' hits term 4 only in its context → veto
    # (ConceptNet.pm:4598-4603 via the single-token context rule :4445-4450)
    assert matcher.calc_match_score(4, [lemma_suffix("science")]) == 0.0


def test_single_token_partial_match_veto(matcher):
    # 1-token query vs multi-token main: DISABLE_1_TOKEN_QUERY_PARTIAL_MATCH
    # (ConceptNet.pm:4407-4412)
    assert matcher.calc_match_score(1, [lemma_suffix("data")]) == 0.0


def test_multi_token_query_one_main_match_veto(matcher):
    # 2 non-stop query tokens but only 1 matched in main → veto
    # (ConceptNet.pm:4676-4684, $W2 > 1 branch)
    score = matcher.calc_match_score(
        1, [lemma_suffix("data"), lemma_suffix("structure")]
    )
    assert score == 0.0


def test_one_of_n_partial(matcher):
    # query with exactly one non-stop token (plus a stopword) vs
    # 'data compression': 1 of 2 main tokens matched, the missed token's
    # weight punished ×3, then the 1-of-N discount ×0.4
    # (ConceptNet.pm:4676-4692, $W2 <= 1, unknownTokenCount == 0 branch)
    score = matcher.calc_match_score(
        1, [lemma_suffix("data"), lemma_suffix("of")]
    )
    # full = 4*3 (missed 'compression') + 2 ('data'); match = 2
    expected = 2.0 / (12.0 + 2.0) * MATCH_1_OF_N_TOKENS_DISCOUNT
    assert score == pytest.approx(round(expected, 4))


def test_inversion_discount(matcher):
    # 'compression image' reverses the term order of 'image compression'
    s_fwd = matcher.calc_match_score(
        2, [lemma_suffix("image"), lemma_suffix("compression")]
    )
    s_rev = matcher.calc_match_score(
        2, [lemma_suffix("compression"), lemma_suffix("image")]
    )
    assert s_fwd == 1.0
    assert s_rev == pytest.approx(0.3)


def test_stopword_gap_bookkeeping(matcher):
    lemmas, gaps, weights = matcher.extract_tokens("compression of the images")
    assert [l for l, _ in lemmas] == ["compression", "image"]
    assert gaps == [0, 2]
    assert weights == [0.0, pytest.approx(1.1)]  # 'of' 1.0 + 'the' 0.1


def test_piece_boundary_blocks_windows(matcher):
    # a colon starts a new piece: +10 gap weight forbids cross-piece windows
    lemmas, gaps, weights = matcher.extract_tokens("image: compression")
    assert weights[1] >= 10.0
    got = matcher.match_title("image: compression")
    assert 2 not in got  # 'image compression' must NOT match across pieces


def test_distribute_perfect_reserve(matcher):
    tids, freqs = matcher.distribute_matches([1, 2], [1.0, 0.8])
    d = dict(zip(tids, freqs))
    assert d[1] == pytest.approx(PERFECT_MATCH_LEAST_SCORE)
    assert d[2] == pytest.approx(1 - PERFECT_MATCH_LEAST_SCORE)


def test_distribute_all_bad_discount(matcher):
    tids, freqs = matcher.distribute_matches([1], [0.4])
    assert freqs == [pytest.approx(0.4 * ALL_BAD_MATCHES_DISCOUNT)]


def test_distribute_scale_to_one(matcher):
    tids, freqs = matcher.distribute_matches([1, 2], [0.9, 0.6])
    assert sum(freqs) == pytest.approx(1.0)
    assert freqs[0] / freqs[1] == pytest.approx(0.9 / 0.6)


def test_unknown_token_veto(matcher):
    m = ConceptMatcher(["zork gromp compression"], TFIAF)
    # two term tokens unknown to the unigram table → veto (:4605-4610)
    assert m.calc_match_score(0, [lemma_suffix("compression")]) == 0.0


def test_concept_match_operator(spark):
    from namedis_spark.operators.concepts import concept_match

    df = spark.createDataFrame(
        [("d1", "data structure design"), ("d2", "lossy image compression"),
         ("d3", "unrelated words only")],
        "doc_id string, text string",
    )
    m = ConceptMatcher(TERMS, TFIAF)
    rows = {
        (r["id"], r["term"]): r["weight"]
        for r in concept_match(df, m).collect()
    }
    assert rows[("d1", "data structure")] == 1.0
    assert rows[("d2", "image compression")] == 1.0
    assert ("d3", "data structure") not in rows
