"""Golden tests for the Chinese-name order vote (testChnNameReverse,
NLPUtil.pm:1750-1851)."""

from __future__ import annotations

import math

from namedis_spark.functions.nameorder import name_reverse_vote, orient_name

SUR = {"wang": math.log(0.3), "li": math.log(0.25), "chen": math.log(0.2),
       "wei": math.log(0.01), "ming": math.log(0.01)}
GIV = {"wei": math.log(0.2), "ming": math.log(0.2), "ling": math.log(0.1),
       "wang": math.log(0.005), "li": math.log(0.01), "chen": math.log(0.005)}


def test_hyphen_signals():
    # hyphenated first part = given name first → forward
    assert name_reverse_vote(["mei-ling chen"], SUR, GIV) == 0
    # hyphenated second part = given name second → reversed
    assert name_reverse_vote(["chen mei-ling"], SUR, GIV) == 1
    # conflicting records → suspicious
    assert name_reverse_vote(["mei-ling chen", "chen mei-ling"], SUR, GIV) == -1


def test_two_syllable_concat_signals():
    # 'xiaoming' (2 syllables, not a 2-char surname) in the SECOND
    # position is a given name → reversed
    assert name_reverse_vote(["wang xiaoming"], SUR, GIV) == 1
    # in the FIRST position → forward
    assert name_reverse_vote(["xiaoming wang"], SUR, GIV) == 0
    # a two-char SURNAME in second position is NOT a reversal signal;
    # 'ouyang feng' stays undecided → forward (ll vote has no entries →
    # pin counts not 1/1, no contribution)
    assert name_reverse_vote(["feng ouyang"], SUR, GIV) == 0


def test_log_likelihood_vote():
    # "wei wang": forward = P_sur(wang)+P_giv(wei) ≫ reverse =
    # P_sur(wei)+P_giv(wang) → forward (0)
    assert name_reverse_vote(["wei wang"], SUR, GIV) == 0
    # "wang wei": forward reads surname='wei' (rare surname), given='wang'
    # (rare given) → reverse likelihood wins → reversed (1)
    assert name_reverse_vote(["wang wei"], SUR, GIV) == 1
    # accumulation across names: two weakly-reversed names still vote 1
    assert name_reverse_vote(["wang wei", "li ming"], SUR, GIV) == 1
    # 'zhu' missing from BOTH tables fires both asymmetric flags →
    # suspicious (-1), exactly the reference's double-condition outcome
    assert name_reverse_vote(["zhu wei"], SUR, GIV) == -1


def test_non_chinese_and_empty():
    assert name_reverse_vote(["john smith"], SUR, GIV) == 0
    assert name_reverse_vote([], SUR, GIV) == 0
    assert name_reverse_vote(None, SUR, GIV) == 0
    # without prob tables the plain names stay forward
    assert name_reverse_vote(["wang wei"], {}, {}) == 0


def test_orient_name():
    assert orient_name("wang wei", 1) == "wei wang"
    assert orient_name("wang wei", 0) == "wang wei"
    assert orient_name("wang wei", -1) == "wang wei"
    assert orient_name("mei-ling chen wang", 1) == "mei-ling chen wang"
    assert orient_name(None, 1) is None
