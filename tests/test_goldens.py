"""The golden join-assert (queries._assert_golden) must actually fire.

Round-3 verdict finding #3: SURVEY claimed a corruption test that did not
exist, and the assert itself was untested — a silent-skip bug (path typo
making os.path.exists always False) would quietly demote the three golden
queries back to rows-only. These tests prove:

* a doctored golden CSV raises AssertionError (value drift, row drift,
  column drift),
* a matching golden passes, including the ADVICE dtype trap (query-side
  float column whose golden CSV values all parse as int64),
* the committed goldens for the three rows-only queries exist at BOTH
  verification SFs and are non-trivially sized, so the assert is not
  silently skipped on registered runs.
"""

from __future__ import annotations

import os

import pytest

from namedis_spark.queries import _assert_golden

# multimodal_features graduated to a full DuckDB oracle in round 5 (its
# stub decoder is SQL-expressible); only the genuinely non-expressible
# fuzzy matcher family stays golden-verified.
GOLDEN_QUERIES = ("concept_pair_simi", "concept_match_titles")
GOLDENS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "namedis_spark",
    "goldens",
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, score double, n bigint")


def _write(tmp_path, name, text):
    p = tmp_path / f"{name}_sfX.csv"
    p.write_text(text)
    return str(tmp_path)


def test_matching_golden_passes(spark, tmp_path):
    d = _write(tmp_path, "toy", "k,score,n\na,1.5,3\nb,2.25,4\n")
    df = _df(spark, [("a", 1.5, 3), ("b", 2.25, 4)])
    out = _assert_golden(df, "toy", "/data/sfX", goldens_dir=d)
    assert out is df


def test_int_parsed_golden_vs_float_query_passes(spark, tmp_path):
    # ADVICE trap: the golden CSV's float column holds only integral
    # values, so pandas parses it int64 while the query side is float64.
    # Joint dtype resolution must compare them as floats, not raise.
    d = _write(tmp_path, "toy", "k,score,n\na,1,3\nb,2,4\n")
    df = _df(spark, [("a", 1.0, 3), ("b", 2.0, 4)])
    _assert_golden(df, "toy", "/data/sfX", goldens_dir=d)


def test_corrupted_value_fires(spark, tmp_path):
    d = _write(tmp_path, "toy", "k,score,n\na,1.5,3\nb,9.99,4\n")
    df = _df(spark, [("a", 1.5, 3), ("b", 2.25, 4)])
    with pytest.raises(AssertionError, match="drifted"):
        _assert_golden(df, "toy", "/data/sfX", goldens_dir=d)


def test_corrupted_exact_column_fires(spark, tmp_path):
    d = _write(tmp_path, "toy", "k,score,n\na,1.5,3\nb,2.25,7\n")
    df = _df(spark, [("a", 1.5, 3), ("b", 2.25, 4)])
    with pytest.raises(AssertionError, match="drifted"):
        _assert_golden(df, "toy", "/data/sfX", goldens_dir=d)


def test_row_count_drift_fires(spark, tmp_path):
    d = _write(tmp_path, "toy", "k,score,n\na,1.5,3\n")
    df = _df(spark, [("a", 1.5, 3), ("b", 2.25, 4)])
    with pytest.raises(AssertionError, match="rows"):
        _assert_golden(df, "toy", "/data/sfX", goldens_dir=d)


def test_column_drift_fires(spark, tmp_path):
    d = _write(tmp_path, "toy", "k,score,extra\na,1.5,3\nb,2.25,4\n")
    df = _df(spark, [("a", 1.5, 3), ("b", 2.25, 4)])
    with pytest.raises(AssertionError, match="columns"):
        _assert_golden(df, "toy", "/data/sfX", goldens_dir=d)


def test_missing_golden_is_noop(spark, tmp_path):
    df = _df(spark, [("a", 1.5, 3)])
    assert _assert_golden(df, "nope", "/data/sfX", goldens_dir=str(tmp_path)) is df


def test_nan_vs_value_fires(spark, tmp_path):
    d = _write(tmp_path, "toy", "k,score,n\na,1.5,3\nb,,4\n")
    df = _df(spark, [("a", 1.5, 3), ("b", 2.25, 4)])
    with pytest.raises(AssertionError, match="drifted"):
        _assert_golden(df, "toy", "/data/sfX", goldens_dir=d)


def test_committed_goldens_exist_for_registered_runs():
    # The driver verifies at sf0.01 and tests replay sf0.001: both goldens
    # must be committed for every rows-only query or the join-assert
    # silently skips and the value check evaporates.
    for q in GOLDEN_QUERIES:
        for sf in ("sf0.001", "sf0.01"):
            p = os.path.join(GOLDENS_DIR, f"{q}_{sf}.csv")
            assert os.path.exists(p), f"missing committed golden {p}"
            assert os.path.getsize(p) > 50, f"suspiciously small golden {p}"
