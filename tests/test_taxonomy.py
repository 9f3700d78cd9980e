"""Multi-level taxonomy DAG tests: closure, attenuation, exclusions, LCS.

Golden values follow the reference semantics (ConceptNet.pm): min-depth
ancestors, batch attenuation min(1, depth0/depth_b), freq pass-up
freq·atten^depth, LCS = min depth-sum ≤ 3 with attenuated tie-break.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F


@pytest.fixture(scope="module")
def dag(spark):
    # leaf_a → m1 → c1 → ROOT      (depth-3 leaf via mid)
    # leaf_a → c2 → ROOT           (alternative, shallower parent)
    # leaf_b → c1 → ROOT           (depth-2 leaf)
    # leaf_c → m1                  (second child of the mid)
    rows = [
        ("leaf_a", "m1"), ("leaf_a", "c2"),
        ("leaf_b", "c1"),
        ("leaf_c", "m1"),
        ("m1", "c1"),
        ("c1", "CONCEPT_NET_ROOT"), ("c2", "CONCEPT_NET_ROOT"),
    ]
    return spark.createDataFrame(rows, "term string, parent string")


def test_closure_min_depth_multi_parent(spark, dag):
    from namedis_spark.operators.taxonomy import ancestor_closure

    clo = {
        (r["term"], r["ancestor"]): r["depth"]
        for r in ancestor_closure(dag).collect()
    }
    assert clo[("leaf_a", "leaf_a")] == 0
    assert clo[("leaf_a", "m1")] == 1
    assert clo[("leaf_a", "c1")] == 2
    assert clo[("leaf_a", "c2")] == 1
    # min-depth: ROOT reachable via c2 (depth 2) and via m1→c1 (depth 3)
    assert clo[("leaf_a", "CONCEPT_NET_ROOT")] == 2
    assert clo[("leaf_b", "CONCEPT_NET_ROOT")] == 2
    assert clo[("leaf_c", "CONCEPT_NET_ROOT")] == 3


def test_attenuation_closed_form(spark, dag):
    """atten = min(1, rootdepth(t) / (rootdepth(a) + depth(t,a))):
    1 on shortest root paths, < 1 for longer alternative inheritance —
    the declarative twin of attenuateByBatch (ConceptNet.pm:5253)."""
    from namedis_spark.operators.taxonomy import ancestor_closure, with_attenuation

    att = {
        (r["term"], r["ancestor"]): r["atten"]
        for r in with_attenuation(ancestor_closure(dag)).collect()
    }
    assert att[("leaf_a", "c2")] == 1.0          # on the shortest root path
    assert att[("leaf_a", "CONCEPT_NET_ROOT")] == 1.0
    # c1 reached at wave rootdepth(c1)+depth = 1+2 = 3 > rootdepth(leaf_a)=2
    assert att[("leaf_a", "c1")] == pytest.approx(2 / 3)
    # m1 is NOT on leaf_a's shortest root path (that goes via c2): wave
    # rootdepth(m1)+1 = 3 > 2 → later batch → attenuated
    assert att[("leaf_a", "m1")] == pytest.approx(2 / 3)
    assert att[("leaf_b", "c1")] == 1.0
    assert att[("leaf_c", "m1")] == 1.0          # on leaf_c's only root path
    assert att[("leaf_c", "leaf_c")] == 1.0      # self depth-0 entries are 1


def test_exclusions_cut_terms_and_edges(spark, dag):
    from namedis_spark.operators.taxonomy import ancestor_closure, apply_exclusions

    # excluding m1 orphans nothing (leaf_a still has c2) but removes the
    # m1 routes; blacklisting (leaf_a, c2) removes that edge only
    cut = apply_exclusions(dag, excluded_terms=("m1",), excluded_edges=(("leaf_a", "c2"),))
    universe = dag.select("term").union(dag.select("parent")).distinct()
    clo = {
        (r["term"], r["ancestor"]): r["depth"]
        for r in ancestor_closure(cut, extra_nodes=universe).collect()
        if r["term"] != "m1"  # excluded term keeps no entries we care about
    }
    assert ("leaf_a", "m1") not in clo
    assert ("leaf_a", "c2") not in clo
    assert ("leaf_c", "m1") not in clo
    assert clo[("leaf_c", "leaf_c")] == 0      # orphan: closure = {self}
    assert ("leaf_c", "CONCEPT_NET_ROOT") not in clo
    assert clo[("leaf_b", "c1")] == 1          # untouched branch intact


def test_passup_and_ic_golden(spark, dag):
    """freq pass-up with attenuation: hand-computed goldens."""
    from namedis_spark.operators.taxonomy import (
        ancestor_closure,
        term_ic_dag,
        with_attenuation,
    )

    tf = spark.createDataFrame(
        [("leaf_a", 8), ("leaf_b", 4), ("leaf_c", 2)], "term string, freq long"
    )
    att = with_attenuation(ancestor_closure(dag))
    got = {r["term"]: r["freq"] for r in term_ic_dag(tf, att).collect()}
    assert got["leaf_a"] == 8.0
    # m1: leaf_a attenuated (2/3)^1 (off-shortest-path batch) + leaf_c 1·2
    assert got["m1"] == pytest.approx(8 * (2 / 3) + 2, abs=1e-5)
    # c1: leaf_b (atten 1, d1) + m1 route of leaf_a ((2/3)^2 · 8) + leaf_c (1·2)
    assert got["c1"] == pytest.approx(4 + 8 * (2 / 3) ** 2 + 2, abs=1e-5)
    assert got["CONCEPT_NET_ROOT"] == pytest.approx(8 + 4 + 2)    # unattenuated
    ic = {r["term"]: r["ic"] for r in term_ic_dag(tf, att).collect()}
    assert ic["CONCEPT_NET_ROOT"] == 0.0                          # MC holder


def test_lcs_multi_level_and_gate(spark, dag):
    """Mixed leaf depths: (leaf_a, leaf_b) meet at c1 with depth-sum 3
    (inside the ≤3 gate); (leaf_a, leaf_c) share m1 at depth-sum 2 —
    the LCS must prefer the smaller depth-sum."""
    from namedis_spark.operators.taxonomy import (
        ancestor_closure,
        lcs_closeness,
        with_attenuation,
    )

    tf = spark.createDataFrame(
        [("leaf_a", 8), ("leaf_b", 4), ("leaf_c", 2)], "term string, freq long"
    )
    att = with_attenuation(ancestor_closure(dag))
    got = {
        (r["term1"], r["term2"]): r
        for r in lcs_closeness(tf, att).collect()
    }
    assert got[("leaf_a", "leaf_c")]["lcs"] == "m1"
    assert got[("leaf_a", "leaf_c")]["depth_sum"] == 2
    assert got[("leaf_a", "leaf_b")]["lcs"] == "c1"
    assert got[("leaf_a", "leaf_b")]["depth_sum"] == 3
    assert got[("leaf_b", "leaf_c")]["lcs"] == "c1"  # 1 + 2 = 3, in gate
    # attenuation product on the chosen subsumer: leaf_a reaches c1 at 2/3
    assert got[("leaf_a", "leaf_b")]["attenuation"] == pytest.approx(2 / 3, abs=1e-6)


def test_synthetic_dag_has_multi_level_lcs_pairs(spark):
    """The registered synthetic DAG must actually produce depth-sum-3
    (mid-level) subsumers, not only flat same-parent pairs, and honor its
    exclusion fixtures."""
    from namedis_spark.operators.taxonomy import (
        EXCLUDED_TERMS,
        ancestor_closure,
        lcs_closeness,
        synthetic_dag,
        with_attenuation,
    )

    tf = spark.createDataFrame(
        [(f"word{i}", i + 1) for i in range(60)], "term string, freq long"
    )
    edges = synthetic_dag(tf)
    assert edges.where(F.col("parent").isin(*EXCLUDED_TERMS)).count() == 0
    att = with_attenuation(ancestor_closure(edges))
    rows = lcs_closeness(tf, att).collect()
    depth_sums = {r["depth_sum"] for r in rows}
    assert 2 in depth_sums and 3 in depth_sums, depth_sums
    lcs_levels = {r["lcs"][:3] for r in rows}
    assert "mid" in lcs_levels and "cat" in lcs_levels


def test_closeness_fn_feeds_combined_similarity(spark, dag):
    """End-to-end: the DAG closeness table plugs into the full combined
    similarity as the cross-term channel."""
    from namedis_spark.functions.conceptsimi import calc_concept_vector_simi
    from namedis_spark.operators.taxonomy import (
        ancestor_closure,
        closeness_fn_from_df,
        lcs_closeness,
        term_ic_dag,
        with_attenuation,
    )

    tf = spark.createDataFrame(
        [("leaf_a", 8), ("leaf_b", 4), ("leaf_c", 2)], "term string, freq long"
    )
    att = with_attenuation(ancestor_closure(dag))
    # toy-DAG ICs are small, so disable the IC offset for the closeness
    # channel (the offset is corpus-scale calibration, clust.pl:277)
    fn = closeness_fn_from_df(lcs_closeness(tf, att, ic_offset=0.0))
    ics = {r["term"]: r["ic"] for r in term_ic_dag(tf, att).collect()}
    freqs = {r["term"]: r["freq"] for r in term_ic_dag(tf, att).collect()}

    got = fn("leaf_a", "leaf_c")
    assert got is not None and got[2] == "m1" and got[3] == 2
    assert fn("leaf_c", "leaf_a") == got  # order-insensitive

    r = calc_concept_vector_simi(
        {"leaf_a": {"w": 0.9, "f": 2019, "t": 2020}},
        {"leaf_c": {"w": 0.8, "f": 2019, "t": 2020}},
        {"v": 1}, {"v": 1},
        # ambig 0.2 → freqSumThres = 14·0.5/0.6 ≈ 11.67 admits m1 (7.33)
        ics=ics, freqs=freqs, mc=14.0, ambig=0.2,
        closeness_fn=fn, use_lower_bound=False,
    )
    # cross-term channel engaged via the DAG LCS (m1 rare enough)
    assert r["max_diff"] > 0
    assert r["closest"][0] == "m1"
